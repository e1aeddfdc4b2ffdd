"""Streaming / bounded-memory codec API.

The reference codec is pull/push streaming: `CSCEnc_Encode` consumes an
`ISeqInStream` in raw_blocksize chunks and pushes coded blocks through
MemIO to an `ISeqOutStream` (csc_enc.cpp:160-203); `CSCDec_Decode`
pulls coded blocks on demand and emits one raw block per iteration
(csc_dec.cpp:740-767).  Peak memory is ~2-4x dict on the encode side
and ~dict + 2 x csc_blocksize on the decode side (README.md:54,
csc_dec.cpp:331-348) — independent of file size.

This module gives the golden codec the same property: a 4 GB file can
be (de)compressed through a pipe without ever being resident.  The
device batch paths keep whole-task buffers (the archiver bounds those
by task size); `csc_tpu.cli --stream` uses this API.
"""
import io as _io

from .props import write_properties, read_properties

CSC_PROP_SIZE = 10
from .golden.encoder import CSCEncoder
from .golden.decoder import CSCDecoder
from .golden.coder import MemReader


class StreamEncoder:
    """Push-style encoder: feed arbitrary-size writes, receive the
    physical stream on `out` (a file-like object) incrementally."""

    def __init__(self, props, out, write_header=True):
        self.props = props
        self.out = out
        if write_header:
            out.write(write_properties(props))
        self.enc = CSCEncoder(props)
        self.buf = bytearray()
        self.raw_in = 0
        self._finished = False

    def _drain(self):
        data = self.enc.io.out
        if data:
            self.out.write(bytes(data))
            del data[:]

    def write(self, data):
        assert not self._finished
        self.buf += data
        self.raw_in += len(data)
        rb = self.props.raw_blocksize
        while len(self.buf) >= rb:
            chunk = bytes(self.buf[:rb])
            del self.buf[:rb]
            self.enc.compress(chunk, 0, rb)
            self._drain()

    def finish(self):
        """Encode the tail, write SIG_EOF, flush the coder."""
        if self._finished:
            return
        if self.buf:
            chunk = bytes(self.buf)
            self.buf.clear()
            self.enc.compress(chunk, 0, len(chunk))
        self.enc.write_eof()
        self.enc.flush()
        self._drain()
        self._finished = True


class _FileMemReader(MemReader):
    """MemIO read side fed from a file object with a bounded buffer:
    consumed bytes are trimmed, so residency is ~2 coded blocks."""

    _CHUNK = 1 << 20

    def __init__(self, fh, bsize):
        super().__init__(bytearray(), bsize, 0)
        self.fh = fh

    def _ensure(self, n):
        """Make n bytes available at self.pos (trim consumed first)."""
        if self.pos:
            del self.data[:self.pos]
            self.pos = 0
        while len(self.data) < n:
            got = self.fh.read(max(self._CHUNK, n - len(self.data)))
            if not got:
                return False
            self.data += got
        return True

    def _read_block(self, want_rc):
        queue = self.rc_queue if want_rc else self.bc_queue
        while True:
            if queue:
                return queue.pop(0)
            if not self._ensure(4):
                raise IOError("unexpected end of stream")
            fb = self.data[self.pos]
            hdr = 1
            if (fb >> 6) & 1:
                cur = self.bsize
            else:
                cur = ((self.data[self.pos + 1] << 16)
                       | (self.data[self.pos + 2] << 8)
                       | self.data[self.pos + 3])
                hdr = 4
            if cur == 0 or cur > self.bsize:
                raise IOError("bad block size")
            if not self._ensure(hdr + cur):
                raise IOError("truncated block")
            block = bytes(self.data[self.pos + hdr:self.pos + hdr + cur])
            self.pos += hdr + cur
            if ((fb >> 7) & 1) == want_rc:
                return block
            other = self.bc_queue if want_rc else self.rc_queue
            other.append(block)


class StreamDecoder:
    """Pull-style decoder: iterate raw blocks from a file object."""

    def __init__(self, fh, props=None):
        if props is None:
            hdr = fh.read(CSC_PROP_SIZE)
            if len(hdr) != CSC_PROP_SIZE:
                raise IOError("missing property header")
            props = read_properties(hdr)
        self.props = props
        self.dec = CSCDecoder.__new__(CSCDecoder)
        d = self.dec
        from .golden.coder import RangeDecoder
        from .golden.model import Model
        d.io = _FileMemReader(fh, props.csc_blocksize)
        d.rd = RangeDecoder(d.io)
        d.model = Model()
        d.wnd_size = props.dict_size
        d.wnd = bytearray(d.wnd_size + 8)
        d.wnd_curpos = 0
        d.rep_dist = [0, 0, 0, 0]

    def blocks(self):
        while True:
            block = self.dec.decompress(self.props.raw_blocksize)
            if not block:
                return
            yield block


def compress_file(src_fh, dst_fh, props):
    """Bounded-memory file-to-file compress; returns raw size."""
    enc = StreamEncoder(props, dst_fh)
    while True:
        chunk = src_fh.read(1 << 20)
        if not chunk:
            break
        enc.write(chunk)
    enc.finish()
    return enc.raw_in


def decompress_file(src_fh, dst_fh):
    """Bounded-memory file-to-file decompress; returns output size."""
    dec = StreamDecoder(src_fh)
    n = 0
    for block in dec.blocks():
        dst_fh.write(block)
        n += len(block)
    return n
