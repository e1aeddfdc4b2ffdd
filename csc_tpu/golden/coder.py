"""Dual-substream block framing + LZMA-style binary range coder + raw bit coder.

Stream framing (csc_memio.{h,cpp}): the physical stream is a sequence of
tagged blocks.  Flag byte: bit7 = substream id (1 = range-coder bytes,
0 = direct-bit bytes), bit6 = "full block" (size == csc_blocksize, no size
field), otherwise a 3-byte big-endian size follows.  Reader demultiplexes,
queueing blocks of the other substream (csc_memio.cpp:5-81).

Range coder (csc_coder.{h,cpp}): carry-cache binary range coder with 12-bit
adaptive probabilities (shift-5 update), plus a big-endian raw bit packer.
The decoder mirror lives in csc_dec.cpp:10-96.

Byte-exactness note: the reference's Coder::Flush skips one RC byte without
storing (csc_coder.cpp:46 ``prc_++``), emitting whatever the persistent
64 KB buffer held at that offset (0 on a fresh allocation, stale coder bytes
afterwards).  We model the RC/BC buffers as persistent fixed-size arrays to
reproduce the output byte-for-byte.
"""

from ..constants import READ_ERROR

MASK32 = 0xFFFFFFFF


class MemWriter:
    """MemIO, write side.  Collects the physical stream in memory."""

    def __init__(self, bsize):
        self.bsize = bsize
        self.out = bytearray()

    def _write_block(self, data, rc1bc0):
        size = len(data)
        fb = (rc1bc0 << 7)
        if size == self.bsize:
            fb |= 1 << 6
        self.out.append(fb)
        if size != self.bsize:
            self.out += bytes([(size >> 16) & 0xFF, (size >> 8) & 0xFF, size & 0xFF])
        self.out += data

    def write_rc(self, data):
        self._write_block(data, 1)

    def write_bc(self, data):
        self._write_block(data, 0)

    def getvalue(self):
        return bytes(self.out)


class MemReader:
    """MemIO, read side.  Demuxes RC/BC blocks from one physical stream.

    ``read_rc``/``read_bc`` return the next block of that substream,
    queueing any interleaved blocks of the other substream
    (csc_memio.cpp:5-81).
    """

    def __init__(self, data, bsize, pos=0):
        self.data = data
        self.bsize = bsize
        self.pos = pos
        self.rc_queue = []
        self.bc_queue = []

    def _read_block(self, want_rc):
        queue = self.rc_queue if want_rc else self.bc_queue
        if queue:
            return queue.pop(0)
        data, pos = self.data, self.pos
        while True:
            if pos >= len(data):
                raise IOError(READ_ERROR)
            fb = data[pos]
            pos += 1
            if (fb >> 6) & 1:
                cur = self.bsize
            else:
                if pos + 3 > len(data):
                    raise IOError(READ_ERROR)
                cur = (data[pos] << 16) | (data[pos + 1] << 8) | data[pos + 2]
                pos += 3
            if cur == 0 or cur > self.bsize:
                raise IOError(READ_ERROR)
            if pos + cur > len(data):
                raise IOError(READ_ERROR)
            block = data[pos:pos + cur]
            pos += cur
            if ((fb >> 7) & 1) == want_rc:
                self.pos = pos
                return block
            other = self.bc_queue if want_rc else self.rc_queue
            other.append(block)

    def read_rc(self):
        return self._read_block(1)

    def read_bc(self):
        return self._read_block(0)


class RangeEncoder:
    """Coder, encode side (csc_coder.{h,cpp}).

    encode_bit applies the 12-bit shift-5 adaptive update to probs[idx] and
    range-codes the bit; enc_direct16/encode_direct pack raw bits big-endian
    into the BC substream.  flush() ends a chunk (csc_coder.cpp:40-74):
    5 ShiftLows + 1 skipped byte on RC, partial byte + 1 pad on BC, then both
    buffers go to MemIO and coder state resets (probabilities do NOT reset —
    they live in Model and persist across chunks).
    """

    def __init__(self, io: MemWriter):
        self.io = io
        self.bufsize = io.bsize
        self.low = 0          # 64-bit
        self.range = MASK32
        self.cachesize = 1
        self.cache = 0
        # persistent buffers: content survives chunk flushes (see module doc)
        self.rc_buf = bytearray(self.bufsize)
        self.bc_buf = bytearray(self.bufsize)
        self.rc_size = 0
        self.bc_size = 0
        self.bc_curbits = 0
        self.bc_curval = 0
        self.outsize = 0

    def _put_rc(self, b):
        self.rc_buf[self.rc_size] = b
        self.rc_size += 1
        if self.rc_size == self.bufsize:
            self.outsize += self.rc_size
            self.io.write_rc(bytes(self.rc_buf))
            self.rc_size = 0

    def _put_bc(self, b):
        self.bc_buf[self.bc_size] = b
        self.bc_size += 1
        if self.bc_size == self.bufsize:
            self.outsize += self.bc_size
            self.io.write_bc(bytes(self.bc_buf))
            self.bc_size = 0

    def _shift_low(self):
        # RC_ShiftLow, csc_coder.cpp:89-112
        low = self.low
        if (low & MASK32) < 0xFF000000 or (low >> 32) != 0:
            temp = self.cache
            carry = (low >> 32) & 0xFF
            while True:
                self._put_rc((temp + carry) & 0xFF)
                temp = 0xFF
                self.cachesize -= 1
                if self.cachesize == 0:
                    break
            self.cache = (low >> 24) & 0xFF
        self.cachesize += 1
        self.low = (low << 8) & MASK32

    def encode_bit(self, probs, idx, v):
        # EncodeBit macro, csc_coder.h:67-81
        p = probs[idx]
        new_bound = (self.range >> 12) * p
        if v:
            self.range = new_bound
            probs[idx] = p + ((0xFFF - p) >> 5)
        else:
            self.low += new_bound
            self.range -= new_bound
            probs[idx] = p - (p >> 5)
        if self.range < (1 << 24):
            self.range = (self.range << 8) & MASK32
            self._shift_low()

    def enc_direct16(self, val, length):
        # EncDirect16, csc_coder.cpp:76-87
        self.bc_curval = ((self.bc_curval << length) | val) & MASK32
        self.bc_curbits += length
        while self.bc_curbits >= 8:
            self._put_bc((self.bc_curval >> (self.bc_curbits - 8)) & 0xFF)
            self.bc_curbits -= 8

    def encode_direct(self, v, length):
        # EncodeDirect macro, csc_coder.h:83-88
        if length <= 16:
            self.enc_direct16(v, length)
        else:
            self.enc_direct16(v >> 16, length - 16)
            self.enc_direct16(v & 0xFFFF, 16)

    def flush(self):
        # Coder::Flush, csc_coder.cpp:40-74
        for _ in range(5):
            self._shift_low()
        # prc_++/rc_size_++ without a store: stale buffer byte is emitted.
        self.rc_size += 1
        for i in range(2):
            if i == 1:
                self._put_bc(0)
            else:
                self._put_bc((self.bc_curval << (8 - self.bc_curbits)) & 0xFF)
        self.outsize += self.rc_size + self.bc_size
        self.io.write_rc(bytes(self.rc_buf[:self.rc_size]))
        self.io.write_bc(bytes(self.bc_buf[:self.bc_size]))
        self.low = 0
        self.range = MASK32
        self.cachesize = 1
        self.cache = 0
        self.rc_size = 0
        self.bc_size = 0
        self.bc_curbits = 0
        self.bc_curval = 0

    def get_coded_length(self):
        return self.bc_size + self.rc_size

    def compressed_size(self):
        return self.outsize + self.rc_size + self.bc_size


class RangeDecoder:
    """Decoder-side coder state (csc_dec.cpp:10-96, 309-344, 657-680)."""

    def __init__(self, io: MemReader):
        self.io = io
        self.range = MASK32
        self.code = 0
        self.rc_buf = b""
        self.bc_buf = b""
        self.rc_pos = 0
        self.bc_pos = 0
        self.bc_curbits = 0
        self.bc_curval = 0
        self.outsize = 0
        self._prime()

    def _prime(self):
        # csc_dec.cpp:336-345 — read first RC + BC blocks, take 5 RC bytes
        self.rc_buf = self.io.read_rc()
        self.bc_buf = self.io.read_bc()
        b = self.rc_buf
        self.code = (b[1] << 24) | (b[2] << 16) | (b[3] << 8) | b[4]
        self.rc_pos = 5

    def chunk_reset(self):
        # per-chunk coder re-init, csc_dec.cpp:657-680
        self.range = MASK32
        self.code = 0
        self.outsize += self.rc_pos + self.bc_pos
        self.rc_pos = 0
        self.bc_pos = 0
        self.bc_curbits = 0
        self.bc_curval = 0
        self._prime()

    def decode_bit(self, probs, idx):
        # DecodeBit macro, csc_dec.cpp:10-35.  Refill happens BEFORE the bit.
        if self.range < (1 << 24):
            self.range = (self.range << 8) & MASK32
            self.code = ((self.code << 8) & MASK32) + self.rc_buf[self.rc_pos]
            self.rc_pos += 1
            if self.rc_pos >= len(self.rc_buf):
                self.outsize += self.rc_pos
                self.rc_buf = self.io.read_rc()
                self.rc_pos = 0
        p = probs[idx]
        bound = (self.range >> 12) * p
        if self.code < bound:
            self.range = bound
            probs[idx] = p + ((0xFFF - p) >> 5)
            return 1
        else:
            self.range -= bound
            self.code -= bound
            probs[idx] = p - (p >> 5)
            return 0

    def decode_direct16(self, length):
        # coder_decode_direct, csc_dec.cpp:65-87
        while self.bc_curbits < length:
            self.bc_curval = ((self.bc_curval << 8) | self.bc_buf[self.bc_pos]) & MASK32
            self.bc_pos += 1
            if self.bc_pos >= len(self.bc_buf):
                self.outsize += self.bc_pos
                self.bc_buf = self.io.read_bc()
                self.bc_pos = 0
            self.bc_curbits += 8
        result = (self.bc_curval >> (self.bc_curbits - length)) & ((1 << length) - 1)
        self.bc_curbits -= length
        return result

    def decode_direct(self, length):
        # DecodeDirect macro, csc_dec.cpp:37-42
        if length <= 16:
            return self.decode_direct16(length)
        hi = self.decode_direct16(length - 16)
        return (hi << 16) | self.decode_direct16(16)

    def compressed_size(self):
        return self.outsize + self.rc_pos + self.bc_pos
