"""CSCEncoder: analyzer-driven block typing + filters + LZ + chunk framing.

Mirrors csc_encoder_main.cpp and the C API loop in csc_enc.cpp:160-203.
"""

from ..constants import (DT_NONE, DT_NORMAL, DT_ENGTXT, DT_EXE, DT_FAST,
                         DT_BAD, DT_ENTROPY, DT_NO_LZ, DT_SKIP, DT_DLT,
                         DLT_CHANNEL_MAX, DLT_INDEX, SIG_EOF, MIN_BLOCK_SIZE)
from .coder import MemWriter, RangeEncoder
from .model import Model
from .lz import LZ
from . import analyzer, filters


class CSCEncoder:
    def __init__(self, props):
        # CSCEncoder::Init, csc_encoder_main.cpp:5-33
        self.props = props
        self.io = MemWriter(props.csc_blocksize)
        self.rc = RangeEncoder(self.io)
        self.model = Model()
        self.lz = LZ(props, self.model)
        self.lz.rc = self.rc
        self.fixed_datatype = DT_NONE
        self.rawblock_limit = props.raw_blocksize
        self.use_filters = (props.DLTFilter + props.EXEFilter + props.TXTFilter) > 0

    def _compress_block(self, buf, off, size, block_type):
        # compress_block, csc_encoder_main.cpp:35-83
        if size == 0:
            return
        m = self.model
        lz_mode = self.props.lz_mode
        if block_type == DT_NORMAL:
            m.encode_int(self.rc, block_type)
            self.lz.encode_normal(buf, off, size, lz_mode)
        elif block_type == DT_EXE:
            m.encode_int(self.rc, block_type)
            sub = bytearray(buf[off:off + size])
            filters.forward_e89(sub, size)
            self.lz.encode_normal(sub, 0, size, lz_mode)
        elif block_type == DT_ENGTXT:
            sub = bytearray(buf[off:off + size])
            if filters.forward_dict(sub, size):
                m.encode_int(self.rc, block_type)
                m.encode_int(self.rc, size)
            else:
                m.encode_int(self.rc, DT_NORMAL)
            self.lz.encode_normal(sub, 0, size, lz_mode)
        elif block_type == DT_FAST:
            m.encode_int(self.rc, DT_NORMAL)
            self.lz.encode_normal(buf, off, size, lz_mode)
        elif block_type == DT_BAD:
            m.encode_int(self.rc, block_type)
            self.lz.encode_normal(buf, off, size, 5)
            m.compress_bad(self.rc, buf[off:off + size])
        elif block_type == DT_ENTROPY:
            m.encode_int(self.rc, block_type)
            self.lz.encode_normal(buf, off, size, 5)
            m.compress_literals(self.rc, buf[off:off + size])
        elif DT_DLT <= block_type < DT_DLT + DLT_CHANNEL_MAX:
            chn = DLT_INDEX[block_type - DT_DLT]
            m.encode_int(self.rc, block_type)
            self.lz.encode_normal(buf, off, size, 5)
            sub = bytearray(buf[off:off + size])
            filters.forward_delta(sub, size, chn)
            m.compress_rle(self.rc, sub)
        else:
            raise ValueError("bad data type %d" % block_type)

    def compress(self, buf, off=0, size=None):
        # CSCEncoder::Compress, csc_encoder_main.cpp:85-146 — one raw block
        # (<= raw_blocksize) per call; ends with EncodeInt(1) + coder flush.
        if size is None:
            size = len(buf) - off
        last_begin = 0
        last_size = 0
        last_type = DT_NORMAL
        i = 0
        while i < size:
            cur = min(MIN_BLOCK_SIZE, size - i)
            if self.use_filters:
                if self.fixed_datatype == DT_NONE:
                    this_type, bpb = analyzer.analyze(buf[off + i:off + i + cur], cur)
                else:
                    this_type, bpb = self.fixed_datatype, 0
            else:
                this_type, bpb = DT_NORMAL, 0

            if this_type == DT_SKIP:
                this_type = last_type

            if this_type != DT_NORMAL:
                if this_type == DT_EXE and self.props.EXEFilter == 0:
                    this_type = DT_NORMAL
                elif this_type == DT_ENGTXT and self.props.TXTFilter == 0:
                    this_type = DT_NORMAL
                elif this_type >= DT_DLT and self.props.DLTFilter == 0:
                    this_type = DT_NORMAL

            if (this_type >= DT_DLT
                    and analyzer.get_dlt_bpb(buf[off + i:off + i + cur], cur,
                                             DLT_INDEX[this_type - DT_DLT]) >= bpb * 0.95):
                this_type = DT_NORMAL

            if this_type >= DT_NO_LZ:
                if self.lz.is_duplicate_block(buf, off + i, cur):
                    this_type = DT_NORMAL

            if last_type != this_type or last_size + cur > self.rawblock_limit:
                if last_size:
                    self._compress_block(buf, off + last_begin, last_size, last_type)
                    self.model.encode_int(self.rc, 0)
                last_begin = i
                last_size = 0

            last_type = this_type
            last_size += cur
            i += cur
        if last_size:
            self._compress_block(buf, off + last_begin, last_size, last_type)
            self.model.encode_int(self.rc, 1)
            self.rc.flush()

    def write_eof(self):
        # WriteEOF, csc_encoder_main.cpp:154-157
        self.model.encode_int(self.rc, SIG_EOF)

    def flush(self):
        self.rc.flush()

    def compressed_size(self):
        return self.rc.compressed_size()


def encode_stream(props, data):
    """Full-stream encode: raw_blocksize chunks, EOF, flush
    (CSCEnc_Encode + CSCEnc_Encode_Flush, csc_enc.cpp:160-203).
    Returns the physical stream bytes (no property header)."""
    enc = CSCEncoder(props)
    pos = 0
    while pos < len(data):
        size = min(props.raw_blocksize, len(data) - pos)
        enc.compress(data, pos, size)
        pos += size
    enc.write_eof()
    enc.flush()
    return enc.io.getvalue()
