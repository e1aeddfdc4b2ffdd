"""CSCDecoder: self-contained stream decoder (mirror of csc_dec.cpp:63-682).

Holds the coder, model tables, and the ring LZ window; Decompress() returns
one raw block per call until SIG_EOF.
"""

from ..constants import (DT_NORMAL, DT_EXE, DT_ENGTXT, DT_BAD, DT_ENTROPY,
                         SIG_EOF, DT_DLT, DLT_CHANNEL_MAX, DLT_INDEX,
                         MIN_BLOCK_SIZE, DECODE_ERROR)
from .coder import MemReader, RangeDecoder
from .model import Model
from . import filters


class DecodeError(Exception):
    code = DECODE_ERROR


def _wnd_copy(wnd, dst, src, length):
    """Overlap-safe LZ copy: replicate the period when src+length > dst
    (byte-serial semantics, csc_dec.cpp:516-517) using slice copies."""
    dist = dst - src
    if dist >= length or dist <= 0:
        wnd[dst:dst + length] = wnd[src:src + length]
        return
    if dist == 1:
        wnd[dst:dst + length] = wnd[src:src + 1] * length
        return
    n = 0
    while n < length:
        m = min(dist, length - n)
        wnd[dst + n:dst + n + m] = wnd[src + n:src + n + m]
        n += m


class CSCDecoder:
    def __init__(self, props, data, pos=0):
        self.io = MemReader(data, props.csc_blocksize, pos)
        self.rd = RangeDecoder(self.io)
        self.model = Model()
        self.wnd_size = props.dict_size
        self.wnd = bytearray(self.wnd_size + 8)
        self.wnd_curpos = 0
        self.rep_dist = [0, 0, 0, 0]   # decoder inits to 0 (csc_dec.cpp:381-384)

    # ------------------------------------------------------------------

    def _lz_decode(self, limit):
        # lz_decode, csc_dec.cpp:476-571
        m = self.model
        rd = self.rd
        wnd = self.wnd
        wnd_size = self.wnd_size
        out = bytearray()
        copied_wndpos = self.wnd_curpos
        i = 0
        while i <= limit:
            if rd.decode_bit(m.p_state, m.state * 3 + 0) == 0:
                wnd[self.wnd_curpos] = m.decode_literal(rd)
                self.wnd_curpos += 1
                i += 1
            else:
                if rd.decode_bit(m.p_state, m.state * 3 + 1) == 1:
                    dist, length = m.decode_match(rd)
                    if length == 0 and dist == 64:
                        break  # end of block sentinel
                    dist += 1
                    length += 2
                    rd_ = self.rep_dist
                    rd_[3] = rd_[2]
                    rd_[2] = rd_[1]
                    rd_[1] = rd_[0]
                    rd_[0] = dist
                    cpy_pos = (self.wnd_curpos - dist if self.wnd_curpos >= dist
                               else self.wnd_curpos + wnd_size - dist)
                    if (cpy_pos >= wnd_size or cpy_pos + length > wnd_size
                            or length + i > limit
                            or self.wnd_curpos + length > wnd_size):
                        raise DecodeError("match out of range")
                    _wnd_copy(wnd, self.wnd_curpos, cpy_pos, length)
                    i += length
                    self.wnd_curpos += length
                    m.ctx = wnd[self.wnd_curpos - 1]
                else:
                    if rd.decode_bit(m.p_state, m.state * 3 + 2) == 0:
                        m.decode_1byte_match()
                        # NOTE strict '>' (csc_dec.cpp:525) unlike matches
                        cpy_pos = (self.wnd_curpos - self.rep_dist[0]
                                   if self.wnd_curpos > self.rep_dist[0]
                                   else self.wnd_curpos + wnd_size - self.rep_dist[0])
                        wnd[self.wnd_curpos] = wnd[cpy_pos]
                        self.wnd_curpos += 1
                        i += 1
                        m.ctx = wnd[self.wnd_curpos - 1]
                    else:
                        rep_idx, length = m.decode_repdist_match(rd)
                        length += 2
                        if length + i > limit:
                            raise DecodeError("rep match too long")
                        rd_ = self.rep_dist
                        dist = rd_[rep_idx]
                        for j in range(rep_idx, 0, -1):
                            rd_[j] = rd_[j - 1]
                        rd_[0] = dist
                        cpy_pos = (self.wnd_curpos - dist if self.wnd_curpos >= dist
                                   else self.wnd_curpos + wnd_size - dist)
                        if (cpy_pos >= wnd_size or cpy_pos + length > wnd_size
                                or length + i > limit
                                or self.wnd_curpos + length > wnd_size):
                            raise DecodeError("rep match out of range")
                        _wnd_copy(wnd, self.wnd_curpos, cpy_pos, length)
                        i += length
                        self.wnd_curpos += length
                        m.ctx = wnd[self.wnd_curpos - 1]

            if self.wnd_curpos > wnd_size:
                raise DecodeError("window overrun")
            elif self.wnd_curpos == wnd_size:
                self.wnd_curpos = 0
                out += wnd[copied_wndpos:copied_wndpos + (i - len(out))]
                copied_wndpos = 0
        out += wnd[copied_wndpos:copied_wndpos + (i - len(out))]
        return bytes(out)

    def _lz_copy2dict(self, src):
        # lz_copy2dict, csc_dec.cpp:573-584
        size = len(src)
        i = 0
        while i < size:
            cur = min(self.wnd_size - self.wnd_curpos, size - i, MIN_BLOCK_SIZE)
            self.wnd[self.wnd_curpos:self.wnd_curpos + cur] = src[i:i + cur]
            self.wnd_curpos += cur
            if self.wnd_curpos >= self.wnd_size:
                self.wnd_curpos = 0
            i += cur
        return src

    def decompress(self, max_bsize):
        """One block. Returns bytes ('' on SIG_EOF).  csc_dec.cpp:586-682."""
        m = self.model
        rd = self.rd
        block_type = m.decode_int(rd)
        if block_type == DT_NORMAL:
            data = self._lz_decode(max_bsize)
        elif block_type == DT_EXE:
            data = bytearray(self._lz_decode(max_bsize))
            filters.inverse_e89(data, len(data))
            data = bytes(data)
        elif block_type == DT_ENGTXT:
            m.decode_int(rd)  # declared size: read but unused (csc_dec.cpp:603-604)
            data = bytearray(self._lz_decode(max_bsize))
            filters.inverse_dict(data, len(data))
            data = bytes(data)
        elif block_type == DT_BAD:
            data = self._lz_copy2dict(m.decode_bad(rd, max_bsize))
        elif block_type == DT_ENTROPY:
            data = self._lz_copy2dict(m.decode_literals(rd, max_bsize))
        elif block_type == SIG_EOF:
            data = b""
        elif DT_DLT <= block_type < DT_DLT + DLT_CHANNEL_MAX:
            chn = DLT_INDEX[block_type - DT_DLT]
            data = bytearray(m.decode_rle(rd, max_bsize))
            filters.inverse_delta(data, len(data), chn)
            data = self._lz_copy2dict(bytes(data))
        else:
            raise DecodeError("bad block type %d" % block_type)

        if m.decode_int(rd) == 1:
            rd.chunk_reset()
        return data


def decode_stream(props, data, pos=0):
    """Decode a full stream (header already consumed). Yields raw blocks."""
    dec = CSCDecoder(props, data, pos)
    while True:
        block = dec.decompress(props.raw_blocksize)
        if not block:
            return
        yield block
