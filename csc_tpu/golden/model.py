"""Statistical model: pack-flag state machine, order-1 literals, len/dist
slot coding, rep-distance queue coding, whole-block modes, and pricing.

Mirrors csc_model.{h,cpp} (encode + price) and the self-contained decoder
mirror in csc_dec.cpp:98-302.  One class holds the probability tables and
both the encode and decode paths, so either direction adapts identically.

Pack syntax (csc_model.h:7-46):
    0                      literal
    1 1  dist len          ordinary match
    1 0 0                  1-byte match with rep_dist[0]
    1 0 1 <2 tree bits>    match with rep_dist[idx], then len

State = last three pack types packed 2 bits each (& 0x3F).
"""
import math

from ..constants import DIST_TABLE, REV16_TABLE, PROB_INIT
from . import profiler


def _new_probs(n):
    return [PROB_INIT] * n


class Model:
    def __init__(self):
        # p_2_bits_ price LUT (csc_model.cpp:68-70): truncated
        # 128 * log(p/4096) / log(0.5) = -128*log2(p/4096)
        self.p_2_bits = [int(128 * math.log((i * 8 + 4) / 4096.0) / math.log(0.5))
                         for i in range(4096 >> 3)]
        self.p_lit = None
        self.p_delta = None
        self.reset()

    def reset(self):
        # Model::Reset (csc_model.cpp:88-111) / decoder Init (csc_dec.cpp:355-372)
        self.p_delta = None
        self.p_state = _new_probs(64 * 3)
        self.p_lit = _new_probs(256 * 256)
        self.p_repdist = _new_probs(64 * 3)
        self.p_dist = _new_probs(8 + 16 * 2 + 32 * 4)
        self.p_rle_len = _new_probs(16)
        self.p_matchlen_slot = _new_probs(2)
        self.p_matchlen_extra1 = _new_probs(8)
        self.p_matchlen_extra2 = _new_probs(8)
        self.p_matchlen_extra3 = _new_probs(128)
        self.p_matchdist_extra = _new_probs(29 * 16)
        self.p_longlen = [PROB_INIT]
        self.p_rle_flag = [PROB_INIT]
        self.state = 0
        self.ctx = 0
        self.lp_rebuild_int = 0
        self.len_price = [0] * 32

    def _ensure_delta(self):
        if self.p_delta is None:
            self.p_delta = _new_probs(256 * 256)

    # ------------------------------------------------------------------
    # Encode side
    # ------------------------------------------------------------------

    def encode_literal(self, rc, c):
        # EncodeLiteral, csc_model.cpp:169-183 (PEncodeLiteral hook :170)
        if profiler.enabled:
            profiler.on_literal(c)
        rc.encode_bit(self.p_state, self.state * 3 + 0, 0)
        self.state = (self.state * 4) & 0x3F
        base = self.ctx * 256
        self.ctx = c
        c |= 0x100
        p = self.p_lit
        while c < 0x10000:
            rc.encode_bit(p, base + (c >> 8), (c >> 7) & 1)
            c <<= 1

    def set_literal_ctx(self, c):
        self.ctx = c

    def encode_rep0len1(self, rc):
        # EncodeRep0Len1, csc_model.cpp:198-207 (PEncode1BMatch hook :200)
        if profiler.enabled:
            profiler.on_rep0len1()
        rc.encode_bit(self.p_state, self.state * 3 + 0, 1)
        rc.encode_bit(self.p_state, self.state * 3 + 1, 0)
        rc.encode_bit(self.p_state, self.state * 3 + 2, 0)
        self.ctx = 0
        self.state = (self.state * 4 + 2) & 0x3F

    def _encode_matchlen_1(self, rc, length):
        # encode_matchlen_1, csc_model.cpp:113-145
        if length < 16:
            if length < 8:
                rc.encode_bit(self.p_matchlen_slot, 0, 0)
                p = self.p_matchlen_extra1
            else:
                rc.encode_bit(self.p_matchlen_slot, 0, 1)
                rc.encode_bit(self.p_matchlen_slot, 1, 0)
                length -= 8
                p = self.p_matchlen_extra2
            c = length | 0x08
            while c < 0x40:
                rc.encode_bit(p, c >> 3, (c >> 2) & 1)
                c <<= 1
        else:
            rc.encode_bit(self.p_matchlen_slot, 0, 1)
            rc.encode_bit(self.p_matchlen_slot, 1, 1)
            length -= 16
            p = self.p_matchlen_extra3
            c = length | 0x80
            while c < 0x4000:
                rc.encode_bit(p, c >> 7, (c >> 6) & 1)
                c <<= 1

    def _encode_matchlen_2(self, rc, length):
        # encode_matchlen_2, csc_model.cpp:147-159
        if length >= 143:
            self._encode_matchlen_1(rc, 143)
            length -= 143
            while length >= 143:
                length -= 143
                rc.encode_bit(self.p_longlen, 0, 0)
            rc.encode_bit(self.p_longlen, 0, 1)
        self._encode_matchlen_1(rc, length)

    def encode_repdist_match(self, rc, rep_idx, match_len):
        # EncodeRepDistMatch, csc_model.cpp:218-232 (PEncodeRepMatch :220)
        if profiler.enabled:
            profiler.on_rep_match(rep_idx, match_len)
        rc.encode_bit(self.p_state, self.state * 3 + 0, 1)
        rc.encode_bit(self.p_state, self.state * 3 + 1, 0)
        rc.encode_bit(self.p_state, self.state * 3 + 2, 1)
        i = 1
        j = (rep_idx >> 1) & 1
        rc.encode_bit(self.p_repdist, self.state * 3 + i - 1, j)
        i += i + j
        j = rep_idx & 1
        rc.encode_bit(self.p_repdist, self.state * 3 + i - 1, j)
        self._encode_matchlen_2(rc, match_len)
        self.state = (self.state * 4 + 3) & 0x3F

    @staticmethod
    def _dist_pos_bits(length):
        # slot-tree segment by match length (csc_model.cpp:308-329)
        if length == 0:
            return 0, 3
        if length <= 2:
            return 16 * (length - 1) + 8, 4
        if length <= 5:
            return 32 * (length - 3) + 8 + 16 * 2, 5
        return 32 * 3 + 8 + 16 * 2, 5

    @staticmethod
    def _dist_slot(dist):
        # binary search of dist_table_ (csc_model.cpp:331-340)
        lo, hi = 0, 32
        while lo + 1 < hi:
            mid = lo + (hi - lo) // 2
            if DIST_TABLE[mid] > dist:
                hi = mid
            elif DIST_TABLE[mid] < dist:
                lo = mid
            else:
                lo = hi = mid
        return lo

    def encode_match(self, rc, dist, length):
        # EncodeMatch, csc_model.cpp:301-366 (PEncodeMatch hook :304)
        if profiler.enabled:
            profiler.on_match(dist, length)
        rc.encode_bit(self.p_state, self.state * 3 + 0, 1)
        rc.encode_bit(self.p_state, self.state * 3 + 1, 1)
        self._encode_matchlen_2(rc, length)
        pdist_pos, sbits = self._dist_pos_bits(length)
        slot = self._dist_slot(dist)
        c = slot | (1 << sbits)
        extra_bits = slot - 2 if slot > 2 else 0
        p = self.p_dist
        while c < (1 << (sbits * 2)):
            rc.encode_bit(p, pdist_pos + (c >> sbits), (c >> (sbits - 1)) & 1)
            c <<= 1
        if extra_bits:
            extra_len = dist - (1 << extra_bits) - 1
            if extra_bits > 4:
                rc.encode_direct(extra_len >> 4, extra_bits - 4)
            c = REV16_TABLE[extra_len & 0x0F] | 0x10
            base = (extra_bits - 1) * 16
            while c < (1 << 8):
                rc.encode_bit(self.p_matchdist_extra, base + (c >> 4), (c >> 3) & 1)
                c <<= 1
        self.state = (self.state * 4 + 1) & 0x3F

    def encode_int(self, rc, num):
        # EncodeInt, csc_model.cpp:389-414
        tmp = num
        slot = 0
        while tmp:
            tmp >>= 1
            slot += 1
        if slot:
            slot -= 1
        rc.encode_direct(slot, 5)
        if slot == 0:
            rc.encode_direct(num, 1)
        else:
            rc.encode_direct(num - (1 << slot), slot)

    # whole-block modes -------------------------------------------------

    def compress_bad(self, rc, src):
        # CompressBad, csc_model.cpp:463-469 — raw 8-bit direct
        self.encode_int(rc, len(src))
        for b in src:
            rc.enc_direct16(b, 8)

    def compress_literals(self, rc, src):
        # CompressLiterals, csc_model.cpp:448-461 — order-1, shares p_lit/ctx
        self.encode_int(rc, len(src))
        p = self.p_lit
        for b in src:
            base = self.ctx * 256
            self.ctx = b
            c = b | 0x100
            while c < 0x10000:
                rc.encode_bit(p, base + (c >> 8), (c >> 7) & 1)
                c <<= 1

    def compress_rle(self, rc, src):
        # CompressRLE, csc_model.cpp:471-513 — order-1 delta ctx + runs >= 11
        size = len(src)
        self.encode_int(rc, size)
        self._ensure_delta()
        p_delta = self.p_delta
        s_ctx = 0
        i = 0
        while i < size:
            if (i > 0 and size - i > 3 and src[i - 1] == src[i]
                    and src[i] == src[i + 1] and src[i] == src[i + 2]):
                j = i + 3
                length = 3
                while j < size and src[j] == src[j - 1]:
                    length += 1
                    j += 1
                if length > 10:
                    s_ctx = src[j - 1]
                    rc.encode_bit(self.p_rle_flag, 0, 1)
                    self._encode_matchlen_2(rc, length - 11)
                    i = j
                    continue
            rc.encode_bit(self.p_rle_flag, 0, 0)
            base = s_ctx * 256
            c = src[i] | 0x100
            while c < 0x10000:
                rc.encode_bit(p_delta, base + (c >> 8), (c >> 7) & 1)
                c <<= 1
            s_ctx = src[i]
            i += 1

    # ------------------------------------------------------------------
    # Pricing (fake encode) for the optimal parser
    # ------------------------------------------------------------------

    def _fprice(self, v, p):
        # FEncodeBit, csc_model.cpp:161-167
        return self.p_2_bits[p >> 3] if v else self.p_2_bits[(4096 - p) >> 3]

    def get_literal_price(self, fstate, fctx, c):
        # GetLiteralPrice, csc_model.cpp:185-196
        ret = self._fprice(0, self.p_state[fstate * 3 + 0])
        base = fctx * 256
        p = self.p_lit
        c |= 0x100
        while c < 0x10000:
            ret += self._fprice((c >> 7) & 1, p[base + (c >> 8)])
            c <<= 1
        return ret

    def get_rep0len1_price(self, fstate):
        # GetRep0Len1Price, csc_model.cpp:209-216
        return (self._fprice(1, self.p_state[fstate * 3 + 0])
                + self._fprice(0, self.p_state[fstate * 3 + 1])
                + self._fprice(0, self.p_state[fstate * 3 + 2]))

    def get_repdist_price(self, fstate, rep_idx):
        # GetRepDistPrice, csc_model.cpp:273-284
        ret = (self._fprice(1, self.p_state[fstate * 3 + 0])
               + self._fprice(0, self.p_state[fstate * 3 + 1])
               + self._fprice(1, self.p_state[fstate * 3 + 2]))
        i = 1
        j = (rep_idx >> 1) & 1
        ret += self._fprice(j, self.p_repdist[fstate * 3 + i - 1])
        i += i + j
        j = rep_idx & 1
        ret += self._fprice(j, self.p_repdist[fstate * 3 + i - 1])
        return ret

    def get_matchdist_price(self, fstate, dist):
        # GetMatchDistPrice, csc_model.cpp:368-387 — slot-only estimate
        ret = (self._fprice(1, self.p_state[fstate * 3 + 0])
               + self._fprice(1, self.p_state[fstate * 3 + 1]))
        slot = self._dist_slot(dist)
        ret += (slot + 2 if slot > 2 else 2) * 128
        return ret

    def get_matchlen_price(self, fstate, match_len):
        # GetMatchLenPrice, csc_model.cpp:286-299.
        # NOTE the reference post-decrements: the cache is rebuilt when the
        # counter is 0 *before* decrement, i.e. every 4097 calls.
        if match_len >= 32:
            return 128 * 6
        if self.lp_rebuild_int == 0:
            self._len_price_rebuild()
        else:
            self.lp_rebuild_int -= 1
        return self.len_price[match_len]

    def _len_price_rebuild(self):
        # len_price_rebuild, csc_model.cpp:234-270
        for i in range(32):
            ret = 0
            length = i
            if length < 16:
                if length < 8:
                    ret += self._fprice(0, self.p_matchlen_slot[0])
                    p = self.p_matchlen_extra1
                else:
                    ret += self._fprice(1, self.p_matchlen_slot[0])
                    ret += self._fprice(0, self.p_matchlen_slot[1])
                    length -= 8
                    p = self.p_matchlen_extra2
                c = length | 0x08
                while c < 0x40:
                    ret += self._fprice((c >> 2) & 1, p[c >> 3])
                    c <<= 1
            else:
                ret += self._fprice(1, self.p_matchlen_slot[0])
                ret += self._fprice(1, self.p_matchlen_slot[1])
                length -= 16
                p = self.p_matchlen_extra3
                c = length | 0x80
                while c < 0x4000:
                    ret += self._fprice((c >> 6) & 1, p[c >> 7])
                    c <<= 1
            self.len_price[i] = ret
        self.lp_rebuild_int = 4096

    # ------------------------------------------------------------------
    # Decode side (mirror of csc_dec.cpp:89-302)
    # ------------------------------------------------------------------

    def decode_int(self, rd):
        # decode_int, csc_dec.cpp:89-96
        slot = rd.decode_direct(5)
        num = rd.decode_direct(1 if slot == 0 else slot)
        if slot:
            num += 1 << slot
        return num

    def decode_literal(self, rd):
        # decode_literal, csc_dec.cpp:155-167
        base = self.ctx * 256
        p = self.p_lit
        i = 1
        while i < 0x100:
            i = (i << 1) | rd.decode_bit(p, base + i)
        self.ctx = i & 0xFF
        self.state = (self.state * 4 + 0) & 0x3F
        return self.ctx

    def _decode_matchlen_1(self, rd):
        # decode_matchlen_1, csc_dec.cpp:187-218
        if rd.decode_bit(self.p_matchlen_slot, 0) == 0:
            p, lenbase = self.p_matchlen_extra1, 0
        elif rd.decode_bit(self.p_matchlen_slot, 1) == 0:
            p, lenbase = self.p_matchlen_extra2, 8
        else:
            p, lenbase = self.p_matchlen_extra3, 16
        i = 1
        if lenbase == 16:
            while i < 0x80:
                i = (i << 1) | rd.decode_bit(p, i)
            return lenbase + (i & 0x7F)
        while i < 0x08:
            i = (i << 1) | rd.decode_bit(p, i)
        return lenbase + (i & 0x07)

    def decode_matchlen_2(self, rd):
        # decode_matchlen_2, csc_dec.cpp:220-232
        length = self._decode_matchlen_1(rd)
        if length == 143:
            while True:
                v = rd.decode_bit(self.p_longlen, 0)
                if v:
                    break
                length += 143
            return length + self._decode_matchlen_1(rd)
        return length

    def decode_match(self, rd):
        # decode_match, csc_dec.cpp:234-281
        length = self.decode_matchlen_2(rd)
        pdist_pos, sbits = self._dist_pos_bits(length)
        i = 1
        p = self.p_dist
        while i < (1 << sbits):
            i = (i << 1) | rd.decode_bit(p, pdist_pos + i)
        slot = i & ((1 << sbits) - 1)
        if slot <= 2:
            dist = slot
        else:
            ebits = slot - 2
            elen = 0
            if ebits > 4:
                elen = rd.decode_direct(ebits - 4)
            i = 1
            base = (ebits - 1) * 16
            while i < 0x10:
                i = (i << 1) | rd.decode_bit(self.p_matchdist_extra, base + i)
            dist = DIST_TABLE[slot] + (elen << 4) + REV16_TABLE[i & 0x0F]
        self.state = (self.state * 4 + 1) & 0x3F
        return dist, length

    def decode_1byte_match(self):
        # decode_1byte_match, csc_dec.cpp:287-291
        self.state = (self.state * 4 + 2) & 0x3F
        self.ctx = 0

    def decode_repdist_match(self, rd):
        # decode_repdist_match, csc_dec.cpp:293-302
        i = 1
        while i < 0x4:
            i = (i << 1) | rd.decode_bit(self.p_repdist, self.state * 3 + i - 1)
        rep_idx = i & 0x3
        match_len = self.decode_matchlen_2(rd)
        self.state = (self.state * 4 + 3) & 0x3F
        return rep_idx, match_len

    def decode_bad(self, rd, max_bsize):
        # decode_bad, csc_dec.cpp:98-108
        size = self.decode_int(rd)
        if size > max_bsize:
            raise ValueError("decode_bad: oversized block")
        return bytes(rd.decode_direct16(8) for _ in range(size))

    def decode_literals(self, rd, max_bsize):
        # decode_literals, csc_dec.cpp:169-185
        size = self.decode_int(rd)
        if size > max_bsize:
            raise ValueError("decode_literals: oversized block")
        out = bytearray(size)
        p = self.p_lit
        for k in range(size):
            base = self.ctx * 256
            c = 1
            while c < 0x100:
                c = (c << 1) | rd.decode_bit(p, base + c)
            self.ctx = c & 0xFF
            out[k] = self.ctx
        return bytes(out)

    def decode_rle(self, rd, max_bsize):
        # decode_rle, csc_dec.cpp:110-153
        self._ensure_delta()
        size = self.decode_int(rd)
        if size > max_bsize:
            raise ValueError("decode_rle: oversized block")
        out = bytearray(size)
        p_delta = self.p_delta
        s_ctx = 0
        i = 0
        while i < size:
            flag = rd.decode_bit(self.p_rle_flag, 0)
            if flag == 0:
                base = s_ctx * 256
                c = 1
                while c < 0x100:
                    c = (c << 1) | rd.decode_bit(p_delta, base + c)
                out[i] = c & 0xFF
                s_ctx = out[i]
                i += 1
            else:
                length = self.decode_matchlen_2(rd) + 11
                if i == 0:
                    raise ValueError("decode_rle: run at position 0")
                while length > 0 and i < size:
                    out[i] = out[i - 1]
                    i += 1
                    length -= 1
                s_ctx = out[i - 1]
        return bytes(out)
