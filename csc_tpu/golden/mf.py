"""Match finder: HT2/HT3 low hashes, HT6 multi-candidate hash, and the
LZMA-style binary-tree finder over a reduced window.  Mirrors csc_mf.cpp
exactly — insertion order, MTF updates, distance gates, good_len early
exits, and several load-bearing quirks (strict '>' in the HT2 wraparound,
`lasth6` starting at 0, the dist-monotonic candidate chain) are all
observable through the chosen tokens and must match for byte-identical
re-encoding.
"""
from array import array

from ..constants import MF_DIST_BOUND, MF_CAND_LIMIT, MIN_BLOCK_SIZE

HT2_BITS = 14
HT2_SIZE = 16 * 1024     # csc_mf.h:18
HT3_SIZE = 64 * 1024     # csc_mf.h:17
MASK32 = 0xFFFFFFFF


def hash2(b0, b1):
    # HASH2, csc_mf.cpp:23-28 (little-endian 16-bit load)
    return ((b0 | (b1 << 8)) * 65521) & 0x3FFF


def hash3(b0, b1, b2):
    # HASH3, csc_mf.cpp:30-33
    return ((b0 << 8) ^ (b1 << 5) ^ b2) & 0xFFFF


def hash6(wnd, p, bits):
    # HASH6, csc_mf.cpp:35-42 (little-endian 32+16 bit loads)
    v = wnd[p] | (wnd[p + 1] << 8) | (wnd[p + 2] << 16) | (wnd[p + 3] << 24)
    v2 = wnd[p + 4] | (wnd[p + 5] << 8)
    return (((v ^ (v2 << 13)) * 2654435761) & MASK32) >> (32 - bits)


class MFCand:
    __slots__ = ("len", "dist", "price")

    def __init__(self, length=0, dist=0):
        self.len = length
        self.dist = dist
        self.price = 0


class MatchFinder:
    def __init__(self, wnd, wnd_size, bt_size, bt_bits, ht_width, ht_bits):
        # MatchFinder::Init, csc_mf.cpp:45-106
        self.wnd = wnd
        self.wnd_size = wnd_size
        self.vld_rge = wnd_size - MIN_BLOCK_SIZE - 4
        self.pos = self.vld_rge
        self.bt_pos = 0
        if not bt_bits or not bt_size:
            bt_bits = bt_size = 0
        if not ht_bits or not ht_width:
            ht_bits = ht_width = 0
        self.ht_bits = ht_bits
        self.ht_width = ht_width
        self.bt_bits = bt_bits
        self.bt_size = bt_size
        self.ht2 = array('I', bytes(4 * HT2_SIZE))
        self.ht3 = array('I', bytes(4 * HT3_SIZE))
        self.ht6 = (array('I', bytes(4 * ht_width * (1 << ht_bits)))
                    if ht_width else None)
        self.bt_head = array('I', bytes(4 << bt_bits)) if bt_bits else None
        self.bt_nodes = array('I', bytes(8 * bt_size)) if bt_bits else None
        self.bt_cyc = 1
        self.ht_cyc = 1
        self.ht_low = 1
        self.good_len = 32
        self.mfcand = [MFCand() for _ in range(MF_CAND_LIMIT)]

    def set_arg(self, bt_cyc, ht_cyc, ht_low, good_len):
        self.bt_cyc = bt_cyc
        self.ht_cyc = ht_cyc
        self.ht_low = ht_low
        self.good_len = good_len

    def normalize(self):
        # csc_mf.cpp:108-114
        diff = self.pos - self.vld_rge + 1
        for tbl in (self.ht2, self.ht3, self.ht6, self.bt_head, self.bt_nodes):
            if tbl is None:
                continue
            for i in range(len(tbl)):
                v = tbl[i]
                tbl[i] = v - diff if v > diff else 0
        self.pos -= diff

    # ------------------------------------------------------------------

    def _extend(self, wpos, cmp_pos, climit):
        """Byte-compare extension from offset 0; returns match length.

        Chunked slice equality runs at C speed; overlap is fine because
        both sides only read the current window."""
        wnd = self.wnd
        n = 0
        step = 128
        while n < climit:
            m = min(step, climit - n)
            a = wnd[wpos + n:wpos + n + m]
            b = wnd[cmp_pos + n:cmp_pos + n + m]
            if a == b:
                n += m
                step = min(step * 2, 4096)
                continue
            for i in range(m):
                if a[i] != b[i]:
                    return n + i
            return n + m
        return n

    def slide_pos(self, wnd_pos, length, limit=0xFFFFFFFF):
        # SlidePos, csc_mf.cpp:134-206: insert positions wnd_pos+1 .. +len-1
        wnd = self.wnd
        lasth6 = 0
        i = 1
        while i < length:
            wpos = wnd_pos + i
            if self.pos >= 0xFFFFFFF0:
                self.normalize()
            self.ht2[hash2(wnd[wpos], wnd[wpos + 1])] = self.pos
            self.ht3[hash3(wnd[wpos], wnd[wpos + 1], wnd[wpos + 2])] = self.pos

            if i + 128 < length:
                i += 4
                self.pos += 4
                self.bt_pos += 4
                continue

            if self.ht_width:
                h6 = hash6(wnd, wpos, self.ht_bits)
                base = h6 * self.ht_width
                ht6 = self.ht6
                if h6 != lasth6:
                    cands = min(self.ht_width, self.ht_cyc)
                    for j in range(cands - 1, 0, -1):
                        ht6[base + j] = ht6[base + j - 1]
                ht6[base] = self.pos
                lasth6 = h6

            if self.bt_head is None:
                self.pos += 1
                i += 1
                continue

            hbt = hash6(wnd, wpos, self.bt_bits)
            if self.bt_pos >= self.bt_size:
                self.bt_pos -= self.bt_size
            dist = (self.pos - self.bt_head[hbt]) & MASK32
            nodes = self.bt_nodes
            l_idx = self.bt_pos * 2
            r_idx = self.bt_pos * 2 + 1
            lenl = lenr = 0
            cyc = 0
            while True:
                if cyc >= self.bt_cyc or dist >= self.bt_size or dist >= self.vld_rge:
                    nodes[l_idx] = nodes[r_idx] = 0
                    break
                cyc += 1
                cmp_pos = wpos - dist if wpos >= dist else wpos + self.wnd_size - dist
                clen = min(lenl, lenr)
                climit = min(limit - i, self.wnd_size - cmp_pos)
                if clen >= climit:
                    nodes[l_idx] = nodes[r_idx] = 0
                    break
                bt_npos = (self.bt_pos - dist if self.bt_pos >= dist
                           else self.bt_pos + self.bt_size - dist)
                tlast = bt_npos * 2
                if wnd[wpos + clen] == wnd[cmp_pos + clen]:
                    climit2 = min(self.good_len, climit)
                    clen += 1
                    while clen < climit2 and wnd[wpos + clen] == wnd[cmp_pos + clen]:
                        clen += 1
                    if clen >= self.good_len:
                        nodes[l_idx] = nodes[tlast]
                        nodes[r_idx] = nodes[tlast + 1]
                        break
                    elif clen >= climit2:
                        nodes[l_idx] = nodes[r_idx] = 0
                        break
                if wnd[cmp_pos + clen] < wnd[wpos + clen]:
                    nodes[l_idx] = (self.pos - dist) & MASK32
                    l_idx = tlast + 1
                    dist = (self.pos - nodes[l_idx]) & MASK32
                    lenl = clen
                else:
                    nodes[r_idx] = (self.pos - dist) & MASK32
                    r_idx = tlast
                    dist = (self.pos - nodes[r_idx]) & MASK32
                    lenr = clen
            self.bt_head[hbt] = self.pos
            self.bt_pos += 1
            self.pos += 1
            i += 1

    def slide_pos_fast(self, wnd_pos, length):
        # SlidePosFast, csc_mf.cpp:208-241: sparse 1/16 insertion for BAD data
        wnd = self.wnd
        i = 0
        while i < length:
            wpos = wnd_pos + i
            if self.pos >= 0xFFFFFFF0:
                self.normalize()
            h = hash2(wnd[wpos], wnd[wpos + 1])
            if h % 16:
                i += 1
                self.pos += 1
                # ++bt_pos_ then wrap; with bt_size_==0 the wrap subtracts 0
                self.bt_pos += 1
                if self.bt_size and self.bt_pos >= self.bt_size:
                    self.bt_pos -= self.bt_size
                continue
            if self.ht_width:
                h6 = hash6(wnd, wpos, self.ht_bits)
                base = h6 * self.ht_width
                ht6 = self.ht6
                for j in range(self.ht_width - 1, 0, -1):
                    ht6[base + j] = ht6[base + j - 1]
                ht6[base] = self.pos
            if self.bt_head is not None:
                h = hash6(wnd, wpos, self.bt_bits)
                self.bt_nodes[self.bt_pos * 2] = 0
                self.bt_nodes[self.bt_pos * 2 + 1] = 0
                self.bt_head[h] = self.pos
                self.bt_pos += 1
                if self.bt_pos >= self.bt_size:
                    self.bt_pos -= self.bt_size
            i += 1
            self.pos += 1

    # ------------------------------------------------------------------

    def find_match(self, out, rep_dist, wpos, limit):
        """find_match, csc_mf.cpp:243-495.  Fills out[0..cnt-1], returns cnt."""
        wnd = self.wnd
        wnd_size = self.wnd_size
        vld_rge = self.vld_rge
        good_len = self.good_len
        bound = MF_DIST_BOUND
        h2 = hash2(wnd[wpos], wnd[wpos + 1])
        h3 = hash3(wnd[wpos], wnd[wpos + 1], wnd[wpos + 2])
        h6 = hash6(wnd, wpos, self.ht_bits) if self.ht_width else 0
        hbt = hash6(wnd, wpos, self.bt_bits) if self.bt_head is not None else 0

        minlen = 1
        cnt = 0
        dist = 0

        # rep-distance probe first (csc_mf.cpp:266-299)
        for i in range(4):
            rd = rep_dist[i]
            if rd >= vld_rge:
                continue
            cmp_pos = wpos - rd if wpos >= rd else wpos + wnd_size - rd
            climit = min(limit, wnd_size - cmp_pos)
            if minlen >= climit or wnd[cmp_pos + minlen] != wnd[wpos + minlen]:
                continue
            match_len = self._extend(wpos, cmp_pos, climit)
            if match_len and i == 0:
                out[cnt].len = 1
                out[cnt].dist = 1
                if cnt + 2 < MF_CAND_LIMIT:
                    cnt += 1
            if match_len > minlen:
                minlen = match_len
                out[cnt].len = match_len
                out[cnt].dist = 1 + i
                if cnt + 2 < MF_CAND_LIMIT:
                    cnt += 1
                if match_len >= good_len:
                    dist = MASK32
                    break

        if self.ht_low:
            # HT2 single probe (csc_mf.cpp:303-332).  NOTE strict '>' in the
            # wraparound below — a reference quirk kept verbatim.
            if ((self.pos - self.ht2[h2]) & MASK32) > dist:
                while True:
                    dist = (self.pos - self.ht2[h2]) & MASK32
                    if dist >= vld_rge:
                        break
                    cmp_pos = wpos - dist if wpos > dist else wpos + wnd_size - dist
                    climit = min(limit, wnd_size - cmp_pos)
                    if minlen >= climit or wnd[cmp_pos + minlen] != wnd[wpos + minlen]:
                        break
                    match_len = self._extend(wpos, cmp_pos, climit)
                    if match_len > minlen:
                        minlen = match_len
                        if match_len <= 6 and dist >= bound[match_len]:
                            break
                        out[cnt].len = match_len
                        out[cnt].dist = 4 + dist
                        if cnt + 2 < MF_CAND_LIMIT:
                            cnt += 1
                        if match_len >= good_len:
                            dist = MASK32
                            break
                    break

            # HT3 single probe (csc_mf.cpp:334-364)
            if ((self.pos - self.ht3[h3]) & MASK32) > dist:
                while True:
                    dist = (self.pos - self.ht3[h3]) & MASK32
                    if dist >= vld_rge:
                        break
                    cmp_pos = wpos - dist if wpos >= dist else wpos + wnd_size - dist
                    climit = min(limit, wnd_size - cmp_pos)
                    if minlen >= climit or wnd[cmp_pos + minlen] != wnd[wpos + minlen]:
                        break
                    match_len = self._extend(wpos, cmp_pos, climit)
                    if match_len > minlen:
                        minlen = match_len
                        if match_len <= 6 and dist >= bound[match_len]:
                            break
                        out[cnt].len = match_len
                        out[cnt].dist = 4 + dist
                        if cnt + 2 < MF_CAND_LIMIT:
                            cnt += 1
                        if match_len >= good_len:
                            dist = MASK32
                            break
                    break
            self.ht2[h2] = self.pos
            self.ht3[h3] = self.pos

        # binary-tree finder (csc_mf.cpp:369-451)
        if self.bt_head is not None:
            dist = (self.pos - self.bt_head[hbt]) & MASK32
            nodes = self.bt_nodes
            l_idx = self.bt_pos * 2
            r_idx = self.bt_pos * 2 + 1

            # head candidate beyond bt range has no distance limit
            while dist >= self.bt_size and dist < vld_rge:
                cmp_pos = wpos - dist if wpos >= dist else wpos + wnd_size - dist
                climit = min(limit, wnd_size - cmp_pos)
                if minlen >= climit or wnd[cmp_pos + minlen] != wnd[wpos + minlen]:
                    break
                match_len = self._extend(wpos, cmp_pos, climit)
                if match_len > minlen:
                    minlen = match_len
                    if match_len <= 6 and dist >= bound[match_len]:
                        break
                    out[cnt].len = match_len
                    out[cnt].dist = 4 + dist
                    if cnt + 2 < MF_CAND_LIMIT:
                        cnt += 1
                    if match_len >= good_len:
                        dist = MASK32
                        break
                break

            lenl = lenr = 0
            cyc = 0
            while True:
                if cyc >= self.bt_cyc or dist >= self.bt_size or dist >= vld_rge:
                    nodes[l_idx] = nodes[r_idx] = 0
                    break
                cyc += 1
                cmp_pos = wpos - dist if wpos >= dist else wpos + wnd_size - dist
                clen = min(lenl, lenr)
                climit = min(limit, wnd_size - cmp_pos)
                if clen >= climit:
                    nodes[l_idx] = nodes[r_idx] = 0
                    break
                bt_npos = (self.bt_pos - dist if self.bt_pos >= dist
                           else self.bt_pos + self.bt_size - dist)
                tlast = bt_npos * 2
                if wnd[wpos + clen] == wnd[cmp_pos + clen]:
                    climit2 = climit
                    clen += 1
                    while clen < climit2 and wnd[wpos + clen] == wnd[cmp_pos + clen]:
                        clen += 1
                    if clen > minlen:
                        minlen = clen
                        if clen > 6 or dist < bound[clen]:
                            out[cnt].len = clen
                            out[cnt].dist = 4 + dist
                            if cnt + 2 < MF_CAND_LIMIT:
                                cnt += 1
                    if clen >= good_len:
                        nodes[l_idx] = nodes[tlast]
                        nodes[r_idx] = nodes[tlast + 1]
                        dist = MASK32
                        break
                    elif clen >= climit2:
                        nodes[l_idx] = nodes[r_idx] = 0
                        break
                if wnd[cmp_pos + clen] < wnd[wpos + clen]:
                    nodes[l_idx] = (self.pos - dist) & MASK32
                    l_idx = tlast + 1
                    dist = (self.pos - nodes[l_idx]) & MASK32
                    lenl = clen
                else:
                    nodes[r_idx] = (self.pos - dist) & MASK32
                    r_idx = tlast
                    dist = (self.pos - nodes[r_idx]) & MASK32
                    lenr = clen
            self.bt_head[hbt] = self.pos
            self.bt_pos += 1
            if self.bt_pos >= self.bt_size:
                self.bt_pos -= self.bt_size

        # HT6 multi-candidate probe (csc_mf.cpp:453-491)
        if self.ht_width:
            ht6 = self.ht6
            base = h6 * self.ht_width
            cands = min(self.ht_width, self.ht_cyc)
            for i in range(cands):
                cand_dist = (self.pos - ht6[base + i]) & MASK32
                if cand_dist <= dist:
                    continue
                dist = cand_dist
                if dist >= vld_rge:
                    continue
                cmp_pos = wpos - dist if wpos >= dist else wpos + wnd_size - dist
                climit = min(limit, wnd_size - cmp_pos)
                if minlen >= climit or wnd[cmp_pos + minlen] != wnd[wpos + minlen]:
                    continue
                match_len = self._extend(wpos, cmp_pos, climit)
                if match_len > minlen:
                    minlen = match_len
                    if match_len <= 6 and dist >= bound[match_len]:
                        continue
                    out[cnt].len = match_len
                    out[cnt].dist = 4 + dist
                    if cnt + 2 < MF_CAND_LIMIT:
                        cnt += 1
                    if match_len >= good_len:
                        dist = MASK32
                        break
            for i in range(cands - 1, 0, -1):
                ht6[base + i] = ht6[base + i - 1]
            ht6[base] = self.pos

        self.pos += 1
        if self.pos >= 0xFFFFFFF0:
            self.normalize()
        return cnt

    # ------------------------------------------------------------------

    @staticmethod
    def _second_better(u1, u2):
        # SecondMatchBetter, csc_mf.cpp:570-582
        cof = (0, 4, 8, 12)
        if u2.len <= 1:
            return False
        if u2.len > u1.len + 3:
            return True
        if u2.len > u1.len and u2.dist <= 4:
            return True
        if u2.len + 2 > u1.len and u2.dist <= 4 and u1.dist > 4:
            return True
        if u2.len >= u1.len and (u2.dist >> cof[u2.len - u1.len]) <= u1.dist:
            return True
        if (u2.len < u1.len and u2.len + 2 >= u1.len and u1.dist > 4
                and (u1.dist >> cof[u1.len - u2.len]) > u2.dist):
            return True
        return False

    def find_match_best(self, rep_dist, wnd_pos, limit):
        # FindMatch, csc_mf.cpp:497-524
        mf = self.mfcand
        mf[0].len = 1
        mf[0].dist = 0
        n = self.find_match(mf[1:], rep_dist, wnd_pos, limit)
        bestidx = 0
        for i in range(1, n + 1):
            if not bestidx:
                bestidx = i
                continue
            if self._second_better(mf[bestidx], mf[i]):
                bestidx = i
        u = mf[bestidx]
        return MFCand(u.len, u.dist)

    def second_match_better(self, u1, u2):
        return self._second_better(u1, u2)

    def test_find(self, wpos, buf, off, limit):
        # TestFind, csc_mf.cpp:526-568 — sampled dedup probe.
        # Quirks kept verbatim: ht6_[h*ht_width_] is read for every i
        # (missing +i — all candidates identical); the first
        # climit=MIN(limit,24) is immediately overwritten.  The reference
        # also reads up to 6 bytes past the 8KB block (into the surrounding
        # read buffer); we read the caller's full buffer and clamp at its
        # end with 0.
        def b(k):
            return buf[k] if k < len(buf) else 0

        h = hash2(b(off), b(off + 1))
        if h % 16:
            return False
        dists = []
        if self.ht_width:
            v = b(off) | (b(off + 1) << 8) | (b(off + 2) << 16) | (b(off + 3) << 24)
            v2 = b(off + 4) | (b(off + 5) << 8)
            h = (((v ^ (v2 << 13)) * 2654435761) & MASK32) >> (32 - self.ht_bits)
            for _ in range(min(self.ht_width, 8)):
                dists.append((self.pos - self.ht6[h * self.ht_width]) & MASK32)
        if self.bt_head is not None:
            v = b(off) | (b(off + 1) << 8) | (b(off + 2) << 16) | (b(off + 3) << 24)
            v2 = b(off + 4) | (b(off + 5) << 8)
            h = (((v ^ (v2 << 13)) * 2654435761) & MASK32) >> (32 - self.bt_bits)
            dists.append((self.pos - self.bt_head[h]) & MASK32)
        wnd = self.wnd
        for dist in dists:
            if dist >= self.vld_rge:
                continue
            cmp_pos = wpos - dist if wpos >= dist else wpos + self.wnd_size - dist
            climit = min(limit, self.wnd_size - cmp_pos)
            n = 0
            while n < climit and b(off + n) == wnd[cmp_pos + n]:
                n += 1
            if n > 18:
                return True
        return False

    @staticmethod
    def _hash6_bytes(buf, off, bits):
        v = (buf[off] | (buf[off + 1] << 8) | (buf[off + 2] << 16)
             | (buf[off + 3] << 24))
        v2 = buf[off + 4] | (buf[off + 5] << 8)
        return (((v ^ (v2 << 13)) * 2654435761) & MASK32) >> (32 - bits)

    def find_match_with_price(self, model, state, ret, rep_dist, wnd_pos, limit):
        # FindMatchWithPrice, csc_mf.cpp:584-625
        bound = MF_DIST_BOUND
        mf = self.mfcand
        mf[0].len = 1
        mf[0].dist = 0
        n = self.find_match(mf[1:], rep_dist, wnd_pos, limit)
        ret[0].len = mf[n].len
        ret[0].dist = mf[n].dist
        if ret[0].len >= self.good_len:
            return
        ret[1].dist = 0
        lpos = 1
        for i in range(1, n + 1):
            cand = mf[i]
            if cand.len == 1 and cand.dist == 1:
                ret[1].price = model.get_rep0len1_price(state)
                ret[1].dist = 1
                continue
            elif cand.dist <= 4:
                distprice = model.get_repdist_price(state, cand.dist - 1)
                rdist = 0
            else:
                distprice = model.get_matchdist_price(state, cand.dist - 5)
                rdist = cand.dist - 4
            while lpos < cand.len:
                lpos += 1
                if lpos <= 6 and rdist >= bound[lpos]:
                    ret[lpos].dist = 0
                    continue
                ret[lpos].dist = cand.dist
                ret[lpos].price = distprice + model.get_matchlen_price(state, lpos - 2)
