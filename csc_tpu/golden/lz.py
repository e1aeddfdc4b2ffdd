"""LZ engine: sliding ring window, rep-distance queue, lazy parser, and the
price-optimal (advanced) parser.  Mirrors csc_lz.{h,cpp}.
"""

from .mf import MatchFinder, MFCand

AP_LIMIT = 2048   # csc_lz.h:43


class APUnit:
    __slots__ = ("dist", "state", "back_pos", "next_pos", "price", "lit", "rep_dist")

    def __init__(self):
        self.dist = 0
        self.state = 0
        self.back_pos = 0
        self.next_pos = 0
        self.price = 0
        self.lit = 0
        self.rep_dist = [0, 0, 0, 0]


class LZ:
    def __init__(self, props, model):
        # LZ::Init, csc_lz.cpp:10-40
        self.model = model
        self.wnd_size = max(32 * 1024, min(props.dict_size, 1024 * 1024 * 1024))
        self.wnd = bytearray(self.wnd_size + 8)
        self.mf = MatchFinder(self.wnd, self.wnd_size, props.bt_size,
                              props.bt_hash_bits if props.bt_size else 0,
                              props.hash_width, props.hash_bits)
        self.good_len = props.good_len
        self.bt_cyc = props.bt_cyc
        self.ht_cyc = props.hash_width
        self.mf.set_arg(self.bt_cyc, self.ht_cyc, 1, self.good_len)
        self.appt = [MFCand() for _ in range(self.good_len + 2)]
        self.apunits = [APUnit() for _ in range(AP_LIMIT + 1)]
        self.rc = None  # RangeEncoder, set per-chunk by the encoder driver
        self.reset()

    def reset(self):
        # LZ::Reset, csc_lz.cpp:43-52
        self.wnd_curpos = 0
        self.rep_dist = [self.wnd_size] * 4
        for i in range(len(self.wnd)):
            self.wnd[i] = 0
        self.model.reset()

    # ------------------------------------------------------------------

    def encode_normal(self, src, off, size, lz_mode):
        # EncodeNormal, csc_lz.cpp:61-100
        i = 0
        while i < size:
            cur = min(self.wnd_size - self.wnd_curpos, size - i, 8 * 1024)
            self.wnd[self.wnd_curpos:self.wnd_curpos + cur] = src[off + i:off + i + cur]
            if lz_mode == 1:
                self._compress_normal(cur, False)
            elif lz_mode == 2:
                self._compress_normal(cur, True)
            elif lz_mode == 3:
                self._compress_advanced(cur)
            elif lz_mode == 5:
                # window/MF insert only, no output
                self.mf.set_arg(1, 1, 0, self.good_len)
                self.mf.slide_pos_fast(self.wnd_curpos, cur)
                self.wnd_curpos += cur
                self.mf.set_arg(self.bt_cyc, self.ht_cyc, 1, self.good_len)
            else:
                raise ValueError("bad lz_mode %d" % lz_mode)
            if self.wnd_curpos >= self.wnd_size:
                self.wnd_curpos = 0
            i += cur
        if lz_mode != 5:
            self.model.encode_match(self.rc, 64, 0)  # block-end sentinel

    def is_duplicate_block(self, buf, off, size):
        # IsDuplicateBlock, csc_lz.cpp:102-112 (returns True on first hit)
        for i in range(size):
            if self.mf.test_find(self.wnd_curpos, buf, off + i, size - i):
                return True
        return False

    def duplicate_insert(self, src, off, size):
        # DuplicateInsert, csc_lz.cpp:114-125
        i = 0
        while i < size:
            cur = min(self.wnd_size - self.wnd_curpos, size - i, 8 * 1024)
            self.wnd[self.wnd_curpos:self.wnd_curpos + cur] = src[off + i:off + i + cur]
            self.wnd_curpos += cur
            if self.wnd_curpos >= self.wnd_size:
                self.wnd_curpos = 0
            i += cur

    # ------------------------------------------------------------------

    def _encode_nonlit(self, u):
        # encode_nonlit, csc_lz.cpp:127-154
        m = self.model
        rd = self.rep_dist
        if u.dist <= 4:
            if u.len == 1 and u.dist == 1:
                m.encode_rep0len1(self.rc)
            else:
                m.encode_repdist_match(self.rc, u.dist - 1, u.len - 2)
                dist = rd[u.dist - 1]
                for j in range(u.dist - 1, 0, -1):
                    rd[j] = rd[j - 1]
                rd[0] = dist
        else:
            m.encode_match(self.rc, u.dist - 5, u.len - 2)
            rd[3] = rd[2]
            rd[2] = rd[1]
            rd[1] = rd[0]
            rd[0] = u.dist - 4

    def _compress_normal(self, size, lazy):
        # compress_normal, csc_lz.cpp:156-199
        m = self.model
        mf = self.mf
        wnd = self.wnd
        got_u1 = False
        u1 = None
        i = 0
        while i < size:
            if not got_u1:
                u1 = mf.find_match_best(self.rep_dist, self.wnd_curpos, size - i)
            if u1.len == 1 or not lazy or u1.len >= self.good_len:
                if u1.dist == 0:
                    m.encode_literal(self.rc, wnd[self.wnd_curpos])
                else:
                    self._encode_nonlit(u1)
                mf.slide_pos(self.wnd_curpos, u1.len, size - i)
                i += u1.len
                self.wnd_curpos += u1.len
                if u1.dist:
                    m.set_literal_ctx(wnd[self.wnd_curpos - 1])
                got_u1 = False
                continue
            u2 = mf.find_match_best(self.rep_dist, self.wnd_curpos + 1, size - i - 1)
            if mf.second_match_better(u1, u2):
                m.encode_literal(self.rc, wnd[self.wnd_curpos])
                mf.slide_pos(self.wnd_curpos, 1, size - i - 1)
                i += 1
                self.wnd_curpos += 1
                u1 = u2
                got_u1 = True
            else:
                self._encode_nonlit(u1)
                mf.slide_pos(self.wnd_curpos + 1, u1.len - 1, size - i - 1)
                i += u1.len
                self.wnd_curpos += u1.len
                m.set_literal_ctx(wnd[self.wnd_curpos - 1])
                got_u1 = False

    def _ap_backward(self, end):
        # ap_backward, csc_lz.cpp:335-362
        ap = self.apunits
        m = self.model
        i = end
        while i:
            ap[ap[i].back_pos].next_pos = i
            i = ap[i].back_pos
        i = 0
        while i != end:
            nxt = ap[i].next_pos
            if ap[nxt].dist == 0:
                m.encode_literal(self.rc, ap[i].lit)
            elif ap[nxt].dist <= 4:
                if nxt - i == 1 and ap[nxt].dist == 1:
                    m.encode_rep0len1(self.rc)
                else:
                    m.encode_repdist_match(self.rc, ap[nxt].dist - 1, nxt - i - 2)
                m.set_literal_ctx(ap[nxt - 1].lit)
            else:
                m.encode_match(self.rc, ap[nxt].dist - 5, nxt - i - 2)
                m.set_literal_ctx(ap[nxt - 1].lit)
            i = nxt
        self.rep_dist[0] = ap[end].rep_dist[0]
        self.rep_dist[1] = ap[end].rep_dist[1]
        self.rep_dist[2] = ap[end].rep_dist[2]
        self.rep_dist[3] = ap[end].rep_dist[3]

    def _compress_advanced(self, size):
        # compress_advanced, csc_lz.cpp:207-333 — forward shortest-path DP
        # over a window of <= AP_LIMIT positions.
        m = self.model
        mf = self.mf
        wnd = self.wnd
        ap = self.apunits
        appt = self.appt
        i = 0
        while i < size:
            mf.find_match_with_price(m, m.state, appt, self.rep_dist,
                                     self.wnd_curpos, size - i)
            if appt[0].dist == 0:
                m.encode_literal(self.rc, wnd[self.wnd_curpos])
                mf.slide_pos(self.wnd_curpos, 1, size - i)
                i += 1
                self.wnd_curpos += 1
                continue

            apend = 1
            ap[0].price = 0
            ap[0].back_pos = 0
            ap[0].rep_dist[:] = self.rep_dist
            ap[0].state = m.state
            aplimit = min(AP_LIMIT, size - i)
            apcur = 0
            while True:
                ap[apcur].lit = wnd[self.wnd_curpos]
                if apcur:
                    back = ap[apcur].back_pos
                    ap[apcur].rep_dist[:] = ap[back].rep_dist
                    if ap[apcur].dist == 0:
                        ap[apcur].state = (ap[back].state * 4) & 0x3F
                    elif ap[apcur].dist <= 4:
                        length = apcur - back
                        if length == 1 and ap[apcur].dist == 1:
                            ap[apcur].state = (ap[back].state * 4 + 2) & 0x3F
                        else:
                            ap[apcur].state = (ap[back].state * 4 + 3) & 0x3F
                            d = ap[apcur].dist
                            tmp = ap[apcur].rep_dist[d - 1]
                            for j in range(d - 1, 0, -1):
                                ap[apcur].rep_dist[j] = ap[apcur].rep_dist[j - 1]
                            ap[apcur].rep_dist[0] = tmp
                    else:
                        ap[apcur].state = (ap[back].state * 4 + 1) & 0x3F
                        ap[apcur].rep_dist[0] = ap[apcur].dist - 4
                        ap[apcur].rep_dist[1] = ap[back].rep_dist[0]
                        ap[apcur].rep_dist[2] = ap[back].rep_dist[1]
                        ap[apcur].rep_dist[3] = ap[back].rep_dist[2]
                    if apcur < aplimit:
                        mf.find_match_with_price(m, ap[apcur].state, appt,
                                                 ap[apcur].rep_dist,
                                                 self.wnd_curpos, size - i - apcur)

                if apcur == aplimit:
                    self._ap_backward(apcur)
                    i += apcur
                    break

                if appt[0].len == 1 and apcur + 1 == apend:
                    self._ap_backward(apcur)
                    m.encode_literal(self.rc, ap[apcur].lit)
                    i += apcur
                    mf.slide_pos(self.wnd_curpos, 1, size - i)
                    self.wnd_curpos += 1
                    i += 1
                    break

                if apcur + 1 >= apend:
                    ap[apend].price = 0xFFFFFFFF
                    apend += 1

                if (appt[0].len >= self.good_len
                        or (appt[0].len > 1 and appt[0].len + apcur >= aplimit)):
                    self._ap_backward(apcur)
                    i += apcur
                    u = MFCand(appt[0].len, appt[0].dist)
                    self._encode_nonlit(u)
                    mf.slide_pos(self.wnd_curpos, appt[0].len, size - i)
                    i += appt[0].len
                    self.wnd_curpos += appt[0].len
                    m.set_literal_ctx(wnd[self.wnd_curpos - 1])
                    break

                lit_ctx = wnd[self.wnd_curpos - 1] if self.wnd_curpos else 0
                cprice = m.get_literal_price(ap[apcur].state, lit_ctx,
                                             wnd[self.wnd_curpos])
                if cprice + ap[apcur].price < ap[apcur + 1].price:
                    ap[apcur + 1].dist = 0
                    ap[apcur + 1].back_pos = apcur
                    ap[apcur + 1].price = cprice + ap[apcur].price

                if appt[1].dist and appt[1].price + ap[apcur].price < ap[apcur + 1].price:
                    ap[apcur + 1].dist = 1
                    ap[apcur + 1].back_pos = apcur
                    ap[apcur + 1].price = appt[1].price + ap[apcur].price

                length = appt[0].len
                while apcur + length >= apend:
                    ap[apend].price = 0xFFFFFFFF
                    apend += 1
                while length > 1:
                    if (appt[length].dist
                            and appt[length].price + ap[apcur].price < ap[apcur + length].price):
                        ap[apcur + length].dist = appt[length].dist
                        ap[apcur + length].back_pos = apcur
                        ap[apcur + length].price = appt[length].price + ap[apcur].price
                    length -= 1
                apcur += 1
                mf.slide_pos(self.wnd_curpos, 1, size - i - apcur)
                self.wnd_curpos += 1
