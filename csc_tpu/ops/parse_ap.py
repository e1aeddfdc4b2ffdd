"""TPU-native optimal (advanced/price-directed) parse for m3/m4.

Batched re-formulation of the reference DP parser (compress_advanced,
csc_lz.cpp:207-333 + ap_backward :335-362): B independent streams walk
their positions in lockstep; per position the parser reconstructs the
DP node's (state, rep_dist) from its back pointer, folds the
precomputed candidate chains + live rep probes exactly like the fast
parse (find_match record semantics, csc_mf.cpp:243-495), prices every
reachable length (FindMatchWithPrice, csc_mf.cpp:584-625), and relaxes
the shortest-path cells.  Stretch ends (good_len match / lone literal /
AP_LIMIT cap) switch the stream to a backward marking phase and a
forward token-emission walk, then the next stretch begins.

Pricing uses SNAPSHOT tables (GetLiteralPrice/GetRep0Len1Price/
GetRepDistPrice/GetMatchDistPrice/len_price_rebuild,
csc_model.cpp:185-299).  The reference prices from the live adaptive
model; this module takes the price tables as inputs so the caller
chooses the snapshot cadence.  v1 uses the initial-model tables (every
probability 2048) — a documented approximation in the same family as
the fast parse's candidate chains: output is a valid CSC stream, the
bars are ratio-equivalence, round-trip, and reference cross-decode
(CSC_ENCODE_PARSE=exact keeps the bit-exact golden path).

DP state lives in absolute-position arrays [B, N] with stretch-id
stamping instead of per-stretch re-initialisation (a cell is valid only
if its stamp matches the stream's current stretch id).
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp

from ..constants import MF_DIST_BOUND, DIST_TABLE
from .encode_scan import (K_LIT, K_MATCH, K_REP, K_REP0L1, K_END,
                          K_SENT_A)
from .parse_pre import EXT_CAP

AP_LIMIT = 2048            # csc_lz.h:43
INF = 0x3FFFFFFF

# fsm
AP_BLOCK = 0
AP_FIND = 1                # node + candidates + extensions + process
AP_MARK = 2                # backward next_pos marking
AP_WALK = 3                # forward token emission
AP_DONE = 4

# post-stretch actions applied when the WALK reaches the end node
POST_NONE = 0              # aplimit cap: next stretch starts at end
POST_LIT = 1               # lone literal after the path
POST_MATCH = 2             # good_len / cap-straddling match token

_BOUND = np.zeros(8, np.int32)
for _i, _b in enumerate(MF_DIST_BOUND):
    _BOUND[_i] = _b
_BOUND[7] = 0x7FFFFFFF
_DIST_TABLE_NP = np.array(DIST_TABLE, np.int32)


def snapshot_prices(batch, model=None):
    """Price tables from a golden model snapshot (default: fresh model,
    all probabilities 2048 — csc_model.cpp:100-131 Init).

    Returns dict of numpy arrays:
      lit_tree [256]  8-bit literal tree price at uniform probs is byte-
                      independent; kept per-byte for future snapshots
      flag0    [64]   FEncodeBit(0, p_state[s*3]) — literal flag
      r01      [64]   GetRep0Len1Price
      repd     [64,4] GetRepDistPrice
      matchf   [64]   match flag pair (csc_model.cpp:368-373)
      lenp     [32]   len_price table after rebuild
    """
    from ..golden.model import Model

    class _P:                       # minimal props for Model()
        csc_blocksize = 65536

    m = model if model is not None else Model()
    fp = m._fprice
    lit = np.zeros(256, np.int32)
    for c in range(256):
        # ctx 0 tree walk; at a uniform snapshot every ctx is identical
        ret, cc = 0, c | 0x100
        while cc < 0x10000:
            ret += fp((cc >> 7) & 1, m.p_lit[(cc >> 8)])
            cc <<= 1
        lit[c] = ret
    flag0 = np.array([fp(0, m.p_state[s * 3]) for s in range(64)],
                     np.int32)
    r01 = np.array([m.get_rep0len1_price(s) for s in range(64)],
                   np.int32)
    repd = np.array([[m.get_repdist_price(s, k) for k in range(4)]
                     for s in range(64)], np.int32)
    matchf = np.array([fp(1, m.p_state[s * 3]) +
                       fp(1, m.p_state[s * 3 + 1])
                       for s in range(64)], np.int32)
    m._len_price_rebuild()
    lenp = np.array(m.len_price, np.int32)
    return dict(lit_tree=lit, flag0=flag0, r01=r01, repd=repd,
                matchf=matchf, lenp=lenp)


def make_ap_state(batch, data, sizes, dict_sizes, cand, run_ends,
                  max_tokens, hash_width, good_len, run_types=None,
                  prices=None):
    """Mirror of encode_scan_fast.make_fast_state plus the DP arrays."""
    B, N = data.shape
    st = {}
    st["data"] = jnp.asarray(data)
    st["in4"] = _mk_in4(st["data"])
    st["cand"] = cand if isinstance(cand, jax.Array) else jnp.asarray(cand)

    z = jnp.zeros(batch, jnp.int32)
    st["size"] = jnp.asarray(np.asarray(sizes, np.int32))
    vld = np.asarray(dict_sizes, np.int32) - 8 * 1024 - 4
    st["vld_rge"] = jnp.asarray(vld)
    st["wpos"] = z
    st["reps"] = jnp.asarray(
        np.tile(np.asarray(dict_sizes, np.int32)[:, None], (1, 4)))
    st["mstate"] = z

    if run_ends is None:
        run_ends = np.asarray(sizes, np.int32)[:, None]
    st["run_ends"] = jnp.asarray(np.asarray(run_ends, np.int32))
    st["run_idx"] = z
    st["run_end"] = jnp.asarray(np.asarray(run_ends, np.int32)[:, 0])
    if run_types is None:
        run_types = np.zeros(np.asarray(run_ends).shape, np.int32)
    st["run_skip"] = jnp.asarray(
        (np.asarray(run_types, np.int32) >= 5).astype(np.int32))

    st["fsm"] = z + AP_BLOCK
    st["blk_off"] = z
    st["blk_len"] = z
    st["blk_i"] = z
    st["armed"] = z

    # DP stretch registers
    st["sid"] = z                  # current stretch id (stamp)
    st["s0"] = z                   # stretch start (absolute)
    st["apend"] = z                # stretch-relative cell horizon
    st["end"] = z                  # absolute end node of current emit
    st["walk"] = z                 # MARK/WALK cursor (absolute)
    st["post"] = z                 # POST_* action
    st["post_len"] = z
    st["post_dist"] = z

    # DP node arrays (absolute positions, stamp-validated)
    st["price"] = jnp.zeros((batch, N), jnp.int32)
    st["stamp"] = jnp.full((batch, N), -1, jnp.int32)
    st["back"] = jnp.zeros((batch, N), jnp.int32)
    st["ndist"] = jnp.zeros((batch, N), jnp.int32)
    st["nstate"] = jnp.zeros((batch, N), jnp.int32)
    st["nrep"] = jnp.zeros((batch, 4, N), jnp.int32)
    st["nxt"] = jnp.zeros((batch, N), jnp.int32)

    # candidate staging / extension lanes (same as fast parse)
    ncand = 2 + hash_width
    st["cand_d"] = jnp.zeros((batch, ncand), jnp.int32)
    st["cand_l"] = jnp.zeros((batch, ncand), jnp.int32)
    NL = 4 + ncand
    st["ext_q"] = jnp.full((batch, NL), -1, jnp.int32)
    st["ext_l"] = jnp.zeros((batch, NL), jnp.int32)
    st["ext_lim"] = jnp.zeros((batch, NL), jnp.int32)

    st["tok_kind"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_a"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_b"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_c"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_cnt"] = z
    st["done"] = z

    if prices is None:
        prices = snapshot_prices(batch)
    for k, v in prices.items():
        st["pr_" + k] = jnp.asarray(v)
    return st, dict(hash_width=int(hash_width), good_len=int(good_len))


def _gather(tbl, idx):
    if tbl.ndim == 1:                  # shared price tables [K]
        return tbl[idx]
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


def _colm(m):
    return m[:, None]


@jax.jit
def _mk_in4(data):
    d = data.astype(jnp.uint32)
    dd = jnp.concatenate([d, jnp.zeros((data.shape[0], 8), jnp.uint32)],
                         axis=1)
    N = data.shape[1]
    return (dd[:, :N] | (dd[:, 1:N + 1] << 8) | (dd[:, 2:N + 2] << 16)
            | (dd[:, 3:N + 3] << 24))


def _dist_slot_vec(dist):
    """_dist_slot (csc_model.cpp:331-340) vectorised: #entries <= dist."""
    s = jnp.zeros_like(dist)
    for i in range(1, 33):
        s = s + (dist >= int(_DIST_TABLE_NP[i])).astype(jnp.int32)
    return s


def ap_parse_step(st, cfg):
    B, N = st["data"].shape
    w = cfg["hash_width"]
    good_len = cfg["good_len"]
    GL = good_len                    # appt length grid: 2..GL-1 relax
    fsm = st["fsm"]
    active = st["done"] == 0
    new = dict(st)

    def upd(name, cond, val):
        new[name] = jnp.where(cond, val, new[name])

    wpos = st["wpos"]
    size = st["size"]
    tape_cols = jnp.arange(st["tok_kind"].shape[1])[None, :]
    brow = jnp.arange(B)

    def cell_get(name, idx):
        return _gather(st[name], jnp.clip(idx, 0, N - 1))

    def cell_set(name, mask, idx, val):
        i = jnp.clip(idx, 0, N - 1)
        cur = _gather(new[name], i)
        new[name] = new[name].at[brow, i].set(jnp.where(mask, val, cur))

    # ---------------- AP_BLOCK (identical to fast parse FB_BLOCK) ------
    c = active & (fsm == AP_BLOCK)
    need_new = c & (st["blk_i"] >= st["blk_len"])
    nboff = st["blk_off"] + st["blk_len"]
    run_done = need_new & (nboff >= st["run_end"]) & (st["blk_len"] > 0)
    upd("tok_kind", run_done[:, None]
        & (tape_cols == st["tok_cnt"][:, None]), K_SENT_A)
    upd("tok_cnt", run_done, st["tok_cnt"] + 1)
    nridx = st["run_idx"] + 1
    upd("run_idx", run_done, nridx)
    upd("run_end", run_done,
        _gather(st["run_ends"], jnp.clip(nridx, 0,
                                         st["run_ends"].shape[1] - 1)))
    upd("blk_off", run_done, nboff)
    upd("blk_len", run_done, 0)
    upd("blk_i", run_done, 0)

    fresh = need_new & ~run_done
    stream_end = fresh & (nboff >= size)
    upd("tok_kind", stream_end[:, None]
        & (tape_cols == st["tok_cnt"][:, None]), K_END)
    upd("tok_cnt", stream_end, st["tok_cnt"] + 1)
    upd("done", stream_end, 1)
    upd("fsm", stream_end, AP_DONE)
    start_blk = fresh & ~stream_end
    cur_skip = _gather(st["run_skip"],
                       jnp.clip(new["run_idx"], 0,
                                st["run_skip"].shape[1] - 1)) == 1
    skip = start_blk & cur_skip
    upd("blk_off", start_blk, nboff)
    upd("blk_len", start_blk,
        jnp.minimum(st["run_end"] - nboff, 8 * 1024))
    upd("blk_i", start_blk, 0)
    run_len = new["run_end"] - nboff
    upd("blk_len", skip, run_len)
    upd("blk_i", skip, run_len)
    upd("wpos", skip, wpos + run_len)
    go = (c & ~need_new) | (start_blk & ~skip)
    # sub-block start = new stretch rooted at wpos with the live regs
    upd("fsm", go, AP_FIND)
    upd("armed", go, 0)
    _stretch_reset(new, st, go, new["wpos"], st["mstate"], st["reps"],
                   brow, N)

    # ---------------- AP_FIND: node + find + process -------------------
    c = active & (fsm == AP_FIND)
    s0 = st["s0"]
    apcur = wpos - s0
    # limit relative to the 8KB sub-block (csc_lz.cpp:237 size-i-apcur)
    limit = st["blk_len"] - st["blk_i"] - apcur
    aplimit = jnp.minimum(AP_LIMIT, st["blk_len"] - st["blk_i"])

    # ---- node reconstruction (csc_lz.cpp:211-233) on first touch
    fresh = c & (st["armed"] == 0)
    back_b = cell_get("back", wpos)
    nd = cell_get("ndist", wpos)
    bstate = cell_get("nstate", back_b)
    brep = [jnp.take_along_axis(
        st["nrep"][:, k, :], jnp.clip(back_b, 0, N - 1)[:, None],
        axis=1)[:, 0] for k in range(4)]
    ln_tok = wpos - back_b
    is_lit_n = nd == 0
    is_r01_n = (nd == 1) & (ln_tok == 1)
    is_rep_n = (nd >= 1) & (nd <= 4) & ~is_r01_n
    nstate_v = jnp.where(
        is_lit_n, (bstate * 4) & 0x3F,
        jnp.where(is_r01_n, (bstate * 4 + 2) & 0x3F,
                  jnp.where(is_rep_n, (bstate * 4 + 3) & 0x3F,
                            (bstate * 4 + 1) & 0x3F)))
    # rep queue: rotate-to-front for rep matches, push for new dists
    di = jnp.clip(nd - 1, 0, 3)
    dsel = jnp.stack(brep, axis=1)
    rfront = jnp.take_along_axis(dsel, di[:, None], axis=1)[:, 0]
    nrep_v = []
    for k in range(4):
        rot = jnp.where(k == 0, rfront,
                        jnp.where(k <= di, brep[k - 1] if k > 0 else rfront,
                                  brep[k]))
        psh = rfront if k == 0 else brep[k - 1]
        psh = jnp.where(k == 0, nd - 4, psh)
        v = jnp.where(is_rep_n, rot,
                      jnp.where(nd > 4, psh, brep[k]))
        nrep_v.append(v)
    node_first = fresh & (apcur == 0)
    # apcur==0 keeps the stretch-entry node written by _stretch_reset
    nstate_n = jnp.where(node_first, cell_get("nstate", wpos), nstate_v)
    nrep_n = [jnp.where(node_first,
                        jnp.take_along_axis(
                            st["nrep"][:, k, :],
                            jnp.clip(wpos, 0, N - 1)[:, None],
                            axis=1)[:, 0], nrep_v[k])
              for k in range(4)]
    wr = fresh & (apcur > 0)
    cell_set("nstate", wr, wpos, nstate_v)
    for k in range(4):
        i = jnp.clip(wpos, 0, N - 1)
        cur = jnp.take_along_axis(new["nrep"][:, k, :], i[:, None],
                                  axis=1)[:, 0]
        new["nrep"] = new["nrep"].at[:, k, :].set(
            new["nrep"][:, k, :].at[brow, i].set(
                jnp.where(wr, nrep_v[k], cur)))

    at_cap = fresh & (apcur >= aplimit)
    # cap reached: emit the path to apcur, no find (csc_lz.cpp:239-242)
    _to_mark(new, st, upd, at_cap, s0, wpos, POST_NONE, 0, 0)

    # ---- arm candidates + rep lanes with the NODE's rep queue ---------
    arm = fresh & ~at_cap
    ppos = wpos
    lanes_q = []
    for k in range(4):
        dk = nrep_n[k]
        qk = ppos - dk
        lanes_q.append(jnp.where(arm & (dk > 0) & (qk >= 0), qk, -1))
    lanes_lim = [limit] * 4
    lanes_l0 = [jnp.zeros_like(ppos)] * 4
    ncand = 2 + w
    cds, cls = [], []
    for ci in range(ncand):
        d = st["cand"][:, 2 * ci, :]
        ln = st["cand"][:, 2 * ci + 1, :]
        dv = _gather(d, jnp.clip(ppos, 0, d.shape[1] - 1))
        lv = _gather(ln, jnp.clip(ppos, 0, ln.shape[1] - 1))
        cds.append(dv)
        cls.append(lv)
        need = (lv >= EXT_CAP) & (limit > EXT_CAP) & (dv > 0)
        lanes_q.append(jnp.where(arm & need, ppos - dv, -1))
        lanes_lim.append(limit)
        lanes_l0.append(jnp.where(need, jnp.full_like(lv, EXT_CAP), 0))
    q = jnp.where(_colm(arm), jnp.stack(lanes_q, axis=1), st["ext_q"])
    lim = jnp.where(_colm(arm), jnp.stack(lanes_lim, axis=1),
                    st["ext_lim"])
    l = jnp.where(_colm(arm), jnp.stack(lanes_l0, axis=1), st["ext_l"])
    cand_d = jnp.where(_colm(arm), jnp.stack(cds, axis=1), st["cand_d"])
    cand_l = jnp.where(_colm(arm), jnp.stack(cls, axis=1), st["cand_l"])
    new["cand_d"] = cand_d
    new["cand_l"] = cand_l
    upd("armed", arm, 1)
    arming = arm | (c & (st["armed"] == 1) & ~at_cap)

    in4 = st["in4"]
    Nw = in4.shape[1]
    alive_l = (q >= 0) & (l < lim) & arming[:, None]

    def _ext_body(carry):
        l, alive_l, it = carry
        pi = jnp.clip(ppos[:, None] + l, 0, Nw - 1)
        qi = jnp.clip(q + l, 0, Nw - 1)
        w1 = jnp.take_along_axis(in4, pi, axis=1)
        w2 = jnp.take_along_axis(in4, qi, axis=1)
        x = w1 ^ w2
        eq = jnp.where(x == 0, 4,
                       jnp.where((x & 0xFF) != 0, 0,
                                 jnp.where((x & 0xFFFF) != 0, 1,
                                           jnp.where((x & 0xFFFFFF) != 0,
                                                     2, 3))))
        adv = jnp.minimum(eq, jnp.maximum(lim - l, 0))
        l = jnp.where(alive_l, l + adv, l)
        alive_l = alive_l & (eq == 4) & (adv == 4) & (l < lim)
        return l, alive_l, it + 1

    l, alive_l, _ = jax.lax.while_loop(
        lambda cr: jnp.any(cr[1]) & (cr[2] < 8), _ext_body,
        (l, alive_l, jnp.int32(0)))
    new["ext_q"] = jnp.where(_colm(arming), q, st["ext_q"])
    new["ext_lim"] = jnp.where(_colm(arming), lim, st["ext_lim"])
    new["ext_l"] = jnp.where(_colm(arming), l, st["ext_l"])
    settled = arming & ~jnp.any(alive_l, axis=1)

    # ---- process: fold + price + stretch-end checks + relax -----------
    proc = settled
    ext_l = new["ext_l"]
    nstate_p = nstate_n

    # fold in find_match order, recording per-lane (rec, len, dist,
    # price_base, rdist) for the per-length sweep
    minlen = jnp.ones_like(wpos)
    dist_var = jnp.zeros_like(wpos)
    gl = jnp.zeros_like(wpos, dtype=bool)
    last_l = jnp.ones_like(wpos)
    last_d = jnp.zeros_like(wpos)

    lane_rec, lane_len, lane_dist, lane_base, lane_rdist = \
        [], [], [], [], []

    r01 = ext_l[:, 0] >= 2
    r01p = _gather(st["pr_r01"], nstate_p)
    last_l = jnp.where(r01, 1, last_l)
    last_d = jnp.where(r01, 1, last_d)

    repd = st["pr_repd"]            # [64, 4]
    for k in range(4):
        ln = jnp.minimum(ext_l[:, k], limit)
        bet = ~gl & (ln > minlen)
        minlen = jnp.where(bet, ln, minlen)
        last_l = jnp.where(bet, ln, last_l)
        last_d = jnp.where(bet, k + 1, last_d)
        gl = gl | (bet & (ln >= good_len))
        lane_rec.append(bet)
        lane_len.append(ln)
        lane_dist.append(jnp.full_like(ln, k + 1))
        lane_base.append(repd[nstate_p, k])
        lane_rdist.append(jnp.zeros_like(ln))

    bound_tbl = jnp.asarray(_BOUND)
    matchf = _gather(st["pr_matchf"], nstate_p)
    for ci in range(ncand):
        dv = cand_d[:, ci]
        lv = cand_l[:, ci]
        lv = jnp.where(new["ext_q"][:, 4 + ci] >= 0, ext_l[:, 4 + ci], lv)
        lv = jnp.minimum(lv, limit)
        du = dv.astype(jnp.uint32)
        gate = (dv > 0) & (du > dist_var.astype(jnp.uint32)) & ~gl
        dist_var = jnp.where(gate, dv, dist_var)
        ok = gate & (du < st["vld_rge"].astype(jnp.uint32))
        if ci == 0:  # HT2 wraparound quirk (csc_mf.cpp:306)
            ok = ok & (dv != ppos)
        bet = ok & (lv > minlen)
        minlen = jnp.where(bet, lv, minlen)
        blen = bound_tbl[jnp.clip(lv, 0, 7)]
        rec = bet & ((lv > 6) | (dv < blen))
        last_l = jnp.where(rec, lv, last_l)
        last_d = jnp.where(rec, dv + 4, last_d)
        gl = gl | (bet & (lv >= good_len))
        lane_rec.append(rec)
        lane_len.append(lv)
        lane_dist.append(dv + 4)
        lane_base.append(matchf + 128 * jnp.maximum(
            _dist_slot_vec(dv - 1) + 2, 4) - 128 * 2
            + 128 * 2)              # (slot+2 if slot>2 else 2)*128
        lane_rdist.append(dv)

    appt0_l = last_l
    appt0_d = last_d

    # ---- per-length price sweep (FindMatchWithPrice sweep, lpos order)
    Ls = jnp.arange(2, GL + 1, dtype=jnp.int32)[None, :]   # [1, GL-1]
    lenp = st["pr_lenp"]            # [32]
    lp_l = lenp[jnp.clip(Ls - 2, 0, 31)]                   # [1, GL-1]
    appt_d = jnp.zeros((B, GL - 1), jnp.int32)
    appt_p = jnp.full((B, GL - 1), INF, jnp.int32)
    lpos = jnp.ones_like(wpos)
    for li in range(len(lane_rec)):
        rec = lane_rec[li]
        lnv = lane_len[li]
        m = rec[:, None] & (Ls > lpos[:, None]) & (Ls <= lnv[:, None])
        gated = m & (Ls <= 6) & (lane_rdist[li][:, None]
                                 >= bound_tbl[jnp.clip(Ls, 0, 7)])
        fill = m & ~gated
        appt_d = jnp.where(fill, lane_dist[li][:, None],
                           jnp.where(gated, 0, appt_d))
        appt_p = jnp.where(fill, lane_base[li][:, None] + lp_l, appt_p)
        lpos = jnp.where(rec, jnp.maximum(lpos, lnv), lpos)

    # ---- stretch-end checks (csc_lz.cpp:239-267, in order) ------------
    apend = st["apend"]
    lone = proc & (appt0_l == 1) & (apcur + 1 == apend)
    lit_b = _gather(st["data"], jnp.clip(wpos, 0, N - 1)).astype(jnp.int32)
    _to_mark(new, st, upd, lone, s0, wpos, POST_LIT, 1, 0)

    grow1 = proc & ~lone & (apcur + 1 >= apend)
    apend = jnp.where(grow1, apcur + 2, apend)

    big = proc & ~lone & ((appt0_l >= good_len)
                          | ((appt0_l > 1) & (appt0_l + apcur >= aplimit)))
    _to_mark(new, st, upd, big, s0, wpos, POST_MATCH, appt0_l, appt0_d)

    # ---- relaxation ---------------------------------------------------
    relax = proc & ~lone & ~big
    myp = cell_get("price", wpos)
    mystamp = cell_get("stamp", wpos)
    myp = jnp.where(mystamp == st["sid"], myp, 0)   # s0 cell price = 0

    def cellp(idx):
        p = cell_get("price", idx)
        s_ = cell_get("stamp", idx)
        return jnp.where(s_ == st["sid"], p, INF)

    # literal -> cell apcur+1
    litp = (st["pr_lit_tree"][jnp.clip(lit_b, 0, 255)]
            + _gather(st["pr_flag0"], nstate_p))
    nxt1 = wpos + 1
    cp1 = cellp(nxt1)
    win_l = relax & (litp + myp < cp1)
    cell_set("price", win_l, nxt1, litp + myp)
    cell_set("back", win_l, nxt1, wpos)
    cell_set("ndist", win_l, nxt1, 0)
    cell_set("stamp", win_l, nxt1, st["sid"])
    # rep0len1 -> same cell, sequential after the literal relax
    cp1b = jnp.where(win_l, litp + myp, cp1)
    win_r = relax & r01 & (r01p + myp < cp1b)
    cell_set("price", win_r, nxt1, r01p + myp)
    cell_set("back", win_r, nxt1, wpos)
    cell_set("ndist", win_r, nxt1, 1)
    cell_set("stamp", win_r, nxt1, st["sid"])

    # matches: grid cells apcur+L for L in [2, appt0_l]
    tgt = jnp.clip(wpos[:, None] + Ls, 0, N - 1)           # [B, GL-1]
    curp = jnp.take_along_axis(new["price"], tgt, axis=1)
    curs = jnp.take_along_axis(new["stamp"], tgt, axis=1)
    curp = jnp.where(curs == st["sid"][:, None], curp, INF)
    cand_ok = (appt_d > 0) & (Ls <= appt0_l[:, None]) & relax[:, None]
    newp = appt_p + myp[:, None]
    win_m = cand_ok & (newp < curp)
    new["price"] = new["price"].at[brow[:, None], tgt].set(
        jnp.where(win_m, newp, curp_raw := jnp.take_along_axis(
            new["price"], tgt, axis=1)))
    new["back"] = new["back"].at[brow[:, None], tgt].set(
        jnp.where(win_m, wpos[:, None],
                  jnp.take_along_axis(new["back"], tgt, axis=1)))
    new["ndist"] = new["ndist"].at[brow[:, None], tgt].set(
        jnp.where(win_m, appt_d,
                  jnp.take_along_axis(new["ndist"], tgt, axis=1)))
    new["stamp"] = new["stamp"].at[brow[:, None], tgt].set(
        jnp.where(win_m, st["sid"][:, None],
                  jnp.take_along_axis(new["stamp"], tgt, axis=1)))

    apend = jnp.where(relax & (appt0_l > 1),
                      jnp.maximum(apend, apcur + appt0_l + 1), apend)
    upd("apend", proc & ~lone & ~big, apend)
    upd("wpos", relax, wpos + 1)
    upd("armed", proc, 0)

    # ---------------- AP_MARK: backward next_pos marking ---------------
    c = active & (fsm == AP_MARK)
    wk = st["walk"]
    at_s0 = c & (wk <= st["s0"])
    bk = cell_get("back", wk)
    cell_set("nxt", c & ~at_s0, bk, wk)
    upd("walk", c & ~at_s0, bk)
    upd("walk", at_s0, st["s0"])
    upd("fsm", at_s0, AP_WALK)

    # ---------------- AP_WALK: forward token emission ------------------
    c = active & (fsm == AP_WALK)
    wk = st["walk"]
    at_end = c & (wk >= st["end"])
    emitting = c & ~at_end
    nx = cell_get("nxt", wk)
    tok_d = cell_get("ndist", nx)
    tok_l = nx - wk
    _emit_ap(new, st, emitting, tok_l, tok_d, wk, tape_cols)
    upd("walk", emitting, nx)

    # end reached: apply post action, then next stretch / block
    end = st["end"]
    post = st["post"]
    end_state = cell_get("nstate", end)
    end_rep = jnp.stack(
        [jnp.take_along_axis(st["nrep"][:, k, :],
                             jnp.clip(end, 0, N - 1)[:, None],
                             axis=1)[:, 0] for k in range(4)], axis=1)
    upd("mstate", at_end, end_state)
    new["reps"] = jnp.where(_colm(at_end), end_rep, new["reps"])

    p_lit = at_end & (post == POST_LIT)
    _emit_ap(new, st, p_lit, jnp.ones_like(wpos), jnp.zeros_like(wpos),
             end, tape_cols)
    p_mat = at_end & (post == POST_MATCH)
    _emit_ap(new, st, p_mat, st["post_len"], st["post_dist"], end,
             tape_cols)
    adv = jnp.where(p_lit, 1, jnp.where(p_mat, st["post_len"], 0))
    consumed = (end - st["s0"]) + adv
    upd("blk_i", at_end, st["blk_i"] + consumed)
    upd("wpos", at_end, end + adv)
    # next stretch (or sub-block bookkeeping when the block is consumed)
    boundary = at_end & (new["blk_i"] >= st["blk_len"])
    upd("fsm", at_end & ~boundary, AP_FIND)
    upd("fsm", boundary, AP_BLOCK)
    upd("armed", at_end, 0)
    _stretch_reset(new, st, at_end & ~boundary, new["wpos"],
                   new["mstate"], new["reps"], brow, N)
    return new


def _stretch_reset(new, st, mask, s0_new, mstate, reps, brow, N):
    """Root a new stretch at s0_new: bump sid, stamp the start cell,
    write the entry node (state, reps) into the node arrays."""
    new["sid"] = jnp.where(mask, new["sid"] + 1, new["sid"])
    new["s0"] = jnp.where(mask, s0_new, new["s0"])
    new["apend"] = jnp.where(mask, 1, new["apend"])
    i = jnp.clip(s0_new, 0, N - 1)

    def set_at(name, val):
        cur = jnp.take_along_axis(new[name], i[:, None], axis=1)[:, 0]
        new[name] = new[name].at[brow, i].set(
            jnp.where(mask, val, cur))

    set_at("price", jnp.zeros_like(s0_new))
    set_at("stamp", new["sid"])
    set_at("back", s0_new)
    set_at("ndist", jnp.zeros_like(s0_new))
    set_at("nstate", mstate)
    for k in range(4):
        cur = jnp.take_along_axis(new["nrep"][:, k, :], i[:, None],
                                  axis=1)[:, 0]
        new["nrep"] = new["nrep"].at[:, k, :].set(
            new["nrep"][:, k, :].at[brow, i].set(
                jnp.where(mask, reps[:, k], cur)))


def _to_mark(new, st, upd, mask, s0, end, post, post_len, post_dist):
    upd("end", mask, end)
    upd("walk", mask, end)
    upd("post", mask, jnp.full_like(end, post) if np.isscalar(post)
        else post)
    upd("post_len", mask, post_len if not np.isscalar(post_len)
        else jnp.full_like(end, post_len))
    upd("post_dist", mask, post_dist if not np.isscalar(post_dist)
        else jnp.full_like(end, post_dist))
    upd("fsm", mask, AP_MARK)


def _emit_ap(new, st, mask, u_len, u_dist, pos, tape_cols):
    """Emit one token (kind conventions of encode_scan._emit_token) and
    advance the live model-state register for the emitted kind."""
    B = pos.shape[0]
    brow = jnp.arange(B)
    tpos = jnp.clip(new["tok_cnt"], 0, new["tok_kind"].shape[1] - 1)
    is_lit = u_dist == 0
    is_r01 = (u_dist == 1) & (u_len == 1)
    is_rep = (u_dist <= 4) & ~is_lit & ~is_r01
    is_match = u_dist > 4

    data = st["data"]
    N = data.shape[1]
    lit_byte = _gather(data, jnp.clip(pos, 0, N - 1))
    kind = jnp.where(is_lit, K_LIT,
                     jnp.where(is_r01, K_REP0L1,
                               jnp.where(is_rep, K_REP, K_MATCH)))
    a = jnp.where(is_lit, lit_byte.astype(jnp.int32),
                  jnp.where(is_r01, 0,
                            jnp.where(is_rep, u_dist - 1, u_dist - 5)))
    b = jnp.where(is_rep | is_match, u_len - 2, 0)
    last_byte = _gather(data, jnp.clip(pos + u_len - 1, 0, N - 1))

    def scat(tbl, val):
        cur = jnp.take_along_axis(tbl, tpos[:, None], axis=1)[:, 0]
        return tbl.at[brow, tpos].set(jnp.where(mask, val, cur))

    new["tok_kind"] = scat(new["tok_kind"], kind)
    new["tok_a"] = scat(new["tok_a"], a)
    new["tok_b"] = scat(new["tok_b"], b)
    new["tok_c"] = scat(new["tok_c"], last_byte.astype(jnp.int32))
    new["tok_cnt"] = jnp.where(mask, new["tok_cnt"] + 1, new["tok_cnt"])

    # live model-state transition for post-action emissions
    s = new["mstate"]
    ns = jnp.where(is_lit, (s * 4) & 0x3F,
                   jnp.where(is_r01, (s * 4 + 2) & 0x3F,
                             jnp.where(is_rep, (s * 4 + 3) & 0x3F,
                                       (s * 4 + 1) & 0x3F)))
    new["mstate"] = jnp.where(mask, ns, new["mstate"])
    reps = new["reps"]
    rd = jnp.take_along_axis(reps, jnp.clip(u_dist - 1, 0, 3)[:, None],
                             axis=1)[:, 0]
    rot = jnp.where(jnp.arange(4)[None, :] <= (u_dist - 1)[:, None],
                    jnp.concatenate([rd[:, None], reps[:, :3]], axis=1),
                    reps)
    push = jnp.concatenate([(u_dist - 4)[:, None], reps[:, :3]], axis=1)
    reps2 = jnp.where((mask & is_rep)[:, None], rot, reps)
    reps2 = jnp.where((mask & is_match)[:, None], push, reps2)
    new["reps"] = reps2


@functools.lru_cache(maxsize=32)
def ap_parse_fn(hash_width, good_len):
    cfg = dict(hash_width=int(hash_width), good_len=int(good_len))
    return jax.jit(lambda s, ms: run_ap_parse(s, cfg, ms))


def run_ap_parse(st, cfg, max_steps):
    def cond(carry):
        s, i = carry
        return (i < max_steps) & ~jnp.all(s["done"] == 1)

    def body(carry):
        s, i = carry
        return ap_parse_step(s, cfg), i + 1

    final, steps = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return final, steps
