"""TPU-native fast parse: candidate-fold lazy parser over precomputed
hash-chain candidates (parse_pre.py).

The reference parser spends its steps probing and *mutating* hash tables
per position (csc_mf.cpp:243-495 + csc_lz.cpp:156-199).  With the
candidates and their match lengths precomputed, one parse token needs
only: live rep-distance extensions (4 lanes), a candidate fold
replicating find_match's sequential record semantics (distance gates,
minlen growth, good_len early exit, HT2 wrap quirk), the FindMatch
best-pick, and the lazy second-probe decision — no table updates at all.
~2-4 lockstep steps per TOKEN instead of ~40 per token.

Output contract is identical to encode_scan.run_parse (token tape with
K_SENT_A run sentinels), so the host tape stitching and phase B are
shared.  Parse choices can differ from the reference encoder only via
the documented chain approximation (parse_pre.py) — the stream stays
format-exact; round-trip and reference-binary cross-decode are the
correctness bar for this path (CSC_ENCODE_PARSE=exact keeps the
bit-exact scan).
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp

from ..constants import MF_DIST_BOUND
from .encode_scan import (K_LIT, K_MATCH, K_REP, K_REP0L1, K_END, K_SENT_A,
                          _second_better)
from .parse_pre import EXT_CAP

MASK32 = 0xFFFFFFFF

# fsm
FB_BLOCK = 0
FB_FIND = 1       # load candidates + start live extensions
FB_EXT = 2        # continue live extensions (32B/step/lane)
FB_PICK = 3       # fold + lazy decision + emit
FB_DONE = 4

_BOUND = np.zeros(8, np.int32)
for _i, _b in enumerate(MF_DIST_BOUND):
    _BOUND[_i] = _b
_BOUND[7] = 0x7FFFFFFF


def make_fast_state(batch, data, sizes, dict_sizes, cand, run_ends,
                    max_tokens, hash_width, run_types=None):
    """data: [B,N] u8; cand: [B, C, N] i32 (dist,len pairs: ht2, ht3,
    ht6_0..w-1, from parse_pre.precompute_candidates)."""
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

    if run_ends is None:
        run_ends = np.asarray(sizes, np.int32)[:, None]
    st["run_ends"] = jnp.asarray(np.asarray(run_ends, np.int32))
    st["run_idx"] = z
    st["run_end"] = jnp.asarray(np.asarray(run_ends, np.int32)[:, 0])
    if run_types is None:
        run_types = np.zeros(np.asarray(run_ends).shape, np.int32)
    # skip-parse runs (BAD/ENTROPY payloads, DT_NO_LZ=5): the tape gets
    # only the run sentinel; the stitcher emits the payload tokens
    st["run_skip"] = jnp.asarray(
        (np.asarray(run_types, np.int32) >= 5).astype(np.int32))

    st["fsm"] = z + FB_BLOCK
    st["blk_off"] = z
    st["blk_len"] = z
    st["blk_i"] = z
    st["probe2"] = z
    st["armed"] = z
    st["have_u1"] = z
    st["u1_len"] = z
    st["u1_dist"] = z
    # precomputed candidates staged into registers at arm time
    st["cand_d"] = jnp.zeros((batch, cand.shape[1] // 2), jnp.int32)
    st["cand_l"] = jnp.zeros((batch, cand.shape[1] // 2), jnp.int32)
    # live extension lanes: 4 reps + capped-ht continuations
    NL = 4 + cand.shape[1] // 2
    st["ext_q"] = jnp.full((batch, NL), -1, jnp.int32)
    st["ext_l"] = jnp.zeros((batch, NL), jnp.int32)
    st["ext_lim"] = jnp.zeros((batch, NL), jnp.int32)
    st["tok_kind"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_a"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_b"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_c"] = jnp.zeros((batch, max_tokens), jnp.int32)
    st["tok_cnt"] = z
    st["done"] = z
    return st, dict(hash_width=int(hash_width), lazy=1)


def _gather(tbl, idx):
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


@functools.lru_cache(maxsize=32)
def fast_parse_fn(hash_width, lazy, good_len):
    """Memoized jitted parse loop (a fresh jax.jit(lambda) per call
    would reload the executable through the remote-compile service
    every time)."""
    cfg = dict(hash_width=int(hash_width), lazy=int(lazy))
    return jax.jit(lambda s, ms: run_fast_parse(s, cfg, int(good_len),
                                                ms))


def fast_parse_step(st, cfg, good_len):
    B = st["fsm"].shape[0]
    NL = st["ext_q"].shape[1]
    w = cfg["hash_width"]
    fsm = st["fsm"]
    active = st["done"] == 0
    new = dict(st)

    def upd(name, cond, val):
        new[name] = jnp.where(cond, val, new[name])

    wpos = st["wpos"]
    size = st["size"]
    tape_cols = jnp.arange(st["tok_kind"].shape[1])[None, :]

    # ---------------- FB_BLOCK (port of encode_scan E_BLOCK) -----------
    c = active & (fsm == FB_BLOCK)
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
    upd("have_u1", run_done, 0)

    fresh = need_new & ~run_done
    stream_end = fresh & (nboff >= size)
    upd("tok_kind", stream_end[:, None]
        & (tape_cols == st["tok_cnt"][:, None]), K_END)
    upd("tok_cnt", stream_end, st["tok_cnt"] + 1)
    upd("done", stream_end, 1)
    upd("fsm", stream_end, FB_DONE)
    start_blk = fresh & ~stream_end
    cur_skip = _gather(st["run_skip"],
                       jnp.clip(new["run_idx"], 0,
                                st["run_skip"].shape[1] - 1)) == 1
    skip = start_blk & cur_skip
    upd("blk_off", start_blk, nboff)
    upd("blk_len", start_blk,
        jnp.minimum(st["run_end"] - nboff, 8 * 1024))
    upd("blk_i", start_blk, 0)
    upd("have_u1", start_blk, 0)
    # BAD/ENTROPY run: no parse — consume the whole run, the next
    # FB_BLOCK step emits its sentinel
    run_len = new["run_end"] - nboff
    upd("blk_len", skip, run_len)
    upd("blk_i", skip, run_len)
    upd("wpos", skip, wpos + run_len)
    go = (c & ~need_new) | (start_blk & ~skip)
    upd("fsm", go, FB_FIND)
    upd("armed", go, 0)
    upd("probe2", go & (st["have_u1"] == 0), 0)

    # ---------------- FB_FIND (fused arm + extend + pick) --------------
    c = active & (fsm == FB_FIND)
    ppos = wpos + st["probe2"]
    limit = st["blk_len"] - st["blk_i"] - st["probe2"]
    need_find = (st["have_u1"] == 0) | (st["probe2"] == 1)
    fresh = c & (st["armed"] == 0) & need_find

    # ---- arm: rep lanes 0..3 (a rep distance reaching before the
    # window start — e.g. the dict_size init — can never match) + capped
    # ht continuation lanes, and stage the precomputed candidates into
    # registers so the pick fold does no gathers
    lanes_q = []
    for k in range(4):
        dk = st["reps"][:, k]
        qk = ppos - dk
        lanes_q.append(jnp.where((dk > 0) & (qk >= 0), qk, -1))
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
        lanes_q.append(jnp.where(need, ppos - dv, -1))
        lanes_lim.append(limit)
        lanes_l0.append(jnp.where(need, jnp.full_like(lv, EXT_CAP), 0))
    q = jnp.where(_colm(fresh), jnp.stack(lanes_q, axis=1), st["ext_q"])
    lim = jnp.where(_colm(fresh), jnp.stack(lanes_lim, axis=1),
                    st["ext_lim"])
    l = jnp.where(_colm(fresh), jnp.stack(lanes_l0, axis=1), st["ext_l"])
    cand_d = jnp.where(_colm(fresh), jnp.stack(cds, axis=1),
                       st["cand_d"])
    cand_l = jnp.where(_colm(fresh), jnp.stack(cls, axis=1),
                       st["cand_l"])
    new["cand_d"] = cand_d
    new["cand_l"] = cand_l
    upd("armed", fresh, 1)
    arming = fresh | (c & (st["armed"] == 1))

    # ---- extend all live lanes, 4B/lane/iteration, early-exit: most
    # matches settle in 1-2 iterations, so the (expensive) XLA gathers
    # only run while some lane is still extending
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
        lambda c: jnp.any(c[1]) & (c[2] < 8), _ext_body,
        (l, alive_l, jnp.int32(0)))
    new["ext_q"] = jnp.where(_colm(arming), q, st["ext_q"])
    new["ext_lim"] = jnp.where(_colm(arming), lim, st["ext_lim"])
    new["ext_l"] = jnp.where(_colm(arming), l, st["ext_l"])
    settled = arming & ~jnp.any(alive_l, axis=1)

    # ---- pick: fold + lazy decision, same step when extensions settle
    c = (c & (st["armed"] == 0) & ~need_find) | settled
    probe2 = st["probe2"] == 1
    ext_l = new["ext_l"]

    # fold candidates in find_match order (csc_mf.cpp:243-495)
    minlen = jnp.ones_like(wpos)
    dist_var = jnp.zeros_like(wpos)          # u32 semantics via cast
    gl = jnp.zeros_like(wpos, dtype=bool)    # good_len exit hit
    best_l = jnp.ones_like(wpos)
    best_d = jnp.zeros_like(wpos)
    have = jnp.zeros_like(wpos, dtype=bool)

    def consider(bl, bd, hv, ln, dw):
        take_first = ~hv
        rep = hv & _second_better(bl, bd, ln, dw)
        take = take_first | rep
        return (jnp.where(take, ln, bl), jnp.where(take, dw, bd),
                hv | take_first)

    # rep0len1 (csc_mf.cpp:281-287): probe runs iff the byte at the
    # running minlen(=1) matches, i.e. observable iff ext >= 2
    r01 = ext_l[:, 0] >= 2
    best_l = jnp.where(r01, 1, best_l)
    best_d = jnp.where(r01, 1, best_d)
    have = r01

    # rep probes: 'better' (ext > minlen) drives minlen/gl; reps always
    # record when better (csc_mf.cpp:288-301)
    for k in range(4):
        ln = jnp.minimum(ext_l[:, k], limit)
        bet = ~gl & (ln > minlen)
        minlen = jnp.where(bet, ln, minlen)
        bl2, bd2, hv2 = consider(best_l, best_d, have, ln,
                                 jnp.full_like(ln, k + 1))
        best_l = jnp.where(bet, bl2, best_l)
        best_d = jnp.where(bet, bd2, best_d)
        have = jnp.where(bet, hv2, have)
        gl = gl | (bet & (ln >= good_len))

    # ht probes: distance-gate chain + validity + len/dist record gate
    # (csc_mf.cpp:302-365,441-495); minlen grows on 'better' even when
    # the record gate fails
    bound_tbl = jnp.asarray(_BOUND)
    for ci in range(ncand):
        dv = cand_d[:, ci]
        lv = cand_l[:, ci]
        # live continuation replaces the capped length
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
        bl2, bd2, hv2 = consider(best_l, best_d, have, lv, dv + 4)
        best_l = jnp.where(rec, bl2, best_l)
        best_d = jnp.where(rec, bd2, best_d)
        have = jnp.where(rec, hv2, have)
        gl = gl | (bet & (lv >= good_len))

    u_len = jnp.where(have, best_l, 1)
    u_dist = jnp.where(have, best_d, 0)

    # ----- lazy logic (port of encode_scan E_DECIDE) -------------------
    lazy = cfg["lazy"]
    first = c & ~probe2
    u1_len = jnp.where(st["have_u1"] == 1, st["u1_len"], u_len)
    u1_dist = jnp.where(st["have_u1"] == 1, st["u1_dist"], u_dist)
    take_now = first & ((u1_len == 1) | (lazy == 0)
                        | (u1_len >= good_len))
    _emit_token(new, st, take_now, u1_len, u1_dist, wpos)
    upd("blk_i", take_now, st["blk_i"] + u1_len)
    upd("wpos", take_now, wpos + u1_len)
    upd("have_u1", take_now, 0)

    go2 = first & ~take_now
    upd("u1_len", go2, u1_len)
    upd("u1_dist", go2, u1_dist)
    upd("probe2", go2, 1)
    upd("armed", go2, 0)

    second = c & probe2
    smb = _second_better(st["u1_len"], st["u1_dist"], u_len, u_dist)
    lit = second & smb
    _emit_token(new, st, lit, jnp.ones_like(u_len),
                jnp.zeros_like(u_dist), wpos)
    upd("blk_i", lit, st["blk_i"] + 1)
    upd("wpos", lit, wpos + 1)
    upd("u1_len", lit, u_len)
    upd("u1_dist", lit, u_dist)
    upd("have_u1", lit, 1)
    upd("probe2", lit, 0)

    mt = second & ~smb
    _emit_token(new, st, mt, st["u1_len"], st["u1_dist"], wpos)
    upd("blk_i", mt, st["blk_i"] + st["u1_len"])
    upd("wpos", mt, wpos + st["u1_len"])
    upd("have_u1", mt, 0)
    upd("probe2", mt, 0)

    # after an emit: next token directly unless the sub-block ended
    emitted = take_now | lit | mt
    upd("armed", emitted, 0)
    boundary = emitted & (new["blk_i"] >= st["blk_len"])
    upd("fsm", boundary, FB_BLOCK)
    return new


def _emit_token(new, st, mask, u_len, u_dist, wpos):
    """Identical semantics to encode_scan._emit_token."""
    tape_w = new["tok_kind"].shape[1]
    B = wpos.shape[0]
    tpos = jnp.clip(st["tok_cnt"], 0, tape_w - 1)
    is_lit = u_dist == 0
    is_r01 = (u_dist == 1) & (u_len == 1)
    is_rep = (u_dist <= 4) & ~is_lit & ~is_r01
    is_match = u_dist > 4

    data = st["data"]
    lit_byte = _gather(data, jnp.clip(wpos, 0, data.shape[1] - 1))
    kind = jnp.where(is_lit, K_LIT,
                     jnp.where(is_r01, K_REP0L1,
                               jnp.where(is_rep, K_REP, K_MATCH)))
    a = jnp.where(is_lit, lit_byte.astype(jnp.int32),
                  jnp.where(is_r01, 0,
                            jnp.where(is_rep, u_dist - 1, u_dist - 5)))
    b = jnp.where(is_rep | is_match, u_len - 2, 0)
    last_byte = _gather(data,
                        jnp.clip(wpos + u_len - 1, 0,
                                 data.shape[1] - 1)).astype(jnp.int32)

    def scat(tbl, val):
        cur = _gather(tbl, tpos)
        return tbl.at[jnp.arange(B), tpos].set(
            jnp.where(mask, val, cur))

    new["tok_kind"] = scat(new["tok_kind"], kind)
    new["tok_a"] = scat(new["tok_a"], a)
    new["tok_b"] = scat(new["tok_b"], b)
    new["tok_c"] = scat(new["tok_c"], last_byte)
    new["tok_cnt"] = jnp.where(mask, st["tok_cnt"] + 1, new["tok_cnt"])

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


def run_fast_parse(st, cfg, good_len, max_steps):
    def cond(carry):
        s, i = carry
        return (i < max_steps) & ~jnp.all(s["done"] == 1)

    def body(carry):
        s, i = carry
        return fast_parse_step(s, cfg, good_len), i + 1

    final, steps = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return final, steps
