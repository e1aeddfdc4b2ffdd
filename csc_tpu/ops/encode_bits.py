"""Batched CSC encoder, phase B: token tape -> range-coded byte streams.

Mirrors the decode scan's FSM, but driven: every bit's value is known from
the token tape, so each lockstep step encodes one range-coder bit (with
the adaptive 12-bit shift-5 update, csc_coder.h:67-81), packs direct bits
(EncDirect16, csc_coder.cpp:76-87), or drains pending carry-run bytes from
RC_ShiftLow (csc_coder.cpp:89-112).  Output: per-stream logical RC/BC byte
arrays + final coder registers; the host performs MemIO block framing and
the chunk-flush tail (encode_host.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..constants import DIST_TABLE, REV16_TABLE
from .decode_scan import (P_STATE, P_LIT, P_DIST, P_MDEXTRA, P_MLSLOT,
                          P_MLEX1, P_MLEX2, P_MLEX3, P_LONGLEN, P_REPDIST,
                          P_DELTA, P_RLEFLAG, NPROB, _PDIST_POS, _PDIST_BITS)
from .encode_scan import K_LIT, K_MATCH, K_REP, K_REP0L1, K_END

MASK32 = 0xFFFFFFFF

B_DONE = 0
B_NEXT = 1        # fetch next token
B_FLAG = 2        # pack-flag bits (1-3, via flag_i)
B_LITTREE = 3
B_REPTREE = 4
B_LENSLOT = 5
B_LENTREE = 6
B_LONGLEN = 7
B_DISTSLOT = 8
B_DISTEXTRA = 9
B_DISTDIRECT = 10
B_INT = 11
B_FLUSH = 12      # 5 ShiftLows + bc pads, then coder reset
B_RAW = 13        # direct raw bytes (CompressBad, csc_model.cpp:463-469)
B_RLEFLAG = 14    # CompressRLE per-token flag bit (csc_model.cpp:483,492)
B_DLITTREE = 15   # CompressRLE literal through p_delta[sctx] (:493-499)

_DIST_TABLE = np.array(DIST_TABLE, np.int64)
_REV16 = np.array(REV16_TABLE, np.int32)

K_INT = 10        # host token: EncodeInt(tok_a)
K_SENT = 11       # host token: EncodeMatch(64, 0) block sentinel
K_FLUSH = 12      # host token: Coder::Flush chunk boundary
K_RAW = 6         # CompressBad payload: tok_a = 1-2 raw bytes, tok_b = bits
K_ELIT = 7        # CompressLiterals payload: order-1 literal, no LZ flags
K_DLIT = 8        # CompressRLE literal: tok_a = byte, tok_b = s_ctx
K_RLEN = 9        # CompressRLE run: tok_b = run length - 11

_BIT_STATES = (B_FLAG, B_LITTREE, B_REPTREE, B_LENSLOT, B_LENTREE,
               B_LONGLEN, B_DISTSLOT, B_DISTEXTRA, B_RLEFLAG, B_DLITTREE)

# physical MemIO block size; module-level so the step fn stays static
BSIZE_REF = [65536]


def _log_cross(blkmap, cnt_after, other_cnt, mask, bsize):
    """Record other_cnt at each bsize boundary crossing of cnt_after."""
    crossed = mask & (cnt_after > 0) & (cnt_after % bsize == 0)
    idx = jnp.clip(cnt_after // bsize - 1, 0, blkmap.shape[1] - 1)
    cur = jnp.take_along_axis(blkmap, idx[:, None], axis=1)[:, 0]
    return blkmap.at[jnp.arange(blkmap.shape[0]), idx].set(
        jnp.where(crossed, other_cnt, cur))


def make_bits_state(batch, tok_kind, tok_a, tok_b, tok_c, max_rc, max_bc,
                    bsize=65536, max_blocks=64):
    st = {}
    st["tok_kind"] = jnp.asarray(tok_kind)
    st["tok_a"] = jnp.asarray(tok_a)
    st["tok_b"] = jnp.asarray(tok_b)
    st["tok_c"] = jnp.asarray(tok_c)
    z = jnp.zeros(batch, jnp.int32)
    st["probs"] = jnp.full((batch, NPROB), 2048, jnp.int32)
    st["rc_out"] = jnp.zeros((batch, max_rc), jnp.uint8)
    st["bc_out"] = jnp.zeros((batch, max_bc), jnp.uint8)
    st["rc_cnt"] = z
    st["bc_cnt"] = z
    # block-fill event logs: counter of the OTHER substream at each 64KB
    # boundary, for chronological MemIO remux on host
    st["rc_blkmap"] = jnp.zeros((batch, max_blocks), jnp.int32)
    st["bc_blkmap"] = jnp.zeros((batch, max_blocks), jnp.int32)
    st["low"] = jnp.zeros(batch, jnp.uint32)
    st["lowhi"] = z
    st["range"] = jnp.full(batch, MASK32, jnp.uint32)
    st["cache"] = z
    st["cachesize"] = z + 1
    st["pending"] = z
    st["pend_carry"] = z
    st["bc_val"] = jnp.zeros(batch, jnp.uint32)
    st["bc_bits"] = z
    st["mstate"] = z
    st["ctx"] = z
    st["tok_i"] = z
    st["fsm"] = z + B_NEXT
    st["kind"] = z
    st["va"] = z
    st["vb"] = z
    st["vc"] = z
    st["flag_i"] = z
    st["node"] = z
    st["bits_c"] = z
    st["len_phase"] = z
    st["len_left"] = z
    st["lenv"] = z
    st["len_tbl"] = z
    st["sub_i"] = z
    st["slot"] = z
    st["ebits"] = z
    st["elen"] = z
    st["pdist_pos"] = z
    st["sbits"] = z
    st["dir_val"] = z
    st["dir_rem"] = z
    st["after_len"] = z
    st["flush_i"] = z
    # per-chunk log: (rc_cnt, bc_cnt) after each chunk's flush bytes
    st["chunk_log"] = jnp.zeros((batch, 64, 2), jnp.int32)
    st["chunk_cnt"] = z
    st["done"] = z
    return st


def _gather(tbl, idx):
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


def _scatter1(tbl, idx, val, mask):
    cur = _gather(tbl, idx)
    return tbl.at[jnp.arange(tbl.shape[0]), idx].set(
        jnp.where(mask, val, cur))


def _bitlen(v):
    r = jnp.zeros_like(v)
    x = v
    for sh in (16, 8, 4, 2, 1):
        big = x >= (1 << sh)
        r = r + jnp.where(big, sh, 0)
        x = jnp.where(big, x >> sh, x)
    return jnp.where(v > 0, r + 1, 0)


def encode_bits_step(st):
    B = st["fsm"].shape[0]
    fsm = st["fsm"]
    alive = st["done"] == 0
    draining = alive & (st["pending"] > 0)
    active = alive & (st["pending"] == 0)
    new = dict(st)

    def upd(name, cond, val):
        new[name] = jnp.where(cond, val, new[name])

    node = st["node"]
    mstate3 = st["mstate"] * 3
    kind = st["kind"]
    fi = st["flag_i"]

    is_flag = active & (fsm == B_FLAG)
    is_lit = active & (fsm == B_LITTREE)
    is_rept = active & (fsm == B_REPTREE)
    is_lslot = active & (fsm == B_LENSLOT)
    is_ltree = active & (fsm == B_LENTREE)
    is_long = active & (fsm == B_LONGLEN)
    is_dslot = active & (fsm == B_DISTSLOT)
    is_dext = active & (fsm == B_DISTEXTRA)
    is_rlef = active & (fsm == B_RLEFLAG)
    is_dlit = active & (fsm == B_DLITTREE)
    is_bit = (is_flag | is_lit | is_rept | is_lslot | is_ltree | is_long
              | is_dslot | is_dext | is_rlef | is_dlit)
    is_l3 = st["len_tbl"] != 3

    # ---------------- bit value + prob index -----------------------------
    flag_bit = jnp.select(
        [kind == K_LIT,
         (kind == K_MATCH) | (kind == K_SENT),
         kind == K_REP0L1, kind == K_REP],
        [jnp.zeros_like(fi), jnp.ones_like(fi),
         jnp.where(fi == 0, 1, 0),
         jnp.where(fi == 0, 1, jnp.where(fi == 1, 0, 1))],
        default=jnp.zeros_like(fi))
    nflags = jnp.select(
        [kind == K_LIT, (kind == K_MATCH) | (kind == K_SENT)],
        [jnp.ones_like(fi), jnp.full_like(fi, 2)],
        default=jnp.full_like(fi, 3))

    lit_bit = (st["bits_c"] >> 7) & 1
    ltree_bit = jnp.where(is_l3, (st["bits_c"] >> 2) & 1,
                          (st["bits_c"] >> 6) & 1)
    rep_bit = jnp.where(st["sub_i"] == 0, (st["va"] >> 1) & 1, st["va"] & 1)
    lslot_bit = jnp.where(st["sub_i"] == 0,
                          jnp.where(st["lenv"] < 8, 0, 1),
                          jnp.where(st["lenv"] < 16, 0, 1))
    dslot_bit = (st["bits_c"] >> jnp.maximum(st["sbits"] - 1, 0)) & 1
    dext_bit = (st["bits_c"] >> 3) & 1
    long_bit = jnp.where(st["len_left"] > 0, 0, 1)

    rlef_bit = jnp.where(kind == K_RLEN, 1, 0)

    bit = jnp.select(
        [is_flag, is_lit | is_dlit, is_rept, is_lslot, is_ltree, is_long,
         is_dslot, is_dext, is_rlef],
        [flag_bit, lit_bit, rep_bit, lslot_bit, ltree_bit, long_bit,
         dslot_bit, dext_bit, rlef_bit],
        default=jnp.zeros_like(fi))

    pidx = jnp.select(
        [is_flag, is_lit, is_rept, is_lslot,
         is_ltree & is_l3 & (st["len_tbl"] == 1),
         is_ltree & is_l3 & (st["len_tbl"] == 2),
         is_ltree & ~is_l3,
         is_long, is_dslot, is_dext, is_rlef, is_dlit],
        [P_STATE + mstate3 + fi,
         P_LIT + st["ctx"] * 256 + node,
         P_REPDIST + mstate3 + node - 1,
         P_MLSLOT + st["sub_i"],
         P_MLEX1 + node, P_MLEX2 + node, P_MLEX3 + node,
         jnp.full_like(fi, P_LONGLEN),
         P_DIST + st["pdist_pos"] + node,
         P_MDEXTRA + (st["ebits"] - 1) * 16 + node,
         jnp.full_like(fi, P_RLEFLAG),
         P_DELTA + st["vb"] * 256 + node],
        default=jnp.zeros_like(fi))
    pidx = jnp.where(is_bit, pidx, 0)

    # ---------------- EncodeBit ------------------------------------------
    p = _gather(st["probs"], pidx).astype(jnp.uint32)
    bound = (st["range"] >> 12) * p
    bset = bit == 1
    new_p = jnp.where(bset, p + ((0xFFF - p) >> 5), p - (p >> 5))
    new_p = jnp.where(is_bit, new_p, p)
    new["probs"] = st["probs"].at[jnp.arange(B), pidx].set(
        new_p.astype(jnp.int32))
    rng = jnp.where(is_bit,
                    jnp.where(bset, bound, st["range"] - bound), st["range"])
    low_add = jnp.where(is_bit & ~bset, bound, jnp.uint32(0))
    low_sum = st["low"] + low_add
    lowhi = st["lowhi"] + (low_sum < st["low"]).astype(jnp.int32)
    low = low_sum

    renorm = is_bit & (rng < jnp.uint32(1 << 24))
    rng = jnp.where(renorm, rng << 8, rng)
    trigger = renorm & ((low < jnp.uint32(0xFF000000)) | (lowhi != 0))
    carry = jnp.where(trigger, lowhi, 0)
    first_byte = (st["cache"] + carry) & 0xFF
    new["rc_out"] = _scatter1(new["rc_out"],
                              jnp.clip(st["rc_cnt"], 0,
                                       st["rc_out"].shape[1] - 1),
                              first_byte.astype(jnp.uint8), trigger)
    rc_cnt = jnp.where(trigger, st["rc_cnt"] + 1, st["rc_cnt"])
    new["rc_blkmap"] = _log_cross(new["rc_blkmap"], rc_cnt, st["bc_cnt"],
                                  trigger, BSIZE_REF[0])
    run_more = trigger & (st["cachesize"] > 1)
    upd("pending", run_more, st["cachesize"] - 1)
    upd("pend_carry", run_more, carry)
    upd("cache", trigger, ((low >> 24) & 0xFF).astype(jnp.int32))
    ncsize = jnp.where(trigger, 0, st["cachesize"])
    ncsize = jnp.where(renorm, ncsize + 1, ncsize)
    upd("cachesize", is_bit, ncsize)
    low = jnp.where(renorm, low << 8, low)
    lowhi = jnp.where(renorm, 0, lowhi)
    new["low"] = jnp.where(is_bit, low, st["low"])
    new["lowhi"] = jnp.where(is_bit, lowhi, st["lowhi"])
    new["range"] = rng
    new["rc_cnt"] = rc_cnt

    # ---------------- bit-state transitions ------------------------------
    # FLAG
    c = is_flag
    nfi = fi + 1
    upd("flag_i", c, nfi)
    flags_done = c & (nfi >= nflags)
    fd_lit = flags_done & (kind == K_LIT)
    upd("fsm", fd_lit, B_LITTREE)
    upd("node", fd_lit, 1)
    upd("bits_c", fd_lit, st["va"] | 0x100)
    upd("mstate", fd_lit, (st["mstate"] * 4) & 0x3F)   # EncodeLiteral order
    fd_r01 = flags_done & (kind == K_REP0L1)
    upd("mstate", fd_r01, (st["mstate"] * 4 + 2) & 0x3F)
    upd("ctx", fd_r01, st["vc"])       # ctx=0 then SetLiteralCtx(byte)
    upd("fsm", fd_r01, B_NEXT)
    fd_rep = flags_done & (kind == K_REP)
    upd("fsm", fd_rep, B_REPTREE)
    upd("node", fd_rep, 1)
    upd("sub_i", fd_rep, 0)
    fd_match = flags_done & ((kind == K_MATCH) | (kind == K_SENT))
    upd("fsm", fd_match, B_LENSLOT)
    upd("sub_i", fd_match, 0)
    upd("after_len", fd_match, 1)
    upd("len_phase", fd_match, 0)
    upd("len_left", fd_match, 0)
    upd("lenv", fd_match, jnp.minimum(st["vb"], 143))

    # LITTREE
    c = is_lit
    nnode = node * 2 + bit
    nb = (st["bits_c"] << 1) & 0x1FFFF
    upd("bits_c", c, nb)
    upd("node", c, nnode)
    lit_done = c & (nnode >= 0x100)
    upd("ctx", lit_done, st["va"])
    upd("fsm", lit_done, B_NEXT)

    # REPTREE
    c = is_rept
    nsub = st["sub_i"] + 1
    upd("node", c, node * 2 + bit)
    upd("sub_i", c, nsub)
    rep_done = c & (nsub >= 2)
    upd("fsm", rep_done, B_LENSLOT)
    upd("sub_i", rep_done, 0)
    upd("after_len", rep_done, 0)
    upd("len_phase", rep_done, 0)
    upd("len_left", rep_done, 0)
    upd("lenv", rep_done, jnp.minimum(st["vb"], 143))

    # LENSLOT
    c = is_lslot
    lv = st["lenv"]
    one_slot = lv < 8
    nsub = st["sub_i"] + 1
    slot_done = c & (one_slot | (nsub >= 2))
    upd("sub_i", c & ~slot_done, nsub)
    tbl = jnp.where(lv < 8, 1, jnp.where(lv < 16, 2, 3))
    lbase = jnp.where(lv < 8, 0, jnp.where(lv < 16, 8, 16))
    tree_c = jnp.where(tbl == 3, (lv - 16) | 0x80, (lv - lbase) | 0x08)
    upd("len_tbl", slot_done, tbl)
    upd("bits_c", slot_done, tree_c)
    upd("node", slot_done, 1)
    upd("fsm", slot_done, B_LENTREE)

    # LENTREE
    c = is_ltree
    nb = (st["bits_c"] << 1) & 0x7FFF
    upd("bits_c", c, nb)
    nnode = node * 2 + bit
    upd("node", c, nnode)
    t_done = c & jnp.where(is_l3, nnode >= 0x8, nnode >= 0x80)
    # matchlen_2: if this m1 encoded 143 in phase 0 and the real length is
    # >= 143, continue with the long-len loop (csc_model.cpp:147-159)
    # first matchlen_1 value: for vb >= 143 it is exactly 143
    was143 = (st["len_phase"] == 0) & (st["vb"] >= 143)
    go_long = t_done & was143
    upd("fsm", go_long, B_LONGLEN)
    upd("len_left", go_long, (st["vb"] - 143) // 143)
    len_fin = t_done & ~was143
    lf_rep = len_fin & (st["after_len"] == 0)
    upd("mstate", lf_rep, (st["mstate"] * 4 + 3) & 0x3F)
    upd("ctx", lf_rep, st["vc"])
    upd("fsm", lf_rep, B_NEXT)
    # RLE run length (after_len==2): no mstate/ctx updates (compress_rle
    # calls encode_matchlen_2 directly, csc_model.cpp:492)
    lf_rle = len_fin & (st["after_len"] == 2)
    upd("fsm", lf_rle, B_NEXT)
    lf_match = len_fin & (st["after_len"] == 1)
    wl_c = jnp.minimum(st["vb"], 6)
    npdist = jnp.asarray(_PDIST_POS)[wl_c]
    nsbits = jnp.asarray(_PDIST_BITS)[wl_c]
    upd("pdist_pos", lf_match, npdist)
    upd("sbits", lf_match, nsbits)
    dist = st["va"]
    dtab = jnp.asarray(_DIST_TABLE)
    slot = (jnp.searchsorted(dtab, dist.astype(jnp.int64), side="right") - 1)
    slot = jnp.clip(slot, 0, 31).astype(jnp.int32)
    upd("slot", lf_match, slot)
    upd("node", lf_match, 1)
    upd("bits_c", lf_match, slot | (1 << nsbits))
    upd("fsm", lf_match, B_DISTSLOT)

    # LONGLEN
    c = is_long
    dec = c & (st["len_left"] > 0)
    upd("len_left", dec, st["len_left"] - 1)
    fin_l = c & (st["len_left"] == 0)
    rem = (st["vb"] - 143) % 143
    upd("len_phase", fin_l, 1)
    upd("lenv", fin_l, jnp.minimum(rem, 143))
    upd("sub_i", fin_l, 0)
    upd("fsm", fin_l, B_LENSLOT)

    # DISTSLOT
    c = is_dslot
    nb = (st["bits_c"] << 1) & 0x7FF
    upd("bits_c", c, nb)
    nnode = node * 2 + bit
    upd("node", c, nnode)
    ds_done = c & (nnode >= (1 << st["sbits"]))
    small = ds_done & (st["slot"] <= 2)
    upd("mstate", small, (st["mstate"] * 4 + 1) & 0x3F)
    upd("ctx", small & (kind != K_SENT), st["vc"])
    upd("fsm", small, B_NEXT)
    big = ds_done & (st["slot"] > 2)
    ebits = jnp.maximum(st["slot"] - 2, 1)
    extra_len = st["va"] - (1 << jnp.minimum(ebits, 30)) - 1
    upd("ebits", big, ebits)
    upd("elen", big, extra_len)
    need_dir = big & (ebits > 4)
    upd("dir_val", need_dir, extra_len >> 4)
    upd("dir_rem", need_dir, ebits - 4)
    upd("fsm", need_dir, B_DISTDIRECT)
    go_ext = big & ~need_dir
    rev = jnp.asarray(_REV16)[extra_len & 0xF]
    upd("bits_c", go_ext, rev | 0x10)
    upd("node", go_ext, 1)
    upd("fsm", go_ext, B_DISTEXTRA)

    # DISTEXTRA
    c = is_dext
    nb = (st["bits_c"] << 1) & 0x1FF
    upd("bits_c", c, nb)
    nnode = node * 2 + bit
    upd("node", c, nnode)
    de_done = c & (nnode >= 0x10)
    upd("mstate", de_done, (st["mstate"] * 4 + 1) & 0x3F)
    upd("ctx", de_done & (kind != K_SENT), st["vc"])
    upd("fsm", de_done, B_NEXT)

    # RLEFLAG: one flag bit, then delta literal or run length
    c = is_rlef
    to_dlit = c & (kind == K_DLIT)
    upd("fsm", to_dlit, B_DLITTREE)
    upd("node", to_dlit, 1)
    upd("bits_c", to_dlit, st["va"] | 0x100)
    to_rlen = c & (kind == K_RLEN)
    upd("fsm", to_rlen, B_LENSLOT)
    upd("sub_i", to_rlen, 0)
    upd("after_len", to_rlen, 2)
    upd("len_phase", to_rlen, 0)
    upd("len_left", to_rlen, 0)
    upd("lenv", to_rlen, jnp.minimum(st["vb"], 143))

    # DLITTREE: order-1 literal through p_delta[sctx]; model ctx untouched
    c = is_dlit
    nb = (st["bits_c"] << 1) & 0x1FFFF
    upd("bits_c", c, nb)
    nnode = node * 2 + bit
    upd("node", c, nnode)
    dlit_done = c & (nnode >= 0x100)
    upd("fsm", dlit_done, B_NEXT)

    # ---------------- direct-bit micro-ops -------------------------------
    bcv, bcb = new["bc_val"], new["bc_bits"]
    bc_out, bc_cnt = new["bc_out"], new["bc_cnt"]

    def enc_direct(mask, val, nbits):
        nonlocal bcv, bcb, bc_out, bc_cnt
        nv = ((bcv << jnp.clip(nbits, 0, 31).astype(jnp.uint32))
              | val.astype(jnp.uint32)) & jnp.uint32(MASK32)
        nbt = bcb + nbits
        bcv = jnp.where(mask, nv, bcv)
        bcb = jnp.where(mask, nbt, bcb)
        for _ in range(3):
            emit = mask & (bcb >= 8)
            byte = (bcv >> jnp.clip(bcb - 8, 0, 31).astype(jnp.uint32)) & 0xFF
            bc_out = _scatter1(bc_out,
                               jnp.clip(bc_cnt, 0, bc_out.shape[1] - 1),
                               byte.astype(jnp.uint8), emit)
            bc_cnt = jnp.where(emit, bc_cnt + 1, bc_cnt)
            new["bc_blkmap"] = _log_cross(new["bc_blkmap"], bc_cnt,
                                          new["rc_cnt"], emit, BSIZE_REF[0])
            bcb = jnp.where(emit, bcb - 8, bcb)

    # DISTDIRECT
    c = active & (fsm == B_DISTDIRECT)
    two = st["dir_rem"] > 16
    nbits = jnp.where(two, st["dir_rem"] - 16, st["dir_rem"])
    val = jnp.where(two, (st["dir_val"] >> 16) & 0xFFFF,
                    st["dir_val"] & ((1 << jnp.clip(nbits, 0, 30)) - 1))
    enc_direct(c, val, jnp.where(c, nbits, 0))
    upd("dir_rem", c & two, 16)
    upd("dir_val", c & two, st["dir_val"] & 0xFFFF)
    dd_done = c & ~two
    rev = jnp.asarray(_REV16)[st["elen"] & 0xF]
    upd("bits_c", dd_done, rev | 0x10)
    upd("node", dd_done, 1)
    upd("fsm", dd_done, B_DISTEXTRA)

    # RAW (CompressBad byte payload: tok_a bytes, tok_b bits)
    c = active & (fsm == B_RAW)
    enc_direct(c, jnp.where(c, st["va"].astype(jnp.uint32), 0),
               jnp.where(c, st["vb"], 0))
    upd("fsm", c, B_NEXT)

    # INT (EncodeInt, csc_model.cpp:389-414; values here are < 2^16)
    c = active & (fsm == B_INT)
    v = st["va"]
    slot_i = jnp.maximum(_bitlen(v) - 1, 0)
    ph0 = c & (st["sub_i"] == 0)
    enc_direct(ph0, slot_i, jnp.where(ph0, 5, 0))
    upd("sub_i", ph0, 1)
    ph1 = c & (st["sub_i"] == 1)
    nb1 = jnp.where(slot_i == 0, 1, slot_i)
    vv = jnp.where(slot_i == 0, v, v - (1 << jnp.clip(slot_i, 0, 30)))
    enc_direct(ph1, vv, jnp.where(ph1, nb1, 0))
    upd("fsm", ph1, B_NEXT)

    new["bc_val"], new["bc_bits"] = bcv, bcb
    new["bc_out"], new["bc_cnt"] = bc_out, bc_cnt

    # ---------------- B_FLUSH: chunk flush (csc_coder.cpp:40-74) ---------
    # flush_i 0..4: ShiftLows; 5: bc partial+pad bytes, log chunk, reset.
    c = active & (fsm == B_FLUSH)
    fstep = c & (st["flush_i"] < 5)
    ftrig = fstep & ((st["low"] < jnp.uint32(0xFF000000)) | (st["lowhi"] != 0))
    fcarry = jnp.where(ftrig, st["lowhi"], 0)
    fbyte = (st["cache"] + fcarry) & 0xFF
    new["rc_out"] = _scatter1(new["rc_out"],
                              jnp.clip(new["rc_cnt"], 0,
                                       st["rc_out"].shape[1] - 1),
                              fbyte.astype(jnp.uint8), ftrig)
    new["rc_cnt"] = jnp.where(ftrig, new["rc_cnt"] + 1, new["rc_cnt"])
    new["rc_blkmap"] = _log_cross(new["rc_blkmap"], new["rc_cnt"],
                                  new["bc_cnt"], ftrig, BSIZE_REF[0])
    frun = ftrig & (st["cachesize"] > 1)
    upd("pending", frun, st["cachesize"] - 1)
    upd("pend_carry", frun, fcarry)
    upd("cache", ftrig, ((st["low"] >> 24) & 0xFF).astype(jnp.int32))
    fcs = jnp.where(ftrig, 0, st["cachesize"])
    upd("cachesize", fstep, fcs + 1)
    upd("low", fstep, st["low"] << 8)
    upd("lowhi", fstep, 0)
    upd("flush_i", fstep, st["flush_i"] + 1)

    fdone = c & (st["flush_i"] >= 5)
    # bc partial byte + zero pad
    pb1 = jnp.where(st["bc_bits"] > 0,
                    (st["bc_val"] << (8 - jnp.clip(st["bc_bits"], 0, 8))
                     .astype(jnp.uint32)).astype(jnp.int32) & 0xFF,
                    0)
    bco, bcc = new["bc_out"], new["bc_cnt"]
    bco = _scatter1(bco, jnp.clip(bcc, 0, bco.shape[1] - 1),
                    pb1.astype(jnp.uint8), fdone)
    bcc = jnp.where(fdone, bcc + 1, bcc)
    new["bc_blkmap"] = _log_cross(new["bc_blkmap"], bcc, new["rc_cnt"],
                                  fdone, BSIZE_REF[0])
    bco = _scatter1(bco, jnp.clip(bcc, 0, bco.shape[1] - 1),
                    jnp.zeros_like(pb1).astype(jnp.uint8), fdone)
    bcc = jnp.where(fdone, bcc + 1, bcc)
    new["bc_blkmap"] = _log_cross(new["bc_blkmap"], bcc, new["rc_cnt"],
                                  fdone, BSIZE_REF[0])
    new["bc_out"], new["bc_cnt"] = bco, bcc
    # chunk log entry
    clog = jnp.minimum(st["chunk_cnt"], st["chunk_log"].shape[1] - 1)
    entry = jnp.stack([new["rc_cnt"], bcc], axis=-1)
    old = st["chunk_log"][jnp.arange(B), clog]
    new["chunk_log"] = st["chunk_log"].at[jnp.arange(B), clog].set(
        jnp.where(fdone[:, None], entry, old))
    upd("chunk_cnt", fdone, st["chunk_cnt"] + 1)
    # coder reset (probabilities persist, csc_encoder_main.cpp:141-145)
    upd("low", fdone, jnp.uint32(0))
    upd("lowhi", fdone, 0)
    new["range"] = jnp.where(fdone, jnp.uint32(0xFFFFFFFF), new["range"])
    upd("cache", fdone, 0)
    upd("cachesize", fdone, 1)
    new["bc_val"] = jnp.where(fdone, jnp.uint32(0), new["bc_val"])
    new["bc_bits"] = jnp.where(fdone, 0, new["bc_bits"])
    upd("fsm", fdone, B_NEXT)

    # ---------------- B_NEXT: fetch token --------------------------------
    c = active & (fsm == B_NEXT)
    ti = jnp.clip(st["tok_i"], 0, st["tok_kind"].shape[1] - 1)
    k = _gather(st["tok_kind"], ti)
    a = _gather(st["tok_a"], ti)
    b_ = _gather(st["tok_b"], ti)
    cc = _gather(st["tok_c"], ti)
    upd("tok_i", c, st["tok_i"] + 1)
    upd("kind", c, k)
    upd("va", c, a)
    upd("vb", c, b_)
    upd("vc", c, cc)
    upd("flag_i", c, 0)
    is_end = c & (k == K_END)
    upd("done", is_end, 1)
    upd("fsm", is_end, B_DONE)
    is_int = c & (k == K_INT)
    upd("fsm", is_int, B_INT)
    upd("sub_i", is_int, 0)
    is_fl = c & (k == K_FLUSH)
    upd("fsm", is_fl, B_FLUSH)
    upd("flush_i", is_fl, 0)
    is_raw = c & (k == K_RAW)
    upd("fsm", is_raw, B_RAW)
    # ELIT: straight into the literal tree, no LZ flags, mstate untouched
    # (CompressLiterals, csc_model.cpp:448-461)
    is_el = c & (k == K_ELIT)
    upd("fsm", is_el, B_LITTREE)
    upd("node", is_el, 1)
    upd("bits_c", is_el, a | 0x100)
    # DLIT/RLEN: CompressRLE tokens lead with the p_rle_flag bit
    is_dl = c & ((k == K_DLIT) | (k == K_RLEN))
    upd("fsm", is_dl, B_RLEFLAG)
    is_tok = c & (k != K_END) & (k != K_INT) & (k != K_FLUSH) \
        & (k != K_RAW) & (k != K_ELIT) & (k != K_DLIT) & (k != K_RLEN)
    upd("fsm", is_tok, B_FLAG)

    # ---------------- carry-run drain ------------------------------------
    run_byte = ((0xFF + st["pend_carry"]) & 0xFF)
    new["rc_out"] = _scatter1(new["rc_out"],
                              jnp.clip(new["rc_cnt"], 0,
                                       st["rc_out"].shape[1] - 1),
                              jnp.full_like(run_byte, 0).astype(jnp.uint8)
                              + run_byte.astype(jnp.uint8), draining)
    drained_cnt = jnp.where(draining, new["rc_cnt"] + 1, new["rc_cnt"])
    new["rc_blkmap"] = _log_cross(new["rc_blkmap"], drained_cnt,
                                  new["bc_cnt"], draining, BSIZE_REF[0])
    new["rc_cnt"] = drained_cnt
    new["pending"] = jnp.where(draining, st["pending"] - 1, new["pending"])
    return new


def run_bits(st, max_steps):
    def cond(carry):
        s, i = carry
        return (i < max_steps) & ~jnp.all(s["done"] == 1)

    def body(carry):
        s, i = carry
        return encode_bits_step(s), i + 1

    final, steps = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return final, steps
