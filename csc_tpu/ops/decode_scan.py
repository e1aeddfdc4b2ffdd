"""Batched CSC stream decoder: B independent streams decoded in lockstep on
TPU as one jitted while-loop.

Design (SURVEY.md §7 "hard parts" #1): the CSC token stream is bit-serial
per stream — every range-coder bit depends on the previous bit's coder
state, and window bytes may depend on the immediately preceding byte.  The
TPU-native answer is *lockstep multi-stream decoding*: each loop step
executes exactly one micro-op per stream — decode one range-coder bit,
read <=16 direct bits, or copy <=16 window bytes — over the whole batch in
VPU lanes.  Parallelism comes from the batch (archiver tasks / -p splits),
the reference's own parallelism model (csarc.cpp:338-474) mapped onto one
chip.

Bit-exactness contract: identical to CSCDecoder (csc_dec.cpp) for streams
whose decoded size fits the dictionary (no ring wrap) — the archiver
guarantees this by construction (dict = min(dict, task size),
csa_worker.cpp:35).  Inverse filters for DT_EXE / DT_ENGTXT blocks are
applied on host from the recorded block log (window semantics preserved:
the window keeps filtered data, csc_dec.cpp:596-609); DT_DLT inverse-delta
is fused into the scan (the window must hold unfiltered data there,
csc_dec.cpp:644-651) by exploiting that RLE decode order equals the
inverse-delta's channel-major traversal order.

State machine: 22 FSM states, four micro-op classes (BIT / DIRECT / COPY /
IDLE).  All transitions are masked vector selects over disjoint per-stream
conditions; probability tables live in one [B, NP] i32 array, windows in
[B, W] u8.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..constants import (DIST_TABLE, REV16_TABLE, DT_NORMAL, DT_EXE,
                         DT_ENGTXT, DT_BAD, DT_ENTROPY, SIG_EOF, DT_DLT,
                         DLT_INDEX)

# ---------------------------------------------------------------- layout
P_STATE = 0            # 64*3
P_REPDIST = 192        # 64*3
P_DIST = 384           # 8 + 16*2 + 32*4 = 168
P_MDEXTRA = 552        # 29*16
P_MLSLOT = 1016        # 2
P_MLEX1 = 1018         # 8
P_MLEX2 = 1026         # 8
P_MLEX3 = 1034         # 128
P_LONGLEN = 1162
P_RLEFLAG = 1163
P_LIT = 2048           # 65536
P_DELTA = 67584        # 65536
NPROB = 133120

# ---------------------------------------------------------------- fsm ids
F_IDLE = 0
F_FLAG1 = 1
F_FLAG2 = 2
F_FLAG3 = 3
F_LITTREE = 4
F_REPTREE = 5
F_LENSLOT0 = 6
F_LENSLOT1 = 7
F_LENTREE3 = 8
F_LENTREE7 = 9
F_LONGLEN = 10
F_DISTSLOT = 11
F_DISTEXTRA = 12
F_RLEFLAG = 13
F_RLETREE = 14
F_ENTTREE = 15
F_INTSLOT = 16
F_INTNUM = 17
F_DISTDIRECT = 18
F_BADBYTES = 19
F_COPY = 20
F_RLERUN = 21

_OP_BIT = 0
_OP_DIRECT = 1
_OP_COPY = 2
_OP_IDLE = 3
_OPCLASS = np.full(22, _OP_BIT, np.int32)
_OPCLASS[F_IDLE] = _OP_IDLE
for _f in (F_INTSLOT, F_INTNUM, F_DISTDIRECT, F_BADBYTES):
    _OPCLASS[_f] = _OP_DIRECT
for _f in (F_COPY, F_RLERUN):
    _OPCLASS[_f] = _OP_COPY

# int_purpose codes
IP_BLOCKTYPE = 0
IP_CONT = 1
IP_SIZE_BAD = 2
IP_SIZE_ENT = 3
IP_SIZE_RLE = 4
IP_SIZE_TXT = 5

# len_for codes
LF_MATCH = 0
LF_REP = 1
LF_RLE = 2

_DIST_TABLE = np.array(DIST_TABLE, np.int64)
_REV16 = np.array(REV16_TABLE, np.int32)
_DLT_CHN = np.zeros(32, np.int32)
for _i, _c in enumerate(DLT_INDEX):
    _DLT_CHN[DT_DLT + _i] = _c

COPY_CHUNK = 16
MASK32 = 0xFFFFFFFF


def _dist_pos_bits_np():
    # slot-tree segment by wire length (csc_model.cpp:308-329), tabulated
    # for wire lengths 0..6+ (clamped at 6).
    pos = np.zeros(7, np.int32)
    bits = np.zeros(7, np.int32)
    for ln in range(7):
        if ln == 0:
            pos[ln], bits[ln] = 0, 3
        elif ln <= 2:
            pos[ln], bits[ln] = 16 * (ln - 1) + 8, 4
        elif ln <= 5:
            pos[ln], bits[ln] = 32 * (ln - 3) + 8 + 16 * 2, 5
        else:
            pos[ln], bits[ln] = 32 * 3 + 8 + 16 * 2, 5
    return pos, bits


_PDIST_POS, _PDIST_BITS = _dist_pos_bits_np()

_INT_REGS = [
    "rc_ptr", "rc_blk", "bc_bits", "bc_ptr", "bc_blk",
    "fsm", "int_purpose", "int_slot", "direct_acc", "direct_rem",
    "mstate", "ctx", "wnd_pos", "node", "len_acc", "len_phase", "len_for",
    "len_base", "len_tbl", "wire_len", "rep_idx", "slot", "ebits", "elen",
    "pdist_pos", "sbits", "dist", "cpy_src", "cpy_rem", "size_rem",
    "blk_size", "chn", "rle_i", "rle_rel", "prev", "last_delta", "sctx",
    "eof", "done", "err", "blk_start", "blk_cnt",
]


def make_decode_state(batch, wnd_size, rc, bc, rc_ends, bc_ends,
                      max_blocks=4096):
    """Build the initial device state dict.  rc/bc: [B, L] u8 padded;
    *_ends: [B, NB] i32 padded with sentinel 0x7FFFFFFF."""
    st = {}
    st["probs"] = jnp.full((batch, NPROB), 2048, jnp.int32)
    # +COPY_CHUNK slack: 16-wide copy writes ending exactly at
    # wnd_size must not clip (duplicate clipped indices would
    # overwrite the final byte with stale lanes)
    st["wnd"] = jnp.zeros((batch, wnd_size + COPY_CHUNK), jnp.uint8)
    st["rc"] = jnp.asarray(rc)
    st["bc"] = jnp.asarray(bc)
    st["rc_ends"] = jnp.asarray(rc_ends)
    st["bc_ends"] = jnp.asarray(bc_ends)

    z = jnp.zeros(batch, jnp.int32)
    for name in _INT_REGS:
        st[name] = z
    # coder priming (csc_dec.cpp:336-345): rc_code from rc bytes 1..4
    code = ((rc[:, 1].astype(np.uint32) << 24)
            | (rc[:, 2].astype(np.uint32) << 16)
            | (rc[:, 3].astype(np.uint32) << 8)
            | rc[:, 4].astype(np.uint32))
    st["rc_code"] = jnp.asarray(code.astype(np.uint32))
    st["rc_range"] = jnp.full(batch, MASK32, jnp.uint32)
    st["rc_ptr"] = z + 5
    st["bc_val"] = jnp.zeros(batch, jnp.uint32)
    st["fsm"] = z + F_INTSLOT
    st["direct_rem"] = z + 5
    st["reps"] = jnp.zeros((batch, 4), jnp.int32)
    st["blk_log"] = jnp.zeros((batch, max_blocks, 2), jnp.int32)
    return st


def _gather(tbl, idx):
    return jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]


def _scatter_rows(arr, idx, vals):
    """arr[b, idx[b, k]] = vals[b, k] (vals pre-blended with old values)."""
    rows = jnp.broadcast_to(jnp.arange(arr.shape[0])[:, None], idx.shape)
    flat_idx = rows * arr.shape[1] + idx
    return arr.reshape(-1).at[flat_idx.reshape(-1)].set(
        vals.reshape(-1)).reshape(arr.shape)


def decode_step(st, wnd_size):
    """One lockstep micro-op for every stream.  Pure function of state."""
    B = st["fsm"].shape[0]
    barange = jnp.arange(B)
    opclass = jnp.asarray(_OPCLASS)[st["fsm"]]
    active = st["done"] == 0
    fsm = st["fsm"]
    node = st["node"]
    mstate3 = st["mstate"] * 3

    # =============================== BIT micro-op ========================
    is_bit = (opclass == _OP_BIT) & active

    pidx = jnp.select(
        [fsm == F_FLAG1, fsm == F_FLAG2, fsm == F_FLAG3,
         fsm == F_LITTREE, fsm == F_REPTREE,
         fsm == F_LENSLOT0, fsm == F_LENSLOT1,
         fsm == F_LENTREE3, fsm == F_LENTREE7, fsm == F_LONGLEN,
         fsm == F_DISTSLOT, fsm == F_DISTEXTRA,
         fsm == F_RLEFLAG, fsm == F_RLETREE, fsm == F_ENTTREE],
        [P_STATE + mstate3, P_STATE + mstate3 + 1, P_STATE + mstate3 + 2,
         P_LIT + st["ctx"] * 256 + node, P_REPDIST + mstate3 + node - 1,
         jnp.full_like(node, P_MLSLOT), jnp.full_like(node, P_MLSLOT + 1),
         jnp.where(st["len_tbl"] == 1, P_MLEX1, P_MLEX2) + node,
         P_MLEX3 + node, jnp.full_like(node, P_LONGLEN),
         P_DIST + st["pdist_pos"] + node,
         P_MDEXTRA + (st["ebits"] - 1) * 16 + node,
         jnp.full_like(node, P_RLEFLAG), P_DELTA + st["sctx"] * 256 + node,
         P_LIT + st["ctx"] * 256 + node],
        default=jnp.zeros_like(node))
    pidx = jnp.where(is_bit, pidx, 0)

    # range-coder refill BEFORE the bit (csc_dec.cpp:11-22)
    need_refill = is_bit & (st["rc_range"] < jnp.uint32(1 << 24))
    rng = jnp.where(need_refill, st["rc_range"] << 8, st["rc_range"])
    rbyte = _gather(st["rc"], jnp.minimum(st["rc_ptr"],
                                          st["rc"].shape[1] - 1)).astype(jnp.uint32)
    code = jnp.where(need_refill,
                     (st["rc_code"] << 8) + rbyte, st["rc_code"])
    rc_ptr = jnp.where(need_refill, st["rc_ptr"] + 1, st["rc_ptr"])
    rc_blk = jnp.where(need_refill & (rc_ptr >= _gather(st["rc_ends"], st["rc_blk"])),
                       st["rc_blk"] + 1, st["rc_blk"])

    p = _gather(st["probs"], pidx).astype(jnp.uint32)
    bound = (rng >> 12) * p
    bit = (code < bound) & is_bit
    new_p = jnp.where(bit, p + ((0xFFF - p) >> 5), p - (p >> 5))
    new_p = jnp.where(is_bit, new_p, p)
    probs = st["probs"].at[barange, pidx].set(new_p.astype(jnp.int32))
    rng = jnp.where(is_bit, jnp.where(bit, bound, rng - bound), rng)
    code = jnp.where(is_bit & ~bit, code - bound, code)

    # =============================== DIRECT micro-op =====================
    is_dir = (opclass == _OP_DIRECT) & active
    two_phase = st["direct_rem"] > 16
    nbits = jnp.where(two_phase, st["direct_rem"] - 16, st["direct_rem"])
    nbits = jnp.where(fsm == F_BADBYTES,
                      jnp.where(st["size_rem"] >= 2, 16, 8), nbits)
    nbits = jnp.where(is_dir, nbits, 0)

    bc_val, bc_bits = st["bc_val"], st["bc_bits"]
    bc_ptr, bc_blk = st["bc_ptr"], st["bc_blk"]
    for _ in range(3):  # <= 2 byte refills for 16 bits + 1 slack
        need = is_dir & (bc_bits < nbits)
        bbyte = _gather(st["bc"], jnp.minimum(bc_ptr,
                                              st["bc"].shape[1] - 1)).astype(jnp.uint32)
        bc_val = jnp.where(need, (bc_val << 8) | bbyte, bc_val)
        bc_ptr = jnp.where(need, bc_ptr + 1, bc_ptr)
        bc_blk = jnp.where(need & (bc_ptr >= _gather(st["bc_ends"], bc_blk)),
                           bc_blk + 1, bc_blk)
        bc_bits = jnp.where(need, bc_bits + 8, bc_bits)
    shift = jnp.maximum(bc_bits - nbits, 0).astype(jnp.uint32)
    mask = ((jnp.uint32(1) << nbits.astype(jnp.uint32)) - 1)
    dval = jnp.where(is_dir, (bc_val >> shift) & mask, 0).astype(jnp.int32)
    bc_bits = jnp.where(is_dir, bc_bits - nbits, bc_bits)

    # =============================== COPY micro-op =======================
    is_mcopy = (fsm == F_COPY) & active
    is_rrun = (fsm == F_RLERUN) & active

    karange = jnp.arange(COPY_CHUNK, dtype=jnp.int32)
    chunk = jnp.minimum(st["cpy_rem"], COPY_CHUNK)
    safe_dist = jnp.maximum(st["dist"], 1)
    # overlap-safe: byte k of the chunk = wnd[cpy_src + (k mod dist)]
    wnd_cap = wnd_size + COPY_CHUNK
    src_idx = st["cpy_src"][:, None] + (karange[None, :] % safe_dist[:, None])
    src_idx = jnp.clip(src_idx, 0, wnd_cap - 1)
    src_bytes = jnp.take_along_axis(st["wnd"], src_idx, axis=1)
    dst_idx = jnp.clip(st["wnd_pos"][:, None] + karange[None, :], 0, wnd_cap - 1)
    write_mask = is_mcopy[:, None] & (karange[None, :] < chunk[:, None])

    # ========================== transitions ==============================
    new = dict(st)

    def upd(name, cond, val):
        new[name] = jnp.where(cond, val, new[name])

    # --- FLAG1
    c = is_bit & (fsm == F_FLAG1)
    upd("fsm", c & bit, F_FLAG2)
    upd("fsm", c & ~bit, F_LITTREE)
    upd("node", c & ~bit, 1)

    # --- FLAG2
    c = is_bit & (fsm == F_FLAG2)
    cb = c & bit
    upd("fsm", cb, F_LENSLOT0)
    upd("len_for", cb, LF_MATCH)
    upd("len_acc", cb, 0)
    upd("len_phase", cb, 0)
    upd("fsm", c & ~bit, F_FLAG3)

    # --- FLAG3
    c = is_bit & (fsm == F_FLAG3)
    c0 = c & ~bit   # rep0len1 (csc_dec.cpp:523-529)
    rep0 = st["reps"][:, 0]
    upd("mstate", c0, (st["mstate"] * 4 + 2) & 0x3F)
    upd("dist", c0, rep0)
    # strict '>' quirk (csc_dec.cpp:525)
    upd("cpy_src", c0, jnp.where(st["wnd_pos"] > rep0,
                                 st["wnd_pos"] - rep0,
                                 st["wnd_pos"] + wnd_size - rep0))
    upd("cpy_rem", c0, 1)
    upd("fsm", c0, F_COPY)
    cb = c & bit
    upd("fsm", cb, F_REPTREE)
    upd("node", cb, 1)

    # --- LITTREE
    c = is_bit & (fsm == F_LITTREE)
    nnode = node * 2 + bit
    lit_done = c & (nnode >= 0x100)
    lit_byte = (nnode & 0xFF).astype(jnp.int32)
    upd("node", c, nnode)
    upd("ctx", lit_done, lit_byte)
    upd("mstate", lit_done, (st["mstate"] * 4) & 0x3F)
    upd("wnd_pos", lit_done, st["wnd_pos"] + 1)
    upd("fsm", lit_done, F_FLAG1)
    lit_write = lit_done

    # --- REPTREE
    c = is_bit & (fsm == F_REPTREE)
    rep_done = c & (nnode >= 4)
    upd("node", c, nnode)
    upd("rep_idx", rep_done, nnode & 3)
    upd("fsm", rep_done, F_LENSLOT0)
    upd("len_for", rep_done, LF_REP)
    upd("len_acc", rep_done, 0)
    upd("len_phase", rep_done, 0)

    # --- LENSLOT0 / LENSLOT1
    c = is_bit & (fsm == F_LENSLOT0)
    cb = c & ~bit
    upd("fsm", cb, F_LENTREE3)
    upd("len_tbl", cb, 1)
    upd("len_base", cb, 0)
    upd("node", cb, 1)
    upd("fsm", c & bit, F_LENSLOT1)
    c = is_bit & (fsm == F_LENSLOT1)
    cb = c & ~bit
    upd("fsm", cb, F_LENTREE3)
    upd("len_tbl", cb, 2)
    upd("len_base", cb, 8)
    upd("node", cb, 1)
    cb = c & bit
    upd("fsm", cb, F_LENTREE7)
    upd("len_base", cb, 16)
    upd("node", cb, 1)

    # --- LENTREE3 / LENTREE7 -> len_complete
    c3 = is_bit & (fsm == F_LENTREE3)
    c7 = is_bit & (fsm == F_LENTREE7)
    done3 = c3 & (nnode >= 0x8)
    done7 = c7 & (nnode >= 0x80)
    upd("node", c3 | c7, nnode)
    lenv = jnp.where(done3, st["len_base"] + (nnode & 0x7),
                     st["len_base"] + (nnode & 0x7F))
    len_complete = done3 | done7

    goes_long = len_complete & (st["len_phase"] == 0) & (lenv == 143)
    upd("fsm", goes_long, F_LONGLEN)
    upd("len_acc", goes_long, 143)
    wl = jnp.where(st["len_phase"] == 0, lenv, st["len_acc"] + lenv)
    len_done = len_complete & ~goes_long
    upd("wire_len", len_done, wl)

    # --- LONGLEN
    c = is_bit & (fsm == F_LONGLEN)
    upd("len_acc", c & ~bit, st["len_acc"] + 143)
    cb = c & bit
    upd("fsm", cb, F_LENSLOT0)
    upd("len_phase", cb, 1)

    # --- len_done dispatch
    ld_match = len_done & (st["len_for"] == LF_MATCH)
    upd("fsm", ld_match, F_DISTSLOT)
    upd("node", ld_match, 1)
    wl_c = jnp.minimum(wl, 6)
    upd("pdist_pos", ld_match, jnp.asarray(_PDIST_POS)[wl_c])
    upd("sbits", ld_match, jnp.asarray(_PDIST_BITS)[wl_c])

    ld_rep = len_done & (st["len_for"] == LF_REP)
    upd("mstate", ld_rep, (st["mstate"] * 4 + 3) & 0x3F)
    rdist = _gather(st["reps"], st["rep_idx"])
    # rotate reps[0..rep_idx] (csc_dec.cpp:538-541)
    shifted = jnp.concatenate([rdist[:, None], st["reps"][:, :3]], axis=1)
    reps_rot = jnp.where(jnp.arange(4)[None, :] <= st["rep_idx"][:, None],
                         shifted, st["reps"])
    upd("reps", ld_rep[:, None], reps_rot)
    upd("dist", ld_rep, rdist)
    upd("cpy_src", ld_rep, st["wnd_pos"] - rdist)
    upd("cpy_rem", ld_rep, wl + 2)
    upd("fsm", ld_rep, F_COPY)

    ld_rle = len_done & (st["len_for"] == LF_RLE)
    upd("fsm", ld_rle, F_RLERUN)
    upd("cpy_rem", ld_rle, wl + 11)

    # --- DISTSLOT
    c = is_bit & (fsm == F_DISTSLOT)
    sdone = c & (nnode >= (1 << st["sbits"]))
    upd("node", c, nnode)
    slot = nnode & ((1 << st["sbits"]) - 1)
    upd("slot", sdone, slot)
    small = sdone & (slot <= 2)
    big = sdone & (slot > 2)
    ebits = slot - 2
    upd("ebits", big, ebits)
    upd("elen", big, 0)
    need_direct = big & (ebits > 4)
    upd("fsm", need_direct, F_DISTDIRECT)
    upd("direct_rem", need_direct, ebits - 4)
    upd("direct_acc", need_direct, 0)
    cb = big & ~need_direct
    upd("fsm", cb, F_DISTEXTRA)
    upd("node", cb, 1)

    # --- DISTEXTRA
    c = is_bit & (fsm == F_DISTEXTRA)
    edone = c & (nnode >= 0x10)
    upd("node", c, nnode)
    dist_big = (jnp.asarray(_DIST_TABLE.astype(np.int32))[jnp.clip(st["slot"], 0, 32)]
                + (st["elen"] << 4) + jnp.asarray(_REV16)[nnode & 0xF])

    # --- match_complete (from `small` or `edone`)
    mc = small | edone
    dist_raw = jnp.where(small, slot, dist_big)
    upd("mstate", mc, (st["mstate"] * 4 + 1) & 0x3F)
    sentinel = mc & (st["wire_len"] == 0) & (dist_raw == 64)
    normal_match = mc & ~sentinel
    nd = dist_raw + 1
    upd("dist", normal_match, nd)
    reps_push = jnp.concatenate([nd[:, None], st["reps"][:, :3]], axis=1)
    upd("reps", normal_match[:, None], reps_push)
    upd("cpy_src", normal_match, st["wnd_pos"] - nd)
    upd("cpy_rem", normal_match, st["wire_len"] + 2)
    upd("fsm", normal_match, F_COPY)
    # LZ block end -> continuation int
    upd("fsm", sentinel, F_INTSLOT)
    upd("int_purpose", sentinel, IP_CONT)
    upd("direct_rem", sentinel, 5)

    # --- RLEFLAG
    c = is_bit & (fsm == F_RLEFLAG)
    cb = c & ~bit
    upd("fsm", cb, F_RLETREE)
    upd("node", cb, 1)
    cb = c & bit
    upd("fsm", cb, F_LENSLOT0)
    upd("len_for", cb, LF_RLE)
    upd("len_acc", cb, 0)
    upd("len_phase", cb, 0)

    # --- RLETREE (delta-domain literal; fused inverse-delta + interleave)
    c = is_bit & (fsm == F_RLETREE)
    rdone = c & (nnode >= 0x100)
    upd("node", c, nnode)
    delta_byte = (nnode & 0xFF).astype(jnp.int32)
    rle_orig = (delta_byte + st["prev"]) & 0xFF
    upd("prev", rdone, rle_orig)
    upd("last_delta", rdone, delta_byte)
    upd("sctx", rdone, delta_byte)
    rle_write = rdone
    rle_wpos = st["blk_start"] + st["rle_rel"]
    sz = st["blk_size"]
    nrel = st["rle_rel"] + st["chn"]
    upd("rle_rel", rdone, jnp.where(nrel >= sz, st["rle_i"] + 1, nrel))
    upd("rle_i", rdone, jnp.where(nrel >= sz, st["rle_i"] + 1, st["rle_i"]))
    nszrem = st["size_rem"] - 1
    upd("size_rem", rdone, nszrem)
    rle_blk_done = rdone & (nszrem == 0)
    upd("fsm", rdone & ~rle_blk_done, F_RLEFLAG)
    upd("fsm", rle_blk_done, F_INTSLOT)
    upd("int_purpose", rle_blk_done, IP_CONT)
    upd("direct_rem", rle_blk_done, 5)
    upd("wnd_pos", rle_blk_done, st["blk_start"] + sz)

    # --- ENTTREE
    c = is_bit & (fsm == F_ENTTREE)
    ent_done = c & (nnode >= 0x100)
    upd("node", c, nnode)
    ent_byte = (nnode & 0xFF).astype(jnp.int32)
    upd("ctx", ent_done, ent_byte)
    ent_write = ent_done
    upd("wnd_pos", ent_done, st["wnd_pos"] + 1)
    nszrem2 = st["size_rem"] - 1
    upd("size_rem", ent_done, nszrem2)
    ent_blk_done = ent_done & (nszrem2 == 0)
    upd("node", ent_done & ~ent_blk_done, 1)
    upd("fsm", ent_blk_done, F_INTSLOT)
    upd("int_purpose", ent_blk_done, IP_CONT)
    upd("direct_rem", ent_blk_done, 5)

    # ====================== DIRECT transitions ===========================
    # --- INTSLOT
    c = is_dir & (fsm == F_INTSLOT)
    upd("int_slot", c, dval)
    upd("fsm", c, F_INTNUM)
    upd("direct_rem", c, jnp.maximum(dval, 1))
    upd("direct_acc", c, 0)

    # --- INTNUM (two-phase for slot > 16)
    c = is_dir & (fsm == F_INTNUM)
    ph1 = c & two_phase
    upd("direct_acc", ph1, dval)
    upd("direct_rem", ph1, 16)
    cdone = c & ~two_phase
    num = ((st["direct_acc"] << nbits) | dval) + jnp.where(
        st["int_slot"] > 0, 1 << jnp.minimum(st["int_slot"], 30), 0)

    ip = st["int_purpose"]
    bt = cdone & (ip == IP_BLOCKTYPE)
    logpos = jnp.minimum(st["blk_cnt"], st["blk_log"].shape[1] - 1)
    entry = jnp.stack([num, st["wnd_pos"]], axis=-1)
    old_entry = st["blk_log"][barange, logpos]
    new["blk_log"] = st["blk_log"].at[barange, logpos].set(
        jnp.where(bt[:, None], entry, old_entry))
    upd("blk_cnt", bt, st["blk_cnt"] + 1)
    upd("blk_start", bt, st["wnd_pos"])

    upd("fsm", bt & ((num == DT_NORMAL) | (num == DT_EXE)), F_FLAG1)

    def to_int(cond, purpose):
        upd("fsm", cond, F_INTSLOT)
        upd("int_purpose", cond, purpose)
        upd("direct_rem", cond, 5)

    to_int(bt & (num == DT_ENGTXT), IP_SIZE_TXT)
    to_int(bt & (num == DT_BAD), IP_SIZE_BAD)
    to_int(bt & (num == DT_ENTROPY), IP_SIZE_ENT)
    t_eof = bt & (num == SIG_EOF)
    upd("eof", t_eof, 1)
    to_int(t_eof, IP_CONT)
    t_dlt = bt & (num >= DT_DLT) & (num < DT_DLT + 5)
    to_int(t_dlt, IP_SIZE_RLE)
    upd("chn", t_dlt, jnp.asarray(_DLT_CHN)[jnp.clip(num, 0, 31)])
    # invalid block type: the reference throws DECODE_ERROR
    # (csc_dec.cpp:653); stop the stream and surface err on host
    bad_type = bt & ~((num == DT_NORMAL) | (num == DT_EXE)
                      | (num == DT_ENGTXT) | (num == DT_BAD)
                      | (num == DT_ENTROPY) | (num == SIG_EOF)
                      | ((num >= DT_DLT) & (num < DT_DLT + 5)))
    upd("err", bad_type, 1)
    upd("done", bad_type, 1)

    sb = cdone & (ip == IP_SIZE_BAD)
    upd("size_rem", sb, num)
    upd("fsm", sb & (num > 0), F_BADBYTES)
    to_int(sb & (num == 0), IP_CONT)

    se = cdone & (ip == IP_SIZE_ENT)
    upd("size_rem", se, num)
    upd("node", se, 1)
    upd("fsm", se & (num > 0), F_ENTTREE)
    to_int(se & (num == 0), IP_CONT)

    sr = cdone & (ip == IP_SIZE_RLE)
    upd("size_rem", sr, num)
    upd("blk_size", sr, num)
    upd("prev", sr, 0)
    upd("sctx", sr, 0)
    upd("last_delta", sr, 0)
    upd("rle_i", sr, 0)
    upd("rle_rel", sr, 0)
    upd("fsm", sr & (num > 0), F_RLEFLAG)
    to_int(sr & (num == 0), IP_CONT)

    upd("fsm", cdone & (ip == IP_SIZE_TXT), F_FLAG1)

    # --- CONT: num==1 -> chunk reset (csc_dec.cpp:657-680)
    ct = cdone & (ip == IP_CONT)
    reset = ct & (num == 1)
    r_blk = st["rc_blk"] + 1
    r_start = _gather(st["rc_ends"], jnp.maximum(r_blk - 1, 0))
    rcl = st["rc"].shape[1] - 1

    def rc_byte_at(off):
        return _gather(st["rc"], jnp.clip(r_start + off, 0, rcl)).astype(jnp.uint32)

    prime = ((rc_byte_at(1) << 24) | (rc_byte_at(2) << 16)
             | (rc_byte_at(3) << 8) | rc_byte_at(4))
    upd("rc_blk", reset, r_blk)
    reset_rc_ptr = r_start + 5
    b_blk = st["bc_blk"] + 1
    b_start = _gather(st["bc_ends"], jnp.maximum(b_blk - 1, 0))
    upd("bc_blk", reset, b_blk)
    reset_bc_ptr = b_start

    fin = ct & (st["eof"] == 1)
    upd("done", fin, 1)
    upd("fsm", fin, F_IDLE)
    to_int(ct & (st["eof"] == 0), IP_BLOCKTYPE)

    # --- DISTDIRECT
    c = is_dir & (fsm == F_DISTDIRECT)
    ph1 = c & two_phase
    upd("direct_acc", ph1, dval)
    upd("direct_rem", ph1, 16)
    cd = c & ~two_phase
    upd("elen", cd, (st["direct_acc"] << nbits) | dval)
    upd("fsm", cd, F_DISTEXTRA)
    upd("node", cd, 1)

    # --- BADBYTES: dval holds 1-2 big-endian raw bytes
    c = is_dir & (fsm == F_BADBYTES)
    wrote2 = c & (nbits == 16)
    bad_b0 = jnp.where(wrote2, dval >> 8, dval) & 0xFF
    bad_b1 = dval & 0xFF
    nwr = jnp.where(wrote2, 2, 1)
    upd("wnd_pos", c, st["wnd_pos"] + nwr)
    nszb = st["size_rem"] - nwr
    upd("size_rem", c, nszb)
    to_int(c & (nszb == 0), IP_CONT)
    bad_write = c

    # ====================== COPY transitions =============================
    c = is_mcopy
    upd("cpy_src", c, st["cpy_src"] + chunk)
    upd("wnd_pos", c, st["wnd_pos"] + chunk)
    ncrem = st["cpy_rem"] - chunk
    upd("cpy_rem", c, ncrem)
    copy_done = c & (ncrem == 0)
    last_off = jnp.clip(chunk - 1, 0, COPY_CHUNK - 1)
    last_byte = jnp.take_along_axis(src_bytes, last_off[:, None], axis=1)[:, 0]
    upd("ctx", copy_done, last_byte.astype(jnp.int32))
    upd("fsm", copy_done, F_FLAG1)

    # --- RLE run: one byte/step, constant delta added in original domain
    c = is_rrun
    run_orig = (st["last_delta"] + st["prev"]) & 0xFF
    upd("prev", c, run_orig)
    run_wpos = st["blk_start"] + st["rle_rel"]
    nrel2 = st["rle_rel"] + st["chn"]
    sz2 = st["blk_size"]
    upd("rle_rel", c, jnp.where(nrel2 >= sz2, st["rle_i"] + 1, nrel2))
    upd("rle_i", c, jnp.where(nrel2 >= sz2, st["rle_i"] + 1, st["rle_i"]))
    nrun = st["cpy_rem"] - 1
    nsz3 = st["size_rem"] - 1
    upd("cpy_rem", c, nrun)
    upd("size_rem", c, nsz3)
    upd("sctx", c, st["last_delta"])
    rle_done2 = c & (nsz3 == 0)
    run_end = c & (nrun == 0) & ~rle_done2
    upd("fsm", run_end, F_RLEFLAG)
    upd("fsm", rle_done2, F_INTSLOT)
    upd("int_purpose", rle_done2, IP_CONT)
    upd("direct_rem", rle_done2, 5)
    upd("wnd_pos", rle_done2, st["blk_start"] + sz2)
    run_write = c

    # ====================== window writes ================================
    wnd = st["wnd"]
    cur16 = jnp.take_along_axis(wnd, dst_idx, axis=1)
    blended = jnp.where(write_mask, src_bytes, cur16)
    wnd = _scatter_rows(wnd, dst_idx, blended)

    one_mask = lit_write | ent_write | rle_write | run_write | bad_write
    one_pos = jnp.select(
        [lit_write, ent_write, rle_write, run_write, bad_write],
        [st["wnd_pos"], st["wnd_pos"], rle_wpos, run_wpos, st["wnd_pos"]],
        default=jnp.zeros_like(node))
    one_val = jnp.select(
        [lit_write, ent_write, rle_write, run_write, bad_write],
        [lit_byte, ent_byte, rle_orig, run_orig, bad_b0],
        default=jnp.zeros_like(node)).astype(jnp.uint8)
    one_pos = jnp.clip(one_pos, 0, wnd_cap - 1)
    wnd = wnd.at[barange, one_pos].set(
        jnp.where(one_mask, one_val, wnd[barange, one_pos]))
    two_pos = jnp.clip(st["wnd_pos"] + 1, 0, wnd_cap - 1)
    wnd = wnd.at[barange, two_pos].set(
        jnp.where(wrote2, bad_b1.astype(jnp.uint8), wnd[barange, two_pos]))

    new["wnd"] = wnd
    new["probs"] = probs
    new["rc_code"] = jnp.where(reset, prime,
                               jnp.where(is_bit, code, st["rc_code"]))
    new["rc_range"] = jnp.where(reset, jnp.uint32(MASK32),
                                jnp.where(is_bit, rng, st["rc_range"]))
    new["rc_ptr"] = jnp.where(reset, reset_rc_ptr,
                              jnp.where(need_refill, rc_ptr, st["rc_ptr"]))
    new["rc_blk"] = jnp.where(reset, new["rc_blk"],
                              jnp.where(is_bit, rc_blk, new["rc_blk"]))
    new["bc_val"] = jnp.where(reset, jnp.uint32(0),
                              jnp.where(is_dir, bc_val, st["bc_val"]))
    new["bc_bits"] = jnp.where(reset, 0,
                               jnp.where(is_dir, bc_bits, st["bc_bits"]))
    new["bc_ptr"] = jnp.where(reset, reset_bc_ptr,
                              jnp.where(is_dir, bc_ptr, st["bc_ptr"]))
    new["bc_blk"] = jnp.where(reset, new["bc_blk"],
                              jnp.where(is_dir, bc_blk, new["bc_blk"]))
    return new


def run_decode(st, wnd_size, max_steps):
    """Jitted while-loop over decode_step until every stream is done."""

    def cond(carry):
        st_, steps = carry
        return (steps < max_steps) & ~jnp.all(st_["done"] == 1)

    def body(carry):
        st_, steps = carry
        return decode_step(st_, wnd_size), steps + 1

    final, steps = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
    return final, steps


run_decode_jit = jax.jit(run_decode, static_argnums=(1,))
