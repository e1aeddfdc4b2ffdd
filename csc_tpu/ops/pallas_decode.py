"""Pallas lockstep CSC decoder: B independent streams, one mega-kernel.

This is the TPU-native port of the bit-exact FSM in decode_scan.py
(csc_dec.cpp:476-682 semantics).  Design constraints are the measured
axon/Mosaic facts (see tools/spike_marginal.py, tools/spike_dma.py):

* ~24 ms fixed overhead per device call -> the WHOLE decode runs inside
  one pallas_call (internal while_loop over micro-op steps).
* No per-lane gather/scatter primitives -> all dynamic access is one-hot
  over <=2048-lane VMEM tiles (full-window vector passes are ~5 us and
  banned).
* DMA slices must be (8,128)-tile aligned -> every HBM-resident array is
  laid out [B, S, 128] i32 ("byte per lane"), moved in 1024-element
  blocks; per-stream staging tiles in VMEM:
    out_tile [B,16,128]  ring of the 2 most recent 1KB output blocks
    rd_tile  [B,16,128]  2-block copy-source window (refetched on miss)
    rc_tile/bc_tile [B,16,128]  2-block coder-input windows
    grp      [B,16,128]  2 slots of one 4-ctx-row literal/delta prob
                         group (p_lit/p_delta stay in HBM, csc_model.h:104)
* Scalar loops are ~4 ns/iter and bulk DMAs ~20-35 ns -> one synchronous
  scalar "service" sweep per step issues & waits all per-stream DMAs
  (flush / fetch / group swap / coder refills). No cross-step DMA state.

Bit-exactness contract: identical to CSCDecoder for streams whose output
fits the window (no ring wrap), excluding DT_DLT blocks which flag
ERR_UNSUPPORTED and fall back to the XLA scan on host (pipeline.py).
Corrupt streams set ERR_CORRUPT where csc_dec.cpp:508-547 throws
DECODE_ERROR (x_tpu improvement over the clamping XLA scan).

Layout/FSM constants are imported from decode_scan to stay in lockstep
with the validated implementation.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (DIST_TABLE, REV16_TABLE, DT_NORMAL, DT_EXE,
                         DT_ENGTXT, DT_BAD, DT_ENTROPY, SIG_EOF, DT_DLT)
from .decode_scan import (
    P_STATE, P_REPDIST, P_DIST, P_MDEXTRA, P_MLSLOT, P_MLEX1, P_MLEX2,
    P_MLEX3, P_LONGLEN, P_RLEFLAG,
    F_IDLE, F_FLAG1, F_FLAG2, F_FLAG3, F_LITTREE, F_REPTREE, F_LENSLOT0,
    F_LENSLOT1, F_LENTREE3, F_LENTREE7, F_LONGLEN, F_DISTSLOT, F_DISTEXTRA,
    F_ENTTREE, F_INTSLOT, F_INTNUM, F_DISTDIRECT, F_BADBYTES, F_COPY,
    IP_BLOCKTYPE, IP_CONT, IP_SIZE_BAD, IP_SIZE_ENT, IP_SIZE_RLE,
    IP_SIZE_TXT, LF_MATCH, LF_REP,
    _PDIST_POS, _PDIST_BITS,
)

# kernel-only FSM state: coder (re)priming after init / chunk reset
F_PRIME = 22

NP_ROWS = 12             # small prob tables as [B, NP_ROWS, 128] tile

# Kernel-local PADDED small-table layout: every probability tree is
# aligned so its whole span lives inside ONE 128-lane row.  The per-step
# state window is then a single staged row ([B,128] gathers/adapts and
# one select per writeback row) instead of a 256-lane pair.  This is an
# internal layout only — the wire format never sees prob indices; the
# XLA scan (decode_scan.py) keeps the compact P_* layout.
PP_STATE = 0             # 8*mstate + {0,1,2}=flag1/2/3, {4,5,6}=reptree
PP_LEN = 512             # +0,+1 len slots; +16+node / +24+node lentree3
                         # (tbl 1/2); +32 longlen
PP_MLEX3 = 640           # +node (1..127), full row
PP_DIST = 768            # + _PPDIST_POS[min(len,6)] + node (2 rows)
PP_MDEXTRA = 1024        # + (ebits-1)*16 + node (29 trees, 16-aligned)
_PPDIST_POS_NP = np.array([0, 16, 32, 64, 96, 128, 160], np.int32)
TS = 16                  # tile sublanes (2 blocks of 8)
BLK = 1024               # DMA block, elements
TILE = TS * 128          # 2048
CH = 128                 # max copy chunk, bytes
NBLK_LOG = 256           # typed-block log entries

ERR_NONE = 0
ERR_CORRUPT = 1
ERR_UNSUPPORTED = 2      # DT_DLT: host falls back to the XLA scan

# kernel wall seconds of the last decode_batch_pallas group, recorded
# when CSC_DECODE_TIMING is set (bench telemetry)
LAST_KERNEL_SECONDS = 0.0

_DIST_TABLE_NP = np.array(DIST_TABLE, np.int32)
_REV16_NP = np.array(REV16_TABLE, np.int32)

# opclass table including F_PRIME (class 4 = prime)
_OPC = np.full(23, 0, np.int32)          # 0 = BIT
_OPC[F_IDLE] = 3
for _f in (F_INTSLOT, F_INTNUM, F_DISTDIRECT, F_BADBYTES):
    _OPC[_f] = 1                          # DIRECT
_OPC[F_COPY] = 2                          # COPY
_OPC[F_PRIME] = 4

REGS = [
    "fsm", "int_purpose", "int_slot", "direct_acc", "direct_rem",
    "mstate", "ctx", "wnd_pos", "node", "len_acc", "len_phase", "len_for",
    "len_base", "len_tbl", "wire_len", "rep_idx", "slot", "ebits", "elen",
    "pdist_pos", "sbits", "dist", "cpy_src", "cpy_rem", "cpy_done",
    "size_rem", "eof", "done", "blk_start", "blk_cnt",
    "rc_ptr", "rc_blk", "rc_base", "bc_bits", "bc_ptr", "bc_blk",
    "bc_base", "rd_base", "grp_key", "grp_slot", "flushed_blk", "err",
    "rep0", "rep1", "rep2", "rep3",
    "rc_code", "rc_range", "bc_val",     # u32 semantics, stored as i32
]
NR = len(REGS)
_RI = {n: i for i, n in enumerate(REGS)}

# service request rows (vector phase -> SMEM -> scalar sweep).  Rows 1-5
# hold COMPACTED requesting-stream ids (prefix-sum packed, -1 sentinel
# terminated) so the scalar sweep runs O(requests), not O(B); rows 6-12
# hold per-stream payloads read by id.
RQ_FLUSH_IDS = 1
RQ_FETCH_IDS = 2
RQ_SWAP_IDS = 3
RQ_RC_IDS = 4
RQ_BC_IDS = 5
RQ_FLUSH_P = 6    # wnd block index to flush
RQ_FETCH_P = 7    # rd fetch base sublane
RQ_SWAP_NEW = 8   # group key to fetch (table*64+grp)
RQ_SWAP_OLD = 9   # group key to write back first (-1 = none)
RQ_SWAP_SLOT = 10  # slot to fetch into (old slot is 1-this)
RQ_RC_P = 11      # rc tile fetch base sublane
RQ_BC_P = 12      # bc tile fetch base sublane
NRQ = 16


def _u32(x):
    return x.astype(jnp.uint32)


def _i32(x):
    return x.astype(jnp.int32)


def _ult(a, b):
    """unsigned 32-bit a < b on i32-held values."""
    return (a ^ jnp.int32(-0x80000000)) < (b ^ jnp.int32(-0x80000000))



def _col(m):
    """bool [B] -> [B,1] without an i1 minor-dim insertion (Mosaic only
    supports non-no-op minor-dim inserts for 32-bit types)."""
    return _i32(m)[:, None] != 0

def _tile_gather(tile_refs, sub, lane, use_first=None):
    """byte[b] = tile[b, sub[b], lane[b]] over [B,TS,128] tile ref(s).

    tile_refs: one ref, or (ref_a, ref_b) with use_first selecting per
    stream. sub in [0,TS), lane in [0,128)."""
    B = sub.shape[0]
    lane_oh = (jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
               == lane[:, None])
    if isinstance(tile_refs, tuple):
        ra, rb = tile_refs
    else:
        ra, rb = tile_refs, None
    rowsel = jnp.zeros((B, 128), jnp.int32)
    for s in range(TS):
        row = ra[:, s, :]
        if rb is not None:
            row = jnp.where(_col(use_first), row, rb[:, s, :])
        rowsel = rowsel + jnp.where(sub[:, None] == s, row, 0)
    return jnp.sum(jnp.where(lane_oh, rowsel, 0), axis=1)


def _row_onehot(sub, nrows):
    """[B,nrows] one-hot of per-stream row index.  ONE lane->sublane
    relayout (sub[:,None]) instead of one per unrolled row — the
    per-row masks are then cheap [B,1] column slices."""
    B = sub.shape[0]
    io = jax.lax.broadcasted_iota(jnp.int32, (B, nrows), 1)
    return io == sub[:, None]


def _tile_one(tile_refs, sub, use_first=None, nrows=TS):
    """[B,128] = row sub of a [B,nrows,128] tile (single-row window)."""
    if isinstance(tile_refs, tuple):
        ra, rb = tile_refs
    else:
        ra, rb = tile_refs, None
    B = sub.shape[0]
    oh = _row_onehot(sub, nrows)
    ufcol = None if rb is None else _col(use_first)
    lo = jnp.zeros((B, 128), jnp.int32)
    for s in range(nrows):
        row = ra[:, s, :]
        if rb is not None:
            row = jnp.where(ufcol, row, rb[:, s, :])
        lo = lo + jnp.where(oh[:, s:s + 1], row, 0)
    return lo


def _tile_pair(tile_refs, sub, use_first=None, nrows=TS):
    """[B,256] = rows sub and (sub+1)%nrows concatenated."""
    B = sub.shape[0]
    if isinstance(tile_refs, tuple):
        ra, rb = tile_refs
    else:
        ra, rb = tile_refs, None
    oh = _row_onehot(sub, nrows)
    ufcol = None if rb is None else _col(use_first)
    lo = jnp.zeros((B, 128), jnp.int32)
    hi = jnp.zeros((B, 128), jnp.int32)
    for s in range(nrows):
        row = ra[:, s, :]
        if rb is not None:
            row = jnp.where(ufcol, row, rb[:, s, :])
        lo = lo + jnp.where(oh[:, s:s + 1], row, 0)
        # row s is the HI row for streams whose sub == s-1 (mod nrows)
        hi = hi + jnp.where(oh[:, (s - 1) % nrows:(s - 1) % nrows + 1],
                            row, 0)
    return jnp.concatenate([lo, hi], axis=1)


def _rot_left(x, k, width):
    """per-stream left-rotate of [B,width] by k[b] (log-shift selects)."""
    j = 1
    while j < width:
        x = jnp.where((k & j)[:, None] != 0,
                      pltpu.roll(x, width - j, 1), x)
        j *= 2
    return x


def _rot_right(x, k, width):
    j = 1
    while j < width:
        x = jnp.where((k & j)[:, None] != 0, pltpu.roll(x, j, 1), x)
        j *= 2
    return x



def _lut(idx, table_np):
    """static-table vector lookup as an unrolled select chain (Pallas
    kernels cannot capture array constants)."""
    r = jnp.full(idx.shape, int(table_np[len(table_np) - 1]), jnp.int32)
    for i in range(len(table_np) - 1):
        r = jnp.where(idx == i, int(table_np[i]), r)
    return r

def _make_kernel(B, NWS, NRCS, NBCS, NB, max_blocks=NBLK_LOG):
    """Build the decode kernel for static shapes.

    NWS/NRCS/NBCS: sublane counts (x128 lanes) of window / rc / bc HBM
    arrays.  NB: framing block table width."""
    import os as _os
    _ABL = set(filter(None, _os.environ.get("PDK_ABL", "").split(",")))
    KBITS = int(_os.environ.get("PDK_KBITS", "9"))
    # PDK_DUP: profiling ablation by DUPLICATION — re-run a section with
    # a runtime-zero perturbation (dz) and discard the result through a
    # runtime-false select, so semantics are unchanged but the section's
    # work doubles.  marginal(dup) - marginal(base) = section cost.
    _DUP = set(filter(None, _os.environ.get("PDK_DUP", "").split(",")))


    def kernel(max_steps_ref,            # SMEM (1,1)
               rc_ends_ref, bc_ends_ref,  # VMEM [B, NB]
               regs_ref,                  # VMEM [NR, B] (in)
               rc_hbm, bc_hbm,            # ANY [B, NRCS/NBCS, 128]
               wnd_hbm,                   # ANY [B, NWS, 128] (aliased out)
               plit_hbm, pdlt_hbm,        # ANY [B, 512, 128] (aliased out)
               wnd_out, plit_out, pdlt_out,   # aliased with inputs
               regs_out,                  # VMEM [NR, B]
               blklog_ref,                # VMEM [B, 2*max_blocks] (out)
               steps_ref,                 # SMEM (1, 1) out
               probs,                     # scratch VMEM [B, NP_ROWS, 128]
               grp, out_t, rd_t, rc_t, bc_t,   # scratch [B,TS,128]
               req,                       # scratch VMEM [NRQ, B] i32
               smem,                      # scratch SMEM [NRQ, B]
               sem_fl, sem_ft, sem_sw, sem_rc, sem_bc, sem_req):
        # All window / prob-group DMA goes through the OUTPUT refs: with
        # input_output_aliases they are the same HBM buffers on hardware,
        # and interpret mode only reflects writes made via the output ref.
        del wnd_hbm, plit_hbm, pdlt_hbm
        barange = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        lane256 = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
        lane_nb = jax.lax.broadcasted_iota(jnp.int32, (B, NB), 1)
        lane_log = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * max_blocks), 1)

        probs[:] = jnp.full((B, NP_ROWS, 128), 2048, jnp.int32)
        blklog_ref[:] = jnp.zeros((B, 2 * max_blocks), jnp.int32)

        def ends_gather(ends_ref, idx):
            return jnp.sum(jnp.where(lane_nb == idx[:, None],
                                     ends_ref[:], 0), axis=1)

        iota_1b = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        slot_bb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        src_bb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)

        def compact(mask):
            """Pack the ids of set lanes to the front; -1 beyond count.
            Roll-based exclusive prefix sum + one-hot scatter."""
            m32 = _i32(mask)[None, :]
            ps = m32
            j = 1
            while j < B:
                ps = ps + jnp.where(iota_1b >= j, pltpu.roll(ps, j, 1), 0)
                j *= 2
            pos = (ps - m32)[0]
            hit = (pos[None, :] == slot_bb) & mask[None, :]
            return jnp.sum(jnp.where(hit, src_bb + 1, 0), axis=1) - 1

        def emit(row, mask):
            """Write a compacted id row, skipping the packing entirely on
            request-free steps (the overwhelmingly common case)."""
            def then(_):
                req[row, :] = compact(mask)
                return 0

            def els(_):
                req[row, :] = jnp.full((B,), -1, jnp.int32)
                return 0
            jax.lax.cond(jnp.any(mask), then, els, 0)

        # ---------------- vector phase: one lockstep micro-op ------------
        def vstep(rg):
            g = lambda n: rg[_RI[n]]
            fsm = g("fsm")
            done = g("done")
            opclass = _lut(jnp.clip(fsm, 0, 22), _OPC)
            node = g("node")
            mstate8 = g("mstate") * 8
            ctx = g("ctx")
            wnd_pos = g("wnd_pos")
            live = (done == 0)

            # ---- resource checks -> stalls + requests
            rc_ptr, rc_base = g("rc_ptr"), g("rc_base")
            bc_ptr, bc_base = g("bc_ptr"), g("bc_base")
            is_bit0 = (opclass == 0) & live
            is_dir0 = (opclass == 1) & live
            is_cpy0 = (opclass == 2) & live
            is_prm0 = (opclass == 4) & live

            rc_need = jnp.where(is_prm0, 5,
                                jnp.where(is_bit0, KBITS, 0))
            rc_miss = (rc_need > 0) & ((rc_ptr < rc_base)
                                       | (rc_ptr + rc_need > rc_base + TILE))
            bc_miss = is_dir0 & ((bc_ptr < bc_base)
                                 | (bc_ptr + 4 > bc_base + TILE))

            # literal-group residency (LITTREE/ENTTREE use p_lit[ctx],
            # csc_model.cpp:169-183; RLETREE excluded in v1)
            uses_grp = (fsm == F_LITTREE) | (fsm == F_ENTTREE)
            want_key = ctx >> 2
            grp_key = g("grp_key")
            grp_miss = is_bit0 & uses_grp & (grp_key != want_key)

            # copy source coverage
            dist = g("dist")
            src0 = g("cpy_src")
            cpy_done = g("cpy_done")
            cpy_rem = g("cpy_rem")
            sdist = jnp.maximum(dist, 1)
            src_eff = src0 + cpy_done % sdist
            avail = wnd_pos - src_eff
            bad_copy = is_cpy0 & ((dist <= 0) | (src0 < 0)
                                  | (avail <= 0))
            out_lo = jnp.maximum(((wnd_pos >> 10) - 1) << 10, 0)
            use_out = src_eff >= out_lo
            rd_base = g("rd_base")
            rd_ok = (src_eff >= rd_base) & (src_eff < rd_base + TILE) \
                & (rd_base >= 0)
            rd_miss = is_cpy0 & ~bad_copy & ~use_out & ~rd_ok

            stall = rc_miss | bc_miss | grp_miss | rd_miss
            is_bit = is_bit0 & ~stall
            is_dir = is_dir0 & ~stall
            is_cpy = is_cpy0 & ~stall & ~bad_copy
            is_prm = is_prm0 & ~stall

            # ---- request payload rows (ids are emitted compacted at the
            # end of the step, once the flush mask is known)
            req[RQ_RC_P, :] = jnp.clip((rc_ptr >> 10) << 3, 0, NRCS - 16)
            req[RQ_BC_P, :] = jnp.clip((bc_ptr >> 10) << 3, 0, NBCS - 16)
            req[RQ_FETCH_P, :] = jnp.clip((src_eff >> 10) << 3, 0,
                                          NWS - 16)
            new_rc_base = jnp.where(rc_miss, (rc_ptr >> 10) << 10, rc_base)
            new_bc_base = jnp.where(bc_miss, (bc_ptr >> 10) << 10, bc_base)
            new_rd_base = jnp.where(rd_miss, (src_eff >> 10) << 10, rd_base)
            grp_slot = g("grp_slot")
            new_grp_key = jnp.where(grp_miss, want_key, grp_key)
            # (RQ_SWAP_* payload rows are written after the transitions,
            # where the ctx-change prefetch mask is known)

            # =================== BIT micro-op ============================
            # prob index: small tables vs group cache
            # nested-where select (jnp.select lowers to argmax, which
            # Mosaic only supports for f32)
            _sel_pairs = [
                (fsm == F_FLAG1, PP_STATE + mstate8),
                (fsm == F_FLAG2, PP_STATE + mstate8 + 1),
                (fsm == F_FLAG3, PP_STATE + mstate8 + 2),
                (fsm == F_REPTREE, PP_STATE + mstate8 + 3 + node),
                (fsm == F_LENSLOT0, jnp.full_like(node, PP_LEN)),
                (fsm == F_LENSLOT1, jnp.full_like(node, PP_LEN + 1)),
                (fsm == F_LENTREE3,
                 jnp.where(g("len_tbl") == 1, PP_LEN + 16,
                           PP_LEN + 24) + node),
                (fsm == F_LENTREE7, PP_MLEX3 + node),
                (fsm == F_LONGLEN, jnp.full_like(node, PP_LEN + 32)),
                (fsm == F_DISTSLOT, PP_DIST + g("pdist_pos") + node),
                (fsm == F_DISTEXTRA,
                 PP_MDEXTRA + (g("ebits") - 1) * 16 + node),
            ]
            pidx = jnp.zeros_like(node)
            for _c, _v in _sel_pairs:
                pidx = jnp.where(_c, _v, pidx)
            use_small = is_bit & ~uses_grp
            pidx = jnp.where(use_small, pidx, 0)

            # group-cache access is by tree node within the staged
            # 256-entry ctx subtree (see lit_pair below)
            use_gc = is_bit & uses_grp
            # FLAG1 streams whose literal group is already resident may
            # CHAIN into the literal tree within this same step (the
            # group is usually resident thanks to the ctx-change
            # prefetch issued when the previous token completed)
            flag1_lit_ok = is_bit & (fsm == F_FLAG1) & (grp_key == want_key)

            # ---- K-bit unrolled range decode.  Bit 0 serves every BIT
            # state; bits 1..K-1 continue only streams still descending
            # the SAME probability tree (fsm is unchanged during tree
            # descent), so the regular transition code below runs once on
            # the final node.  Each inner bit sees the previous bit's
            # adapted probabilities (RMW applied between bits).
            dz = max_steps_ref[0, 0] >> 30          # runtime 0 (profiling)
            dcol = jnp.full((B, 1), dz) != 0        # runtime False

            # the whole literal/entropy tree descent hits ONE 256-entry
            # ctx subtree (2 tile rows): stage it into a register pair so
            # per-bit group access is a [B,256] one-hot, and write it back
            # once after the K bits (csc_model.h:104 layout)
            gsub_lit = grp_slot * 8 + (ctx & 3) * 2
            use_gc_any = use_gc | flag1_lit_ok
            lit_pair = jax.lax.cond(
                jnp.any(use_gc_any),
                lambda: _tile_pair(grp, gsub_lit),
                lambda: jnp.zeros((B, 256), jnp.int32))
            if "stage" in _DUP:
                lit_pair = jnp.where(dcol, jax.lax.cond(
                    jnp.any(use_gc_any),
                    lambda: _tile_pair(grp, gsub_lit + dz),
                    lambda: jnp.zeros((B, 256), jnp.int32)), lit_pair)

            # stage the next <=256 coder bytes as a register pair too: a
            # K-bit step refills at most K bytes, all within the window
            # (stall check guarantees rc tile residency for K bytes)
            roff0 = rc_ptr - rc_base
            rc_win_base = rc_base + (roff0 & ~127)
            rc_pair = jax.lax.cond(
                jnp.any(is_bit),
                lambda: _tile_pair(rc_t, jnp.clip(roff0 >> 7, 0, TS - 1)),
                lambda: jnp.zeros((B, 256), jnp.int32))
            if "stage" in _DUP:
                rc_pair = jnp.where(dcol, jax.lax.cond(
                    jnp.any(is_bit),
                    lambda: _tile_pair(
                        rc_t, jnp.clip((roff0 >> 7) + dz, 0, TS - 1)),
                    lambda: jnp.zeros((B, 256), jnp.int32)), rc_pair)

            # ...and the small-table window: every small-table index a
            # stream can touch during this step lies in ONE 256-lane
            # window anchored by its bit-0 state (trees never change fsm
            # mid-descent; all spans <=128, see csc_model.h tables)
            # the padded layout guarantees every tree a stream can touch
            # during this step lies in ONE 128-lane row (win_row)
            base_small = jnp.zeros_like(node)
            for _c, _v in [
                    ((fsm == F_FLAG1) | (fsm == F_FLAG2)
                     | (fsm == F_FLAG3) | (fsm == F_REPTREE),
                     PP_STATE + mstate8),
                    ((fsm == F_LENSLOT0) | (fsm == F_LENSLOT1)
                     | (fsm == F_LENTREE3) | (fsm == F_LONGLEN),
                     jnp.full_like(node, PP_LEN)),
                    (fsm == F_LENTREE7, jnp.full_like(node, PP_MLEX3)),
                    (fsm == F_DISTSLOT, PP_DIST + g("pdist_pos")),
                    (fsm == F_DISTEXTRA,
                     PP_MDEXTRA + (g("ebits") - 1) * 16)]:
                base_small = jnp.where(_c, _v, base_small)
            win_row = jnp.clip(base_small >> 7, 0, NP_ROWS - 1)
            win_base = win_row << 7
            small_win = jax.lax.cond(
                jnp.any(use_small),
                lambda: _tile_one(probs, win_row, nrows=NP_ROWS),
                lambda: jnp.zeros((B, 128), jnp.int32))
            if "stage" in _DUP:
                small_win = jnp.where(dcol[:, :1], jax.lax.cond(
                    jnp.any(use_small),
                    lambda: _tile_one(probs, win_row + dz,
                                      nrows=NP_ROWS),
                    lambda: jnp.zeros((B, 128), jnp.int32)), small_win)

            def _kloop(rng, code, rc_ptrc, rc_blk, nnode, small_win,
                       lit_pair):
              bit = jnp.zeros((B,), jnp.bool_)
              lit_chain = jnp.zeros((B,), jnp.bool_)
              comb = jnp.zeros((B, 256), jnp.int32)
              gc_cls = jnp.zeros((B,), jnp.bool_)
              for ibit in range(KBITS):
                if ibit == 0:
                    act = is_bit
                    use_gc_i = use_gc
                    use_small_i = use_small
                    pidx_i = pidx
                else:
                    tree_lim = jnp.zeros_like(node)
                    for _f, _l in ((F_LITTREE, 0x100), (F_REPTREE, 4),
                                   (F_LENTREE3, 8), (F_LENTREE7, 0x80),
                                   (F_DISTEXTRA, 0x10),
                                   (F_ENTTREE, 0x100)):
                        tree_lim = jnp.where(fsm == _f, _l, tree_lim)
                    tree_lim = jnp.where(
                        fsm == F_DISTSLOT,
                        1 << jnp.clip(g("sbits"), 0, 5), tree_lim)
                    act = (is_bit & (tree_lim > 0) & (nnode < tree_lim)) \
                        | (lit_chain & (nnode < 0x100))
                    use_gc_i = act & gc_cls
                    use_small_i = act & ~gc_cls
                    pidx_i = jnp.zeros_like(node)
                    for _c, _v in [
                            (fsm == F_REPTREE,
                             PP_STATE + mstate8 + 3 + nnode),
                            (fsm == F_LENTREE3,
                             jnp.where(g("len_tbl") == 1, PP_LEN + 16,
                                       PP_LEN + 24) + nnode),
                            (fsm == F_LENTREE7, PP_MLEX3 + nnode),
                            (fsm == F_DISTSLOT,
                             PP_DIST + g("pdist_pos") + nnode),
                            (fsm == F_DISTEXTRA,
                             PP_MDEXTRA + (g("ebits") - 1) * 16 + nnode)]:
                        pidx_i = jnp.where(_c, _v, pidx_i)
                    pidx_i = jnp.where(use_small_i, pidx_i, 0)

                # rc refill BEFORE the bit (csc_dec.cpp:11-22)
                need = act & _ult(rng, jnp.int32(1 << 24))
                woff = jnp.clip(rc_ptrc - rc_win_base, 0, 255)
                rbyte = jnp.sum(jnp.where(lane256 == woff[:, None],
                                          rc_pair, 0), axis=1)
                rng = jnp.where(need, rng << 8, rng)
                code = jnp.where(need, (code << 8) + rbyte, code)
                rc_ptrc = jnp.where(need, rc_ptrc + 1, rc_ptrc)
                rc_end = ends_gather(rc_ends_ref,
                                     jnp.clip(rc_blk, 0, NB - 1))
                rc_blk = jnp.where(need & (rc_ptrc >= rc_end),
                                   rc_blk + 1, rc_blk)

                if ibit == 0:
                    # bit 0: separate small/gc gathers (FLAG1 streams
                    # read their flag prob from the small window, then
                    # may chain into the literal tree from bit 1)
                    swoff = jnp.clip(pidx_i - win_base, 0, 127)
                    oh_small = lane128 == jnp.where(use_small_i,
                                                    swoff, -1)[:, None]
                    p_small = jnp.sum(jnp.where(oh_small, small_win, 0),
                                      axis=1)
                    oh_gc = lane256 == jnp.where(use_gc_i, nnode,
                                                 0)[:, None]
                    p_gc = jnp.sum(jnp.where(oh_gc, lit_pair, 0), axis=1)
                    p = jnp.where(use_gc_i, p_gc, p_small)
                else:
                    # bits 1..K-1: ONE gather from the per-stream merged
                    # window (gc streams: lit subtree; small streams:
                    # their 128-lane state row, duplicated)
                    swoff = jnp.clip(pidx_i - win_base, 0, 127)
                    idx = jnp.where(use_gc_i, nnode,
                                    jnp.where(use_small_i, swoff, -1))
                    oh = lane256 == idx[:, None]
                    p = jnp.sum(jnp.where(oh, comb, 0), axis=1)

                bound = _i32(_u32(jnp.where(act, rng, 0)) >> 12) * p
                b_i = _ult(code, bound) & act
                new_p = jnp.where(b_i, p + ((0xFFF - p) >> 5),
                                  p - (p >> 5))

                if ibit == 0:
                    small_win = jnp.where(
                        oh_small & _col(use_small_i),
                        jnp.broadcast_to(new_p[:, None], (B, 128)),
                        small_win)
                    lit_pair = jnp.where(
                        oh_gc & _col(use_gc_i),
                        jnp.broadcast_to(new_p[:, None], (B, 256)),
                        lit_pair)
                else:
                    comb = jnp.where(
                        oh, jnp.broadcast_to(new_p[:, None], (B, 256)),
                        comb)
                rng = jnp.where(act, jnp.where(b_i, bound, rng - bound),
                                rng)
                code = jnp.where(act & ~b_i, code - bound, code)
                if ibit == 0:
                    bit = b_i
                nnode = jnp.where(act, nnode * 2 + jnp.where(b_i, 1, 0),
                                  nnode)
                if ibit == 0 and KBITS > 1:
                    # FLAG1(bit=0) chains into the literal tree
                    lit_chain = flag1_lit_ok & ~b_i
                    nnode = jnp.where(lit_chain, 1, nnode)
                    gc_cls = (uses_grp & is_bit) | lit_chain
                    comb = jnp.where(
                        _col(gc_cls), lit_pair,
                        jnp.concatenate([small_win, small_win], axis=1))
              if KBITS > 1:
                  # split the merged window back
                  lit_pair = jnp.where(_col(gc_cls), comb, lit_pair)
                  small_win = jnp.where(_col(use_small & ~gc_cls),
                                        comb[:, :128], small_win)
              return (rng, code, rc_ptrc, rc_blk, bit, nnode, small_win,
                      lit_pair, lit_chain)

            kres = _kloop(g("rc_range"), g("rc_code"), rc_ptr,
                          g("rc_blk"), node, small_win, lit_pair)
            if "bits" in _DUP:
                kres2 = _kloop(g("rc_range") + dz, g("rc_code"), rc_ptr,
                               g("rc_blk"), node, small_win, lit_pair)
                kres = tuple(jnp.where(dz != 0, r2, r)
                             for r, r2 in zip(kres, kres2))
            (rng, code, rc_ptrc, rc_blk, bit, nnode, small_win,
             lit_pair, lit_chain) = kres
            use_gc2 = use_gc | lit_chain

            def _wb_pair(_):
                ohg = _row_onehot(gsub_lit, TS) & _col(use_gc2)
                for s in range(TS):
                    lo_m = ohg[:, s:s + 1]
                    hi_m = (ohg[:, s - 1:s]
                            if s > 0 else jnp.zeros((B, 1), jnp.bool_))
                    grp[:, s, :] = jnp.where(
                        lo_m, lit_pair[:, :128],
                        jnp.where(hi_m, lit_pair[:, 128:],
                                  grp[:, s, :]))
                return 0
            jax.lax.cond(jnp.any(use_gc2), _wb_pair, lambda _: 0, 0)
            if "wb" in _DUP:
                jax.lax.cond(jnp.any(use_gc2), _wb_pair, lambda _: 0, dz)

            def _wb_small(_):
                ohr = _row_onehot(win_row, NP_ROWS) & _col(use_small)
                for s in range(NP_ROWS):
                    probs[:, s, :] = jnp.where(
                        ohr[:, s:s + 1], small_win, probs[:, s, :])
                return 0
            jax.lax.cond(jnp.any(use_small), _wb_small, lambda _: 0, 0)
            if "wb" in _DUP:
                jax.lax.cond(jnp.any(use_small), _wb_small,
                             lambda _: 0, dz)
            rc_ptr2 = rc_ptrc

            # =================== DIRECT micro-op =========================
            direct_rem = g("direct_rem")
            size_rem = g("size_rem")
            two_phase = direct_rem > 16
            nbits = jnp.where(two_phase, direct_rem - 16, direct_rem)
            # BADBYTES: 2 bytes per step unless that write would cross a
            # 128-lane row (single-row window-write invariant)
            nbits = jnp.where(fsm == F_BADBYTES,
                              jnp.where((size_rem >= 2)
                                        & ((wnd_pos & 127) != 127),
                                        16, 8), nbits)
            nbits = jnp.where(is_dir, nbits, 0)

            def _dir_read(poff=0):
                bc_val_, bc_bits_ = g("bc_val"), g("bc_bits")
                bc_ptr_, bc_blk_ = bc_ptr + poff, g("bc_blk")
                bc_end = ends_gather(bc_ends_ref,
                                     jnp.clip(bc_blk_, 0, NB - 1))
                # stage the next <=256 bc bytes once; the <=3 refill
                # bytes all lie inside this pair (stall check guarantees
                # bc_ptr+4 <= bc_base+TILE residency)
                boff0 = bc_ptr - bc_base
                bwin_base = bc_base + (boff0 & ~127)
                bc_pair = _tile_pair(bc_t, jnp.clip(boff0 >> 7, 0,
                                                    TS - 1))
                for _ in range(3):
                    need = is_dir & (bc_bits_ < nbits)
                    woffb = jnp.clip(bc_ptr_ - bwin_base, 0, 255)
                    bbyte = jnp.sum(jnp.where(
                        lane256 == woffb[:, None], bc_pair, 0), axis=1)
                    bc_val_ = jnp.where(need, ((bc_val_ << 8) | bbyte),
                                        bc_val_)
                    bc_ptr_ = jnp.where(need, bc_ptr_ + 1, bc_ptr_)
                    bc_blk_ = jnp.where(need & (bc_ptr_ >= bc_end),
                                        bc_blk_ + 1, bc_blk_)
                    bc_end = ends_gather(bc_ends_ref,
                                         jnp.clip(bc_blk_, 0, NB - 1))
                    bc_bits_ = jnp.where(need, bc_bits_ + 8, bc_bits_)
                shift = jnp.maximum(bc_bits_ - nbits, 0)
                msk = _i32((_u32(jnp.full_like(nbits, 1))
                            << _u32(nbits)) - 1)
                dval_ = jnp.where(is_dir,
                                  _i32(_u32(bc_val_) >> _u32(shift)) & msk,
                                  0)
                bc_bits_ = jnp.where(is_dir, bc_bits_ - nbits, bc_bits_)
                return dval_, bc_val_, bc_bits_, bc_ptr_, bc_blk_

            dval, bc_val, bc_bits, bc_ptr2, bc_blk = jax.lax.cond(
                jnp.any(is_dir), _dir_read,
                lambda: (jnp.zeros((B,), jnp.int32), g("bc_val"),
                         g("bc_bits"), bc_ptr, g("bc_blk")))
            if "dir" in _DUP:
                dres = jax.lax.cond(
                    jnp.any(is_dir), lambda: _dir_read(dz),
                    lambda: (jnp.zeros((B,), jnp.int32), g("bc_val"),
                             g("bc_bits"), bc_ptr, g("bc_blk")))
                (dval, bc_val, bc_bits, bc_ptr2, bc_blk) = tuple(
                    jnp.where(dz != 0, b2, a) for a, b2 in zip(
                        (dval, bc_val, bc_bits, bc_ptr2, bc_blk), dres))

            # =================== PRIME micro-op ==========================
            # read 4 big-endian code bytes at rc_ptr+1..+4 (csc_dec.cpp:340)
            def _prime_read():
                pr = jnp.where(is_prm, rc_ptr, 0)
                pb = []
                for k in range(1, 5):
                    off = pr + k - rc_base
                    pb.append(_tile_gather(rc_t,
                                           jnp.clip(off >> 7, 0, TS - 1),
                                           off & 127))
                return ((pb[0] << 24) | (pb[1] << 16)
                        | (pb[2] << 8) | pb[3])

            prime_code = jax.lax.cond(
                jnp.any(is_prm), _prime_read,
                lambda: jnp.zeros((B,), jnp.int32))

            # =================== COPY micro-op ===========================
            cl = jnp.minimum(jnp.minimum(cpy_rem, CH), avail)
            cl = jnp.where(use_out, cl,
                           jnp.minimum(cl, rd_base + TILE - src_eff))
            # row caps: keep the read and the write each inside ONE
            # 128-lane row (single-row rot+select instead of a 256-lane
            # pair); a crossing copy just takes another COPY step
            cl = jnp.minimum(cl, 128 - (src_eff & 127))
            cl = jnp.minimum(cl, 128 - (wnd_pos & 127))
            # (src_eff>=out_lo guarantees out-ring residency; reads
            #  below wnd_pos only, enforced by the avail cap)
            cl = jnp.where(is_cpy, jnp.maximum(cl, 0), 0)

            def _copy_read(off):
                osub = (off >> 7) & (TS - 1)
                rsub = jnp.clip((off - rd_base) >> 7, 0, TS - 1)
                pairsub = jnp.where(use_out, osub, rsub)
                row = _tile_one((out_t, rd_t), pairsub,
                                use_first=use_out)
                return _rot_left(row, off & 127, 128)

            copy_chunk = jax.lax.cond(
                jnp.any(is_cpy), lambda: _copy_read(src_eff),
                lambda: jnp.zeros((B, 128), jnp.int32))
            if "copy" in _DUP:
                copy_chunk = jnp.where(dcol, jax.lax.cond(
                    jnp.any(is_cpy), lambda: _copy_read(src_eff + dz),
                    lambda: jnp.zeros((B, 128), jnp.int32)), copy_chunk)

            # ---- unified window write (copy chunk OR literal/raw bytes)
            # byte-write values are filled in by the transition section
            # below; we compute masks after transitions.

            # =================== transitions =============================
            new = [rg[i] for i in range(NR)]

            def upd(name, cond, val):
                i = _RI[name]
                new[i] = jnp.where(cond, val, new[i])

            reps = jnp.stack([g("rep0"), g("rep1"), g("rep2"), g("rep3")],
                             axis=1)

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

            # --- FLAG3 (rep0len1, csc_dec.cpp:523-529)
            c = is_bit & (fsm == F_FLAG3)
            c0 = c & ~bit
            rep0 = g("rep0")
            upd("mstate", c0, (g("mstate") * 4 + 2) & 0x3F)
            upd("dist", c0, rep0)
            # no-ring windows: wnd_pos <= rep0 is a corrupt stream
            upd("err", c0 & (wnd_pos <= rep0) & (g("err") == 0),
                ERR_CORRUPT)
            upd("cpy_src", c0, wnd_pos - rep0)
            upd("cpy_rem", c0, 1)
            upd("cpy_done", c0, 0)
            upd("fsm", c0, F_COPY)
            cb = c & bit
            upd("fsm", cb, F_REPTREE)
            upd("node", cb, 1)

            # --- LITTREE (including FLAG1 streams that chained this step)
            # nnode accumulated by the K-bit loop above
            c = (is_bit & (fsm == F_LITTREE)) | lit_chain
            lit_done = c & (nnode >= 0x100)
            lit_byte = nnode & 0xFF
            upd("node", c, nnode)
            upd("ctx", lit_done, lit_byte)
            upd("mstate", lit_done, (g("mstate") * 4) & 0x3F)
            upd("wnd_pos", lit_done, wnd_pos + 1)
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

            # --- LENTREE3 / LENTREE7
            c3 = is_bit & (fsm == F_LENTREE3)
            c7 = is_bit & (fsm == F_LENTREE7)
            done3 = c3 & (nnode >= 0x8)
            done7 = c7 & (nnode >= 0x80)
            upd("node", c3 | c7, nnode)
            lenv = jnp.where(done3, g("len_base") + (nnode & 0x7),
                             g("len_base") + (nnode & 0x7F))
            len_complete = done3 | done7
            goes_long = len_complete & (g("len_phase") == 0) & (lenv == 143)
            upd("fsm", goes_long, F_LONGLEN)
            upd("len_acc", goes_long, 143)
            wl = jnp.where(g("len_phase") == 0, lenv, g("len_acc") + lenv)
            len_done = len_complete & ~goes_long
            upd("wire_len", len_done, wl)

            # --- LONGLEN
            c = is_bit & (fsm == F_LONGLEN)
            upd("len_acc", c & ~bit, g("len_acc") + 143)
            cb = c & bit
            upd("fsm", cb, F_LENSLOT0)
            upd("len_phase", cb, 1)

            # --- len_done dispatch
            ld_match = len_done & (g("len_for") == LF_MATCH)
            upd("fsm", ld_match, F_DISTSLOT)
            upd("node", ld_match, 1)
            wl_c = jnp.minimum(wl, 6)
            # pdist_pos holds the PADDED layout offset (kernel-local)
            upd("pdist_pos", ld_match, _lut(wl_c, _PPDIST_POS_NP))
            upd("sbits", ld_match, _lut(wl_c, _PDIST_BITS))

            ld_rep = len_done & (g("len_for") == LF_REP)
            upd("mstate", ld_rep, (g("mstate") * 4 + 3) & 0x3F)
            rep_idx = g("rep_idx")
            rdist = jnp.sum(jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (B, 4), 1)
                == rep_idx[:, None], reps, 0), axis=1)
            # rotate reps[0..rep_idx] (csc_dec.cpp:538-541)
            shifted = jnp.concatenate([rdist[:, None], reps[:, :3]], axis=1)
            reps_rot = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (B, 4), 1)
                <= rep_idx[:, None], shifted, reps)
            for k in range(4):
                upd(f"rep{k}", ld_rep, reps_rot[:, k])
            upd("dist", ld_rep, rdist)
            upd("err", ld_rep & ((rdist <= 0) | (rdist > wnd_pos))
                & (g("err") == 0), ERR_CORRUPT)
            upd("cpy_src", ld_rep, wnd_pos - rdist)
            upd("cpy_rem", ld_rep, wl + 2)
            upd("cpy_done", ld_rep, 0)
            upd("fsm", ld_rep, F_COPY)

            # (LF_RLE unreachable: DT_DLT flagged unsupported)

            # --- DISTSLOT
            c = is_bit & (fsm == F_DISTSLOT)
            sbits = g("sbits")
            sdone = c & (nnode >= (1 << sbits))
            upd("node", c, nnode)
            slotv = nnode & ((1 << sbits) - 1)
            upd("slot", sdone, slotv)
            small = sdone & (slotv <= 2)
            big = sdone & (slotv > 2)
            eb = slotv - 2
            upd("ebits", big, eb)
            upd("elen", big, 0)
            need_direct = big & (eb > 4)
            upd("fsm", need_direct, F_DISTDIRECT)
            upd("direct_rem", need_direct, eb - 4)
            upd("direct_acc", need_direct, 0)
            cb = big & ~need_direct
            upd("fsm", cb, F_DISTEXTRA)
            upd("node", cb, 1)

            # --- DISTEXTRA
            c = is_bit & (fsm == F_DISTEXTRA)
            edone = c & (nnode >= 0x10)
            upd("node", c, nnode)
            nib = nnode & 0xF
            rev = (((nib & 1) << 3) | ((nib & 2) << 1)
                   | ((nib & 4) >> 1) | ((nib & 8) >> 3))
            dist_big = (_lut(jnp.clip(g("slot"), 0, 32), _DIST_TABLE_NP)
                        + (g("elen") << 4) + rev)

            # --- match_complete
            mc = small | edone
            dist_raw = jnp.where(small, slotv, dist_big)
            upd("mstate", mc, (g("mstate") * 4 + 1) & 0x3F)
            sentinel = mc & (g("wire_len") == 0) & (dist_raw == 64)
            normal_match = mc & ~sentinel
            nd = dist_raw + 1
            upd("dist", normal_match, nd)
            upd("err", normal_match & (nd > wnd_pos) & (g("err") == 0),
                ERR_CORRUPT)
            for k, v in enumerate([nd, reps[:, 0], reps[:, 1], reps[:, 2]]):
                upd(f"rep{k}", normal_match, v)
            upd("cpy_src", normal_match, wnd_pos - nd)
            upd("cpy_rem", normal_match, g("wire_len") + 2)
            upd("cpy_done", normal_match, 0)
            upd("fsm", normal_match, F_COPY)
            upd("fsm", sentinel, F_INTSLOT)
            upd("int_purpose", sentinel, IP_CONT)
            upd("direct_rem", sentinel, 5)

            # --- ENTTREE (order-1 coded high-entropy block)
            c = is_bit & (fsm == F_ENTTREE)
            ent_done = c & (nnode >= 0x100)
            upd("node", c, nnode)
            ent_byte = nnode & 0xFF
            upd("ctx", ent_done, ent_byte)
            ent_write = ent_done
            upd("wnd_pos", ent_done, wnd_pos + 1)
            nszrem2 = size_rem - 1
            upd("size_rem", ent_done, nszrem2)
            ent_blk_done = ent_done & (nszrem2 == 0)
            upd("node", ent_done & ~ent_blk_done, 1)
            upd("fsm", ent_blk_done, F_INTSLOT)
            upd("int_purpose", ent_blk_done, IP_CONT)
            upd("direct_rem", ent_blk_done, 5)

            # ================== DIRECT transitions =======================
            c = is_dir & (fsm == F_INTSLOT)
            upd("int_slot", c, dval)
            upd("fsm", c, F_INTNUM)
            upd("direct_rem", c, jnp.maximum(dval, 1))
            upd("direct_acc", c, 0)

            c = is_dir & (fsm == F_INTNUM)
            ph1 = c & two_phase
            upd("direct_acc", ph1, dval)
            upd("direct_rem", ph1, 16)
            cdone = c & ~two_phase
            int_slot = g("int_slot")
            num = ((g("direct_acc") << nbits) | dval) + jnp.where(
                int_slot > 0, 1 << jnp.clip(int_slot, 0, 30), 0)

            ip = g("int_purpose")
            bt = cdone & (ip == IP_BLOCKTYPE)
            # blk_log one-hot scatter: lanes 2*cnt, 2*cnt+1 (the one-hot
            # compares are inside the cond: block headers are rare steps)
            blk_cnt = g("blk_cnt")
            def _log_block(_):
                logpos = jnp.minimum(blk_cnt, max_blocks - 1) * 2
                ohl = lane_log == logpos[:, None]
                ohl2 = lane_log == (logpos + 1)[:, None]
                blklog_ref[:] = jnp.where(
                    ohl & _col(bt),
                    jnp.broadcast_to(num[:, None], (B, 2 * max_blocks)),
                    jnp.where(ohl2 & _col(bt),
                              jnp.broadcast_to(wnd_pos[:, None],
                                               (B, 2 * max_blocks)),
                              blklog_ref[:]))
                return 0
            jax.lax.cond(jnp.any(bt), _log_block, lambda _: 0, 0)
            upd("blk_cnt", bt, blk_cnt + 1)
            upd("blk_start", bt, wnd_pos)
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
            upd("err", t_dlt & (g("err") == 0), ERR_UNSUPPORTED)
            upd("done", t_dlt, 1)
            upd("fsm", t_dlt, F_IDLE)
            bad_type = bt & (num != DT_NORMAL) & (num != DT_EXE) \
                & (num != DT_ENGTXT) & (num != DT_BAD) \
                & (num != DT_ENTROPY) & (num != SIG_EOF) & ~t_dlt
            upd("err", bad_type & (g("err") == 0), ERR_CORRUPT)

            sb = cdone & (ip == IP_SIZE_BAD)
            upd("size_rem", sb, num)
            upd("fsm", sb & (num > 0), F_BADBYTES)
            to_int(sb & (num == 0), IP_CONT)

            se = cdone & (ip == IP_SIZE_ENT)
            upd("size_rem", se, num)
            upd("node", se, 1)
            upd("fsm", se & (num > 0), F_ENTTREE)
            to_int(se & (num == 0), IP_CONT)

            upd("fsm", cdone & (ip == IP_SIZE_TXT), F_FLAG1)

            # --- CONT (chunk reset, csc_dec.cpp:657-680)
            ct = cdone & (ip == IP_CONT)
            reset = ct & (num == 1)
            r_blk = rc_blk + 1
            r_start = ends_gather(rc_ends_ref,
                                  jnp.clip(jnp.maximum(r_blk - 1, 0),
                                           0, NB - 1))
            b_blk = bc_blk + 1
            b_start = ends_gather(bc_ends_ref,
                                  jnp.clip(jnp.maximum(b_blk - 1, 0),
                                           0, NB - 1))
            fin = ct & (g("eof") == 1)
            upd("done", fin, 1)
            upd("fsm", fin, F_IDLE)
            go_prime = reset & ~fin
            upd("rc_blk", go_prime, r_blk)
            upd("bc_blk", go_prime, b_blk)
            upd("fsm", go_prime, F_PRIME)
            to_int(ct & ~reset & ~fin, IP_BLOCKTYPE)

            # --- DISTDIRECT
            c = is_dir & (fsm == F_DISTDIRECT)
            ph1 = c & two_phase
            upd("direct_acc", ph1, dval)
            upd("direct_rem", ph1, 16)
            cd = c & ~two_phase
            upd("elen", cd, (g("direct_acc") << nbits) | dval)
            upd("fsm", cd, F_DISTEXTRA)
            upd("node", cd, 1)

            # --- BADBYTES
            c = is_dir & (fsm == F_BADBYTES)
            wrote2 = c & (nbits == 16)
            bad_b0 = jnp.where(wrote2, dval >> 8, dval) & 0xFF
            bad_b1 = dval & 0xFF
            nwr = jnp.where(wrote2, 2, 1)
            upd("wnd_pos", c, wnd_pos + nwr)
            nszb = size_rem - nwr
            upd("size_rem", c, nszb)
            to_int(c & (nszb == 0), IP_CONT)
            bad_write = c

            # ================== COPY transitions =========================
            c = is_cpy & (cl > 0)
            upd("cpy_done", c, cpy_done + cl)
            upd("wnd_pos", c, wnd_pos + cl)
            ncrem = cpy_rem - cl
            upd("cpy_rem", c, ncrem)
            copy_done = c & (ncrem == 0)
            last_byte = jnp.sum(jnp.where(
                lane128 == jnp.clip(cl - 1, 0, 127)[:, None],
                copy_chunk, 0), axis=1)
            upd("ctx", copy_done, last_byte)
            upd("fsm", copy_done, F_FLAG1)
            upd("err", bad_copy & (g("err") == 0), ERR_CORRUPT)
            upd("done", bad_copy | (g("err") > 0), 1)
            upd("fsm", bad_copy, F_IDLE)

            # ================== PRIME transitions ========================
            upd("rc_code", is_prm, prime_code)
            upd("rc_range", is_prm, jnp.int32(-1))
            upd("rc_ptr", is_prm, rc_ptr + 5)
            upd("bc_val", is_prm, 0)
            upd("bc_bits", is_prm, 0)
            upd("fsm", is_prm, F_INTSLOT)
            upd("int_purpose", is_prm, IP_BLOCKTYPE)
            upd("direct_rem", is_prm, 5)

            # ================== unified window write =====================
            # byte-writers: literal / entropy byte / BAD raw bytes
            one_w = lit_write | ent_write | bad_write
            b0 = jnp.where(lit_write, lit_byte,
                           jnp.where(ent_write, ent_byte,
                                     jnp.where(bad_write, bad_b0, 0)))
            wlen = jnp.where(is_cpy & (cl > 0), cl,
                             jnp.where(bad_write, nwr,
                                       jnp.where(one_w, 1, 0)))
            wbase = wnd_pos  # position before advance
            bytes_vec = jnp.where(_col(is_cpy & (cl > 0)), copy_chunk,
                                  jnp.where(lane128 == 0, b0[:, None],
                                            jnp.where(lane128 == 1,
                                                      bad_b1[:, None], 0)))
            # position into the 2-row ring pair and write
            dsub = (wbase >> 7) & (TS - 1)
            dlane = wbase & 127
            wany = (wlen > 0)

            def _wnd_write(off):
                # all writers are row-capped (copy cl, BADBYTES nwr at
                # lane 127, 1-byte literals) -> single-row write
                dlane_e = dlane + off
                pos128 = _rot_right(bytes_vec, dlane_e, 128)
                v = (lane128 >= dlane_e[:, None]) \
                    & (lane128 < (dlane_e + wlen)[:, None])
                ohd = _row_onehot(dsub, TS) & _col(wany)
                for s in range(TS):
                    m = v & ohd[:, s:s + 1]
                    out_t[:, s, :] = jnp.where(m, pos128, out_t[:, s, :])
                return 0
            jax.lax.cond(jnp.any(wany), lambda: _wnd_write(0),
                         lambda: 0)
            if "write" in _DUP:
                jax.lax.cond(jnp.any(wany), lambda: _wnd_write(dz),
                             lambda: 0)

            # flush request when a 1KB block boundary is crossed
            new_wp = new[_RI["wnd_pos"]]
            flushed = g("flushed_blk")
            crossed = (new_wp >> 10) > flushed
            flush_mask = crossed & live
            req[RQ_FLUSH_P, :] = flushed
            upd("flushed_blk", flush_mask, flushed + 1)

            # ---- ctx-change literal-group prefetch: when a token
            # completes and the NEXT literal/entropy byte will need a
            # different prob group, issue the swap in THIS step's service
            # so the next step's FLAG1 can chain without a stall
            new_ctx = new[_RI["ctx"]]
            pf_key = new_ctx >> 2
            ctx_set = lit_done | copy_done | (ent_done & ~ent_blk_done)
            prefetch = ctx_set & (pf_key != new_grp_key) & live
            swap_any = grp_miss | prefetch
            req[RQ_SWAP_NEW, :] = jnp.where(prefetch, pf_key, want_key)
            req[RQ_SWAP_OLD, :] = grp_key
            new_slot = jnp.where(swap_any, 1 - grp_slot, grp_slot)
            req[RQ_SWAP_SLOT, :] = new_slot
            new_grp_key = jnp.where(prefetch, pf_key, new_grp_key)

            # ---- compacted service request ids (after all masks known)
            emit(RQ_FLUSH_IDS, flush_mask)
            emit(RQ_FETCH_IDS, rd_miss)
            emit(RQ_SWAP_IDS, swap_any)
            emit(RQ_RC_IDS, rc_miss)
            emit(RQ_BC_IDS, bc_miss)
            if "emit" in _DUP:   # spare rows 13-15; service never reads them
                emit(13, flush_mask ^ (dz != 0))
                emit(14, rd_miss ^ (dz != 0))
                emit(15, grp_miss ^ (dz != 0))

            # pointer/overflow hardening (corrupt streams must halt, not
            # run to the step cap or overflow HBM; csc_dec.cpp:508-547)
            wnd_limit = NWS * 128 - 2 * TILE
            over = ((new[_RI["wnd_pos"]] > wnd_limit)
                    | (rc_ptr + 5 > NRCS * 128 - TILE)
                    | (bc_ptr + 4 > NBCS * 128 - TILE)) & live
            upd("err", over & (g("err") == 0), ERR_CORRUPT)
            err_now = new[_RI["err"]] > 0
            upd("done", err_now, 1)
            upd("fsm", err_now & (new[_RI["err"]] == ERR_CORRUPT), F_IDLE)

            # commit pointer/base regs
            upd("rc_base", rc_miss, new_rc_base)
            upd("bc_base", bc_miss, new_bc_base)
            upd("rd_base", rd_miss, new_rd_base)
            upd("grp_key", swap_any, new_grp_key)
            upd("grp_slot", swap_any, new_slot)

            new[_RI["rc_code"]] = jnp.where(is_bit, code,
                                            new[_RI["rc_code"]])
            new[_RI["rc_range"]] = jnp.where(is_bit, rng,
                                             new[_RI["rc_range"]])
            new[_RI["rc_ptr"]] = jnp.where(is_bit, rc_ptr2,
                                           new[_RI["rc_ptr"]])
            new[_RI["rc_blk"]] = jnp.where(is_bit, rc_blk,
                                           new[_RI["rc_blk"]])
            new[_RI["bc_val"]] = jnp.where(is_dir, bc_val,
                                           new[_RI["bc_val"]])
            new[_RI["bc_bits"]] = jnp.where(is_dir, bc_bits,
                                            new[_RI["bc_bits"]])
            new[_RI["bc_ptr"]] = jnp.where(is_dir, bc_ptr2,
                                           new[_RI["bc_ptr"]])
            new[_RI["bc_blk"]] = jnp.where(is_dir, bc_blk,
                                           new[_RI["bc_blk"]])
            # chunk reset: jump both coder pointers to the next framing
            # block start (csc_dec.cpp:657-680; F_PRIME re-reads the code
            # bytes from rc_ptr+1..+4 next step).  Must come after the
            # is_dir commits above — the CONT INTNUM step is a DIRECT op.
            new[_RI["rc_ptr"]] = jnp.where(go_prime, r_start,
                                           new[_RI["rc_ptr"]])
            new[_RI["bc_ptr"]] = jnp.where(go_prime, b_start,
                                           new[_RI["bc_ptr"]])
            return new

        # ---------------- scalar service phase ---------------------------
        def service():
            d = pltpu.make_async_copy(req, smem, sem_req)
            d.start()
            d.wait()

            def serve(ids_row, issue):
                """issue(b) per compacted id until the -1 sentinel;
                returns the summed DMA count.  O(requests) per step."""
                def cond(c):
                    i, _n = c
                    return (i < B) & (smem[ids_row, jnp.minimum(i, B - 1)]
                                      >= 0)

                def body(c):
                    i, n = c
                    return i + 1, n + issue(smem[ids_row, i])
                return jax.lax.while_loop(
                    cond, body, (jnp.int32(0), jnp.int32(0)))[1]

            # 1) flushes (must complete before fetches may read them)
            def fl_issue(b):
                blk = smem[RQ_FLUSH_P, b]
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(out_t.at[b, pl.ds(slot, 8), :],
                                      wnd_out.at[b, pl.ds(dst, 8), :],
                                      sem_fl).start()
                return jnp.int32(1)
            nfl = serve(RQ_FLUSH_IDS, fl_issue)

            def fl_wait(i, _):
                pltpu.make_async_copy(
                    out_t.at[0, pl.ds(0, 8), :],
                    wnd_out.at[0, pl.ds(0, 8), :], sem_fl).wait()
                return _
            jax.lax.fori_loop(0, nfl, fl_wait, 0)

            # 2) rd fetches + group swaps + coder refills
            def ft_issue(b):
                src = pl.multiple_of(smem[RQ_FETCH_P, b], 8)
                pltpu.make_async_copy(wnd_out.at[b, pl.ds(src, 16), :],
                                      rd_t.at[b, :, :], sem_ft).start()
                return jnp.int32(1)
            nft = serve(RQ_FETCH_IDS, ft_issue)

            def sw_issue(b):
                nkey = smem[RQ_SWAP_NEW, b]
                okey = smem[RQ_SWAP_OLD, b]
                nslot = smem[RQ_SWAP_SLOT, b]
                oslot = 1 - nslot

                def wb(c2):
                    osl = pl.multiple_of(oslot * 8, 8)
                    od = pl.multiple_of((okey & 63) * 8, 8)

                    def to_lit(_):
                        pltpu.make_async_copy(
                            grp.at[b, pl.ds(osl, 8), :],
                            plit_out.at[b, pl.ds(od, 8), :],
                            sem_sw).start()
                        return 0

                    def to_dlt(_):
                        pltpu.make_async_copy(
                            grp.at[b, pl.ds(osl, 8), :],
                            pdlt_out.at[b, pl.ds(od, 8), :],
                            sem_sw).start()
                        return 0
                    jax.lax.cond(okey < 64, to_lit, to_dlt, 0)
                    return c2 + 1
                c = jax.lax.cond(okey >= 0, wb, lambda c2: c2,
                                 jnp.int32(1))

                nsl = pl.multiple_of(nslot * 8, 8)
                nd_ = pl.multiple_of((nkey & 63) * 8, 8)

                def from_lit(_):
                    pltpu.make_async_copy(
                        plit_out.at[b, pl.ds(nd_, 8), :],
                        grp.at[b, pl.ds(nsl, 8), :], sem_sw).start()
                    return 0

                def from_dlt(_):
                    pltpu.make_async_copy(
                        pdlt_out.at[b, pl.ds(nd_, 8), :],
                        grp.at[b, pl.ds(nsl, 8), :], sem_sw).start()
                    return 0
                jax.lax.cond(nkey < 64, from_lit, from_dlt, 0)
                return c
            nsw = serve(RQ_SWAP_IDS, sw_issue)

            def rc_issue(b):
                src = pl.multiple_of(smem[RQ_RC_P, b], 8)
                pltpu.make_async_copy(rc_hbm.at[b, pl.ds(src, 16), :],
                                      rc_t.at[b, :, :], sem_rc).start()
                return jnp.int32(1)
            nrc = serve(RQ_RC_IDS, rc_issue)

            def bc_issue(b):
                src = pl.multiple_of(smem[RQ_BC_P, b], 8)
                pltpu.make_async_copy(bc_hbm.at[b, pl.ds(src, 16), :],
                                      bc_t.at[b, :, :], sem_bc).start()
                return jnp.int32(1)
            nbc = serve(RQ_BC_IDS, bc_issue)

            def drain(n, sem, ref_src, ref_dst):
                def w(i, _):
                    pltpu.make_async_copy(ref_src, ref_dst, sem).wait()
                    return _
                jax.lax.fori_loop(0, n, w, 0)
            drain(nft, sem_ft, wnd_out.at[0, pl.ds(0, 16), :],
                  rd_t.at[0, :, :])
            drain(nsw, sem_sw, plit_out.at[0, pl.ds(0, 8), :],
                  grp.at[0, pl.ds(0, 8), :])
            drain(nrc, sem_rc, rc_hbm.at[0, pl.ds(0, 16), :],
                  rc_t.at[0, :, :])
            drain(nbc, sem_bc, bc_hbm.at[0, pl.ds(0, 16), :],
                  bc_t.at[0, :, :])

        # ---------------- main loop --------------------------------------
        def cond(carry):
            step = carry[0]
            done = carry[1][_RI["done"]]
            if "nodone" in _ABL:
                return step < max_steps_ref[0, 0]
            return (step < max_steps_ref[0, 0]) & ~jnp.all(done == 1)

        import os as _os
        _prof = _os.environ.get("PDK_PROF", "")

        def body(carry):
            step, rg = carry
            if _prof == "novec":
                new = list(rg)
                req[:] = jnp.full((NRQ, B), -1, jnp.int32)
            else:
                new = vstep(rg)
                if "vec" in _DUP:
                    # run the whole vector phase twice with a runtime-0
                    # input perturbation; all side effects (req rows,
                    # tile writes) are value-identical, the merge is a
                    # runtime-false select -> semantics unchanged, work
                    # doubled.  Calibrates the section DUP estimates.
                    dz0 = max_steps_ref[0, 0] >> 30
                    new2 = vstep(tuple(r + dz0 for r in rg))
                    new = [jnp.where(dz0 != 0, b2, a)
                           for a, b2 in zip(new, new2)]
            if _prof != "noserv":
                service()
                if "serv" in _DUP:
                    service()
            return step + 1, tuple(new)

        rg0 = tuple(regs_ref[i, :] for i in range(NR))
        steps, rgf = jax.lax.while_loop(cond, body, (jnp.int32(0), rg0))

        for i in range(NR):
            regs_out[i, :] = rgf[i]
        steps_ref[0, 0] = steps

        # ---------------- epilogue: flush pending output blocks --------
        req[RQ_FLUSH_P, :] = rgf[_RI["flushed_blk"]]
        req[RQ_FETCH_P, :] = rgf[_RI["wnd_pos"]]
        d = pltpu.make_async_copy(req, smem, sem_req)
        d.start()
        d.wait()

        def ep_body(b, cnt):
            fblk = smem[RQ_FLUSH_P, b]
            wp = smem[RQ_FETCH_P, b]
            last = wp >> 10
            last = jnp.minimum(last, (NWS // 8) - 1)

            def go1(c):
                blk = fblk
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(
                    out_t.at[b, pl.ds(slot, 8), :],
                    wnd_out.at[b, pl.ds(dst, 8), :], sem_fl).start()
                return c + 1
            cnt = jax.lax.cond(fblk <= last, go1, lambda c: c, cnt)

            def go2(c):
                blk = fblk + 1
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(
                    out_t.at[b, pl.ds(slot, 8), :],
                    wnd_out.at[b, pl.ds(dst, 8), :], sem_fl).start()
                return c + 1
            return jax.lax.cond(fblk + 1 <= last, go2, lambda c: c, cnt)
        nep = jax.lax.fori_loop(0, B, ep_body, 0)

        def ep_wait(i, _):
            pltpu.make_async_copy(out_t.at[0, pl.ds(0, 8), :],
                                  wnd_out.at[0, pl.ds(0, 8), :],
                                  sem_fl).wait()
            return _
        jax.lax.fori_loop(0, nep, ep_wait, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _run(B, NWS, NRCS, NBCS, NB, interpret,
         max_steps, rc_ends, bc_ends, regs, rc_hbm, bc_hbm,
         wnd, plit, pdlt):
    kernel = _make_kernel(B, NWS, NRCS, NBCS, NB)
    out_shapes = (
        jax.ShapeDtypeStruct((B, NWS, 128), jnp.int32),     # wnd (alias)
        jax.ShapeDtypeStruct((B, 512, 128), jnp.int32),     # plit (alias)
        jax.ShapeDtypeStruct((B, 512, 128), jnp.int32),     # pdlt (alias)
        jax.ShapeDtypeStruct((NR, B), jnp.int32),           # regs_out
        jax.ShapeDtypeStruct((B, 2 * NBLK_LOG), jnp.int32),  # blklog
        jax.ShapeDtypeStruct((1, 1), jnp.int32),            # steps
    )
    grid_kwargs = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # max_steps
            pl.BlockSpec(memory_space=pltpu.VMEM),          # rc_ends
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bc_ends
            pl.BlockSpec(memory_space=pltpu.VMEM),          # regs
            pl.BlockSpec(memory_space=pltpu.ANY),           # rc_hbm
            pl.BlockSpec(memory_space=pltpu.ANY),           # bc_hbm
            pl.BlockSpec(memory_space=pltpu.ANY),           # wnd
            pl.BlockSpec(memory_space=pltpu.ANY),           # plit
            pl.BlockSpec(memory_space=pltpu.ANY),           # pdlt
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, NP_ROWS, 128), jnp.int32),       # probs
            pltpu.VMEM((B, TS, 128), jnp.int32),            # grp
            pltpu.VMEM((B, TS, 128), jnp.int32),            # out_t
            pltpu.VMEM((B, TS, 128), jnp.int32),            # rd_t
            pltpu.VMEM((B, TS, 128), jnp.int32),            # rc_t
            pltpu.VMEM((B, TS, 128), jnp.int32),            # bc_t
            pltpu.VMEM((NRQ, B), jnp.int32),                # req
            pltpu.SMEM((NRQ, B), jnp.int32),                # smem
            pltpu.SemaphoreType.DMA,                        # sem_fl
            pltpu.SemaphoreType.DMA,                        # sem_ft
            pltpu.SemaphoreType.DMA,                        # sem_sw
            pltpu.SemaphoreType.DMA,                        # sem_rc
            pltpu.SemaphoreType.DMA,                        # sem_bc
            pltpu.SemaphoreType.DMA,                        # sem_req
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        input_output_aliases={6: 0, 7: 1, 8: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        **grid_kwargs,
    )(max_steps, rc_ends, bc_ends, regs, rc_hbm, bc_hbm, wnd, plit, pdlt)


def _bucket(n, lo=1024):
    b = lo
    while b < n:
        b *= 2
    return b


def _bucket15(n, lo=1024):
    """Smallest of {2^k, 3*2^(k-1)} >= n: a 1.33/1.5-step size ladder.
    Tighter than pow2 (max 33% padding) at ~2x the jit-cache entries;
    used for the wire-dominant coder arrays (the axon host<->device
    tunnel is ~20 MB/s, so every padded byte is wall time)."""
    b = lo
    while True:
        if b >= n:
            return b
        if b + b // 2 >= n:
            return b + b // 2
        b *= 2


@functools.partial(jax.jit, static_argnums=(1,))
def _pack_bytes(wnd_o, lmax):
    """[B, S, 128] byte-per-i32-lane -> [B, lmax/4] packed i32 (device)."""
    w = wnd_o.reshape(wnd_o.shape[0], -1)[:, :lmax]
    return (w[:, 0::4] | (w[:, 1::4] << 8) | (w[:, 2::4] << 16)
            | (w[:, 3::4] << 24))


@functools.partial(jax.jit, static_argnums=(1,))
def _widen(u8_arr, ns):
    """[B, N] u8 -> [B, ns, 128] byte-per-i32-lane (device-side)."""
    return u8_arr.astype(jnp.int32).reshape(u8_arr.shape[0], ns, 128)


def decode_batch_pallas(props_list, blobs, positions=None, out_sizes=None,
                        max_steps=None, interpret=False):
    """Decode B streams with the Pallas kernel.  Returns (outputs,
    fallback_idx): outputs[i] is bytes or None for streams flagged
    ERR_UNSUPPORTED (DT_DLT) which the caller must decode via the XLA
    scan.  Raises DecodeError on ERR_CORRUPT streams (after extracting
    the rest)."""
    from . import framing

    b = len(blobs)
    assert b > 0
    if positions is None:
        positions = [0] * b
    rcs, bcs, rce, bce = [], [], [], []
    for props, blob, pos in zip(props_list, blobs, positions):
        rc, bc, re_, be_ = framing.demux_stream(blob, pos,
                                                props.csc_blocksize)
        rcs.append(rc)
        bcs.append(bc)
        rce.append(re_)
        bce.append(be_)
    rc = framing.batch_pad(rcs, 0, np.uint8)
    bc = framing.batch_pad(bcs, 0, np.uint8)
    rc_ends = framing.pad_ends(rce)
    bc_ends = framing.pad_ends(bce)
    nb = max(rc_ends.shape[1], bc_ends.shape[1])
    re2 = np.full((b, nb), 0x7FFFFFFF, np.int32)
    re2[:, :rc_ends.shape[1]] = rc_ends
    be2 = np.full((b, nb), 0x7FFFFFFF, np.int32)
    be2[:, :bc_ends.shape[1]] = bc_ends

    nrc = _bucket15(rc.shape[1] + TILE + 8)
    nbc = _bucket15(bc.shape[1] + TILE + 8)
    # ship coder inputs as u8 and widen to byte-per-i32-lane on device:
    # the axon tunnel is bandwidth-bound (~20 MB/s), so 4x fewer wire
    # bytes is 4x less transfer wall time
    rc_i = np.zeros((b, nrc), np.uint8)
    rc_i[:, :rc.shape[1]] = rc
    bc_i = np.zeros((b, nbc), np.uint8)
    bc_i[:, :bc.shape[1]] = bc

    if out_sizes is not None:
        wmax = max(max(out_sizes), 1024)
    else:
        wmax = max(p.dict_size for p in props_list)

    # ---- group pipelining: split the batch into G sub-batches and
    # dispatch them back-to-back.  The device runs the kernels FIFO;
    # group k+1's host->device transfer and group k's packed output
    # pull + host post-pass (bytes, inverse filters) overlap group
    # k+1's kernel execution, hiding most of the ~20 MB/s tunnel cost.
    # default 1: on the axon tunnel, dispatch is effectively synchronous
    # and extra device calls cost ~24 ms each, so splitting loses; on a
    # real PCIe TPU host set CSC_DECODE_GROUPS=2 to overlap.
    import os as _os
    G = int(_os.environ.get("CSC_DECODE_GROUPS", "1"))
    if interpret or b < 32 or G < 2:
        groups = [list(range(b))]
    else:
        half = (b + 1) // 2
        groups = [list(range(0, half)), list(range(half, b))]

    from ..golden.decoder import DecodeError
    from .. import native

    outputs = [None] * b
    fallback = []
    corrupt = []
    max_steps_seen = 0

    while True:   # window regrow loop (rare: unknown-output streams)
        nw = _bucket(wmax + 2 * TILE, 4096)
        lmax = min(_bucket(max(wmax, 4), 1024), nw)

        steps_cap = max_steps
        if steps_cap is None:
            steps_cap = int(8 * rc.shape[1] + bc.shape[1] + 64 + 2 * wmax)
        ms = np.array([[steps_cap]], np.int32)

        handles = []
        for idx in groups:
            gb = len(idx)
            regs = np.zeros((NR, gb), np.int32)
            regs[_RI["fsm"], :] = F_PRIME
            regs[_RI["rc_base"], :] = -(1 << 20)
            regs[_RI["bc_base"], :] = -(1 << 20)
            regs[_RI["rd_base"], :] = -(1 << 20)
            regs[_RI["grp_key"], :] = -1

            wnd = jnp.zeros((gb, nw // 128, 128), jnp.int32)
            plit = jnp.full((gb, 512, 128), 2048, jnp.int32)
            pdlt = jnp.full((gb, 512, 128), 2048, jnp.int32)
            rc_d = _widen(jnp.asarray(rc_i[idx]), nrc // 128)
            bc_d = _widen(jnp.asarray(bc_i[idx]), nbc // 128)
            _timing = _os.environ.get("CSC_DECODE_TIMING")
            if _timing:
                rc_d.block_until_ready()
                bc_d.block_until_ready()
                _t0 = __import__("time").time()
            outs = _run(gb, nw // 128, nrc // 128, nbc // 128, nb,
                        bool(interpret),
                        jnp.asarray(ms), jnp.asarray(re2[idx]),
                        jnp.asarray(be2[idx]), jnp.asarray(regs),
                        rc_d, bc_d, wnd, plit, pdlt)
            wnd_o, _, _, regs_o, blklog, steps = outs
            if _timing:
                regs_o.block_until_ready()
                global LAST_KERNEL_SECONDS
                LAST_KERNEL_SECONDS = __import__("time").time() - _t0
            # dispatch the pack now so it runs before the NEXT group's
            # kernel; lmax is window-capacity-based (static)
            packed = _pack_bytes(wnd_o, lmax)
            handles.append((idx, regs_o, blklog, packed, steps))

        regrow = False
        for idx, regs_o, blklog, packed, steps in handles:
            regs_np = np.asarray(regs_o)
            max_steps_seen = max(max_steps_seen,
                                 int(np.asarray(steps)[0, 0]))
            if (out_sizes is None
                    and int(regs_np[_RI["wnd_pos"]].max()) > wmax):
                # decode without declared sizes outgrew the dict-sized
                # window guess (dict < filesize stream): flush positions
                # clamp past capacity — regrow and re-decode everything
                # (bounded by the 1 GB dict cap, csc_typedef.h:12-13)
                if wmax >= (1 << 30):
                    raise DecodeError(
                        "decoded output exceeds 1 GB window cap")
                wmax = int(regs_np[_RI["wnd_pos"]].max()) * 2
                regrow = True
                break
            blklog_np = np.asarray(blklog)
            wnd_np = np.asarray(packed).view(np.uint8)

            out_pos = regs_np[_RI["wnd_pos"]]
            done = regs_np[_RI["done"]]
            err = regs_np[_RI["err"]]
            blk_cnt = regs_np[_RI["blk_cnt"]]
            for j, i in enumerate(idx):
                if err[j] == ERR_UNSUPPORTED:
                    fallback.append(i)
                    continue
                if blk_cnt[j] >= NBLK_LOG:
                    # block-log capacity exceeded: inverse filters could
                    # not be replayed — re-decode via the XLA scan
                    fallback.append(i)
                    continue
                if err[j] == ERR_CORRUPT or not done[j]:
                    corrupt.append(i)
                    continue
                raw = bytearray(wnd_np[j, :out_pos[j]].tobytes())
                n = blk_cnt[j]
                for k in range(min(n, NBLK_LOG)):
                    btype = blklog_np[j, 2 * k]
                    start = blklog_np[j, 2 * k + 1]
                    end = (blklog_np[j, 2 * (k + 1) + 1]
                           if k + 1 < n else out_pos[j])
                    if btype == SIG_EOF:
                        break
                    if btype == DT_EXE:
                        seg = bytearray(raw[start:end])
                        native.e89_inverse(seg)
                        raw[start:end] = seg
                    elif btype == DT_ENGTXT:
                        seg = bytearray(raw[start:end])
                        native.dict_inverse(seg)
                        raw[start:end] = seg
                outputs[i] = bytes(raw)
        if not regrow:
            break
        outputs = [None] * b
        fallback = []
        corrupt = []
    if corrupt:
        raise DecodeError(f"corrupt stream(s) in batch: {corrupt}")
    return outputs, fallback, max_steps_seen
