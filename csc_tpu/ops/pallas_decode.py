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
fits the window (no ring wrap).  DT_DLT blocks decode on-device in the
FILTERED (delta) domain with a host inverse post-pass; streams where a
later LZ copy sources into a delta segment flag ERR_UNSUPPORTED and
fall back to the XLA scan (which fuses the inverse in-window).
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
                         DT_ENGTXT, DT_BAD, DT_ENTROPY, SIG_EOF, DT_DLT,
                         DLT_INDEX)
from .decode_scan import (
    P_STATE, P_REPDIST, P_DIST, P_MDEXTRA, P_MLSLOT, P_MLEX1, P_MLEX2,
    P_MLEX3, P_LONGLEN, P_RLEFLAG,
    F_IDLE, F_FLAG1, F_FLAG2, F_FLAG3, F_LITTREE, F_REPTREE, F_LENSLOT0,
    F_LENSLOT1, F_LENTREE3, F_LENTREE7, F_LONGLEN, F_DISTSLOT, F_DISTEXTRA,
    F_ENTTREE, F_INTSLOT, F_INTNUM, F_DISTDIRECT, F_BADBYTES, F_COPY,
    F_RLEFLAG, F_RLETREE, F_RLERUN,
    IP_BLOCKTYPE, IP_CONT, IP_SIZE_BAD, IP_SIZE_ENT, IP_SIZE_RLE,
    IP_SIZE_TXT, LF_MATCH, LF_REP, LF_RLE,
    _PDIST_POS, _PDIST_BITS,
)

# kernel-only FSM state: coder (re)priming after init / chunk reset
F_PRIME = 22

# ---- step-local chained-phase ids (round 4): one lockstep step walks a
# stream across MULTIPLE probability trees (flags -> len, or dist slot ->
# dist extra) as long as every tree it can touch lies inside the step's
# staged 256-lane window.  A match token then costs ~3 steps (token /
# dist / copy) instead of ~7 (csc_dec.cpp:476-571 trees).
PH_FLAG1, PH_FLAG2, PH_FLAG3, PH_REP = 0, 1, 2, 3
PH_SLOT0, PH_SLOT1, PH_TREE3, PH_TREE7 = 4, 5, 6, 7
PH_LONG, PH_LIT, PH_DSLOT, PH_DEXTRA, PH_ENT = 8, 9, 10, 11, 12
PH_RLEF, PH_DLIT = 13, 14
PH_DWAIT = 16            # len done; dist trees staged at RESTAGE2_BIT
PH_HALT = 15
# step exit kinds (post-loop transition dispatch)
EX_NONE, EX_LIT, EX_ENT, EX_R01, EX_LENDONE, EX_LEN7 = 0, 1, 2, 3, 4, 5
EX_LONG, EX_MATCH, EX_DDBIG, EX_LITP = 6, 7, 8, 9
EX_DLIT, EX_DLITP = 10, 11
# Restage points.  A dist-step entry (F_DISTSLOT) finishes its slot
# tree (sbits<=5 bits) before bit 5, where the extra-nibble row is
# staged.  A TOKEN step fuses the whole match: flags+len trees finish
# by bit 6 (flag1,flag2,slot0[,slot1],lentree3), the dist row pair is
# staged at bit 7, the slot tree (<=5 bits) finishes by bit 11, and
# the extra row is staged at bit 12 — so one 16-bit step decodes an
# entire match token (dist high bits ride the fused bc direct read).
RESTAGE_BIT = 5
RESTAGE2_BIT = 7         # token-step dist pair
RESTAGE3_BIT = 12        # token-step extra row

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
PP_RLE = PP_LEN + 40     # CompressRLE flag bit (csc_model.cpp:483)
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
_OPC[F_RLERUN] = 2                        # constant-byte run writes
_OPC[F_PRIME] = 4

REGS = [
    "fsm", "int_purpose", "int_slot", "direct_acc", "direct_rem",
    "mstate", "ctx", "wnd_pos", "node", "len_acc", "len_phase", "len_for",
    "len_base", "len_tbl", "wire_len", "rep_idx", "slot", "ebits", "elen",
    "pdist_pos", "sbits", "dist", "cpy_src", "cpy_rem", "cpy_done",
    "size_rem", "eof", "done", "blk_start", "blk_cnt",
    "rc_ptr", "rc_blk", "rc_base", "bc_bits", "bc_ptr", "bc_blk",
    "bc_base", "rd_base", "grp_key", "grp_slot", "flushed_blk", "err",
    "rep0", "rep1", "rep2", "rep3", "sctx", "last_delta", "dlt_hi",
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
    rowsel = _tile_one(tile_refs, sub, use_first)
    return jnp.sum(jnp.where(lane_oh, rowsel, 0), axis=1)


def _row_onehot(sub, nrows):
    """[B,nrows] one-hot of per-stream row index.  ONE lane->sublane
    relayout (sub[:,None]) instead of one per unrolled row — the
    per-row masks are then cheap [B,1] column slices."""
    B = sub.shape[0]
    io = jax.lax.broadcasted_iota(jnp.int32, (B, nrows), 1)
    return io == sub[:, None]


def _tile_one(tile_ref, sub, use_first=None, nrows=TS):
    """[B,128] = row sub of a [B,nrows,128] tile (single-row window).
    Unrolled row selects: measured FASTER than a whole-tile masked
    select + sublane reduction on Mosaic (34 vs 30 us/step, round 5)."""
    del use_first
    B = sub.shape[0]
    oh = _row_onehot(sub, nrows)
    lo = jnp.zeros((B, 128), tile_ref.dtype)
    for s in range(nrows):
        lo = lo + jnp.where(oh[:, s:s + 1], tile_ref[:, s, :], 0)
    return lo


def _tile_pair_even(ref, half, nhalf=8):
    """[B,256] = rows (2h, 2h+1) of a [B,2*nhalf,128] tile, h per stream.
    Even-anchored pairs (the literal-ctx subtree pairs: gsub = slot*8 +
    (ctx&3)*2): whole-tile masked select + sublane reduction."""
    B = half.shape[0]
    oh = _row_onehot(half, nhalf)
    lo = jnp.zeros((B, 128), ref.dtype)
    hi = jnp.zeros((B, 128), ref.dtype)
    for s in range(nhalf):
        m = oh[:, s:s + 1]
        lo = lo + jnp.where(m, ref[:, 2 * s, :], 0)
        hi = hi + jnp.where(m, ref[:, 2 * s + 1, :], 0)
    return jnp.concatenate([lo, hi], axis=1)


def _tile_pair(tile_ref, sub, use_first=None, nrows=TS):
    """[B,256] = rows sub and (sub+1)%nrows concatenated."""
    del use_first
    B = sub.shape[0]
    oh = _row_onehot(sub, nrows)
    lo = jnp.zeros((B, 128), jnp.int32)
    hi = jnp.zeros((B, 128), jnp.int32)
    for s in range(nrows):
        row = tile_ref[:, s, :]
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
    KBITS = int(_os.environ.get("PDK_KBITS", "16"))
    assert KBITS >= 16, "fused token+dist step needs 16 bits"
    # PDK_DUP: profiling ablation by DUPLICATION — re-run a section with
    # a runtime-zero perturbation (dz) and discard the result through a
    # runtime-false select, so semantics are unchanged but the section's
    # work doubles.  marginal(dup) - marginal(base) = section cost.
    _DUP = set(filter(None, _os.environ.get("PDK_DUP", "").split(",")))
    # PDK_ABL=nocond: PROFILING ablation — run every gated section
    # unconditionally.  Measured round 5: 32.0 vs 30.0 us/step, i.e.
    # the scf.if overhead is SMALLER than the guarded work, so the
    # conds stay.  Outputs remain correct (guarded writes select on
    # per-lane masks) but one quickcheck stream spuriously flagged
    # UNSUPPORTED under the ablation — not for production use.
    if "nocond" in _ABL:
        def _cnd(pred, tfn, ffn, *ops):
            del pred, ffn
            return tfn(*ops)
    else:
        def _cnd(pred, tfn, ffn, *ops):
            return jax.lax.cond(pred, tfn, ffn, *ops)


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

        probs[:] = jnp.full((B, NP_ROWS, 128), 2048.0, jnp.float32)
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
            _cnd(jnp.any(mask), then, els, 0)

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
            # token/dist steps may consume <=16 fused direct bits (high
            # dist bits, csc_dec.cpp:259-263) -> need bc residency too
            # (is_cpy0: completed copies chain into a full token step)
            bc_miss = (is_dir0 | is_bit0 | is_cpy0) \
                & ((bc_ptr < bc_base) | (bc_ptr + 4 > bc_base + TILE))

            # literal-group residency: LITTREE/ENTTREE use p_lit[ctx]
            # (csc_model.cpp:169-183); RLETREE uses p_delta[sctx]
            # (:493-499), stored as group keys 64-127 of the same tile
            sctx = g("sctx")
            is_rlet = fsm == F_RLETREE
            uses_grp = (fsm == F_LITTREE) | (fsm == F_ENTTREE) | is_rlet
            gctx = jnp.where(is_rlet | (fsm == F_RLEFLAG), sctx, ctx)
            want_key = (gctx >> 2) + jnp.where(
                is_rlet | (fsm == F_RLEFLAG), 64, 0)
            grp_key = g("grp_key")
            grp_miss = is_bit0 & uses_grp & (grp_key != want_key)

            # copy source coverage (F_RLERUN writes a constant byte —
            # no source window, no residency checks)
            is_rrun = is_cpy0 & (fsm == F_RLERUN)
            dist = g("dist")
            src0 = g("cpy_src")
            cpy_done = g("cpy_done")
            cpy_rem = g("cpy_rem")
            sdist = jnp.maximum(dist, 1)
            src_eff = jnp.where(is_rrun, wnd_pos,
                                src0 + cpy_done % sdist)
            avail = jnp.where(is_rrun, CH, wnd_pos - src_eff)
            bad_copy = is_cpy0 & ~is_rrun & ((dist <= 0) | (src0 < 0)
                                             | (avail <= 0))
            out_lo = jnp.maximum(((wnd_pos >> 10) - 1) << 10, 0)
            use_out = src_eff >= out_lo
            rd_base = g("rd_base")
            rd_ok = (src_eff >= rd_base) & (src_eff < rd_base + TILE) \
                & (rd_base >= 0)
            rd_miss = is_cpy0 & ~is_rrun & ~bad_copy & ~use_out & ~rd_ok

            stall = rc_miss | bc_miss | grp_miss | rd_miss
            is_bit = is_bit0 & ~stall
            is_dir = is_dir0 & ~stall
            is_cpy = is_cpy0 & ~stall & ~bad_copy
            is_prm = is_prm0 & ~stall

            dz = max_steps_ref[0, 0] >> 30          # runtime 0 (profiling)
            dcol = jnp.full((B, 1), dz) != 0        # runtime False

            # =================== COPY micro-op ===========================
            # runs BEFORE the bit section: a copy that completes its last
            # chunk this step chains straight into the next token's flag/
            # len bits (fuse_tok), saving one lockstep step per match.
            cl = jnp.minimum(jnp.minimum(cpy_rem, CH), avail)
            cl = jnp.where(use_out, cl,
                           jnp.minimum(cl, rd_base + TILE - src_eff))
            # row caps: keep the read and the write each inside ONE
            # 128-lane row; a crossing copy just takes another COPY step
            cl = jnp.minimum(cl, 128 - (src_eff & 127))
            cl = jnp.minimum(cl, 128 - (wnd_pos & 127))
            cl = jnp.where(is_rrun, jnp.minimum(cl, g("size_rem")), cl)
            cl = jnp.where(is_cpy, jnp.maximum(cl, 0), 0)
            cfin = is_cpy & ~is_rrun & (cl > 0) & (cpy_rem - cl == 0)
            # fuse only when the rc window already covers a full K-bit
            # step; otherwise prefetch rc now so the token step that
            # follows does not stall
            rc_fuse_ok = (rc_ptr >= rc_base) & (rc_ptr + KBITS
                                                <= rc_base + TILE)
            fuse_tok = cfin & rc_fuse_ok
            rc_pref = cfin & ~rc_fuse_ok
            is_bit = is_bit | fuse_tok

            def _copy_read():
                osub = (src_eff >> 7) & (TS - 1)
                row = _tile_one(out_t, osub)

                def _with_rd():
                    rsub = jnp.clip((src_eff - rd_base) >> 7, 0, TS - 1)
                    return jnp.where(_col(use_out), row,
                                     _tile_one(rd_t, rsub))
                return _cnd(jnp.any(is_cpy & ~use_out),
                                    _with_rd, lambda: row)

            # raw (unrotated) source row; rotated into place by the
            # single unified rotate in the window-write section
            copy_row = _cnd(
                jnp.any(is_cpy & ~is_rrun), _copy_read,
                lambda: jnp.zeros((B, 128), jnp.int32))
            # runs write the constant delta byte across the chunk
            copy_row = jnp.where(_col(is_rrun),
                                 jnp.broadcast_to(
                                     g("last_delta")[:, None], (B, 128)),
                                 copy_row)
            if "copy" in _DUP:
                copy_row = jnp.where(dcol, _cnd(
                    jnp.any(is_cpy), _copy_read,
                    lambda: jnp.zeros((B, 128), jnp.int32)), copy_row)

            # ---- request payload rows (ids are emitted compacted at the
            # end of the step, once the flush mask is known).  Window
            # bases are CLAMPED so the last fetch ends exactly at the
            # HBM array end — the host pads rc/bc by only 8 bytes, not a
            # full TILE (the axon tunnel is ~10-20 MB/s; padding is wall
            # time).
            rc_cbase = jnp.minimum((rc_ptr >> 10) << 10, (NRCS - 16) * 128)
            bc_cbase = jnp.minimum((bc_ptr >> 10) << 10, (NBCS - 16) * 128)
            req[RQ_RC_P, :] = jnp.clip(rc_cbase >> 7, 0, NRCS - 16)
            req[RQ_BC_P, :] = jnp.clip(bc_cbase >> 7, 0, NBCS - 16)
            req[RQ_FETCH_P, :] = jnp.clip((src_eff >> 10) << 3, 0,
                                          NWS - 16)
            rc_fetch = rc_miss | rc_pref
            new_rc_base = jnp.where(rc_fetch, rc_cbase, rc_base)
            new_bc_base = jnp.where(bc_miss, bc_cbase, bc_base)
            new_rd_base = jnp.where(rd_miss, (src_eff >> 10) << 10, rd_base)
            grp_slot = g("grp_slot")
            new_grp_key = jnp.where(grp_miss, want_key, grp_key)
            # (RQ_SWAP_* payload rows are written after the transitions,
            # where the ctx-change prefetch mask is known)

            # =================== BIT micro-op (chained) ==================
            # Round-4 redesign: one lockstep step walks a stream across
            # MULTIPLE probability trees (csc_dec.cpp:476-571) as long as
            # every tree it can touch lies inside the step's staged
            # 256-lane window:
            #   token step  (F_FLAG1):  state row (flags+reptree) || len
            #               row -> flags, len slots, lentree3, longlen
            #   dist step   (F_DISTSLOT): dist rows 6||7 -> slot tree,
            #               then (restaged at RESTAGE_BIT) the extra-
            #               nibble row, plus <=16 fused direct bc bits
            #   group steps (F_LITTREE/F_ENTTREE): staged literal-ctx
            #               subtree pair (p_lit[ctx], csc_model.cpp:169)
            #   F_LENTREE7 / F_LONGLEN / F_DISTEXTRA: single-row windows
            # Probability adaptation is DEFERRED: within one step every
            # prob cell is read at most once (tree descents never repeat
            # a node; LONGLEN re-reads park the lane), so deltas
            # accumulate in a register window and flush ONCE via MXU
            # outer products (measured 2.4x cheaper than row-select
            # writeback at B=128).  Framing-block ids are derived lazily
            # at chunk resets instead of per-refill (csc_memio semantics
            # are only consulted there).
            ebits0 = g("ebits")
            m8l = mstate8 & 127
            # per-entry-state window rows (wlo = lanes 0-127, whi = 128+)
            exrow0 = jnp.clip(8 + ((ebits0 - 1) >> 3), 8, NP_ROWS - 1)
            c4 = jnp.full_like(fsm, 4)
            entry_f1 = (fsm == F_FLAG1) | fuse_tok
            lo_row = jnp.where(entry_f1, mstate8 >> 7, c4)
            hi_row = c4
            for _c, _lo in [(fsm == F_LENTREE7, jnp.full_like(fsm, 5)),
                            (fsm == F_RLEFLAG, c4),
                            (fsm == F_DISTSLOT, jnp.full_like(fsm, 6)),
                            (fsm == F_DISTEXTRA, exrow0)]:
                lo_row = jnp.where(_c, _lo, lo_row)
                hi_row = jnp.where(_c, _lo, hi_row)
            hi_row = jnp.where(fsm == F_DISTSLOT, 7, hi_row)

            use_gc = is_bit & uses_grp
            flag1_lit_ok = is_bit & (fsm == F_FLAG1) & (grp_key == want_key)
            rlef_dlit_ok = is_bit & (fsm == F_RLEFLAG) \
                & (grp_key == want_key)
            use_gc_any = use_gc | flag1_lit_ok | rlef_dlit_ok
            gsub_lit = grp_slot * 8 + (gctx & 3) * 2
            lit_pair = _cnd(
                jnp.any(use_gc_any),
                lambda: _tile_pair_even(grp, gsub_lit >> 1),
                lambda: jnp.zeros((B, 256), jnp.float32))

            # small-table window halves: one NP_ROWS pass stages both
            need_small = is_bit & ~uses_grp

            def _stage_small(lo_r=None, hi_r=None):
                lo_r = lo_row if lo_r is None else lo_r
                hi_r = hi_row if hi_r is None else hi_r
                ohlo = _row_onehot(lo_r, NP_ROWS)
                ohhi = _row_onehot(hi_r, NP_ROWS)
                lo = jnp.zeros((B, 128), jnp.float32)
                hi = jnp.zeros((B, 128), jnp.float32)
                for s in range(NP_ROWS):
                    row = probs[:, s, :]
                    lo = lo + jnp.where(ohlo[:, s:s + 1], row, 0)
                    hi = hi + jnp.where(ohhi[:, s:s + 1], row, 0)
                return jnp.concatenate([lo, hi], axis=1)

            small_pair = _cnd(
                jnp.any(need_small), _stage_small,
                lambda: jnp.zeros((B, 256), jnp.float32))
            comb = jnp.where(_col(use_gc), lit_pair, small_pair)

            # next <=256 coder bytes as a register pair (stall check
            # guarantees KBITS-byte residency)
            roff0 = rc_ptr - rc_base
            rc_win_base = rc_base + (roff0 & ~127)
            rc_pair = _cnd(
                jnp.any(is_bit),
                lambda: _tile_pair(rc_t, jnp.clip(roff0 >> 7, 0, TS - 1)),
                lambda: jnp.zeros((B, 256), jnp.int32))
            if "stage" in _DUP:
                lit2 = _cnd(
                    jnp.any(use_gc_any),
                    lambda: _tile_pair_even(grp, (gsub_lit + dz) >> 1),
                    lambda: jnp.zeros((B, 256), jnp.float32))
                small2 = _cnd(
                    jnp.any(need_small),
                    lambda: _stage_small(lo_row + dz, hi_row + dz),
                    lambda: jnp.zeros((B, 256), jnp.float32))
                rc2 = _cnd(
                    jnp.any(is_bit),
                    lambda: _tile_pair(rc_t,
                                       jnp.clip((roff0 + dz) >> 7, 0,
                                                TS - 1)),
                    lambda: jnp.zeros((B, 256), jnp.int32))
                comb = jnp.where(dcol, jnp.where(_col(use_gc), lit2,
                                                 small2), comb)
                rc_pair = jnp.where(dcol, rc2, rc_pair)

            # entry phase + tree params (idx = baser + node, node from 1)
            pdp = g("pdist_pos")
            exbase0 = ((ebits0 - 1) * 16) & 127
            ph = jnp.full_like(fsm, PH_HALT)
            baser = jnp.zeros_like(fsm)
            lim = jnp.full_like(fsm, 2)
            for _c, _p, _b, _l in [
                    (entry_f1, PH_FLAG1, m8l - 1,
                     jnp.full_like(fsm, 2)),
                    (fsm == F_LITTREE, PH_LIT, jnp.zeros_like(fsm),
                     jnp.full_like(fsm, 256)),
                    (fsm == F_ENTTREE, PH_ENT, jnp.zeros_like(fsm),
                     jnp.full_like(fsm, 256)),
                    (fsm == F_LENTREE7, PH_TREE7, jnp.zeros_like(fsm),
                     jnp.full_like(fsm, 128)),
                    (fsm == F_LONGLEN, PH_LONG, jnp.full_like(fsm, 159),
                     jnp.full_like(fsm, 2)),
                    (fsm == F_RLEFLAG, PH_RLEF,
                     jnp.full_like(fsm, 39), jnp.full_like(fsm, 2)),
                    (fsm == F_RLETREE, PH_DLIT, jnp.zeros_like(fsm),
                     jnp.full_like(fsm, 256)),
                    (fsm == F_DISTSLOT, PH_DSLOT, pdp,
                     1 << jnp.clip(g("sbits"), 0, 5)),
                    (fsm == F_DISTEXTRA, PH_DEXTRA, exbase0,
                     jnp.full_like(fsm, 16))]:
                cm = _c & is_bit
                ph = jnp.where(cm, _p, ph)
                baser = jnp.where(cm, _b, baser)
                lim = jnp.where(cm, _l, lim)
            xwait = fsm == F_DISTSLOT

            # NOTE: the gather index is always baser + node (T() and the
            # in-tree update both preserve the invariant), so no
            # separate idxr register is carried — one fewer [B] select
            # per transition per bit.
            rngv, codev, rcp = g("rc_range"), g("rc_code"), rc_ptr
            node = jnp.full_like(fsm, 1)
            exitk = jnp.zeros_like(fsm)
            lit_b = jnp.zeros_like(fsm)
            nibv = jnp.zeros_like(fsm)
            la, lp, lf = g("len_acc"), g("len_phase"), g("len_for")
            lb, wlr, ri = g("len_base"), g("wire_len"), g("rep_idx")
            slv, ebv = g("slot"), g("ebits")
            dacc = jnp.zeros((B, 256), jnp.float32)
            snapA = jnp.zeros((B, 256), jnp.float32)
            snapB = jnp.zeros((B, 256), jnp.float32)
            m_lit = jnp.zeros((B,), jnp.bool_)    # -> literal/delta grp
            m_ex5 = jnp.zeros((B,), jnp.bool_)    # dist-entry -> extra
            m_dist2 = jnp.zeros((B,), jnp.bool_)  # token -> dist pair
            m_ex12 = jnp.zeros((B,), jnp.bool_)   # token dist -> extra
            npdp, nsb = pdp, jnp.clip(g("sbits"), 0, 5)

            for ibit in range(KBITS):
                if ibit == RESTAGE_BIT:
                    # stage the extra-nibble row for slot->extra streams
                    sw2 = (ph == PH_DEXTRA) & xwait & is_bit
                    exrow2 = jnp.clip(8 + ((ebv - 1) >> 3), 8, NP_ROWS - 1)
                    exw = _cnd(
                        jnp.any(sw2),
                        lambda: _tile_one(probs, exrow2, nrows=NP_ROWS),
                        lambda: jnp.zeros((B, 128), jnp.float32))
                    swc = _col(sw2)
                    snapA = jnp.where(swc, dacc, snapA)
                    dacc = jnp.where(swc, 0, dacc)
                    comb = jnp.where(swc,
                                     jnp.concatenate([exw, exw], axis=1),
                                     comb)
                    m_ex5 = m_ex5 | sw2
                if ibit == RESTAGE2_BIT:
                    # token-step fusion: len trees are done by bit 6;
                    # stage the dist row pair (static rows 6||7) and
                    # enter the slot tree in the SAME step
                    swd = (ph == PH_DWAIT) & is_bit
                    swc = _col(swd)
                    snapA = jnp.where(swc, dacc, snapA)
                    dacc = jnp.where(swc, 0, dacc)
                    comb = jnp.where(
                        swc, jnp.concatenate([probs[:, 6, :],
                                              probs[:, 7, :]], axis=1),
                        comb)
                    m_dist2 = m_dist2 | swd
                    ph = jnp.where(swd, PH_DSLOT, ph)
                    baser = jnp.where(swd, npdp, baser)
                    lim = jnp.where(swd, 1 << nsb, lim)
                    node = jnp.where(swd, 1, node)
                if ibit == RESTAGE3_BIT:
                    # token-step extra row (slot tree done by bit 11)
                    sw3 = (ph == PH_DEXTRA) & m_dist2 & is_bit
                    exrow3 = jnp.clip(8 + ((ebv - 1) >> 3), 8, NP_ROWS - 1)
                    exw3 = _cnd(
                        jnp.any(sw3),
                        lambda: _tile_one(probs, exrow3, nrows=NP_ROWS),
                        lambda: jnp.zeros((B, 128), jnp.float32))
                    swc = _col(sw3)
                    snapB = jnp.where(swc, dacc, snapB)
                    dacc = jnp.where(swc, 0, dacc)
                    comb = jnp.where(swc,
                                     jnp.concatenate([exw3, exw3], axis=1),
                                     comb)
                    m_ex12 = m_ex12 | sw3

                # act AFTER the restage conversions (a converted lane
                # decodes its first slot/extra bit in this same bit)
                act = is_bit & (ph != PH_HALT) & (ph != PH_DWAIT)
                if ibit < RESTAGE_BIT:
                    act = act & ~((ph == PH_DEXTRA) & xwait)
                if ibit < RESTAGE3_BIT:
                    act = act & ~((ph == PH_DEXTRA) & m_dist2)

                # rc refill BEFORE the bit (csc_dec.cpp:11-22); block ids
                # are derived lazily at chunk resets, not tracked here
                need = act & _ult(rngv, jnp.int32(1 << 24))
                woff = jnp.clip(rcp - rc_win_base, 0, 255)
                rbyte = jnp.sum(jnp.where(lane256 == woff[:, None],
                                          rc_pair, 0), axis=1)
                rngv = jnp.where(need, rngv << 8, rngv)
                codev = jnp.where(need, (codev << 8) + rbyte, codev)
                rcp = jnp.where(need, rcp + 1, rcp)

                # gather p; adaptation deferred into dacc
                ohm = lane256 == jnp.where(act, baser + node, -1)[:, None]
                p = _i32(jnp.sum(jnp.where(ohm, comb, 0), axis=1))
                bound = _i32(_u32(jnp.where(act, rngv, 0)) >> 12) * p
                b_ = _ult(codev, bound) & act
                dp = jnp.where(b_, (0xFFF - p) >> 5, -(p >> 5))
                dacc = dacc + jnp.where(ohm,
                                        dp.astype(jnp.float32)[:, None], 0)
                rngv = jnp.where(act, jnp.where(b_, bound, rngv - bound),
                                 rngv)
                codev = jnp.where(act & ~b_, codev - bound, codev)

                bi = _i32(b_)
                node2 = node * 2 + bi
                dn = act & (node2 >= lim)
                # in-tree defaults
                nph, nbase, nlim = ph, baser, lim
                nnode = node2
                nla, nlp = la, lp

                def T(m, p2, b2, l2):
                    # enter tree (base b2, lim l2) at node 1
                    nonlocal nph, nbase, nlim, nnode
                    nph = jnp.where(m, p2, nph)
                    nbase = jnp.where(m, b2, nbase)
                    nlim = jnp.where(m, l2, nlim)
                    nnode = jnp.where(m, 1, nnode)

                def H(m, ex):
                    nonlocal nph, exitk
                    nph = jnp.where(m, PH_HALT, nph)
                    exitk = jnp.where(m, ex, exitk)

                # FLAG1 (csc_dec.cpp:513-521)
                m = dn & (ph == PH_FLAG1)
                T(m & b_, PH_FLAG2, m8l, jnp.full_like(fsm, 2))
                go_lit = m & ~b_ & flag1_lit_ok
                T(go_lit, PH_LIT, jnp.zeros_like(fsm),
                  jnp.full_like(fsm, 256))
                H(m & ~b_ & ~flag1_lit_ok, EX_LITP)
                # FLAG2
                m = dn & (ph == PH_FLAG2)
                mb = m & b_
                T(mb, PH_SLOT0, jnp.full_like(fsm, 127),
                  jnp.full_like(fsm, 2))
                lf = jnp.where(mb, LF_MATCH, lf)
                nla = jnp.where(mb, 0, nla)
                nlp = jnp.where(mb, 0, nlp)
                T(m & ~b_, PH_FLAG3, m8l + 1, jnp.full_like(fsm, 2))
                # FLAG3 (rep0len1 on bit 0, csc_dec.cpp:523-529)
                m = dn & (ph == PH_FLAG3)
                T(m & b_, PH_REP, m8l + 3, jnp.full_like(fsm, 4))
                H(m & ~b_, EX_R01)
                # REPTREE (2 bits)
                m = dn & (ph == PH_REP)
                ri = jnp.where(m, node2 & 3, ri)
                lf = jnp.where(m, LF_REP, lf)
                nla = jnp.where(m, 0, nla)
                nlp = jnp.where(m, 0, nlp)
                T(m, PH_SLOT0, jnp.full_like(fsm, 127),
                  jnp.full_like(fsm, 2))
                # LENSLOT0 / LENSLOT1 (csc_model.cpp:113-145 layout)
                m = dn & (ph == PH_SLOT0)
                mb = m & ~b_
                T(mb, PH_TREE3, jnp.full_like(fsm, 144),
                  jnp.full_like(fsm, 8))
                lb = jnp.where(mb, 0, lb)
                T(m & b_, PH_SLOT1, jnp.full_like(fsm, 128),
                  jnp.full_like(fsm, 2))
                m = dn & (ph == PH_SLOT1)
                mb = m & ~b_
                T(mb, PH_TREE3, jnp.full_like(fsm, 152),
                  jnp.full_like(fsm, 8))
                lb = jnp.where(mb, 8, lb)
                mh = m & b_
                lb = jnp.where(mh, 16, lb)
                H(mh, EX_LEN7)
                # LENTREE3 / LENTREE7 -> len complete (+ longlen escape)
                m3 = dn & (ph == PH_TREE3)
                m7 = dn & (ph == PH_TREE7)
                mlc = m3 | m7
                lenv = jnp.where(m3, lb + (node2 & 7), lb + (node2 & 127))
                golong = mlc & (lp == 0) & (lenv == 143)
                mlen_done = mlc & ~golong
                wl2 = jnp.where(lp == 0, lenv, la + lenv)
                wlr = jnp.where(mlen_done, wl2, wlr)
                # match lens finish by bit 6 on every fusable path, so
                # the dist trees run IN THIS STEP (PH_DWAIT converts to
                # PH_DSLOT at RESTAGE2_BIT); rep/rle lens exit to copy
                mlm = mlen_done & (lf == LF_MATCH)
                wl_c2 = jnp.minimum(wl2, 6)
                npdp = jnp.where(mlm, _lut(wl_c2, _PPDIST_POS_NP), npdp)
                nsb = jnp.where(mlm, _lut(wl_c2, _PDIST_BITS), nsb)
                nph = jnp.where(mlm, PH_DWAIT, nph)
                H(mlen_done & (lf != LF_MATCH), EX_LENDONE)
                T(golong & m3, PH_LONG, jnp.full_like(fsm, 159),
                  jnp.full_like(fsm, 2))
                H(golong & m7, EX_LONG)
                nla = jnp.where(golong, la + 143, nla)
                # LONGLEN: bit1 -> second len pass; bit0 -> +143 and park
                # (the same cell would be re-read, csc_dec.cpp len loop)
                m = dn & (ph == PH_LONG)
                mb = m & b_
                T(mb, PH_SLOT0, jnp.full_like(fsm, 127),
                  jnp.full_like(fsm, 2))
                nlp = jnp.where(mb, 1, nlp)
                mz = m & ~b_
                nla = jnp.where(mz, la + 143, nla)
                H(mz, EX_LONG)
                # LITTREE / ENTTREE byte complete
                m = dn & (ph == PH_LIT)
                lit_b = jnp.where(m, node2 & 0xFF, lit_b)
                H(m, EX_LIT)
                m = dn & (ph == PH_ENT)
                lit_b = jnp.where(m, node2 & 0xFF, lit_b)
                H(m, EX_ENT)
                # RLEFLAG: bit0 -> delta literal, bit1 -> run length
                # (CompressRLE, csc_model.cpp:483-499)
                m = dn & (ph == PH_RLEF)
                go_dlit = m & ~b_ & rlef_dlit_ok
                T(go_dlit, PH_DLIT, jnp.zeros_like(fsm),
                  jnp.full_like(fsm, 256))
                H(m & ~b_ & ~rlef_dlit_ok, EX_DLITP)
                mb = m & b_
                lf = jnp.where(mb, LF_RLE, lf)
                nla = jnp.where(mb, 0, nla)
                nlp = jnp.where(mb, 0, nlp)
                T(mb, PH_SLOT0, jnp.full_like(fsm, 127),
                  jnp.full_like(fsm, 2))
                m = dn & (ph == PH_DLIT)
                lit_b = jnp.where(m, node2 & 0xFF, lit_b)
                H(m, EX_DLIT)
                # DISTSLOT (csc_dec.cpp:234-281)
                m = dn & (ph == PH_DSLOT)
                slotv = node2 - lim
                slv = jnp.where(m, slotv, slv)
                H(m & (slotv <= 2), EX_MATCH)
                eb2 = slotv - 2
                mbig = m & (slotv > 2)
                ebv = jnp.where(mbig, eb2, ebv)
                mfuse = mbig & (eb2 <= 20)
                T(mfuse, PH_DEXTRA, ((eb2 - 1) * 16) & 127,
                  jnp.full_like(fsm, 16))
                H(mbig & ~mfuse, EX_DDBIG)
                # DISTEXTRA nibble complete
                m = dn & (ph == PH_DEXTRA)
                nibv = jnp.where(m, node2 & 15, nibv)
                H(m, EX_MATCH)

                # commit
                ph = nph
                baser = jnp.where(act, nbase, baser)
                lim = jnp.where(act, nlim, lim)
                node = jnp.where(act, nnode, node)
                la, lp = nla, nlp

                if ibit == 0:
                    # FLAG1/RLEFLAG bit0 chains into the literal/delta
                    # subtree: switch the window + fresh accumulator
                    sw1b = go_lit | go_dlit
                    swc1 = _col(sw1b)
                    snapA = jnp.where(swc1, dacc, snapA)
                    dacc = jnp.where(swc1, 0, dacc)
                    comb = jnp.where(swc1, lit_pair, comb)
                    m_lit = m_lit | sw1b

            # ---- flush the deferred prob deltas via MXU outer products.
            # Up to three windows per stream: d1 = the entry window
            # (state||len, or the group subtree for gc entries), d2 =
            # the first switch target (literal subtree / dist pair /
            # dist-entry extra row), d3 = the token-path extra row.
            swA = m_lit | m_ex5 | m_dist2
            d1 = jnp.where(_col(swA), snapA, dacc)
            d2 = jnp.where(_col(m_ex12), snapB,
                           jnp.where(_col(swA), dacc, 0.0))
            d3 = jnp.where(_col(m_ex12), dacc, 0.0)
            gc_c = _col(use_gc)
            grp_delta = jnp.where(gc_c, d1,
                                  jnp.where(_col(m_lit), d2, 0.0))
            probs1 = jnp.where(gc_c, 0.0, d1)
            dist2 = jnp.where(_col(m_dist2), d2, 0.0)
            dex = jnp.where(_col(m_ex12), d3[:, :128],
                            jnp.where(_col(m_ex5), d2[:, :128], 0.0))
            exrow_wb = jnp.clip(8 + ((ebv - 1) >> 3), 8, NP_ROWS - 1)
            r6 = jnp.full_like(fsm, 6)
            r7 = jnp.full_like(fsm, 7)

            def _wb_probs(_):
                ohp = jnp.stack([
                    _row_onehot(lo_row, NP_ROWS).astype(jnp.float32),
                    _row_onehot(hi_row, NP_ROWS).astype(jnp.float32),
                    _row_onehot(r6, NP_ROWS).astype(jnp.float32),
                    _row_onehot(r7, NP_ROWS).astype(jnp.float32),
                    _row_onehot(exrow_wb, NP_ROWS).astype(jnp.float32),
                ], axis=1)                               # [B,5,NP_ROWS]
                dparts = jnp.stack([probs1[:, :128], probs1[:, 128:],
                                    dist2[:, :128], dist2[:, 128:],
                                    dex], axis=1)        # [B,5,128]
                upd_p = jax.lax.dot_general(
                    ohp, dparts, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                probs[:, :, :] = probs[:, :, :] + upd_p
                return 0

            # (no "wb" DUP hook: the add-writeback is not idempotent)
            _cnd(jnp.any(need_small & is_bit), _wb_probs,
                         lambda _: 0, 0)

            use_gc2 = use_gc | m_lit

            def _wb_grp(_):
                ohg = jnp.stack([
                    _row_onehot(gsub_lit, TS).astype(jnp.float32),
                    _row_onehot(gsub_lit + 1, TS).astype(jnp.float32),
                ], axis=1)                               # [B,2,TS]
                dg = jnp.stack([grp_delta[:, :128], grp_delta[:, 128:]],
                               axis=1)                   # [B,2,128]
                upd_g = jax.lax.dot_general(
                    ohg, dg, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                grp[:, :, :] = grp[:, :, :] + upd_g
                return 0

            _cnd(jnp.any(use_gc2), _wb_grp, lambda _: 0, 0)
            rc_ptr2 = rcp

            # post-loop exit masks (transition dispatch below)
            lit_chain = m_lit
            exitk = jnp.where(is_bit, exitk, EX_NONE)
            # fused direct bits: matches whose extra nibble completed
            # THIS step (token-fused or dist-entry) with 4<eb<=20 read
            # their high dist bits from the bc stream now (the rc
            # slot+nibble order matches the encoder; rc and bc are
            # independent substreams, csc_memio.cpp:83-108)
            fuse_dir = (exitk == EX_MATCH) & (xwait | m_dist2) \
                & (slv > 2) & (ebv > 4)

            # =================== DIRECT micro-op =========================
            # serves both dedicated DIRECT steps and the fused high-dist
            # bits of a DISTSLOT step (fuse_dir; <=16 bits).  Framing
            # block ids are derived lazily at chunk resets.
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
            is_dird = is_dir | fuse_dir
            nbits = jnp.where(fuse_dir, ebv - 4, nbits)
            nbits = jnp.where(is_dird, nbits, 0)

            def _dir_read(poff=0):
                bc_val_, bc_bits_ = g("bc_val"), g("bc_bits")
                bc_ptr_ = bc_ptr + poff
                # stage the next <=256 bc bytes once; the <=3 refill
                # bytes all lie inside this pair (stall check guarantees
                # bc_ptr+4 <= bc_base+TILE residency)
                boff0 = bc_ptr - bc_base
                bwin_base = bc_base + (boff0 & ~127)
                bc_pair = _tile_pair(bc_t, jnp.clip(boff0 >> 7, 0,
                                                    TS - 1))
                for _ in range(3):
                    need = is_dird & (bc_bits_ < nbits)
                    woffb = jnp.clip(bc_ptr_ - bwin_base, 0, 255)
                    bbyte = jnp.sum(jnp.where(
                        lane256 == woffb[:, None], bc_pair, 0), axis=1)
                    bc_val_ = jnp.where(need, ((bc_val_ << 8) | bbyte),
                                        bc_val_)
                    bc_ptr_ = jnp.where(need, bc_ptr_ + 1, bc_ptr_)
                    bc_bits_ = jnp.where(need, bc_bits_ + 8, bc_bits_)
                shift = jnp.maximum(bc_bits_ - nbits, 0)
                msk = _i32((_u32(jnp.full_like(nbits, 1))
                            << _u32(nbits)) - 1)
                dval_ = jnp.where(is_dird,
                                  _i32(_u32(bc_val_) >> _u32(shift)) & msk,
                                  0)
                bc_bits_ = jnp.where(is_dird, bc_bits_ - nbits, bc_bits_)
                return dval_, bc_val_, bc_bits_, bc_ptr_

            dval, bc_val, bc_bits, bc_ptr2 = _cnd(
                jnp.any(is_dird), _dir_read,
                lambda: (jnp.zeros((B,), jnp.int32), g("bc_val"),
                         g("bc_bits"), bc_ptr))
            if "dir" in _DUP:
                dres = _cnd(
                    jnp.any(is_dird), lambda: _dir_read(dz),
                    lambda: (jnp.zeros((B,), jnp.int32), g("bc_val"),
                             g("bc_bits"), bc_ptr))
                (dval, bc_val, bc_bits, bc_ptr2) = tuple(
                    jnp.where(dz != 0, b2, a) for a, b2 in zip(
                        (dval, bc_val, bc_bits, bc_ptr2), dres))

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

            prime_code = _cnd(
                jnp.any(is_prm), _prime_read,
                lambda: jnp.zeros((B,), jnp.int32))

            # =================== transitions =============================
            new = [rg[i] for i in range(NR)]

            def upd(name, cond, val):
                i = _RI[name]
                new[i] = jnp.where(cond, val, new[i])

            reps = jnp.stack([g("rep0"), g("rep1"), g("rep2"), g("rep3")],
                             axis=1)

            # ---- COPY transitions first: fused streams chain into the
            # next token's bits, whose exit handlers below override fsm
            # and the copy registers (csc_dec.cpp:497-507 window copy)
            c = is_cpy & (cl > 0)
            upd("cpy_done", c, cpy_done + cl)
            upd("wnd_pos", c, wnd_pos + cl)
            ncrem = cpy_rem - cl
            upd("cpy_rem", c, ncrem)
            copy_done = cfin
            last_byte = jnp.sum(jnp.where(
                lane128 == jnp.clip((src_eff & 127) + cl - 1, 0,
                                    127)[:, None],
                copy_row, 0), axis=1)
            upd("ctx", copy_done, last_byte)
            upd("fsm", copy_done, F_FLAG1)
            upd("err", bad_copy & (g("err") == 0), ERR_CORRUPT)
            upd("done", bad_copy | (g("err") > 0), 1)
            upd("fsm", bad_copy, F_IDLE)
            # constant-delta runs: advance sctx + block accounting
            cr = is_rrun & (cl > 0)
            nszr = size_rem - cl
            upd("size_rem", cr, nszr)
            upd("sctx", cr, g("last_delta"))
            rr_blk_done = cr & (nszr == 0)
            rr_end = cr & (cpy_rem - cl == 0) & ~rr_blk_done
            upd("fsm", rr_end, F_RLEFLAG)
            upd("fsm", rr_blk_done, F_INTSLOT)
            upd("int_purpose", rr_blk_done, IP_CONT)
            upd("direct_rem", rr_blk_done, 5)
            # effective window position for this step's token setups
            wnd_eff = wnd_pos + cl

            # ---- commit loop-carried token-decode registers
            upd("len_for", is_bit, lf)
            upd("len_acc", is_bit, la)
            upd("len_phase", is_bit, lp)
            upd("len_base", is_bit, lb)
            upd("wire_len", is_bit, wlr)
            upd("rep_idx", is_bit, ri)
            upd("slot", is_bit, slv)
            upd("ebits", is_bit, ebv)
            upd("pdist_pos", is_bit, npdp)
            upd("sbits", is_bit, nsb)

            # --- EX_LIT: literal byte complete (csc_dec.cpp:513-521)
            lit_done = exitk == EX_LIT
            lit_byte = lit_b
            upd("ctx", lit_done, lit_byte)
            upd("mstate", lit_done, (g("mstate") * 4) & 0x3F)
            upd("wnd_pos", lit_done, wnd_pos + 1)
            upd("fsm", lit_done, F_FLAG1)
            lit_write = lit_done

            # --- EX_LITP: literal group not resident; park + swap
            c = exitk == EX_LITP
            upd("fsm", c, F_LITTREE)
            upd("node", c, 1)

            # --- EX_R01: rep0len1 (csc_dec.cpp:523-529)
            c0 = exitk == EX_R01
            rep0 = g("rep0")
            upd("mstate", c0, (g("mstate") * 4 + 2) & 0x3F)
            upd("dist", c0, rep0)
            # no-ring windows: wnd_pos <= rep0 is a corrupt stream
            upd("err", c0 & (wnd_eff <= rep0) & (g("err") == 0),
                ERR_CORRUPT)
            upd("cpy_src", c0, wnd_eff - rep0)
            upd("cpy_rem", c0, 1)
            upd("cpy_done", c0, 0)
            upd("fsm", c0, F_COPY)

            # --- EX_LEN7 / EX_LONG: next step continues the long trees
            c = exitk == EX_LEN7
            upd("fsm", c, F_LENTREE7)
            upd("node", c, 1)
            c = exitk == EX_LONG
            upd("fsm", c, F_LONGLEN)
            upd("node", c, 1)

            # --- EX_LENDONE dispatch (match -> dist step; rep -> copy)
            len_done = exitk == EX_LENDONE
            wl = wlr
            ld_match = len_done & (lf == LF_MATCH)
            upd("fsm", ld_match, F_DISTSLOT)
            upd("node", ld_match, 1)
            wl_c = jnp.minimum(wl, 6)
            # pdist_pos holds the PADDED layout offset (kernel-local)
            upd("pdist_pos", ld_match, _lut(wl_c, _PPDIST_POS_NP))
            upd("sbits", ld_match, _lut(wl_c, _PDIST_BITS))

            ld_rep = len_done & (lf == LF_REP)
            upd("mstate", ld_rep, (g("mstate") * 4 + 3) & 0x3F)
            rdist = jnp.sum(jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (B, 4), 1)
                == ri[:, None], reps, 0), axis=1)
            # rotate reps[0..rep_idx] (csc_dec.cpp:538-541)
            shifted = jnp.concatenate([rdist[:, None], reps[:, :3]], axis=1)
            reps_rot = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (B, 4), 1)
                <= ri[:, None], shifted, reps)
            for k in range(4):
                upd(f"rep{k}", ld_rep, reps_rot[:, k])
            upd("dist", ld_rep, rdist)
            upd("err", ld_rep & ((rdist <= 0) | (rdist > wnd_eff))
                & (g("err") == 0), ERR_CORRUPT)
            upd("cpy_src", ld_rep, wnd_eff - rdist)
            upd("cpy_rem", ld_rep, wl + 2)
            upd("cpy_done", ld_rep, 0)
            upd("fsm", ld_rep, F_COPY)

            # (LF_RLE unreachable: DT_DLT flagged unsupported)

            # --- EX_DDBIG: >16 direct high-dist bits, legacy 2-step path
            c = exitk == EX_DDBIG
            upd("fsm", c, F_DISTDIRECT)
            upd("direct_rem", c, ebv - 4)
            upd("direct_acc", c, 0)
            upd("elen", c, 0)

            # --- EX_MATCH: dist complete (csc_dec.cpp:234-281; high bits
            # from the fused direct read this step, or the elen register
            # on the legacy F_DISTDIRECT path)
            mc = exitk == EX_MATCH
            small = mc & (slv <= 2)
            legacy_ex = mc & (fsm == F_DISTEXTRA) & (ebv > 4)
            elen_v = jnp.where(fuse_dir, dval,
                               jnp.where(legacy_ex, g("elen"), 0))
            rev = (((nibv & 1) << 3) | ((nibv & 2) << 1)
                   | ((nibv & 4) >> 1) | ((nibv & 8) >> 3))
            dist_big = (_lut(jnp.clip(slv, 0, 32), _DIST_TABLE_NP)
                        + (elen_v << 4) + rev)
            dist_raw = jnp.where(small, slv, dist_big)
            upd("mstate", mc, (g("mstate") * 4 + 1) & 0x3F)
            # fused token steps decode len and dist in the SAME step:
            # read the loop-local wire length, not last step's register
            sentinel = mc & (wlr == 0) & (dist_raw == 64)
            normal_match = mc & ~sentinel
            nd = dist_raw + 1
            upd("dist", normal_match, nd)
            upd("err", normal_match & (nd > wnd_eff) & (g("err") == 0),
                ERR_CORRUPT)
            for k, v in enumerate([nd, reps[:, 0], reps[:, 1], reps[:, 2]]):
                upd(f"rep{k}", normal_match, v)
            upd("cpy_src", normal_match, wnd_eff - nd)
            upd("cpy_rem", normal_match, wlr + 2)
            upd("cpy_done", normal_match, 0)
            upd("fsm", normal_match, F_COPY)
            upd("fsm", sentinel, F_INTSLOT)
            upd("int_purpose", sentinel, IP_CONT)
            upd("direct_rem", sentinel, 5)

            # --- EX_ENT: one order-1 entropy byte
            ent_done = exitk == EX_ENT
            ent_byte = lit_b
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

            # --- EX_DLIT: one delta-domain byte (CompressRLE literal,
            # csc_model.cpp:493-499).  The device window keeps FILTERED
            # bytes for DLT segments; the host post-pass applies the
            # native inverse delta per logged block (csc_dec.cpp:644-651
            # equivalent), so writes stay monotonic in the ring
            dlit_done = exitk == EX_DLIT
            upd("sctx", dlit_done, lit_b)
            upd("last_delta", dlit_done, lit_b)
            upd("wnd_pos", dlit_done, wnd_pos + 1)
            nszd = size_rem - 1
            upd("size_rem", dlit_done, nszd)
            dlt_blk_done = dlit_done & (nszd == 0)
            upd("fsm", dlit_done & ~dlt_blk_done, F_RLEFLAG)
            upd("fsm", dlt_blk_done, F_INTSLOT)
            upd("int_purpose", dlt_blk_done, IP_CONT)
            upd("direct_rem", dlt_blk_done, 5)
            dlit_write = dlit_done
            # --- EX_DLITP: delta group not resident; park + swap
            c = exitk == EX_DLITP
            upd("fsm", c, F_RLETREE)
            upd("node", c, 1)

            # --- EX_LENDONE with LF_RLE: constant-delta run
            ld_rle = len_done & (lf == LF_RLE)
            upd("fsm", ld_rle, F_RLERUN)
            upd("cpy_rem", ld_rle, wl + 11)
            upd("cpy_done", ld_rle, 0)

            # conservative DLT guard: the device window holds DELTA-
            # domain bytes for DLT segments, so a copy sourcing below
            # the last delta segment's end could read filtered data —
            # flag for the XLA-scan fallback (which fuses the inverse)
            to_copy = (exitk == EX_R01) | ld_rep | normal_match
            dlt_guard = to_copy & (new[_RI["cpy_src"]] < g("dlt_hi"))
            upd("err", dlt_guard & (g("err") == 0), ERR_UNSUPPORTED)
            upd("done", dlt_guard, 1)

            # ================== DIRECT transitions =======================
            # The whole DIRECT + PRIME dispatch (block headers, int
            # sizes, chunk resets, BADBYTES, DISTDIRECT, coder priming)
            # runs under ONE cond: these are rare steps on LZ content
            # (~1-3%), and the region carries ~80 selects plus two
            # [B,NB] framing-end reductions every step otherwise.
            def _direct_prime_region(new_t):
                new = list(new_t)

                def upd(name, cond, val):
                    i = _RI[name]
                    new[i] = jnp.where(cond, val, new[i])

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
                blk_cnt = g("blk_cnt")
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
                to_int(t_dlt, IP_SIZE_RLE)
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

                sr = cdone & (ip == IP_SIZE_RLE)
                upd("size_rem", sr, num)
                upd("blk_start", sr, wnd_pos)
                upd("sctx", sr, 0)
                upd("last_delta", sr, 0)
                upd("dlt_hi", sr, wnd_pos + num)
                upd("fsm", sr & (num > 0), F_RLEFLAG)
                to_int(sr & (num == 0), IP_CONT)

                upd("fsm", cdone & (ip == IP_SIZE_TXT), F_FLAG1)

                # --- CONT (chunk reset, csc_dec.cpp:657-680).  The current
                # framing-block id is derived LAZILY here — the refill paths
                # no longer track it per byte: id = #{ends <= ptr}, identical
                # to the old ptr>=end increment rule, consulted only here.
                ct = cdone & (ip == IP_CONT)
                reset = ct & (num == 1)
                r_cnt = jnp.sum(_i32(rc_ends_ref[:] <= rc_ptr[:, None]),
                                axis=1)
                r_start = ends_gather(rc_ends_ref, jnp.clip(r_cnt, 0, NB - 1))
                b_cnt = jnp.sum(_i32(bc_ends_ref[:] <= bc_ptr2[:, None]),
                                axis=1)
                b_start = ends_gather(bc_ends_ref, jnp.clip(b_cnt, 0, NB - 1))
                fin = ct & (g("eof") == 1)
                upd("done", fin, 1)
                upd("fsm", fin, F_IDLE)
                go_prime = reset & ~fin
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

                # ================== PRIME transitions ========================
                upd("rc_code", is_prm, prime_code)
                upd("rc_range", is_prm, jnp.int32(-1))
                upd("rc_ptr", is_prm, rc_ptr + 5)
                upd("bc_val", is_prm, 0)
                upd("bc_bits", is_prm, 0)
                upd("fsm", is_prm, F_INTSLOT)
                upd("int_purpose", is_prm, IP_BLOCKTYPE)
                upd("direct_rem", is_prm, 5)

                # (i1 vectors don't legalize as scf.if results: masks
                # cross the cond boundary as i32)
                return tuple(new) + (bad_b0, bad_b1, nwr, _i32(bad_write),
                                     _i32(bt), num, _i32(go_prime),
                                     r_start, b_start)

            def _skip_region(new_t):
                z = jnp.zeros_like(fsm)
                return tuple(new_t) + (z, z, z, z, z, z, z, z, z)

            _dp_out = _cnd(
                jnp.any(is_dir | is_prm), _direct_prime_region,
                _skip_region, tuple(new))
            new = list(_dp_out[:NR])
            (bad_b0, bad_b1, nwr, bad_write_i, bt_i, num, go_prime_i,
             r_start, b_start) = _dp_out[NR:]
            bad_write = bad_write_i != 0
            bt = bt_i != 0
            go_prime = go_prime_i != 0

            # blk_log one-hot scatter: lanes 2*cnt, 2*cnt+1 (block
            # headers are rare steps; the ref write lives OUTSIDE the
            # region cond — Mosaic cannot legalize ref side effects
            # inside a value-returning scf.if)
            def _log_block(_):
                blk_cnt0 = g("blk_cnt")
                logpos = jnp.minimum(blk_cnt0, max_blocks - 1) * 2
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
            _cnd(jnp.any(bt), _log_block, lambda _: 0, 0)


            # ================== unified window write =====================
            # byte-writers: literal / entropy byte / BAD raw bytes
            one_w = lit_write | ent_write | bad_write | dlit_write
            b0 = jnp.where(lit_write | ent_write | dlit_write, lit_b,
                           jnp.where(bad_write, bad_b0, 0))
            wlen = jnp.where(is_cpy & (cl > 0), cl,
                             jnp.where(bad_write, nwr,
                                       jnp.where(one_w, 1, 0)))
            wbase = wnd_pos  # position before advance
            # ONE unified rotate positions both the (unrotated) copy-
            # source row and the literal/raw bytes (staged at lanes 0/1)
            dsub = (wbase >> 7) & (TS - 1)
            dlane = wbase & 127
            srcl = src_eff & 127
            is_cw = is_cpy & (cl > 0)
            shift = jnp.where(is_cw, (dlane - srcl) & 127, dlane)
            bytes_pre = jnp.where(_col(is_cw), copy_row,
                                  jnp.where(lane128 == 0, b0[:, None],
                                            jnp.where(lane128 == 1,
                                                      bad_b1[:, None], 0)))
            wany = (wlen > 0)

            _WROWS = _os.environ.get("PDK_WRITE", "tile") == "rows"

            def _wnd_write(off):
                # all writers are row-capped (copy cl, BADBYTES nwr at
                # lane 127, 1-byte literals) -> single-row write.  One
                # whole-tile masked select (the [B,TS,128] broadcast is
                # a single VPU pass) instead of TS row-sliced writes.
                pos128 = _rot_right(bytes_pre, (shift + off) & 127, 128)
                v = (lane128 >= (dlane + off)[:, None]) \
                    & (lane128 < (dlane + off + wlen)[:, None])
                ohd = _row_onehot(dsub, TS) & _col(wany)
                if _WROWS:
                    for s in range(TS):
                        m = v & ohd[:, s:s + 1]
                        out_t[:, s, :] = jnp.where(m, pos128,
                                                   out_t[:, s, :])
                    return 0
                m3 = (_i32(ohd)[:, :, None] != 0) & (_i32(v)[:, None, :]
                                                     != 0)
                out_t[:, :, :] = jnp.where(
                    m3, jnp.broadcast_to(pos128[:, None, :],
                                         (B, TS, 128)), out_t[:, :, :])
                return 0
            _cnd(jnp.any(wany), lambda: _wnd_write(0),
                         lambda: 0)
            if "write" in _DUP:
                _cnd(jnp.any(wany), lambda: _wnd_write(dz),
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
            dlt_next = (dlit_done & ~dlt_blk_done) | rr_end
            pf_key = jnp.where(dlt_next,
                               (new[_RI["sctx"]] >> 2) + 64,
                               new_ctx >> 2)
            ctx_set = lit_done | copy_done | (ent_done & ~ent_blk_done) \
                | dlt_next
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
            emit(RQ_RC_IDS, rc_fetch)
            emit(RQ_BC_IDS, bc_miss)
            # scalar flag for the step loop: ANY request at all this
            # step?  Request-free steps (~half of text decode) skip the
            # whole scalar service sweep (req DMA + 5 serve loops).
            any_req = jnp.any(flush_mask | rd_miss | swap_any
                              | rc_fetch | bc_miss)
            if "emit" in _DUP:   # spare rows 13-15; service never reads them
                emit(13, flush_mask ^ (dz != 0))
                emit(14, rd_miss ^ (dz != 0))
                emit(15, grp_miss ^ (dz != 0))

            # pointer/overflow hardening (corrupt streams must halt, not
            # run to the step cap or overflow HBM; csc_dec.cpp:508-547)
            wnd_limit = NWS * 128 - 2 * TILE
            over = ((new[_RI["wnd_pos"]] > wnd_limit)
                    | (rc_ptr + 5 > NRCS * 128 - 8)
                    | (bc_ptr + 4 > NBCS * 128 - 8)) & live
            upd("err", over & (g("err") == 0), ERR_CORRUPT)
            err_now = new[_RI["err"]] > 0
            upd("done", err_now, 1)
            upd("fsm", err_now & (new[_RI["err"]] == ERR_CORRUPT), F_IDLE)

            # commit pointer/base regs
            upd("rc_base", rc_fetch, new_rc_base)
            upd("bc_base", bc_miss, new_bc_base)
            upd("rd_base", rd_miss, new_rd_base)
            upd("grp_key", swap_any, new_grp_key)
            upd("grp_slot", swap_any, new_slot)

            new[_RI["rc_code"]] = jnp.where(is_bit, codev,
                                            new[_RI["rc_code"]])
            new[_RI["rc_range"]] = jnp.where(is_bit, rngv,
                                             new[_RI["rc_range"]])
            new[_RI["rc_ptr"]] = jnp.where(is_bit, rc_ptr2,
                                           new[_RI["rc_ptr"]])
            new[_RI["bc_val"]] = jnp.where(is_dird, bc_val,
                                           new[_RI["bc_val"]])
            new[_RI["bc_bits"]] = jnp.where(is_dird, bc_bits,
                                            new[_RI["bc_bits"]])
            new[_RI["bc_ptr"]] = jnp.where(is_dird, bc_ptr2,
                                           new[_RI["bc_ptr"]])
            # chunk reset: jump both coder pointers to the next framing
            # block start (csc_dec.cpp:657-680; F_PRIME re-reads the code
            # bytes from rc_ptr+1..+4 next step).  Must come after the
            # is_dir commits above — the CONT INTNUM step is a DIRECT op.
            new[_RI["rc_ptr"]] = jnp.where(go_prime, r_start,
                                           new[_RI["rc_ptr"]])
            new[_RI["bc_ptr"]] = jnp.where(go_prime, b_start,
                                           new[_RI["bc_ptr"]])
            return new, any_req

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
                    _cnd(okey < 64, to_lit, to_dlt, 0)
                    return c2 + 1
                c = _cnd(okey >= 0, wb, lambda c2: c2,
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
                _cnd(nkey < 64, from_lit, from_dlt, 0)
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
                any_req = jnp.bool_(True)
            else:
                new, any_req = vstep(rg)
                if "vec" in _DUP:
                    # run the whole vector phase twice with a runtime-0
                    # input perturbation; all side effects (req rows,
                    # tile writes) are value-identical, the merge is a
                    # runtime-false select -> semantics unchanged, work
                    # doubled.  Calibrates the section DUP estimates.
                    dz0 = max_steps_ref[0, 0] >> 30
                    new2, _ = vstep(tuple(r + dz0 for r in rg))
                    new = [jnp.where(dz0 != 0, b2, a)
                           for a, b2 in zip(new, new2)]
            if _prof != "noserv":
                def _serve(_):
                    service()
                    if "serv" in _DUP:
                        service()
                    return 0
                _cnd(any_req, _serve, lambda _: 0, 0)
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
            cnt = _cnd(fblk <= last, go1, lambda c: c, cnt)

            def go2(c):
                blk = fblk + 1
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(
                    out_t.at[b, pl.ds(slot, 8), :],
                    wnd_out.at[b, pl.ds(dst, 8), :], sem_fl).start()
                return c + 1
            return _cnd(fblk + 1 <= last, go2, lambda c: c, cnt)
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
        jax.ShapeDtypeStruct((B, 512, 128), jnp.float32),   # plit (alias)
        jax.ShapeDtypeStruct((B, 512, 128), jnp.float32),   # pdlt (alias)
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
            pltpu.VMEM((B, NP_ROWS, 128), jnp.float32),     # probs
            pltpu.VMEM((B, TS, 128), jnp.float32),          # grp
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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _run_fused(B, NWS, NRCS, NBCS, NB, interpret, lmax,
               max_steps, rc_ends, bc_ends, rc_u8, bc_u8):
    """One-device-call decode: widen the u8 coder inputs, build the
    window/prob/reg initial states, run the kernel, and pack the output
    bytes — all inside a single jit (the axon tunnel costs ~24 ms per
    device call, so every fused call is wall time saved).

    Returns ONE combined [B, lmax/4 + 2*NBLK_LOG + NR + 1] i32 array:
      [:, :lmax/4]        packed output bytes (4 per i32)
      [:, +2*NBLK_LOG]    blklog
      [:, +NR]            regs (batch-major)
      [:, -1]             steps (broadcast)
    A single D2H transfer instead of four: each distinct pull over the
    axon tunnel costs ~35 ms latency regardless of size."""
    rc_hbm = _widen(rc_u8, NRCS)
    bc_hbm = _widen(bc_u8, NBCS)
    wnd = jnp.zeros((B, NWS, 128), jnp.int32)
    plit = jnp.full((B, 512, 128), 2048.0, jnp.float32)
    pdlt = jnp.full((B, 512, 128), 2048.0, jnp.float32)
    regs = jnp.zeros((NR, B), jnp.int32)
    regs = regs.at[_RI["fsm"], :].set(F_PRIME)
    for _r in ("rc_base", "bc_base", "rd_base"):
        regs = regs.at[_RI[_r], :].set(-(1 << 20))
    regs = regs.at[_RI["grp_key"], :].set(-1)
    outs = _run(B, NWS, NRCS, NBCS, NB, interpret,
                max_steps, rc_ends, bc_ends, regs, rc_hbm, bc_hbm,
                wnd, plit, pdlt)
    wnd_o, _, _, regs_o, blklog, steps = outs
    packed = _pack_bytes(wnd_o, lmax)
    return jnp.concatenate(
        [packed, blklog, regs_o.T,
         jnp.broadcast_to(steps.reshape(1, 1), (B, 1))], axis=1)


def _run_fused_sharded(mesh, B, NWS, NRCS, NBCS, NB, interpret, lmax,
                       max_steps, rc_ends, bc_ends, rc_u8, bc_u8):
    """Multi-chip variant: shard the stream batch over every mesh axis
    (dp x sp — archiver tasks and -p splits, SURVEY §2.3) and run the
    SAME Pallas mega-kernel per shard via shard_map.  Streams are
    independent (csa_worker.cpp:35: one codec instance per task), so no
    collectives appear on the hot path — scaling is linear by design."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:                     # newer jax
        from jax.sharding import shard_map
    ndev = mesh.size
    assert B % ndev == 0
    axes = tuple(mesh.axis_names)
    bspec = P(axes)
    f = functools.partial(_run_fused, B // ndev, NWS, NRCS, NBCS, NB,
                          interpret, lmax)
    fn = shard_map(f, mesh=mesh,
                   in_specs=(P(None, None), P(axes, None), P(axes, None),
                             bspec, bspec),
                   out_specs=P(axes, None),
                   check_rep=False)
    return jax.jit(fn)(max_steps, rc_ends, bc_ends, rc_u8, bc_u8)


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


def _pull_parallel(comb, nparts=4, min_bytes=4 << 20):
    """D2H pull of a [B, W] device array over concurrent row-slices.

    The axon tunnel serializes per-transfer at ~7-17 MB/s but carries
    ~25-29 MB/s over 4 concurrent streams for multi-MB payloads
    (measured round 5); below ~4 MB the extra per-slice device ops and
    transfer setups lose to a single shot, so small arrays keep the
    single np.asarray.  A real PCIe host is indifferent either way."""
    if comb.size * 4 < min_bytes or comb.shape[0] < nparts:
        return np.asarray(comb)
    from concurrent.futures import ThreadPoolExecutor
    b = comb.shape[0]
    bounds = [b * i // nparts for i in range(nparts + 1)]
    parts = [comb[bounds[i]:bounds[i + 1]] for i in range(nparts)]
    for p in parts:
        p.block_until_ready()
    with ThreadPoolExecutor(nparts) as ex:
        rows = list(ex.map(np.asarray, parts))
    return np.concatenate(rows, axis=0)


def decode_batch_pallas(props_list, blobs, positions=None, out_sizes=None,
                        max_steps=None, interpret=False, mesh=None):
    """Decode B streams with the Pallas kernel.  Returns (outputs,
    fallback_idx): outputs[i] is bytes or None for streams flagged
    ERR_UNSUPPORTED (DT_DLT) which the caller must decode via the XLA
    scan.  Raises DecodeError on ERR_CORRUPT streams (after extracting
    the rest)."""
    from . import framing

    import os as _os2
    import time as _tm
    _t2 = bool(_os2.environ.get("CSC_DECODE_TIMING2"))
    _tt = _tm.time()

    def _lap(tag):
        nonlocal _tt
        if _t2:
            now = _tm.time()
            print(f"[dec] {tag} {now - _tt:.3f}s")
            _tt = now

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

    nrc = _bucket15(rc.shape[1] + 8, 2048)
    nbc = _bucket15(bc.shape[1] + 8, 2048)
    # ship coder inputs as u8 and widen to byte-per-i32-lane on device:
    # the axon tunnel is bandwidth-bound (~20 MB/s), so 4x fewer wire
    # bytes is 4x less transfer wall time
    rc_i = np.zeros((b, nrc), np.uint8)
    rc_i[:, :rc.shape[1]] = rc
    bc_i = np.zeros((b, nbc), np.uint8)
    bc_i[:, :bc.shape[1]] = bc

    _lap("demux+pad")
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
    if interpret or b < 32 or G < 2 or mesh is not None:
        groups = [list(range(b))]
    else:
        half = (b + 1) // 2
        groups = [list(range(0, half)), list(range(half, b))]
    # mesh sharding: pad the batch to a multiple of the mesh size by
    # replicating stream 0 (decoded results for pad slots are dropped)
    npad = 0
    if mesh is not None:
        ndev = mesh.size
        npad = (-b) % ndev
        if npad:
            groups = [groups[0] + [0] * npad]

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
            _timing = _os.environ.get("CSC_DECODE_TIMING")
            if _timing:
                _t0 = __import__("time").time()
            args = (jnp.asarray(ms), jnp.asarray(re2[idx]),
                    jnp.asarray(be2[idx]), jnp.asarray(rc_i[idx]),
                    jnp.asarray(bc_i[idx]))
            if mesh is not None:
                comb = _run_fused_sharded(
                    mesh, gb, nw // 128, nrc // 128, nbc // 128, nb,
                    bool(interpret), lmax, *args)
            else:
                comb = _run_fused(
                    gb, nw // 128, nrc // 128, nbc // 128, nb,
                    bool(interpret), lmax, *args)
            if _timing:
                comb.block_until_ready()
                global LAST_KERNEL_SECONDS
                LAST_KERNEL_SECONDS = __import__("time").time() - _t0
            handles.append((idx, comb))

        _lap("device_call")
        regrow = False
        po = lmax // 4
        for idx, comb in handles:
            comb_np = _pull_parallel(comb)
            _lap("output pull")
            blklog_np = comb_np[:, po:po + 2 * NBLK_LOG]
            regs_np = comb_np[:, po + 2 * NBLK_LOG:
                              po + 2 * NBLK_LOG + NR].T
            max_steps_seen = max(max_steps_seen,
                                 int(comb_np[:, -1].max()))
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
            wnd_np = np.ascontiguousarray(
                comb_np[:, :po]).view(np.uint8)

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
                    elif DT_DLT <= btype < DT_DLT + 5:
                        # kernel wrote the FILTERED (delta) bytes;
                        # apply the native inverse (csc_dec.cpp:644-651)
                        seg = bytearray(raw[start:end])
                        native.delta_inverse(
                            seg, DLT_INDEX[btype - DT_DLT])
                        raw[start:end] = seg
                outputs[i] = bytes(raw)
            _lap("post-pass")
        if not regrow:
            break
        outputs = [None] * b
        fallback = []
        corrupt = []
    if corrupt:
        raise DecodeError(f"corrupt stream(s) in batch: {corrupt}")
    return outputs, fallback, max_steps_seen
