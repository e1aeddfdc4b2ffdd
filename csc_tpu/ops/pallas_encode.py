"""Pallas lockstep CSC encoder, phase B: token tapes -> coded bytes.

TPU-native port of encode_bits.py (the driven mirror of the decode
kernel; csc_coder.h:67-81 EncodeBit, csc_coder.cpp:76-112 EncDirect16 +
RC_ShiftLow semantics).  Same design rules as pallas_decode.py:

* whole phase B runs inside ONE pallas_call (internal while_loop);
* K-bit unrolled steps: bit 0 serves any BIT state, bits 1..K-1 continue
  streams still inside the SAME driven tree walk (fsm unchanged), so the
  transition logic runs once on the final node/counters;
* per-step register windows kill per-bit VMEM traffic: the small-table
  256-lane state window, the literal ctx subtree pair, and 256-lane
  output windows for the rc/bc byte streams (flushed to 2-block VMEM
  ring tiles after the K bits, DMA'd to HBM on 1KB crossings);
* compacted service requests (-1-sentinel id lists) keep the scalar DMA
  sweep O(requests).

Outputs mirror encode_bits.run_bits: rc/bc byte streams, 64KB-boundary
cross logs for MemIO remux (rc_blkmap/bc_blkmap), per-chunk flush log.
Probabilities persist across chunk flushes (csc_encoder_main.cpp:141-145).
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DIST_TABLE, REV16_TABLE
from .decode_scan import (P_STATE, P_REPDIST, P_DIST, P_MDEXTRA, P_MLSLOT,
                          P_MLEX1, P_MLEX2, P_MLEX3, P_LONGLEN, P_RLEFLAG,
                          _PDIST_POS, _PDIST_BITS)
from .encode_scan import K_LIT, K_MATCH, K_REP, K_REP0L1, K_END
from .encode_bits import (K_INT, K_SENT, K_FLUSH, K_RAW, K_ELIT, K_DLIT,
                          K_RLEN)
from .pallas_decode import (_col, _u32, _i32, _ult, _tile_pair, _tile_gather,
                            _row_onehot, _lut, _bucket, NP_ROWS, TS, BLK,
                            TILE)

# fsm ids (mirror encode_bits.py B_*)
F_DONE = 0
F_NEXT = 1
F_FLAG = 2
F_LITTREE = 3
F_REPTREE = 4
F_LENSLOT = 5
F_LENTREE = 6
F_LONGLEN = 7
F_DISTSLOT = 8
F_DISTEXTRA = 9
F_DISTDIRECT = 10
F_INT = 11
F_FLUSH = 12
F_RAW = 13
F_RLEFLAG = 14    # CompressRLE flag bit (csc_model.cpp:483,492)
F_DLITTREE = 15   # CompressRLE literal via p_delta[s_ctx] (:493-499)

_DIST_TABLE_NP = np.array(DIST_TABLE, np.int64)
_REV16_NP = np.array(REV16_TABLE, np.int32)

NBLKMAP = 64        # 64KB-boundary events per substream
NCHUNK = 64         # chunk flush log entries

REGS = [
    "fsm", "tok_i", "kind", "va", "vb", "vc", "flag_i", "node", "bits_c",
    "len_phase", "len_left", "lenv", "len_tbl", "sub_i", "slot", "ebits",
    "elen", "pdist_pos", "sbits", "dir_val", "dir_rem", "after_len",
    "flush_i", "mstate", "ctx",
    "low", "lowhi", "range", "cache", "cachesize", "pending", "pend_carry",
    "bc_val", "bc_bits",
    "rc_cnt", "bc_cnt", "rc_flushed", "bc_flushed", "tok_base",
    "grp_key", "grp_slot", "chunk_cnt", "err", "done",
]
NR = len(REGS)
_RI = {n: i for i, n in enumerate(REGS)}

ERR_NONE = 0
ERR_OVERFLOW = 1    # rc/bc output buffer exhausted -> host falls back

# service request rows (same layout discipline as pallas_decode)
RQ_RCFL_IDS = 1     # rc ring-block flush
RQ_BCFL_IDS = 2     # bc ring-block flush
RQ_TOK_IDS = 3      # token tile fetch
RQ_SWAP_IDS = 4     # literal prob group swap
RQ_RCFL_P = 5
RQ_BCFL_P = 6
RQ_TOK_P = 7
RQ_SWAP_NEW = 8
RQ_SWAP_OLD = 9
RQ_SWAP_SLOT = 10
NRQ = 16

_BIT_STATES = (F_FLAG, F_LITTREE, F_REPTREE, F_LENSLOT, F_LENTREE,
               F_LONGLEN, F_DISTSLOT, F_DISTEXTRA, F_RLEFLAG, F_DLITTREE)


def _make_kernel(B, NTS, NRS, NBS, KBITS):
    """NTS/NRS/NBS: sublane counts of token / rc-out / bc-out HBM arrays
    (x128 lanes).  Tokens: token t = lanes 4t..4t+3 (kind,a,b,c)."""

    def kernel(max_steps_ref, bsize_ref,       # SMEM (1,1)
               regs_ref,                       # VMEM [NR, B]
               tok_hbm,                        # ANY [B, NTS, 128]
               plit_hbm,                       # ANY [B, 1024, 128]: p_lit
                                               # rows 0-511, p_delta 512-1023
               rc_hbm, bc_hbm,                 # ANY (aliased outputs)
               plit_out, rc_out, bc_out,       # aliased with inputs
               regs_out,                       # VMEM [NR, B]
               rcmap_ref, bcmap_ref,           # VMEM [B, NBLKMAP]
               clog_ref,                       # VMEM [B, 2*NCHUNK]
               steps_ref,                      # SMEM (1,1)
               probs, grp, tok_t, rc_t, bc_t,  # scratch VMEM
               req, smem,
               sem_rc, sem_bc, sem_tok, sem_sw, sem_req):
        del plit_hbm, rc_hbm, bc_hbm   # writes go through the output refs
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        lane256 = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
        lane_map = jax.lax.broadcasted_iota(jnp.int32, (B, NBLKMAP), 1)
        lane_clog = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * NCHUNK), 1)
        iota_1b = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        slot_bb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        src_bb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)

        probs[:] = jnp.full((B, NP_ROWS, 128), 2048, jnp.int32)
        rcmap_ref[:] = jnp.zeros((B, NBLKMAP), jnp.int32)
        bcmap_ref[:] = jnp.zeros((B, NBLKMAP), jnp.int32)
        clog_ref[:] = jnp.zeros((B, 2 * NCHUNK), jnp.int32)

        def compact(mask):
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
            def then(_):
                req[row, :] = compact(mask)
                return 0

            def els(_):
                req[row, :] = jnp.full((B,), -1, jnp.int32)
                return 0
            jax.lax.cond(jnp.any(mask), then, els, 0)

        # ---------------- vector phase --------------------------------
        def vstep(rg):
            g = lambda n: rg[_RI[n]]
            fsm = g("fsm")
            live = (g("done") == 0)
            mstate3 = g("mstate") * 3
            ctx = g("ctx")
            kind = g("kind")
            bsize = bsize_ref[0, 0]

            _false = jnp.zeros((B,), jnp.int32) != 0
            _true = ~_false
            is_bitst = _false
            for f in _BIT_STATES:
                is_bitst = is_bitst | (fsm == f)
            # a pending carry run blocks every state until drained
            # (encode_bits.py: active = alive & pending == 0)
            quiet = g("pending") == 0
            is_next0 = live & quiet & (fsm == F_NEXT)
            is_int = live & quiet & (fsm == F_INT)
            is_raw = live & quiet & (fsm == F_RAW)
            is_dird = live & quiet & (fsm == F_DISTDIRECT)
            is_flush = live & quiet & (fsm == F_FLUSH)

            # ---- resource checks -> stalls + requests
            # token tile residency (4 lanes per token)
            tok_base = g("tok_base")
            tlane = g("tok_i") * 4
            tok_miss = is_next0 & ((tlane < tok_base)
                                   | (tlane + 4 > tok_base + TILE))
            # literal group residency: LITTREE uses p_lit[ctx]; DLITTREE
            # uses p_delta[s_ctx] = vb (keys 64-127 of the shared table)
            grp_key = g("grp_key")
            grp_slot = g("grp_slot")
            is_dlt_t = fsm == F_DLITTREE
            uses_grp = (fsm == F_LITTREE) | is_dlt_t
            gctx = jnp.where(is_dlt_t, g("vb"), ctx)
            want_key = (gctx >> 2) + jnp.where(is_dlt_t, 64, 0)
            grp_miss = live & is_bitst & uses_grp & (grp_key != want_key)

            stall = tok_miss | grp_miss
            is_bit = live & is_bitst & ~stall
            is_next = is_next0 & ~stall

            req[RQ_TOK_P, :] = jnp.clip((tlane >> 10) << 3, 0, NTS - 16)
            new_tok_base = jnp.where(tok_miss, (tlane >> 10) << 10,
                                     tok_base)
            req[RQ_SWAP_NEW, :] = want_key
            req[RQ_SWAP_OLD, :] = grp_key
            new_slot = jnp.where(grp_miss, 1 - grp_slot, grp_slot)
            req[RQ_SWAP_SLOT, :] = new_slot
            new_grp_key = jnp.where(grp_miss, want_key, grp_key)

            # ---- stage per-step register windows
            # small-table window anchored by the bit-0 state
            node0 = g("node")
            base_small = jnp.zeros_like(node0)
            for _c, _v in [
                    (fsm == F_FLAG, P_STATE + mstate3),
                    (fsm == F_REPTREE, P_REPDIST + mstate3),
                    (fsm == F_LENSLOT, jnp.full_like(node0, P_MLSLOT)),
                    (fsm == F_LENTREE,
                     jnp.where(g("len_tbl") == 1, P_MLEX1,
                               jnp.where(g("len_tbl") == 2, P_MLEX2,
                                         P_MLEX3))),
                    (fsm == F_LONGLEN, jnp.full_like(node0, P_LONGLEN)),
                    (fsm == F_RLEFLAG, jnp.full_like(node0, P_RLEFLAG)),
                    (fsm == F_DISTSLOT, P_DIST + g("pdist_pos")),
                    (fsm == F_DISTEXTRA,
                     P_MDEXTRA + (g("ebits") - 1) * 16)]:
                base_small = jnp.where(_c, _v, base_small)
            use_small0 = is_bit & ~uses_grp
            use_gc0 = is_bit & uses_grp
            win_base = base_small & ~127
            win_row = jnp.clip(win_base >> 7, 0, NP_ROWS - 2)
            small_pair = jax.lax.cond(
                jnp.any(use_small0),
                lambda: _tile_pair(probs, win_row, nrows=NP_ROWS),
                lambda: jnp.zeros((B, 256), jnp.int32))
            gsub_lit = grp_slot * 8 + (gctx & 3) * 2

            def _lit_pair_even():
                # gsub_lit is always even: lo rows are the 8 even rows,
                # hi rows the 8 odd ones — half the staging selects
                oh = _row_onehot(gsub_lit >> 1, TS // 2)
                lo = jnp.zeros((B, 128), jnp.int32)
                hi = jnp.zeros((B, 128), jnp.int32)
                for s in range(TS // 2):
                    lo = lo + jnp.where(oh[:, s:s + 1], grp[:, 2 * s, :], 0)
                    hi = hi + jnp.where(oh[:, s:s + 1],
                                        grp[:, 2 * s + 1, :], 0)
                return jnp.concatenate([lo, hi], axis=1)

            lit_pair = jax.lax.cond(
                jnp.any(use_gc0), _lit_pair_even,
                lambda: jnp.zeros((B, 256), jnp.int32))

            # rc/bc output windows (current partial content staged in)
            rc_cnt0 = g("rc_cnt")
            bc_cnt0 = g("bc_cnt")
            rc_wbase = rc_cnt0 & ~127
            bc_wbase = bc_cnt0 & ~127
            rc_row = (rc_wbase >> 7) & (TS - 1)
            bc_row = (bc_wbase >> 7) & (TS - 1)
            may_rc = is_bit | is_flush | (live & (g("pending") > 0))
            may_bc = is_int | is_dird | is_flush | is_raw
            rc_pair = jax.lax.cond(
                jnp.any(may_rc),
                lambda: _tile_pair(rc_t, rc_row),
                lambda: jnp.zeros((B, 256), jnp.int32))
            bc_pair = jax.lax.cond(
                jnp.any(may_bc),
                lambda: _tile_pair(bc_t, bc_row),
                lambda: jnp.zeros((B, 256), jnp.int32))

            # crossing logs accumulated during the step
            rcmap_idx = jnp.full((B,), -1, jnp.int32)
            rcmap_val = jnp.zeros((B,), jnp.int32)
            bcmap_idx = jnp.full((B,), -1, jnp.int32)
            bcmap_val = jnp.zeros((B,), jnp.int32)

            rc_cnt, bc_cnt = rc_cnt0, bc_cnt0
            low = g("low")
            lowhi = g("lowhi")
            rng = g("range")
            cache = g("cache")
            cachesize = g("cachesize")
            pending = g("pending")
            pend_carry = g("pend_carry")

            def rc_emit(pair, cnt, byte, mask, other_cnt,
                        midx, mval):
                """Append byte at cnt where mask; log 64KB crossings."""
                oh = lane256 == jnp.where(mask, cnt - rc_wbase, -1)[:, None]
                pair = jnp.where(oh, jnp.broadcast_to(byte[:, None],
                                                      (B, 256)), pair)
                ncnt = jnp.where(mask, cnt + 1, cnt)
                crossed = mask & (ncnt > 0) & (ncnt % bsize == 0)
                midx = jnp.where(crossed,
                                 jnp.clip(ncnt // bsize - 1, 0,
                                          NBLKMAP - 1), midx)
                mval = jnp.where(crossed, other_cnt, mval)
                return pair, ncnt, midx, mval

            # ---------------- K-bit loop ------------------------------
            flag_i = g("flag_i")
            node = node0
            bits_c = g("bits_c")
            sub_i = g("sub_i")
            len_left = g("len_left")
            lenv = g("lenv")
            sbits = g("sbits")
            is_l3 = g("len_tbl") != 3

            nflags = jnp.where(kind == K_LIT, 1,
                               jnp.where((kind == K_MATCH)
                                         | (kind == K_SENT), 2, 3))
            state_open = _true

            for ibit in range(KBITS):
                # completion check from the running counters
                open_now = _true
                for _f, _cond in [
                        (F_FLAG, flag_i < nflags),
                        (F_LITTREE, node < 0x100),
                        (F_DLITTREE, node < 0x100),
                        (F_RLEFLAG, flag_i < 1),
                        (F_REPTREE, sub_i < 2),
                        (F_LENSLOT, ((lenv < 8) & (sub_i < 1))
                         | ((lenv >= 8) & (sub_i < 2))),
                        (F_LENTREE, (is_l3 & (node < 0x8))
                         | (~is_l3 & (node < 0x80))),
                        (F_LONGLEN, _true),
                        (F_DISTSLOT, node < (1 << jnp.clip(sbits, 0, 5))),
                        (F_DISTEXTRA, node < 0x10)]:
                    open_now = ((open_now & (fsm != _f))
                                | ((fsm == _f) & _cond))
                state_open = state_open & open_now
                # LONGLEN closes after emitting its 1-bit
                lls_done = (fsm == F_LONGLEN) & (len_left < 0)
                state_open = state_open & ~lls_done

                drain = live & (pending > 0)
                act = is_bit & state_open & (pending == 0)

                # serve pending carry-run bytes first (rare: carry runs)
                def _drain(args):
                    rp, rcn, mi, mv = args
                    run_byte = (0xFF + pend_carry) & 0xFF
                    return rc_emit(rp, rcn, run_byte, drain, bc_cnt,
                                   mi, mv)
                rc_pair, rc_cnt, rcmap_idx, rcmap_val = jax.lax.cond(
                    jnp.any(drain), _drain, lambda a: a,
                    (rc_pair, rc_cnt, rcmap_idx, rcmap_val))
                pending = jnp.where(drain, pending - 1, pending)

                # driven bit value per state
                bit = jnp.zeros((B,), jnp.int32)
                flag_bit = jnp.where(
                    kind == K_LIT, 0,
                    jnp.where((kind == K_MATCH) | (kind == K_SENT), 1,
                              jnp.where(kind == K_REP0L1,
                                        jnp.where(flag_i == 0, 1, 0),
                                        jnp.where(flag_i == 0, 1,
                                                  jnp.where(flag_i == 1,
                                                            0, 1)))))
                for _f, _v in [
                        (F_FLAG, flag_bit),
                        (F_LITTREE, (bits_c >> 7) & 1),
                        (F_DLITTREE, (bits_c >> 7) & 1),
                        (F_RLEFLAG, jnp.where(kind == K_RLEN, 1, 0)),
                        (F_REPTREE, jnp.where(sub_i == 0,
                                              (g("va") >> 1) & 1,
                                              g("va") & 1)),
                        (F_LENSLOT, jnp.where(sub_i == 0,
                                              jnp.where(lenv < 8, 0, 1),
                                              jnp.where(lenv < 16, 0, 1))),
                        (F_LENTREE, jnp.where(is_l3, (bits_c >> 2) & 1,
                                              (bits_c >> 6) & 1)),
                        (F_LONGLEN, jnp.where(len_left > 0, 0, 1)),
                        (F_DISTSLOT,
                         (bits_c >> jnp.clip(sbits - 1, 0, 30)) & 1),
                        (F_DISTEXTRA, (bits_c >> 3) & 1)]:
                    bit = jnp.where(fsm == _f, _v, bit)

                # prob index within the staged windows
                pidx = jnp.zeros_like(node)
                for _f, _v in [
                        (F_FLAG, P_STATE + mstate3 + flag_i),
                        (F_RLEFLAG, jnp.full_like(node, P_RLEFLAG)),
                        (F_REPTREE, P_REPDIST + mstate3 + node - 1),
                        (F_LENSLOT, P_MLSLOT + sub_i),
                        (F_LENTREE,
                         jnp.where(g("len_tbl") == 1, P_MLEX1,
                                   jnp.where(g("len_tbl") == 2, P_MLEX2,
                                             P_MLEX3)) + node),
                        (F_LONGLEN, jnp.full_like(node, P_LONGLEN)),
                        (F_DISTSLOT, P_DIST + g("pdist_pos") + node),
                        (F_DISTEXTRA,
                         P_MDEXTRA + (g("ebits") - 1) * 16 + node)]:
                    pidx = jnp.where(fsm == _f, _v, pidx)
                use_small_i = act & ~uses_grp
                use_gc_i = act & uses_grp
                swoff = jnp.clip(pidx - win_base, 0, 255)
                oh_small = lane256 == jnp.where(use_small_i, swoff,
                                                -1)[:, None]
                p_small = jnp.sum(jnp.where(oh_small, small_pair, 0),
                                  axis=1)
                oh_gc = lane256 == jnp.where(use_gc_i, node, 0)[:, None]
                p_gc = jnp.sum(jnp.where(oh_gc, lit_pair, 0), axis=1)
                p = jnp.where(use_gc_i, p_gc, p_small)

                # EncodeBit (csc_coder.h:67-81)
                bound = _i32(_u32(jnp.where(act, rng, 0)) >> 12) * p
                bset = act & (bit == 1)
                new_p = jnp.where(bset, p + ((0xFFF - p) >> 5),
                                  p - (p >> 5))
                small_pair = jnp.where(
                    oh_small & _col(use_small_i),
                    jnp.broadcast_to(new_p[:, None], (B, 256)),
                    small_pair)
                lit_pair = jnp.where(
                    oh_gc & _col(use_gc_i),
                    jnp.broadcast_to(new_p[:, None], (B, 256)), lit_pair)
                rng = jnp.where(act, jnp.where(bset, bound, rng - bound),
                                rng)
                low_add = jnp.where(act & ~bset, bound, 0)
                low_sum = low + low_add
                carry_in = _ult(low_sum, low) & (low_add != 0)
                lowhi = lowhi + jnp.where(carry_in, 1, 0)
                low = low_sum

                # renorm + ShiftLow (csc_coder.cpp:89-112)
                renorm = act & _ult(rng, jnp.int32(1 << 24))
                rng = jnp.where(renorm, rng << 8, rng)
                trigger = renorm & (_ult(low, jnp.int32(-0x01000000))
                                    | (lowhi != 0))
                carry = jnp.where(trigger, lowhi, 0)
                first_byte = (cache + carry) & 0xFF
                rc_pair, rc_cnt, rcmap_idx, rcmap_val = rc_emit(
                    rc_pair, rc_cnt, first_byte, trigger, bc_cnt,
                    rcmap_idx, rcmap_val)
                run_more = trigger & (cachesize > 1)
                pending = jnp.where(run_more, cachesize - 1, pending)
                pend_carry = jnp.where(run_more, carry, pend_carry)
                cache = jnp.where(trigger,
                                  _i32(_u32(low) >> 24) & 0xFF, cache)
                cachesize = jnp.where(trigger, 0, cachesize)
                cachesize = jnp.where(renorm, cachesize + 1, cachesize)
                low = jnp.where(renorm, low << 8, low)
                lowhi = jnp.where(renorm, 0, lowhi)

                # advance driven counters
                flag_i = jnp.where(act & ((fsm == F_FLAG)
                                          | (fsm == F_RLEFLAG)),
                                   flag_i + 1, flag_i)
                tree_sh = act & ((fsm == F_LITTREE) | (fsm == F_DLITTREE)
                                 | (fsm == F_LENTREE)
                                 | (fsm == F_DISTSLOT)
                                 | (fsm == F_DISTEXTRA))
                bits_c = jnp.where(tree_sh, (bits_c << 1) & 0x1FFFF,
                                   bits_c)
                tree_nd = tree_sh | (act & (fsm == F_REPTREE))
                node = jnp.where(tree_nd, node * 2 + bit, node)
                sub_i = jnp.where(act & ((fsm == F_REPTREE)
                                         | (fsm == F_LENSLOT)),
                                  sub_i + 1, sub_i)
                dec_ll = act & (fsm == F_LONGLEN)
                len_left = jnp.where(dec_ll, len_left - 1, len_left)

            # ---------------- transitions (once, on finals) -----------
            new = [rg[i] for i in range(NR)]

            def upd(name, cond, val):
                i = _RI[name]
                new[i] = jnp.where(cond, val, new[i])

            nnode = node
            # FLAG done
            c = is_bit & (fsm == F_FLAG) & (flag_i >= nflags)
            fd_lit = c & (kind == K_LIT)
            upd("fsm", fd_lit, F_LITTREE)
            upd("node", fd_lit, 1)
            upd("bits_c", fd_lit, g("va") | 0x100)
            upd("mstate", fd_lit, (g("mstate") * 4) & 0x3F)
            fd_r01 = c & (kind == K_REP0L1)
            upd("mstate", fd_r01, (g("mstate") * 4 + 2) & 0x3F)
            upd("ctx", fd_r01, g("vc"))
            upd("fsm", fd_r01, F_NEXT)
            fd_rep = c & (kind == K_REP)
            upd("fsm", fd_rep, F_REPTREE)
            upd("node", fd_rep, 1)
            upd("sub_i", fd_rep, 0)
            fd_match = c & ((kind == K_MATCH) | (kind == K_SENT))
            upd("fsm", fd_match, F_LENSLOT)
            upd("sub_i", fd_match, 0)
            upd("after_len", fd_match, 1)
            upd("len_phase", fd_match, 0)
            upd("len_left", fd_match, 0)
            upd("lenv", fd_match, jnp.minimum(g("vb"), 143))
            upd("flag_i", is_bit & ((fsm == F_FLAG) | (fsm == F_RLEFLAG)),
                flag_i)

            # RLEFLAG done: delta literal or run length
            c = is_bit & (fsm == F_RLEFLAG) & (flag_i >= 1)
            to_dlit = c & (kind == K_DLIT)
            upd("fsm", to_dlit, F_DLITTREE)
            upd("node", to_dlit, 1)
            upd("bits_c", to_dlit, g("va") | 0x100)
            to_rlen = c & (kind == K_RLEN)
            upd("fsm", to_rlen, F_LENSLOT)
            upd("sub_i", to_rlen, 0)
            upd("after_len", to_rlen, 2)
            upd("len_phase", to_rlen, 0)
            upd("len_left", to_rlen, 0)
            upd("lenv", to_rlen, jnp.minimum(g("vb"), 143))

            # LITTREE
            c = is_bit & (fsm == F_LITTREE)
            upd("node", c, nnode)
            upd("bits_c", c, bits_c)
            lit_done = c & (nnode >= 0x100)
            upd("ctx", lit_done, g("va"))
            upd("fsm", lit_done, F_NEXT)

            # DLITTREE: p_delta literal; model ctx/mstate untouched
            c = is_bit & (fsm == F_DLITTREE)
            upd("node", c, nnode)
            upd("bits_c", c, bits_c)
            dlit_done = c & (nnode >= 0x100)
            upd("fsm", dlit_done, F_NEXT)

            # REPTREE
            c = is_bit & (fsm == F_REPTREE)
            upd("node", c, nnode)
            upd("sub_i", c, sub_i)
            rep_done = c & (sub_i >= 2)
            upd("fsm", rep_done, F_LENSLOT)
            upd("sub_i", rep_done, 0)
            upd("after_len", rep_done, 0)
            upd("len_phase", rep_done, 0)
            upd("len_left", rep_done, 0)
            upd("lenv", rep_done, jnp.minimum(g("vb"), 143))

            # LENSLOT
            c = is_bit & (fsm == F_LENSLOT)
            lv = lenv
            slot_done = c & (((lv < 8) & (sub_i >= 1))
                             | ((lv >= 8) & (sub_i >= 2)))
            upd("sub_i", c, jnp.where(slot_done, sub_i, sub_i))
            tbl = jnp.where(lv < 8, 1, jnp.where(lv < 16, 2, 3))
            lbase = jnp.where(lv < 8, 0, jnp.where(lv < 16, 8, 16))
            tree_c = jnp.where(tbl == 3, (lv - 16) | 0x80,
                               (lv - lbase) | 0x08)
            upd("len_tbl", slot_done, tbl)
            upd("bits_c", slot_done, tree_c)
            upd("node", slot_done, 1)
            upd("fsm", slot_done, F_LENTREE)
            upd("sub_i", c & ~slot_done, sub_i)

            # LENTREE
            c = is_bit & (fsm == F_LENTREE)
            upd("node", c, nnode)
            upd("bits_c", c, bits_c)
            t_done = c & ((is_l3 & (nnode >= 0x8))
                          | (~is_l3 & (nnode >= 0x80)))
            was143 = (g("len_phase") == 0) & (g("vb") >= 143)
            go_long = t_done & was143
            upd("fsm", go_long, F_LONGLEN)
            upd("len_left", go_long, (g("vb") - 143) // 143)
            len_fin = t_done & ~was143
            lf_rep = len_fin & (g("after_len") == 0)
            upd("mstate", lf_rep, (g("mstate") * 4 + 3) & 0x3F)
            upd("ctx", lf_rep, g("vc"))
            upd("fsm", lf_rep, F_NEXT)
            # RLE run length: no mstate/ctx updates (csc_model.cpp:492)
            lf_rle = len_fin & (g("after_len") == 2)
            upd("fsm", lf_rle, F_NEXT)
            lf_match = len_fin & (g("after_len") == 1)
            wl_c = jnp.minimum(g("vb"), 6)
            upd("pdist_pos", lf_match, _lut(wl_c, _PDIST_POS))
            upd("sbits", lf_match, _lut(wl_c, _PDIST_BITS))
            dist = g("va")
            # slot = index of the largest table entry <= dist
            slotv = jnp.zeros_like(dist)
            for _k in range(1, 33):
                slotv = jnp.where(dist >= int(_DIST_TABLE_NP[_k]), _k,
                                  slotv)
            nsb = _lut(wl_c, _PDIST_BITS)
            upd("slot", lf_match, slotv)
            upd("node", lf_match, 1)
            upd("bits_c", lf_match, slotv | (1 << jnp.clip(nsb, 0, 5)))
            upd("fsm", lf_match, F_DISTSLOT)

            # LONGLEN (one bit per K-loop pass; len_left went negative
            # exactly when the closing 1-bit was emitted)
            c = is_bit & (fsm == F_LONGLEN)
            fin_l = c & (len_left < 0)
            upd("len_left", c & ~fin_l, len_left)
            rem = (g("vb") - 143) % 143
            upd("len_phase", fin_l, 1)
            upd("lenv", fin_l, jnp.minimum(rem, 143))
            upd("sub_i", fin_l, 0)
            upd("len_left", fin_l, 0)
            upd("fsm", fin_l, F_LENSLOT)

            # DISTSLOT
            c = is_bit & (fsm == F_DISTSLOT)
            upd("node", c, nnode)
            upd("bits_c", c, bits_c)
            ds_done = c & (nnode >= (1 << jnp.clip(sbits, 0, 5)))
            small = ds_done & (g("slot") <= 2)
            upd("mstate", small, (g("mstate") * 4 + 1) & 0x3F)
            upd("ctx", small & (kind != K_SENT), g("vc"))
            upd("fsm", small, F_NEXT)
            big = ds_done & (g("slot") > 2)
            ebits = jnp.maximum(g("slot") - 2, 1)
            extra_len = g("va") - (1 << jnp.clip(ebits, 0, 30)) - 1
            upd("ebits", big, ebits)
            upd("elen", big, extra_len)
            need_dir = big & (ebits > 4)
            upd("dir_val", need_dir, extra_len >> 4)
            upd("dir_rem", need_dir, ebits - 4)
            upd("fsm", need_dir, F_DISTDIRECT)
            go_ext = big & ~need_dir
            rev = _lut(extra_len & 0xF, _REV16_NP)
            upd("bits_c", go_ext, rev | 0x10)
            upd("node", go_ext, 1)
            upd("fsm", go_ext, F_DISTEXTRA)

            # DISTEXTRA
            c = is_bit & (fsm == F_DISTEXTRA)
            upd("node", c, nnode)
            upd("bits_c", c, bits_c)
            de_done = c & (nnode >= 0x10)
            upd("mstate", de_done, (g("mstate") * 4 + 1) & 0x3F)
            upd("ctx", de_done & (kind != K_SENT), g("vc"))
            upd("fsm", de_done, F_NEXT)

            # ---------------- bc micro-ops ----------------------------
            bcv = g("bc_val")
            bcb = g("bc_bits")
            bc_wr = [bc_pair, bc_cnt, bcmap_idx, bcmap_val]

            def enc_direct(mask, val, nbits):
                # bit accumulation only; byte extraction is deferred to
                # one GATED drain after all enc_direct calls (the bc
                # states are rare — no [B,256] work on ordinary steps).
                # Max 21 bits accrue per step, so bcb stays < 32.
                nonlocal bcv, bcb
                nv = _i32((_u32(bcv) << _u32(jnp.clip(nbits, 0, 31)))
                          | _u32(val))
                bcv = jnp.where(mask, nv, bcv)
                bcb = jnp.where(mask, bcb + nbits, bcb)

            # DISTDIRECT
            c = is_dird
            two = g("dir_rem") > 16
            nbits = jnp.where(two, g("dir_rem") - 16, g("dir_rem"))
            val = jnp.where(two, _i32(_u32(g("dir_val")) >> 16) & 0xFFFF,
                            g("dir_val")
                            & ((1 << jnp.clip(nbits, 0, 30)) - 1))
            enc_direct(c, jnp.where(c, val, 0), jnp.where(c, nbits, 0))
            upd("dir_rem", c & two, 16)
            upd("dir_val", c & two, g("dir_val") & 0xFFFF)
            dd_done = c & ~two
            rev = _lut(g("elen") & 0xF, _REV16_NP)
            upd("bits_c", dd_done, rev | 0x10)
            upd("node", dd_done, 1)
            upd("fsm", dd_done, F_DISTEXTRA)

            # RAW (CompressBad bytes: va holds 1-2 bytes, vb the width)
            c = is_raw
            enc_direct(c, jnp.where(c, g("va"), 0),
                       jnp.where(c, g("vb"), 0))
            upd("fsm", c, F_NEXT)

            # INT (EncodeInt; values < 2^16)
            c = is_int
            v = g("va")
            blen = jnp.zeros_like(v)
            x = v
            for sh in (16, 8, 4, 2, 1):
                bigx = x >= (1 << sh)
                blen = blen + jnp.where(bigx, sh, 0)
                x = jnp.where(bigx, _i32(_u32(x) >> sh), x)
            blen = jnp.where(v > 0, blen + 1, 0)
            slot_i = jnp.maximum(blen - 1, 0)
            ph0 = c & (g("sub_i") == 0)
            enc_direct(ph0, jnp.where(ph0, slot_i, 0),
                       jnp.where(ph0, 5, 0))
            upd("sub_i", ph0, 1)
            ph1 = c & (g("sub_i") == 1)
            nb1 = jnp.where(slot_i == 0, 1, slot_i)
            vv = jnp.where(slot_i == 0, v,
                           v - (1 << jnp.clip(slot_i, 0, 30)))
            enc_direct(ph1, jnp.where(ph1, vv, 0), jnp.where(ph1, nb1, 0))
            upd("fsm", ph1, F_NEXT)

            # deferred bc byte drain (gated: only steps where some
            # stream ran a bc micro-op leave bcb >= 8)
            def _bc_drain(args):
                pair, cnt, mi, mv, b_ = args
                for _ in range(3):
                    e = b_ >= 8
                    byte = _i32(_u32(bcv)
                                >> _u32(jnp.clip(b_ - 8, 0, 31))) & 0xFF
                    oh = lane256 == jnp.where(e, cnt - bc_wbase,
                                              -1)[:, None]
                    pair = jnp.where(
                        oh, jnp.broadcast_to(byte[:, None], (B, 256)),
                        pair)
                    cnt = jnp.where(e, cnt + 1, cnt)
                    crossed = e & (cnt > 0) & (cnt % bsize == 0)
                    mi = jnp.where(
                        crossed, jnp.clip(cnt // bsize - 1, 0,
                                          NBLKMAP - 1), mi)
                    mv = jnp.where(crossed, rc_cnt, mv)
                    b_ = jnp.where(e, b_ - 8, b_)
                return pair, cnt, mi, mv, b_

            (bc_wr[0], bc_wr[1], bc_wr[2], bc_wr[3], bcb) = jax.lax.cond(
                jnp.any(bcb >= 8), _bc_drain, lambda a: a,
                (bc_wr[0], bc_wr[1], bc_wr[2], bc_wr[3], bcb))

            # ---------------- F_FLUSH (csc_coder.cpp:40-74) -----------
            c = is_flush & (pending == 0)
            fstep = c & (g("flush_i") < 5)
            ftrig = fstep & (_ult(low, jnp.int32(-0x01000000))
                             | (lowhi != 0))
            fcarry = jnp.where(ftrig, lowhi, 0)
            fbyte = (cache + fcarry) & 0xFF
            rc_pair, rc_cnt, rcmap_idx, rcmap_val = jax.lax.cond(
                jnp.any(ftrig),
                lambda a: rc_emit(a[0], a[1], fbyte, ftrig, bc_wr[1],
                                  a[2], a[3]),
                lambda a: a,
                (rc_pair, rc_cnt, rcmap_idx, rcmap_val))
            frun = ftrig & (cachesize > 1)
            pending = jnp.where(frun, cachesize - 1, pending)
            pend_carry = jnp.where(frun, fcarry, pend_carry)
            cache = jnp.where(ftrig, _i32(_u32(low) >> 24) & 0xFF, cache)
            cachesize = jnp.where(ftrig, 0, cachesize)
            cachesize = jnp.where(fstep, cachesize + 1, cachesize)
            low = jnp.where(fstep, low << 8, low)
            lowhi = jnp.where(fstep, 0, lowhi)
            upd("flush_i", fstep, g("flush_i") + 1)

            fdone = c & (g("flush_i") >= 5)

            def _pads(args):
                pair, cnt, mi, mv = args
                pb1 = jnp.where(
                    bcb > 0,
                    _i32(_u32(bcv)
                         << _u32(8 - jnp.clip(bcb, 0, 8))) & 0xFF, 0)
                for pad_byte in (pb1, jnp.zeros_like(pb1)):
                    oh = lane256 == jnp.where(fdone, cnt - bc_wbase,
                                              -1)[:, None]
                    pair = jnp.where(
                        oh, jnp.broadcast_to(pad_byte[:, None],
                                             (B, 256)), pair)
                    cnt = jnp.where(fdone, cnt + 1, cnt)
                    crossed = fdone & (cnt > 0) & (cnt % bsize == 0)
                    mi = jnp.where(
                        crossed, jnp.clip(cnt // bsize - 1, 0,
                                          NBLKMAP - 1), mi)
                    mv = jnp.where(crossed, rc_cnt, mv)
                return pair, cnt, mi, mv

            (bc_wr[0], bc_wr[1], bc_wr[2], bc_wr[3]) = jax.lax.cond(
                jnp.any(fdone), _pads, lambda a: a,
                (bc_wr[0], bc_wr[1], bc_wr[2], bc_wr[3]))

            # chunk log: (rc_cnt, bc_cnt) after the flush bytes
            def _log_chunk(_):
                cl = jnp.minimum(g("chunk_cnt"), NCHUNK - 1) * 2
                oh1 = lane_clog == cl[:, None]
                oh2 = lane_clog == (cl + 1)[:, None]
                clog_ref[:] = jnp.where(
                    oh1 & _col(fdone),
                    jnp.broadcast_to(rc_cnt[:, None], (B, 2 * NCHUNK)),
                    jnp.where(oh2 & _col(fdone),
                              jnp.broadcast_to(bc_wr[1][:, None],
                                               (B, 2 * NCHUNK)),
                              clog_ref[:]))
                return 0
            jax.lax.cond(jnp.any(fdone), _log_chunk, lambda _: 0, 0)
            upd("chunk_cnt", fdone, g("chunk_cnt") + 1)
            # coder reset (probs persist, csc_encoder_main.cpp:141-145)
            low = jnp.where(fdone, 0, low)
            lowhi = jnp.where(fdone, 0, lowhi)
            rng = jnp.where(fdone, jnp.int32(-1), rng)
            cache = jnp.where(fdone, 0, cache)
            cachesize = jnp.where(fdone, 1, cachesize)
            bcv = jnp.where(fdone, 0, bcv)
            bcb = jnp.where(fdone, 0, bcb)
            upd("fsm", fdone, F_NEXT)

            # ---------------- F_NEXT: fetch token ---------------------
            c = is_next

            def _tok_fetch():
                toff = tlane - tok_base
                vals = []
                for k in range(4):
                    off = toff + k
                    vals.append(_tile_gather(
                        tok_t, jnp.clip(off >> 7, 0, TS - 1), off & 127))
                return tuple(vals)

            k_, a_, b_, c_ = jax.lax.cond(
                jnp.any(c), _tok_fetch,
                lambda: (jnp.zeros((B,), jnp.int32),) * 4)
            upd("tok_i", c, g("tok_i") + 1)
            upd("kind", c, k_)
            upd("va", c, a_)
            upd("vb", c, b_)
            upd("vc", c, c_)
            upd("flag_i", c, 0)
            is_end = c & (k_ == K_END)
            upd("done", is_end, 1)
            upd("fsm", is_end, F_DONE)
            t_int = c & (k_ == K_INT)
            upd("fsm", t_int, F_INT)
            upd("sub_i", t_int, 0)
            t_fl = c & (k_ == K_FLUSH)
            upd("fsm", t_fl, F_FLUSH)
            upd("flush_i", t_fl, 0)
            t_raw = c & (k_ == K_RAW)
            upd("fsm", t_raw, F_RAW)
            # ELIT: straight into the literal tree, no LZ flags, mstate
            # untouched (CompressLiterals, csc_model.cpp:448-461)
            t_el = c & (k_ == K_ELIT)
            upd("fsm", t_el, F_LITTREE)
            upd("node", t_el, 1)
            upd("bits_c", t_el, a_ | 0x100)
            # DLIT/RLEN: CompressRLE tokens lead with the p_rle_flag bit
            t_dl = c & ((k_ == K_DLIT) | (k_ == K_RLEN))
            upd("fsm", t_dl, F_RLEFLAG)
            t_tok = c & (k_ != K_END) & (k_ != K_INT) & (k_ != K_FLUSH) \
                & (k_ != K_RAW) & (k_ != K_ELIT) & (k_ != K_DLIT) \
                & (k_ != K_RLEN)
            upd("fsm", t_tok, F_FLAG)

            # ---------------- write back staged windows ---------------
            bc_pair, bc_cnt, bcmap_idx, bcmap_val = bc_wr

            def _wb(pair, tile, row0, mask):
                def go(_):
                    for s in range(TS):
                        lo_m = mask & (row0 == s)
                        hi_m = mask & (((row0 + 1) & (TS - 1)) == s)
                        tile[:, s, :] = jnp.where(
                            _col(lo_m), pair[:, :128],
                            jnp.where(_col(hi_m), pair[:, 128:],
                                      tile[:, s, :]))
                    return 0
                jax.lax.cond(jnp.any(mask), go, lambda _: 0, 0)

            _wb(rc_pair, rc_t, rc_row, may_rc)
            _wb(bc_pair, bc_t, bc_row, may_bc)
            _wb(small_pair, probs, win_row, use_small0)
            _wb(lit_pair, grp, gsub_lit, use_gc0)

            # crossing-map writes (rare)
            def _map_wr(ref, idx, val, lane):
                def go(_):
                    oh = lane == idx[:, None]
                    ref[:] = jnp.where(
                        oh & _col(idx >= 0),
                        jnp.broadcast_to(val[:, None], ref.shape), ref[:])
                    return 0
                jax.lax.cond(jnp.any(idx >= 0), go, lambda _: 0, 0)
            _map_wr(rcmap_ref, rcmap_idx, rcmap_val, lane_map)
            _map_wr(bcmap_ref, bcmap_idx, bcmap_val, lane_map)

            # output-overflow hardening
            over = ((rc_cnt + 32 > NRS * 128 - TILE)
                    | (bc_cnt + 32 > NBS * 128 - TILE)) & live
            upd("err", over & (g("err") == 0), ERR_OVERFLOW)
            upd("done", over, 1)

            # ---------------- flush/service requests ------------------
            rc_flushed = g("rc_flushed")
            rc_crossed = ((rc_cnt >> 10) > rc_flushed) & live
            req[RQ_RCFL_P, :] = rc_flushed
            upd("rc_flushed", rc_crossed, rc_flushed + 1)
            bc_flushed = g("bc_flushed")
            bc_crossed = ((bc_cnt >> 10) > bc_flushed) & live
            req[RQ_BCFL_P, :] = bc_flushed
            upd("bc_flushed", bc_crossed, bc_flushed + 1)

            emit(RQ_RCFL_IDS, rc_crossed)
            emit(RQ_BCFL_IDS, bc_crossed)
            emit(RQ_TOK_IDS, tok_miss)
            emit(RQ_SWAP_IDS, grp_miss)

            # commit coder + counters
            new[_RI["low"]] = jnp.where(live, low, new[_RI["low"]])
            new[_RI["lowhi"]] = jnp.where(live, lowhi, new[_RI["lowhi"]])
            new[_RI["range"]] = jnp.where(live, rng, new[_RI["range"]])
            new[_RI["cache"]] = jnp.where(live, cache, new[_RI["cache"]])
            new[_RI["cachesize"]] = jnp.where(live, cachesize,
                                              new[_RI["cachesize"]])
            new[_RI["pending"]] = jnp.where(live, pending,
                                            new[_RI["pending"]])
            new[_RI["pend_carry"]] = jnp.where(live, pend_carry,
                                               new[_RI["pend_carry"]])
            new[_RI["bc_val"]] = jnp.where(live, bcv, new[_RI["bc_val"]])
            new[_RI["bc_bits"]] = jnp.where(live, bcb,
                                            new[_RI["bc_bits"]])
            new[_RI["rc_cnt"]] = jnp.where(live, rc_cnt,
                                           new[_RI["rc_cnt"]])
            new[_RI["bc_cnt"]] = jnp.where(live, bc_cnt,
                                           new[_RI["bc_cnt"]])
            new[_RI["tok_base"]] = jnp.where(tok_miss, new_tok_base,
                                             new[_RI["tok_base"]])
            new[_RI["grp_key"]] = jnp.where(grp_miss, new_grp_key,
                                            new[_RI["grp_key"]])
            new[_RI["grp_slot"]] = jnp.where(grp_miss, new_slot,
                                             new[_RI["grp_slot"]])
            return new

        # ---------------- scalar service ------------------------------
        def service():
            d = pltpu.make_async_copy(req, smem, sem_req)
            d.start()
            d.wait()

            def serve(ids_row, issue):
                def cond(cr):
                    i, _n = cr
                    return (i < B) & (smem[ids_row, jnp.minimum(i, B - 1)]
                                      >= 0)

                def body(cr):
                    i, n = cr
                    return i + 1, n + issue(smem[ids_row, i])
                return jax.lax.while_loop(
                    cond, body, (jnp.int32(0), jnp.int32(0)))[1]

            def rcfl_issue(b):
                blk = smem[RQ_RCFL_P, b]
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(rc_t.at[b, pl.ds(slot, 8), :],
                                      rc_out.at[b, pl.ds(dst, 8), :],
                                      sem_rc).start()
                return jnp.int32(1)
            nrc = serve(RQ_RCFL_IDS, rcfl_issue)

            def bcfl_issue(b):
                blk = smem[RQ_BCFL_P, b]
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(bc_t.at[b, pl.ds(slot, 8), :],
                                      bc_out.at[b, pl.ds(dst, 8), :],
                                      sem_bc).start()
                return jnp.int32(1)
            nbc = serve(RQ_BCFL_IDS, bcfl_issue)

            def tok_issue(b):
                src = pl.multiple_of(smem[RQ_TOK_P, b], 8)
                pltpu.make_async_copy(tok_hbm.at[b, pl.ds(src, 16), :],
                                      tok_t.at[b, :, :], sem_tok).start()
                return jnp.int32(1)
            ntk = serve(RQ_TOK_IDS, tok_issue)

            def sw_issue(b):
                nkey = smem[RQ_SWAP_NEW, b]
                okey = smem[RQ_SWAP_OLD, b]
                nslot = smem[RQ_SWAP_SLOT, b]
                oslot = 1 - nslot

                def wb(c2):
                    osl = pl.multiple_of(oslot * 8, 8)
                    od = pl.multiple_of((okey & 127) * 8, 8)
                    pltpu.make_async_copy(
                        grp.at[b, pl.ds(osl, 8), :],
                        plit_out.at[b, pl.ds(od, 8), :], sem_sw).start()
                    return c2 + 1
                cnum = jax.lax.cond(okey >= 0, wb, lambda c2: c2,
                                    jnp.int32(1))
                nsl = pl.multiple_of(nslot * 8, 8)
                nd_ = pl.multiple_of((nkey & 127) * 8, 8)
                pltpu.make_async_copy(
                    plit_out.at[b, pl.ds(nd_, 8), :],
                    grp.at[b, pl.ds(nsl, 8), :], sem_sw).start()
                return cnum
            nsw = serve(RQ_SWAP_IDS, sw_issue)

            def drain(n, sem, src, dst):
                def w(i, _):
                    pltpu.make_async_copy(src, dst, sem).wait()
                    return _
                jax.lax.fori_loop(0, n, w, 0)
            drain(nrc, sem_rc, rc_t.at[0, pl.ds(0, 8), :],
                  rc_out.at[0, pl.ds(0, 8), :])
            drain(nbc, sem_bc, bc_t.at[0, pl.ds(0, 8), :],
                  bc_out.at[0, pl.ds(0, 8), :])
            drain(ntk, sem_tok, tok_hbm.at[0, pl.ds(0, 16), :],
                  tok_t.at[0, :, :])
            drain(nsw, sem_sw, plit_out.at[0, pl.ds(0, 8), :],
                  grp.at[0, pl.ds(0, 8), :])

        # ---------------- main loop -----------------------------------
        def cond(carry):
            step = carry[0]
            done = carry[1][_RI["done"]]
            return (step < max_steps_ref[0, 0]) & ~jnp.all(done == 1)

        def body(carry):
            step, rg = carry
            new = vstep(rg)
            service()
            return step + 1, tuple(new)

        rg0 = tuple(regs_ref[i, :] for i in range(NR))
        steps, rgf = jax.lax.while_loop(cond, body, (jnp.int32(0), rg0))

        for i in range(NR):
            regs_out[i, :] = rgf[i]
        steps_ref[0, 0] = steps

        # epilogue: flush the last (partial) rc/bc ring blocks
        req[RQ_RCFL_P, :] = rgf[_RI["rc_flushed"]]
        req[RQ_BCFL_P, :] = rgf[_RI["bc_flushed"]]
        req[RQ_TOK_P, :] = rgf[_RI["rc_cnt"]]
        req[RQ_SWAP_NEW, :] = rgf[_RI["bc_cnt"]]
        d = pltpu.make_async_copy(req, smem, sem_req)
        d.start()
        d.wait()

        def _ep_one(tile, out_ref, b, blk, sem):
            slot = pl.multiple_of((blk & 1) * 8, 8)
            dst = pl.multiple_of(blk * 8, 8)
            pltpu.make_async_copy(tile.at[b, pl.ds(slot, 8), :],
                                  out_ref.at[b, pl.ds(dst, 8), :],
                                  sem).start()

        def ep_rc(b, cnt):
            rfl = smem[RQ_RCFL_P, b]
            rlast = jnp.minimum(smem[RQ_TOK_P, b] >> 10, (NRS // 8) - 1)

            def go1(c):
                _ep_one(rc_t, rc_out, b, rfl, sem_rc)
                return c + 1
            cnt = jax.lax.cond(rfl <= rlast, go1, lambda c: c, cnt)

            def go2(c):
                _ep_one(rc_t, rc_out, b, rfl + 1, sem_rc)
                return c + 1
            return jax.lax.cond(rfl + 1 <= rlast, go2, lambda c: c, cnt)
        nep_rc = jax.lax.fori_loop(0, B, ep_rc, 0)

        def ep_bc(b, cnt):
            bfl = smem[RQ_BCFL_P, b]
            blast = jnp.minimum(smem[RQ_SWAP_NEW, b] >> 10,
                                (NBS // 8) - 1)

            def go3(c):
                _ep_one(bc_t, bc_out, b, bfl, sem_bc)
                return c + 1
            cnt = jax.lax.cond(bfl <= blast, go3, lambda c: c, cnt)

            def go4(c):
                _ep_one(bc_t, bc_out, b, bfl + 1, sem_bc)
                return c + 1
            return jax.lax.cond(bfl + 1 <= blast, go4, lambda c: c, cnt)
        nep_bc = jax.lax.fori_loop(0, B, ep_bc, 0)

        def ep_wait_rc(i, _):
            pltpu.make_async_copy(rc_t.at[0, pl.ds(0, 8), :],
                                  rc_out.at[0, pl.ds(0, 8), :],
                                  sem_rc).wait()
            return _
        jax.lax.fori_loop(0, nep_rc, ep_wait_rc, 0)

        def ep_wait_bc(i, _):
            pltpu.make_async_copy(bc_t.at[0, pl.ds(0, 8), :],
                                  bc_out.at[0, pl.ds(0, 8), :],
                                  sem_bc).wait()
            return _
        jax.lax.fori_loop(0, nep_bc, ep_wait_bc, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _run(B, NTS, NRS, NBS, KBITS, interpret,
         max_steps, bsize, regs, tok_hbm, plit, rc0, bc0):
    kernel = _make_kernel(B, NTS, NRS, NBS, KBITS)
    out_shapes = (
        jax.ShapeDtypeStruct((B, 1024, 128), jnp.int32),    # plit (alias)
        jax.ShapeDtypeStruct((B, NRS, 128), jnp.int32),     # rc (alias)
        jax.ShapeDtypeStruct((B, NBS, 128), jnp.int32),     # bc (alias)
        jax.ShapeDtypeStruct((NR, B), jnp.int32),           # regs
        jax.ShapeDtypeStruct((B, NBLKMAP), jnp.int32),      # rcmap
        jax.ShapeDtypeStruct((B, NBLKMAP), jnp.int32),      # bcmap
        jax.ShapeDtypeStruct((B, 2 * NCHUNK), jnp.int32),   # chunk log
        jax.ShapeDtypeStruct((1, 1), jnp.int32),            # steps
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # max_steps
            pl.BlockSpec(memory_space=pltpu.SMEM),          # bsize
            pl.BlockSpec(memory_space=pltpu.VMEM),          # regs
            pl.BlockSpec(memory_space=pl.ANY),              # tok
            pl.BlockSpec(memory_space=pl.ANY),              # plit
            pl.BlockSpec(memory_space=pl.ANY),              # rc0
            pl.BlockSpec(memory_space=pl.ANY),              # bc0
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        scratch_shapes=[
            pltpu.VMEM((B, NP_ROWS, 128), jnp.int32),       # probs
            pltpu.VMEM((B, TS, 128), jnp.int32),            # grp
            pltpu.VMEM((B, TS, 128), jnp.int32),            # tok_t
            pltpu.VMEM((B, TS, 128), jnp.int32),            # rc_t
            pltpu.VMEM((B, TS, 128), jnp.int32),            # bc_t
            pltpu.VMEM((NRQ, B), jnp.int32),                # req
            pltpu.SMEM((NRQ, B), jnp.int32),                # smem
            pltpu.SemaphoreType.DMA,                        # sem_rc
            pltpu.SemaphoreType.DMA,                        # sem_bc
            pltpu.SemaphoreType.DMA,                        # sem_tok
            pltpu.SemaphoreType.DMA,                        # sem_sw
            pltpu.SemaphoreType.DMA,                        # sem_req
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
    )(max_steps, bsize, regs, tok_hbm, plit, rc0, bc0)


@functools.partial(jax.jit, static_argnums=(1,))
def _pack_bytes(arr, lmax):
    w = arr.reshape(arr.shape[0], -1)[:, :lmax]
    return (w[:, 0::4] | (w[:, 1::4] << 8) | (w[:, 2::4] << 16)
            | (w[:, 3::4] << 24))


def encode_bits_pallas(tok_kind, tok_a, tok_b, tok_c, max_rc, max_bc,
                       bsize=65536, kbits=None, interpret=False,
                       max_steps=None):
    """Run phase B for B streams.  tok_*: [B, T] i32 (K_END terminated).

    Returns (rc_bytes, bc_bytes, rc_blkmap, bc_blkmap, chunk_ends, errs):
    per-stream byte strings + MemIO remux metadata, matching the
    encode_bits.run_bits contract consumed by pipeline.encode_batch."""
    import os
    if kbits is None:
        kbits = int(os.environ.get("PEK_KBITS", "4"))
    B, T = tok_kind.shape
    # interleave (kind,a,b,c) into 4 consecutive lanes per token
    nts = _bucket(4 * T + TILE + 8)
    if isinstance(tok_kind, jax.Array):
        # device tapes (stitch_dev): interleave + pad on device — the
        # [B, 4T] tape never crosses the host<->device tunnel
        inter = jnp.stack([tok_kind, tok_a, tok_b, tok_c],
                          axis=2).reshape(B, 4 * T).astype(jnp.int32)
        tok = jnp.zeros((B, nts), jnp.int32)
        tok = tok.at[:, :4 * T].set(inter)
    else:
        inter = np.zeros((B, 4 * T), np.int32)
        inter[:, 0::4] = tok_kind
        inter[:, 1::4] = tok_a
        inter[:, 2::4] = tok_b
        inter[:, 3::4] = tok_c
        tok = np.zeros((B, nts), np.int32)
        tok[:, :4 * T] = inter
    nrs = _bucket(max_rc + 2 * TILE)
    nbs = _bucket(max_bc + 2 * TILE)

    regs = np.zeros((NR, B), np.int32)
    regs[_RI["fsm"], :] = F_NEXT
    regs[_RI["range"], :] = -1
    regs[_RI["cachesize"], :] = 1
    regs[_RI["tok_base"], :] = -(1 << 20)
    regs[_RI["grp_key"], :] = -1

    if max_steps is None:
        max_steps = int(12 * T + max_rc + max_bc + 4096)

    plit = jnp.full((B, 1024, 128), 2048, jnp.int32)
    rc0 = jnp.zeros((B, nrs // 128, 128), jnp.int32)
    bc0 = jnp.zeros((B, nbs // 128, 128), jnp.int32)
    import time as _time
    _dbg = bool(os.environ.get("CSC_ENC_DEBUG"))
    _t0 = _time.time()
    outs = _run(B, nts // 128, nrs // 128, nbs // 128, int(kbits),
                bool(interpret),
                jnp.asarray(np.array([[max_steps]], np.int32)),
                jnp.asarray(np.array([[bsize]], np.int32)),
                jnp.asarray(regs),
                jnp.asarray(tok.reshape(B, nts // 128, 128)),
                plit, rc0, bc0)
    _, rc_o, bc_o, regs_o, rcmap, bcmap, clog, steps = outs
    regs_np = np.asarray(regs_o)
    if _dbg:
        print(f"[bits] kernel+regs {_time.time() - _t0:.2f}s "
              f"({int(np.asarray(steps)[0, 0])} steps)")
        _t0 = _time.time()
    rc_cnt = regs_np[_RI["rc_cnt"]]
    bc_cnt = regs_np[_RI["bc_cnt"]]
    done = regs_np[_RI["done"]]
    errs = regs_np[_RI["err"]]
    chunk_cnt = regs_np[_RI["chunk_cnt"]]
    if not done.all():
        raise RuntimeError("pallas encode-bits hit the step cap")

    lr = min(_bucket(max(int(rc_cnt.max()), 4)), nrs)
    lb = min(_bucket(max(int(bc_cnt.max()), 4)), nbs)
    rc_np = np.asarray(_pack_bytes(rc_o, lr)).view(np.uint8)
    bc_np = np.asarray(_pack_bytes(bc_o, lb)).view(np.uint8)
    rcmap_np = np.asarray(rcmap)
    bcmap_np = np.asarray(bcmap)
    clog_np = np.asarray(clog)

    if _dbg:
        print(f"[bits] pulls {_time.time() - _t0:.2f}s")
    rcs = [bytes(rc_np[i, :rc_cnt[i]]) for i in range(B)]
    bcs = [bytes(bc_np[i, :bc_cnt[i]]) for i in range(B)]
    chunk_ends = [[(int(clog_np[i, 2 * k]), int(clog_np[i, 2 * k + 1]))
                   for k in range(chunk_cnt[i])] for i in range(B)]
    return (rcs, bcs, rcmap_np, bcmap_np, chunk_ends,
            [int(e) for e in errs])
