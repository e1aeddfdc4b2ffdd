"""Pallas lockstep fast parse: B streams, ~1 token per step.

TPU-native port of encode_scan_fast.py (the candidate-fold lazy parser
over precomputed hash-chain candidates; csc_mf.cpp:243-524 find_match/
FindMatch semantics + csc_lz.cpp:156-199 lazy parse).  The XLA step
costs ~220 us — dominated by per-step element gathers (~135 ms per
[288,32K] gather, tools/spike_gather2.py); this kernel replaces every
gather with the register-window machinery of pallas_decode.py:

* in4 word window `pw` [B,TS,128] follows ppos; the slide policy keeps
  ppos - pw_base in [1024, 2048), so any distance <= 1024 reads pw;
* candidate windows `cw` [B,C*TS,128] (packed dist<<5|len per position,
  parse_pre.pack_candidates) share pw's base — one slide request
  fetches all of them;
* four rep windows `rw` [B,4*TS,128] keyed by PHYSICAL slot with a
  2-bit/entry permutation register mapping logical rep index -> slot
  (rep rotations permute the map instead of moving VMEM); used only for
  far (>1024) rep distances;
* one far window `fw` for >=cap candidate continuations at far
  distances.  Missing lane windows do NOT stall the stream: resident
  lanes keep extending while the service fetches one window per step
  (guaranteed progress, no livelock when several far lanes compete);
* tokens are emitted 2 lanes each (kind|wire_len<<3, dist_code) into a
  2-block output ring tile, DMA-flushed per 1024 lanes.  Literal bytes
  and last-match bytes are NOT read by the kernel: the device stitcher
  reconstructs byte positions from the tape (cumulative consumed
  lengths) and fills them with one batched data gather (stitch_dev).

Extension model: candidates carry precomputed lengths below EXT_CAP;
rep lanes and >=cap continuations extend live — R_INL 4-byte compare
rounds inline in the FIND step, R_EXT rounds per EXT step after.  Long
matches cost ~len/16 EXT steps; lockstep across B streams keeps the
batch busy (revisit with 128-byte row compares if profiles demand).

Correctness bar (same as the XLA fast parse): identical token tapes to
encode_scan_fast.run_fast_parse on every input (the chain approximation
lives in parse_pre, shared by both paths).
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MF_DIST_BOUND
from .encode_scan import (K_LIT, K_MATCH, K_REP, K_REP0L1, K_END, K_SENT_A)
from .pallas_decode import (_col, _i32, _u32, _ult, _row_onehot, _lut,
                            _bucket, _bucket15, TS, TILE)

# fsm
S_BLOCK = 0
S_FIND = 1
S_EXT = 2
S_DONE = 3

from .parse_pre import EXT_CAP  # precomputed candidate length cap
R_INL = 2           # inline 4-byte extension rounds in a FIND step
R_EXT = 4           # rounds per EXT step (16 bytes/lane/step)
NEAR = 1024         # distances <= NEAR always resident in pw

_BOUND_NP = np.zeros(8, np.int32)
for _i, _b in enumerate(MF_DIST_BOUND):
    _BOUND_NP[_i] = _b
_BOUND_NP[7] = 0x7FFFFFFF


def _second_better(l1, d1, l2, d2):
    """SecondMatchBetter (csc_mf.cpp:570-582) without array constants
    (Pallas kernels cannot capture them): cof[clip(x,0,3)] = 4*clip."""
    import jax.numpy as jnp
    cof21 = 4 * jnp.clip(l2 - l1, 0, 3)
    cof12 = 4 * jnp.clip(l1 - l2, 0, 3)
    return (l2 > 1) & (
        (l2 > l1 + 3)
        | ((l2 > l1) & (d2 <= 4))
        | ((l2 + 2 > l1) & (d2 <= 4) & (d1 > 4))
        | ((l2 >= l1) & ((d2 >> cof21) <= d1))
        | ((l2 < l1) & (l2 + 2 >= l1) & (d1 > 4)
           & ((d1 >> cof12) > d2)))

REGS = [
    "fsm", "done", "wpos", "probe2", "have_u1", "u1_len", "u1_dist",
    "run_idx", "run_end", "blk_off", "blk_len", "blk_i",
    "rep0", "rep1", "rep2", "rep3", "perm",
    "tok_cnt", "tok_flushed",
    "pw_base", "rw_base0", "rw_base1", "rw_base2", "rw_base3",
    "rw_vld", "fw_base",
    # lane state sized for the widest preset (hash_width 8 -> C = 10,
    # NLANE = 14); narrower presets leave the tail registers untouched
    "l0", "l1", "l2", "l3", "l4", "l5", "l6", "l7", "l8", "l9",
    "l10", "l11", "l12", "l13",
    "armed", "alive", "d4", "d5", "d6", "d7", "d8", "d9", "d10",
    "d11", "d12", "d13",
    "limit", "size", "vld_rge",
]
NR = len(REGS)
_RI = {n: i for i, n in enumerate(REGS)}

# service request rows
RQ_TOKFL_IDS = 1
RQ_PW_IDS = 2       # pw + all cand windows slide (same base)
RQ_RW_IDS = 3       # one rep-window fetch per step
RQ_FW_IDS = 4
RQ_TOKFL_P = 5
RQ_PW_P = 6
RQ_RW_P = 7         # slot*(1<<24) | base_sublane
RQ_FW_P = 8
NRQ = 12


def _make_kernel(B, C, NS, NTS, RMAX, good_len):
    """C: candidate count (2 + hash_width).  NS: in4/cand sublanes.
    NTS: token output sublanes.  RMAX: run table width."""
    NLANE = 4 + C

    def kernel(max_steps_ref,                 # SMEM (1,1)
               regs_ref,                      # VMEM [NR, B]
               run_ends_ref, run_skip_ref,    # VMEM [B, RMAX]
               in4_hbm,                       # ANY [B, NS, 128]
               cand_hbm,                      # ANY [B, C, NS, 128]
               tok_hbm,                       # ANY [B, NTS, 128] alias in
               tok_out,                       # aliased output
               regs_out,                      # VMEM [NR, B]
               steps_ref,                     # SMEM (1,1)
               pw, fw, tok_t,                 # scratch [B, TS, 128]
               cw,                            # scratch [B, C*TS, 128]
               rw,                            # scratch [B, 4*TS, 128]
               req, smem,                     # [NRQ, B] VMEM / SMEM
               sem_fl, sem_pw, sem_rw, sem_fw, sem_req):
        del tok_hbm
        tok_t[:] = jnp.zeros((B, TS, 128), jnp.int32)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (B, RMAX), 1)
        iota_1b = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        slot_bb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        src_bb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)

        def runs_gather(ref, idx):
            return jnp.sum(jnp.where(lane_r == idx[:, None], ref[:], 0),
                           axis=1)

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

        def emit_req(row, mask):
            def then(_):
                req[row, :] = compact(mask)
                return 0

            def els(_):
                req[row, :] = jnp.full((B,), -1, jnp.int32)
                return 0
            jax.lax.cond(jnp.any(mask), then, els, 0)

        def tile_gather(ref, row0, sub, lane, nrows=TS):
            """val[b] = ref[b, row0 + sub[b], lane[b]] (row0 static)."""
            oh = _row_onehot(sub, nrows)
            lane_oh = lane128 == lane[:, None]
            acc = jnp.zeros((B, 128), jnp.int32)
            for s in range(nrows):
                acc = acc + jnp.where(oh[:, s:s + 1],
                                      ref[:, row0 + s, :], 0)
            return jnp.sum(jnp.where(lane_oh, acc, 0), axis=1)

        import os as _os
        _DUP = set(filter(None, _os.environ.get("PPK_DUP", "").split(",")))

        # ---------------- vector phase --------------------------------
        def vstep(rg):
            g = lambda n: rg[_RI[n]]
            fsm = g("fsm")
            done = g("done")
            live = done == 0
            wpos = g("wpos")
            probe2 = g("probe2")
            ppos = wpos + probe2
            pw_base = g("pw_base")
            tok_cnt = g("tok_cnt")
            tok_flushed = g("tok_flushed")
            armed = g("armed")
            alive = g("alive")
            perm = g("perm")
            rw_vld = g("rw_vld")
            reps = [g("rep0"), g("rep1"), g("rep2"), g("rep3")]
            rw_bases = [g("rw_base0"), g("rw_base1"), g("rw_base2"),
                        g("rw_base3")]

            new = [rg[i] for i in range(NR)]

            def upd(name, cond, val):
                i = _RI[name]
                new[i] = jnp.where(cond, val, new[i])

            dz = max_steps_ref[0, 0] >> 30       # runtime 0 (profiling)
            dcol = jnp.full((B, 1), dz) != 0     # runtime False
            is_find0 = live & (fsm == S_FIND)
            is_ext0 = live & (fsm == S_EXT)
            is_blk = live & (fsm == S_BLOCK)

            def phys(k):   # logical rep k -> physical slot
                return (perm >> (2 * k)) & 3

            # ---- pw residency (the only stream-stalling window) ------
            # pw covers [pw_base, pw_base+2048) and follows the parse
            # front: the arm/candidate point reads at ppos, the p-side
            # extension reads at ppos + l, and near-q reads down to
            # ppos - 1024.  Slide target keeps the farthest needed
            # position ~1024 from the top; a slide step stalls the
            # stream for one step per 1024 positions.
            poff = ppos - pw_base
            lmax = jnp.zeros_like(poff)
            for i in range(NLANE):
                on = (armed == 1) & ((alive >> i) & 1 != 0)
                lmax = jnp.maximum(lmax, jnp.where(on, g(f"l{i}"), 0))
            # Slide cadence: keep front - pw_base in [512, ~1551], so
            # reads (front + a 252-lane pair extent) stay below row 15
            # and stage_pair never wraps.  1024-granular bases (DMA
            # tiling) mean back-coverage can shrink to 512 — lanes whose
            # q drops below base reroute to their far window (the near
            # check below is by value).
            front = ppos + lmax
            want_base = jnp.maximum(front - 512, 0) >> 10 << 10
            stale = want_base != pw_base
            do_pw = (is_find0 | is_ext0) & stale & (
                (front - pw_base >= 1536) | (poff < 0) | (poff >= TILE))
            can_go = ~do_pw
            is_find = is_find0 & can_go
            is_ext = is_ext0 & can_go
            req[RQ_PW_P, :] = want_base >> 7
            new[_RI["pw_base"]] = jnp.where(do_pw, want_base,
                                            new[_RI["pw_base"]])

            # ---- S_BLOCK (port of encode_scan_fast FB_BLOCK) ----------
            blk_i = g("blk_i")
            blk_len = g("blk_len")
            blk_off = g("blk_off")
            run_end = g("run_end")
            run_idx = g("run_idx")
            size = g("size")
            tape_on = jnp.zeros_like(wpos) != 0
            tape_w = jnp.zeros_like(wpos)

            need_new = is_blk & (blk_i >= blk_len)
            nboff = blk_off + blk_len
            run_done = need_new & (nboff >= run_end) & (blk_len > 0)
            tape_on = tape_on | run_done
            tape_w = jnp.where(run_done, K_SENT_A, tape_w)
            nridx = run_idx + 1
            upd("run_idx", run_done, nridx)
            upd("run_end", run_done,
                runs_gather(run_ends_ref, jnp.clip(nridx, 0, RMAX - 1)))
            upd("blk_off", run_done, nboff)
            upd("blk_len", run_done, 0)
            upd("blk_i", run_done, 0)
            upd("have_u1", run_done, 0)

            fresh = need_new & ~run_done
            stream_end = fresh & (nboff >= size)
            tape_on = tape_on | stream_end
            tape_w = jnp.where(stream_end, K_END, tape_w)
            upd("done", stream_end, 1)
            upd("fsm", stream_end, S_DONE)

            start_blk = fresh & ~stream_end
            cur_skip = runs_gather(
                run_skip_ref,
                jnp.clip(new[_RI["run_idx"]], 0, RMAX - 1)) == 1
            skip = start_blk & cur_skip
            upd("blk_off", start_blk, nboff)
            upd("blk_len", start_blk,
                jnp.minimum(new[_RI["run_end"]] - nboff, 8 * 1024))
            upd("blk_i", start_blk, 0)
            upd("have_u1", start_blk, 0)
            run_len = new[_RI["run_end"]] - nboff
            upd("blk_len", skip, run_len)
            upd("blk_i", skip, run_len)
            upd("wpos", skip, wpos + run_len)

            go = (is_blk & ~need_new) | (start_blk & ~skip)
            upd("fsm", go, S_FIND)
            upd("armed", go, 0)
            upd("probe2", go & (g("have_u1") == 0), 0)

            # ---- candidate loads at ppos ------------------------------
            csub = jnp.clip(poff >> 7, 0, TS - 1)
            clane = poff & 127
            cds, cls = [], []
            for c in range(C):
                pk = tile_gather(cw, c * TS, csub, clane)
                if "cand" in _DUP:
                    pk2 = tile_gather(cw, c * TS, csub, clane + dz)
                    pk = jnp.where(dz != 0, pk2, pk)
                cds.append(pk >> 5)
                cls.append(pk & 31)

            # ---- arm --------------------------------------------------
            need_find = (g("have_u1") == 0) | (probe2 == 1)
            fresh_arm = is_find & (armed == 0) & need_find
            pick_only = is_find & (armed == 0) & ~need_find

            limit_new = blk_len - blk_i - probe2
            alive2 = jnp.zeros_like(wpos)
            for i in range(4):
                qk = ppos - reps[i]
                on = fresh_arm & (reps[i] > 0) & (qk >= 0) \
                    & (limit_new > 0)
                alive2 = alive2 | jnp.where(on, 1 << i, 0)
                upd(f"l{i}", fresh_arm, 0)
            for c in range(C):
                i = 4 + c
                dv, lv = cds[c], cls[c]
                cont = (lv >= EXT_CAP) & (limit_new > EXT_CAP) & (dv > 0)
                alive2 = alive2 | jnp.where(fresh_arm & cont, 1 << i, 0)
                upd(f"d{i}", fresh_arm, dv)
                upd(f"l{i}", fresh_arm,
                    jnp.where(cont, EXT_CAP,
                              jnp.minimum(lv, limit_new)))
            upd("limit", fresh_arm, limit_new)
            upd("alive", fresh_arm, alive2)
            upd("armed", fresh_arm, 1)

            # ---- per-lane q-window residency + fetch picks ------------
            # computed on post-arm lane state; near/far routing is BY
            # VALUE (q inside the current pw window), so lanes whose q
            # drops below a slid pw_base fall back to their far window
            pw_base_c = new[_RI["pw_base"]]
            alive_now = new[_RI["alive"]]
            rw_fetch = jnp.zeros_like(wpos) != 0
            fw_fetch = jnp.zeros_like(wpos) != 0
            rw_slot = jnp.zeros_like(wpos)
            rw_base_req = jnp.zeros_like(wpos)
            fw_base_req = jnp.zeros_like(wpos)
            lane_res = []
            lane_near = []
            span = 4 * max(R_INL, R_EXT) + 8
            act_lane = fresh_arm | is_ext
            for i in range(NLANE):
                li = new[_RI[f"l{i}"]]
                if i < 4:
                    d = reps[i]
                else:
                    d = new[_RI[f"d{i}"]]
                qi = ppos - d + li
                near = (qi >= pw_base_c) & (qi + 4 < pw_base_c + TILE
                                            - 128)
                if i < 4:
                    sl = phys(i)
                    base = jnp.zeros_like(wpos)
                    vld = jnp.zeros_like(wpos) != 0
                    for s in range(4):
                        base = jnp.where(sl == s, rw_bases[s], base)
                        vld = vld | ((sl == s)
                                     & ((rw_vld >> s) & 1 != 0))
                    res_far = vld & (qi >= base) \
                        & (qi + span < base + TILE - 128)
                else:
                    base = g("fw_base")
                    res_far = (base >= 0) & (qi >= base) \
                        & (qi + span < base + TILE - 128)
                res = near | res_far
                lane_res.append(res)
                lane_near.append(near)
                on = act_lane & ((alive_now >> i) & 1 != 0) & ~res
                want_q = jnp.maximum(qi - 256, 0) >> 10 << 3
                if i < 4:
                    first = on & ~rw_fetch
                    rw_slot = jnp.where(first, phys(i), rw_slot)
                    rw_base_req = jnp.where(first, want_q, rw_base_req)
                    rw_fetch = rw_fetch | on
                else:
                    first = on & ~fw_fetch
                    fw_base_req = jnp.where(first, want_q, fw_base_req)
                    fw_fetch = fw_fetch | on
            req[RQ_RW_P, :] = (rw_slot << 24) | rw_base_req
            req[RQ_FW_P, :] = fw_base_req

            # ---- extension rounds -------------------------------------
            # fresh-arm lanes run R_INL rounds this step; EXT steps run
            # R_EXT.  Lanes without window residency skip their rounds
            # (their fetch was requested above / arrives next step).
            #
            # Cost model (tools/prof attribution): [B,128]-wide ops cost
            # ~40 ns each at B=128, so a 16-row one-hot staging is
            # ~1.3 us — stage each lane's p-row and q-row ONCE per step
            # and extract in4 words per round with single-lane one-hots
            # (~0.16 us).  Advances cap at the staged row's end; a lane
            # that hits the cap stays alive and re-stages next step.
            rounds_on = fresh_arm | is_ext
            alive_cur = new[_RI["alive"]]
            limit_cur = new[_RI["limit"]]

            lane256 = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)

            def stage_pair(tile, sub, nrows=TS):
                """[B,256] = rows sub, sub+1 of a [B,nrows,128] tile
                (residency margins guarantee sub+1 < nrows)."""
                oh = _row_onehot(sub, nrows)
                lo = jnp.zeros((B, 128), jnp.int32)
                hi = jnp.zeros((B, 128), jnp.int32)
                for s in range(nrows):
                    row = tile[:, s, :]
                    lo = lo + jnp.where(oh[:, s:s + 1], row, 0)
                    if s > 0:
                        hi = hi + jnp.where(oh[:, s - 1:s], row, 0)
                return jnp.concatenate([lo, hi], axis=1)

            def lane_word(row, lane):
                sel = lane256 == lane[:, None]
                return jnp.sum(jnp.where(sel, row, 0), axis=1)

            # shared pw row pair around ppos: at arm steps every lane's
            # p-side read (and near-q reads of small-distance reps) hits
            # this pair, so the per-lane stagings below only run when a
            # lane's row actually differs (gated conds) — the dominant
            # per-step cost at ~2.6 us per 16-row pair staging
            shared_sub = jnp.clip(poff, 0, TILE - 129) >> 7
            pw_shared = stage_pair(pw, shared_sub)
            if "shared" in _DUP:
                pw_shared = jnp.where(
                    dcol, stage_pair(pw, shared_sub + dz), pw_shared)

            al = alive_cur
            nrounds = max(R_INL, R_EXT)
            for i in range(NLANE):
                if i < 4:
                    d = reps[i]
                else:
                    d = new[_RI[f"d{i}"]]
                li0 = new[_RI[f"l{i}"]]
                lane_any = rounds_on & ((al >> i) & 1 != 0) \
                    & lane_res[i]

                def ext_lane(args):
                    al, li0 = args
                    q0 = ppos - d + li0
                    p0 = ppos + li0
                    # q row pair: pw for near lanes, rw/fw for far
                    qoff_pw = jnp.clip(q0 - pw_base_c, 0, TILE - 1)
                    q_shared = (qoff_pw >> 7) == shared_sub
                    q_own = lane_any & lane_near[i] & ~q_shared
                    qrow = jax.lax.cond(
                        jnp.any(q_own),
                        lambda: stage_pair(pw, qoff_pw >> 7),
                        lambda: pw_shared)
                    qrow = jnp.where(_col(q_shared), pw_shared, qrow)
                    qlane0 = qoff_pw & 127
                    if i < 4:
                        sl = phys(i)
                        base = jnp.zeros_like(q0)
                        for s in range(4):
                            base = jnp.where(sl == s, rw_bases[s],
                                             base)
                        off = jnp.clip(q0 - base, 0, TILE - 1)

                        def far_row():
                            # two-level: collapse the physical-slot
                            # dimension first (16x4-way selects), then a
                            # 16-row pair scan — 2.3x fewer ops than the
                            # flat 64-row scan
                            ohs = _row_onehot(sl, 4)
                            rows = []
                            for s2 in range(TS):
                                r = jnp.where(ohs[:, 0:1],
                                              rw[:, s2, :],
                                              rw[:, TS + s2, :])
                                r = jnp.where(ohs[:, 2:3],
                                              rw[:, 2 * TS + s2, :], r)
                                r = jnp.where(ohs[:, 3:4],
                                              rw[:, 3 * TS + s2, :], r)
                                rows.append(r)
                            oh2 = _row_onehot(off >> 7, TS)
                            lo = jnp.zeros((B, 128), jnp.int32)
                            hi = jnp.zeros((B, 128), jnp.int32)
                            for s2 in range(TS):
                                lo = lo + jnp.where(oh2[:, s2:s2 + 1],
                                                    rows[s2], 0)
                                if s2 > 0:
                                    hi = hi + jnp.where(
                                        oh2[:, s2 - 1:s2], rows[s2], 0)
                            return jnp.concatenate([lo, hi], axis=1)
                        qrow_far = jax.lax.cond(
                            jnp.any(lane_any & ~lane_near[i]), far_row,
                            lambda: qrow)
                        far = ~lane_near[i]
                        qrow = jnp.where(_col(far), qrow_far, qrow)
                        qlane0 = jnp.where(far, off & 127, qlane0)
                    else:
                        base = g("fw_base")
                        off = jnp.clip(q0 - base, 0, TILE - 1)

                        def far_row():
                            return stage_pair(fw, off >> 7)
                        qrow_far = jax.lax.cond(
                            jnp.any(lane_any & ~lane_near[i]), far_row,
                            lambda: qrow)
                        far = ~lane_near[i]
                        qrow = jnp.where(_col(far), qrow_far, qrow)
                        qlane0 = jnp.where(far, off & 127, qlane0)
                    poff0 = jnp.clip(p0 - pw_base_c, 0, TILE - 1)
                    p_shared = (poff0 >> 7) == shared_sub
                    p_own = lane_any & ~p_shared
                    prow = jax.lax.cond(
                        jnp.any(p_own),
                        lambda: stage_pair(pw, poff0 >> 7),
                        lambda: pw_shared)
                    prow = jnp.where(_col(p_shared), pw_shared, prow)
                    plane0 = poff0 & 127
                    # per-step cap: stay inside both staged pairs
                    cap = jnp.minimum(252 - qlane0, 252 - plane0)
                    cap = jnp.minimum(cap, limit_cur - li0)
                    li = li0
                    alv = al

                    def _round(rnd, li, alv):
                        on_rnd = lane_any & ((alv >> i) & 1 != 0) \
                            & ((fresh_arm & (rnd < R_INL))
                               | (is_ext & (rnd < R_EXT)))
                        delta = li - li0
                        w1 = lane_word(prow, plane0 + delta)
                        w2 = lane_word(qrow, qlane0 + delta)
                        x = w1 ^ w2
                        eq = jnp.where(
                            x == 0, 4,
                            jnp.where((x & 0xFF) != 0, 0,
                                      jnp.where((x & 0xFFFF) != 0, 1,
                                                jnp.where((x & 0xFFFFFF)
                                                          != 0, 2, 3))))
                        adv = jnp.minimum(
                            eq, jnp.maximum(cap - delta, 0))
                        li = jnp.where(on_rnd, li + adv, li)
                        # a full-word advance that only hit the row cap
                        # keeps the lane alive (re-stage next step)
                        mism = on_rnd & (((eq < 4) & (adv == eq))
                                         | (li >= limit_cur))
                        alv = jnp.where(mism, alv & ~(1 << i), alv)
                        return li, alv

                    for rnd in range(R_INL):
                        li, alv = _round(rnd, li, alv)

                    # rounds beyond R_INL only matter for EXT streams on
                    # this lane — skip their [B,256] gathers on pure
                    # FIND steps (the majority)
                    def _ext_rounds(args):
                        li, alv = args
                        for rnd in range(R_INL, nrounds):
                            li, alv = _round(rnd, li, alv)
                        return li, alv
                    li, alv = jax.lax.cond(
                        jnp.any(is_ext & lane_any), _ext_rounds,
                        lambda a: a, (li, alv))
                    return alv, li

                al, li_new = jax.lax.cond(
                    jnp.any(lane_any), ext_lane,
                    lambda a: (a[0], a[1]), (al, li0))
                new[_RI[f"l{i}"]] = jnp.where(lane_any, li_new,
                                              new[_RI[f"l{i}"]])
            upd("alive", rounds_on, al)
            # lanes still alive keep the stream in EXT (either they
            # capped at a row end or their window fetch is in flight)
            settled = rounds_on & (al == 0)
            upd("fsm", rounds_on & ~settled, S_EXT)
            upd("fsm", settled, S_FIND)

            # ---- fold + pick + lazy decide + emit ---------------------
            pick = settled | pick_only
            lens = [jnp.minimum(new[_RI[f"l{i}"]], new[_RI["limit"]])
                    for i in range(NLANE)]

            minlen = jnp.ones_like(wpos)
            dist_var = jnp.zeros_like(wpos)
            gl = jnp.zeros_like(wpos) != 0
            best_l = jnp.ones_like(wpos)
            best_d = jnp.zeros_like(wpos)
            have = jnp.zeros_like(wpos) != 0

            def consider(bl, bd, hv, ln, dw):
                take_first = ~hv
                rep_take = hv & _second_better(bl, bd, ln, dw)
                take = take_first | rep_take
                return (jnp.where(take, ln, bl),
                        jnp.where(take, dw, bd), hv | take_first)

            r01 = lens[0] >= 2
            best_l = jnp.where(r01, 1, best_l)
            best_d = jnp.where(r01, 1, best_d)
            have = r01

            for k in range(4):
                ln = lens[k]
                bet = ~gl & (ln > minlen)
                minlen = jnp.where(bet, ln, minlen)
                bl2, bd2, hv2 = consider(best_l, best_d, have, ln,
                                         jnp.full_like(ln, k + 1))
                best_l = jnp.where(bet, bl2, best_l)
                best_d = jnp.where(bet, bd2, best_d)
                # i1 select_n is unsupported by Mosaic: bool algebra
                have = (bet & hv2) | (~bet & have)
                gl = gl | (bet & (ln >= good_len))

            vld_rge = g("vld_rge")
            for c in range(C):
                dv = new[_RI[f"d{4 + c}"]]
                lv = lens[4 + c]
                gate = (dv > 0) & _ult(dist_var, dv) & ~gl
                dist_var = jnp.where(gate, dv, dist_var)
                ok = gate & _ult(dv, vld_rge)
                if c == 0:
                    ok = ok & (dv != ppos)
                bet = ok & (lv > minlen)
                minlen = jnp.where(bet, lv, minlen)
                blen = _lut(jnp.clip(lv, 0, 7), _BOUND_NP)
                rec = bet & ((lv > 6) | (dv < blen))
                bl2, bd2, hv2 = consider(best_l, best_d, have, lv,
                                         dv + 4)
                best_l = jnp.where(rec, bl2, best_l)
                best_d = jnp.where(rec, bd2, best_d)
                have = (rec & hv2) | (~rec & have)
                gl = gl | (bet & (lv >= good_len))

            u_len = jnp.where(have, best_l, 1)
            u_dist = jnp.where(have, best_d, 0)

            have_u1 = g("have_u1")
            u1_len = jnp.where(have_u1 == 1, g("u1_len"), u_len)
            u1_dist = jnp.where(have_u1 == 1, g("u1_dist"), u_dist)
            first = pick & (probe2 == 0)
            take_now = first & ((u1_len == 1) | (u1_len >= good_len))

            em_len = jnp.where(take_now, u1_len, jnp.zeros_like(wpos))
            em_dist = jnp.where(take_now, u1_dist, jnp.zeros_like(wpos))
            emitted = take_now

            go2 = first & ~take_now
            upd("u1_len", go2, u1_len)
            upd("u1_dist", go2, u1_dist)
            upd("probe2", go2, 1)
            upd("armed", go2, 0)

            second = pick & (probe2 == 1)
            smb = _second_better(g("u1_len"), g("u1_dist"), u_len,
                                 u_dist)
            lit = second & smb
            em_len = jnp.where(lit, 1, em_len)
            em_dist = jnp.where(lit, 0, em_dist)
            emitted = emitted | lit
            upd("u1_len", lit, u_len)
            upd("u1_dist", lit, u_dist)
            upd("have_u1", lit, 1)
            upd("probe2", lit, 0)

            mt = second & ~smb
            em_len = jnp.where(mt, g("u1_len"), em_len)
            em_dist = jnp.where(mt, g("u1_dist"), em_dist)
            emitted = emitted | mt
            upd("have_u1", mt, 0)
            upd("probe2", mt, 0)

            upd("have_u1", take_now, 0)
            upd("blk_i", emitted, blk_i + em_len)
            upd("wpos", emitted, wpos + em_len)
            upd("armed", emitted, 0)
            boundary = emitted & (new[_RI["blk_i"]] >= blk_len)
            upd("fsm", boundary, S_BLOCK)

            # ---- rep queue + window permutation -----------------------
            is_lit_t = emitted & (em_dist == 0)
            is_r01_t = emitted & (em_dist == 1) & (em_len == 1)
            is_rep_t = emitted & (em_dist >= 1) & (em_dist <= 4) \
                & ~is_lit_t & ~is_r01_t
            is_match_t = emitted & (em_dist > 4)

            ridx = jnp.clip(em_dist - 1, 0, 3)
            rd = jnp.zeros_like(wpos)
            for k in range(4):
                rd = jnp.where(ridx == k, reps[k], rd)
            for k in range(4):
                if k == 0:
                    rot = rd
                else:
                    rot = jnp.where(k <= ridx, reps[k - 1], reps[k])
                v = jnp.where(is_rep_t, rot, reps[k])
                if k == 0:
                    pushv = em_dist - 4
                else:
                    pushv = reps[k - 1]
                v = jnp.where(is_match_t, pushv, v)
                upd(f"rep{k}", is_rep_t | is_match_t, v)

            fields = [(perm >> (2 * k)) & 3 for k in range(4)]
            fj = jnp.zeros_like(perm)
            for k in range(4):
                fj = jnp.where(ridx == k, fields[k], fj)
            perm_rot = fj
            for k in range(1, 4):
                fk = jnp.where(k <= ridx, fields[k - 1], fields[k])
                perm_rot = perm_rot | (fk << (2 * k))
            upd("perm", is_rep_t, perm_rot)
            f3 = fields[3]
            perm_push = ((perm << 2) & 0xFC) | f3
            upd("perm", is_match_t, perm_push)
            # the evicted physical window no longer matches its rep
            one = jnp.ones_like(rw_vld)
            upd("rw_vld", is_match_t, rw_vld & ~(one << f3))

            # ---- token write(s) ---------------------------------------
            tok_on = tape_on | emitted
            kind = jnp.where(tape_on, tape_w,
                             jnp.where(is_lit_t, K_LIT,
                                       jnp.where(is_r01_t, K_REP0L1,
                                                 jnp.where(is_rep_t,
                                                           K_REP,
                                                           K_MATCH))))
            aval = jnp.where(is_rep_t, em_dist - 1,
                             jnp.where(is_match_t, em_dist - 5, 0))
            aval = jnp.where(tape_on, 0, aval)
            bval = jnp.where(is_rep_t | is_match_t, em_len - 2, 0)
            w0 = kind | (bval << 3)
            w1 = aval

            lane_pos = tok_cnt * 2
            woff0 = lane_pos & (TILE - 1)
            woff1 = (lane_pos + 1) & (TILE - 1)
            onc = _col(tok_on)
            oh0 = _row_onehot(woff0 >> 7, TS)
            oh1 = _row_onehot(woff1 >> 7, TS)
            m0 = (lane128 == (woff0 & 127)[:, None]) & onc
            m1 = (lane128 == (woff1 & 127)[:, None]) & onc
            for _rep in range(2 if "tok" in _DUP else 1):
                for s in range(TS):
                    row = tok_t[:, s, :]
                    row = jnp.where(oh0[:, s:s + 1] & m0, w0[:, None], row)
                    row = jnp.where(oh1[:, s:s + 1] & m1, w1[:, None], row)
                    tok_t[:, s, :] = row
            upd("tok_cnt", tok_on, tok_cnt + 1)

            nl = new[_RI["tok_cnt"]] * 2
            flush_now = tok_on & ((nl >> 10) > tok_flushed)
            req[RQ_TOKFL_P, :] = tok_flushed
            upd("tok_flushed", flush_now, tok_flushed + 1)

            emit_req(RQ_TOKFL_IDS, flush_now)
            emit_req(RQ_PW_IDS, do_pw)
            emit_req(RQ_RW_IDS, rw_fetch)
            emit_req(RQ_FW_IDS, fw_fetch)
            for s in range(4):
                hit = rw_fetch & (rw_slot == s)
                new[_RI[f"rw_base{s}"]] = jnp.where(
                    hit, rw_base_req << 7, new[_RI[f"rw_base{s}"]])
                new[_RI["rw_vld"]] = jnp.where(
                    hit, new[_RI["rw_vld"]] | (1 << s),
                    new[_RI["rw_vld"]])
            new[_RI["fw_base"]] = jnp.where(fw_fetch, fw_base_req << 7,
                                            new[_RI["fw_base"]])
            return new

        # ---------------- scalar service phase ------------------------
        def service():
            d = pltpu.make_async_copy(req, smem, sem_req)
            d.start()
            d.wait()

            def serve(row, issue):
                def cond(c):
                    i, _n = c
                    return (i < B) & (smem[row, jnp.minimum(i, B - 1)]
                                      >= 0)

                def body(c):
                    i, n = c
                    return i + 1, n + issue(smem[row, i])
                return jax.lax.while_loop(
                    cond, body, (jnp.int32(0), jnp.int32(0)))[1]

            def tok_issue(b):
                blk = smem[RQ_TOKFL_P, b]
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(
                    tok_t.at[b, pl.ds(slot, 8), :],
                    tok_out.at[b, pl.ds(dst, 8), :], sem_fl).start()
                return jnp.int32(1)
            nfl = serve(RQ_TOKFL_IDS, tok_issue)

            def pw_issue(b):
                base = pl.multiple_of(
                    jnp.clip(smem[RQ_PW_P, b], 0, NS - TS), 8)
                pltpu.make_async_copy(
                    in4_hbm.at[b, pl.ds(base, TS), :],
                    pw.at[b, :, :], sem_pw).start()
                for c in range(C):
                    pltpu.make_async_copy(
                        cand_hbm.at[b, c, pl.ds(base, TS), :],
                        cw.at[b, pl.ds(c * TS, TS), :], sem_pw).start()
                return jnp.int32(1 + C)
            npw = serve(RQ_PW_IDS, pw_issue)

            def rw_issue(b):
                pv = smem[RQ_RW_P, b]
                slot = pv >> 24
                base = pl.multiple_of(
                    jnp.clip(pv & 0xFFFFFF, 0, NS - TS), 8)

                def mk(s):
                    def go():
                        pltpu.make_async_copy(
                            in4_hbm.at[b, pl.ds(base, TS), :],
                            rw.at[b, pl.ds(s * TS, TS), :],
                            sem_rw).start()
                        return jnp.int32(1)
                    return go
                return jax.lax.switch(jnp.clip(slot, 0, 3),
                                      [mk(0), mk(1), mk(2), mk(3)])
            nrw = serve(RQ_RW_IDS, rw_issue)

            def fw_issue(b):
                base = pl.multiple_of(
                    jnp.clip(smem[RQ_FW_P, b], 0, NS - TS), 8)
                pltpu.make_async_copy(
                    in4_hbm.at[b, pl.ds(base, TS), :],
                    fw.at[b, :, :], sem_fw).start()
                return jnp.int32(1)
            nfw = serve(RQ_FW_IDS, fw_issue)

            def drain(n, sem, ref_src, ref_dst):
                def w(i, _):
                    pltpu.make_async_copy(ref_src, ref_dst, sem).wait()
                    return _
                jax.lax.fori_loop(0, n, w, 0)
            drain(nfl, sem_fl, tok_t.at[0, pl.ds(0, 8), :],
                  tok_out.at[0, pl.ds(0, 8), :])
            drain(npw, sem_pw, in4_hbm.at[0, pl.ds(0, TS), :],
                  pw.at[0, :, :])
            drain(nrw, sem_rw, in4_hbm.at[0, pl.ds(0, TS), :],
                  rw.at[0, pl.ds(0, TS), :])
            drain(nfw, sem_fw, in4_hbm.at[0, pl.ds(0, TS), :],
                  fw.at[0, :, :])

        # ---------------- main loop -----------------------------------
        def cond(carry):
            step = carry[0]
            done = carry[1][_RI["done"]]
            return (step < max_steps_ref[0, 0]) & ~jnp.all(done == 1)

        def body(carry):
            step, rg = carry
            new = vstep(rg)
            service()
            if "serv" in _DUP:
                service()
            return step + 1, tuple(new)

        rg0 = tuple(regs_ref[i, :] for i in range(NR))
        steps, rgf = jax.lax.while_loop(cond, body, (jnp.int32(0), rg0))
        for i in range(NR):
            regs_out[i, :] = rgf[i]
        steps_ref[0, 0] = steps

        # epilogue: flush pending token blocks
        req[RQ_TOKFL_P, :] = rgf[_RI["tok_flushed"]]
        req[RQ_PW_P, :] = rgf[_RI["tok_cnt"]]
        d = pltpu.make_async_copy(req, smem, sem_req)
        d.start()
        d.wait()

        def ep_body(b, cnt):
            fblk = smem[RQ_TOKFL_P, b]
            last = (smem[RQ_PW_P, b] * 2) >> 10
            last = jnp.minimum(last, (NTS // 8) - 1)

            def go(blk, c):
                slot = pl.multiple_of((blk & 1) * 8, 8)
                dst = pl.multiple_of(blk * 8, 8)
                pltpu.make_async_copy(
                    tok_t.at[b, pl.ds(slot, 8), :],
                    tok_out.at[b, pl.ds(dst, 8), :], sem_fl).start()
                return c + 1
            c1 = jax.lax.cond(fblk <= last, lambda c: go(fblk, c),
                              lambda c: c, cnt)
            return jax.lax.cond(fblk + 1 <= last,
                                lambda c: go(fblk + 1, c),
                                lambda c: c, c1)
        nep = jax.lax.fori_loop(0, B, ep_body, 0)

        def ep_wait(i, _):
            pltpu.make_async_copy(tok_t.at[0, pl.ds(0, 8), :],
                                  tok_out.at[0, pl.ds(0, 8), :],
                                  sem_fl).wait()
            return _
        jax.lax.fori_loop(0, nep, ep_wait, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _run(B, C, NS, NTS, RMAX, good_len, interpret,
         max_steps, regs, run_ends, run_skip, in4_hbm, cand_hbm, tok0):
    kernel = _make_kernel(B, C, NS, NTS, RMAX, good_len)
    out_shapes = (
        jax.ShapeDtypeStruct((B, NTS, 128), jnp.int32),   # tok (alias)
        jax.ShapeDtypeStruct((NR, B), jnp.int32),         # regs_out
        jax.ShapeDtypeStruct((1, 1), jnp.int32),          # steps
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        input_output_aliases={6: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # max_steps
            pl.BlockSpec(memory_space=pltpu.VMEM),        # regs
            pl.BlockSpec(memory_space=pltpu.VMEM),        # run_ends
            pl.BlockSpec(memory_space=pltpu.VMEM),        # run_skip
            pl.BlockSpec(memory_space=pltpu.ANY),         # in4
            pl.BlockSpec(memory_space=pltpu.ANY),         # cand
            pl.BlockSpec(memory_space=pltpu.ANY),         # tok0
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, TS, 128), jnp.int32),          # pw
            pltpu.VMEM((B, TS, 128), jnp.int32),          # fw
            pltpu.VMEM((B, TS, 128), jnp.int32),          # tok_t
            pltpu.VMEM((B, C * TS, 128), jnp.int32),      # cw
            pltpu.VMEM((B, 4 * TS, 128), jnp.int32),      # rw
            pltpu.VMEM((NRQ, B), jnp.int32),              # req
            pltpu.SMEM((NRQ, B), jnp.int32),              # smem
            pltpu.SemaphoreType.DMA,                      # sem_fl
            pltpu.SemaphoreType.DMA,                      # sem_pw
            pltpu.SemaphoreType.DMA,                      # sem_rw
            pltpu.SemaphoreType.DMA,                      # sem_fw
            pltpu.SemaphoreType.DMA,                      # sem_req
        ],
    )(max_steps, regs, run_ends, run_skip, in4_hbm, cand_hbm, tok0)


def parse_batch_pallas(data_dev, cand_packed, sizes, dict_sizes,
                       run_ends_np, run_types_np, good_len, hash_width,
                       interpret=False, max_steps=None, mesh=None):
    """Run the parse kernel for B streams.

    data_dev: [B, N] u8 device array (the LZ input).  cand_packed:
    [B, C, N] i32 (parse_pre.pack_candidates).  Returns (tok_w0, tok_w1)
    device arrays [B, T] (T = token capacity), tok_cnt np [B], and the
    steps taken."""
    import numpy as np
    from .parse_pre import mk_in4_dev

    B, N = data_dev.shape
    C = 2 + int(hash_width)
    NS = _bucket(N + 2 * TILE, 1024) // 128
    ntok_lanes = _bucket(2 * (N + 64) + 2 * TILE, 1024)
    NTS = ntok_lanes // 128
    RMAX = max(8, run_ends_np.shape[1])

    regs = np.zeros((NR, B), np.int32)
    regs[_RI["fsm"], :] = S_BLOCK
    for k in range(4):
        regs[_RI[f"rep{k}"], :] = np.asarray(dict_sizes, np.int32)
    regs[_RI["perm"], :] = 0b11100100     # identity map
    regs[_RI["pw_base"], :] = -(1 << 20)  # forces the initial window load
    regs[_RI["fw_base"], :] = -(1 << 20)
    regs[_RI["size"], :] = np.asarray(sizes, np.int32)
    regs[_RI["vld_rge"], :] = (np.asarray(dict_sizes, np.int32)
                               - 8 * 1024 - 4)
    re = np.zeros((B, RMAX), np.int32)
    re[:, :run_ends_np.shape[1]] = run_ends_np
    re[:, run_ends_np.shape[1]:] = run_ends_np[:, -1:]
    rs = np.zeros((B, RMAX), np.int32)
    rs[:, :run_types_np.shape[1]] = (
        np.asarray(run_types_np, np.int32) >= 5).astype(np.int32)
    # run_end register starts at the first run's end
    regs[_RI["run_end"], :] = re[:, 0]
    regs[_RI["run_idx"], :] = 0

    import jax.numpy as jnp
    in4 = mk_in4_dev(data_dev, NS * 128)
    candp = jnp.pad(cand_packed,
                    ((0, 0), (0, 0), (0, NS * 128 - N))).reshape(
        B, C, NS, 128)
    tok0 = jnp.zeros((B, NTS, 128), jnp.int32)

    if max_steps is None:
        max_steps = int(6 * N + 4096)
    ms = jnp.asarray(np.array([[max_steps]], np.int32))
    if mesh is not None:
        # multi-chip: shard the stream batch over every mesh axis
        # (dp x sp) and run the SAME kernel per shard via shard_map —
        # streams are independent, no collectives on the hot path
        from jax.sharding import PartitionSpec as P
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:                     # newer jax
            from jax.sharding import shard_map
        ndev = mesh.size
        assert B % ndev == 0, (B, ndev)
        axes = tuple(mesh.axis_names)
        ax = P(axes)

        def f(ms_, regs_, re_, rs_, in4_, candp_, tok0_):
            tok_s, regs_s, steps_s = _run(
                B // ndev, C, NS, NTS, RMAX, int(good_len),
                bool(interpret), ms_, regs_, re_, rs_, in4_, candp_,
                tok0_)
            return (tok_s, regs_s.T,
                    jnp.broadcast_to(steps_s.reshape(1, 1),
                                     (B // ndev, 1)))

        fn = shard_map(
            f, mesh=mesh,
            in_specs=(P(None, None), P(None, axes), ax, ax,
                      P(axes, None, None), P(axes, None, None, None),
                      P(axes, None, None)),
            out_specs=(P(axes, None, None), P(axes, None),
                       P(axes, None)),
            check_rep=False)
        tok_o, regs_t, steps_b = jax.jit(fn)(
            ms, jnp.asarray(regs), jnp.asarray(re), jnp.asarray(rs),
            in4, candp, tok0)
        regs_np = np.asarray(regs_t).T
        steps_v = int(np.asarray(steps_b).max())
    else:
        tok_o, regs_o, steps = _run(B, C, NS, NTS, RMAX, int(good_len),
                                    bool(interpret), ms,
                                    jnp.asarray(regs),
                                    jnp.asarray(re), jnp.asarray(rs),
                                    in4, candp, tok0)
        regs_np = np.asarray(regs_o)
        steps_v = int(np.asarray(steps)[0, 0])
    if not regs_np[_RI["done"]].all():
        raise RuntimeError("pallas parse hit the step cap")
    T = NTS * 128 // 2
    tokf = tok_o.reshape(B, T, 2)
    return tokf[:, :, 0], tokf[:, :, 1], regs_np[_RI["tok_cnt"]], \
        steps_v
