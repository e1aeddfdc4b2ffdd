"""Device-side tape stitching: parse tape -> phase-B token tape.

The host stitcher (pipeline._encode_group) wraps each run's LZ segment
with EncodeInt headers / sentinels / chunk-flush tokens and generates
the CompressBad / CompressLiterals payload tokens
(csc_encoder_main.cpp:128-145, csc_model.cpp:448-469).  Pulling the
parse tape to the host and re-uploading the stitched tape moves
~20 MB over the ~20 MB/s axon tunnel per 96-stream batch — more wall
time than the parse itself.  This module performs the identical
rewrite on-device with batched gathers:

  out[o] = header token      (K_INT type [, K_INT size])
         | parse-tape gather (LZ segment, via per-run segment offsets
                              recovered from the K_SENT_A sentinels)
         | K_SENT            (block-end sentinel, csc_lz.cpp:97)
         | generated payload (K_RAW byte pairs / K_ELIT literals read
                              straight from the LZ input bytes)
         | tail tokens       (K_INT cont [, K_FLUSH])
         | K_END             (fill)

DT_DLT runs (CompressRLE, csc_model.cpp:471-513) ride an auxiliary
token tape: their payload is the delta-filtered copy whose RLE
skeleton (K_DLIT/K_RLEN tokens) the host precomputes with
encode_host.rle_tape and uploads packed one-int32-per-token
(kind<<30 | b<<8 | a); the stitcher gathers and unpacks them like the
LZ segments.  The aux upload costs 4 B/token over the tunnel — small
next to re-routing the whole stream through the host stitcher.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import DT_ENGTXT, DT_NO_LZ, DT_BAD, DT_ENTROPY, DT_DLT
from .encode_scan import (K_END, K_SENT_A, K_LIT, K_MATCH, K_REP,
                          K_REP0L1)
from .encode_bits import (K_INT, K_SENT, K_FLUSH, K_RAW, K_ELIT, K_DLIT,
                          K_RLEN)


def plan_out_bound(run_tables, tl_in, dlt_toks=None):
    """Static upper bound of the stitched tape length (host-side).

    LZ segments are bounded by the parse tape length; headers, tails,
    sentinels and BAD/ENT payload sizes are known from the run table.
    dlt_toks: per-stream list of per-run aux token counts (0 for
    non-DLT runs), required when any run table contains a DT_DLT run."""
    worst = 0
    for j, rt in enumerate(run_tables):
        extra = 1                      # K_END
        for k, (t, rlen, _decl, last, _pl) in enumerate(rt):
            extra += 1 + (1 if (t == DT_ENGTXT or t >= DT_NO_LZ) else 0)
            extra += 1 + (1 if last else 0)
            if t >= DT_DLT:
                extra += dlt_toks[j][k]
            elif t == DT_BAD:
                extra += (rlen + 1) // 2
            elif t == DT_ENTROPY:
                extra += rlen
            elif t < DT_NO_LZ:
                extra += 1             # K_SENT
        worst = max(worst, tl_in + extra)
    return worst


@functools.partial(jax.jit, static_argnums=(8, 9))
def _stitch_dev(tapes, data_dev, rtype, rdecl, rlen, rlast, rvalid, loff,
                TL_out, fill_from_data=False, aux=None, astart=None,
                aplen=None):
    """tapes: (tk, ta, tb, tc) [B, TL_in] i32 parse tapes (device).
    data_dev: [B, N] u8 LZ input.  r*: [B, R] i32 run tables.
    aux/astart/aplen: packed DT_DLT token tape [B, AUXL] i32 plus
    per-run start/count (None when no stream has a DLT run).
    Returns stitched (tkk, taa, tbb, tcc) [B, TL_out] i32."""
    tk, ta, tb, tc = tapes
    B, TL_in = tk.shape
    R = rtype.shape[1]
    N = data_dev.shape[1]

    # --- per-run LZ segment bounds from the K_SENT_A sentinels --------
    iota_t = jnp.arange(TL_in, dtype=jnp.int32)[None, :]
    m = (tk == K_SENT_A) & (rvalid.sum(axis=1)[:, None] > 0)
    cum = jnp.cumsum(m.astype(jnp.int32), axis=1)
    sp = []
    for r in range(R):
        sp.append(jnp.sum(jnp.where(m & (cum == r + 1), iota_t, 0),
                          axis=1))
    sp = jnp.stack(sp, axis=1)                       # [B, R]
    seg_start = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), sp[:, :-1] + 1], axis=1)
    seg_len = sp - seg_start

    # --- per-run output lengths ---------------------------------------
    is_lz = rtype < DT_NO_LZ
    has_size = (rtype == DT_ENGTXT) | (rtype >= DT_NO_LZ)
    hlen = jnp.where(rvalid > 0, 1 + has_size.astype(jnp.int32), 0)
    plen_nolz = jnp.where(rtype == DT_BAD, (rlen + 1) // 2, rlen)
    if aux is not None:
        plen_nolz = jnp.where(rtype >= DT_DLT, aplen, plen_nolz)
    plen = jnp.where(is_lz, seg_len + 1, plen_nolz)
    plen = jnp.where(rvalid > 0, plen, 0)
    tlen = jnp.where(rvalid > 0, 1 + rlast, 0)
    rl_total = hlen + plen + tlen
    out_end = jnp.cumsum(rl_total, axis=1)           # [B, R] inclusive
    out_start = out_end - rl_total
    total = out_end[:, -1:]                          # [B, 1]

    # --- output index -> (run, offset) --------------------------------
    o = jnp.arange(TL_out, dtype=jnp.int32)[None, :]  # [1, TL_out]
    ridx = jnp.zeros((B, TL_out), jnp.int32)
    for r in range(R - 1):
        ridx += (o >= out_end[:, r:r + 1]).astype(jnp.int32)
    ridx = jnp.clip(ridx, 0, R - 1)

    def g(tbl):
        return jnp.take_along_axis(tbl, ridx, axis=1)

    start_g = g(out_start)
    hlen_g = g(hlen)
    plen_g = g(plen)
    type_g = g(rtype)
    decl_g = g(rdecl)
    rlen_g = g(rlen)
    last_g = g(rlast)
    loff_g = g(loff)
    segs_g = g(seg_start)
    segl_g = g(seg_len)

    off = o - start_g
    p = off - hlen_g
    t_off = p - plen_g

    is_hdr = off < hlen_g
    is_pay = ~is_hdr & (p < plen_g)
    is_lz_g = type_g < DT_NO_LZ
    is_bad_g = type_g == DT_BAD

    # LZ segment gather (tape positions; clamped when inactive)
    in_idx = jnp.clip(segs_g + jnp.maximum(p, 0), 0, TL_in - 1)
    lz_k = jnp.take_along_axis(tk, in_idx, axis=1)
    lz_a = jnp.take_along_axis(ta, in_idx, axis=1)
    lz_b = jnp.take_along_axis(tb, in_idx, axis=1)
    lz_c = jnp.take_along_axis(tc, in_idx, axis=1)

    # BAD/ENT payload byte gathers
    pc = jnp.maximum(p, 0)
    bi0 = jnp.clip(loff_g + jnp.where(is_bad_g, 2 * pc, pc), 0, N - 1)
    d0 = jnp.take_along_axis(data_dev, bi0, axis=1).astype(jnp.int32)
    d1 = jnp.take_along_axis(data_dev, jnp.clip(bi0 + 1, 0, N - 1),
                             axis=1).astype(jnp.int32)
    pair_full = (2 * pc + 1) < rlen_g

    # --- assemble ------------------------------------------------------
    kk = jnp.full((B, TL_out), K_END, jnp.int32)
    aa = jnp.zeros((B, TL_out), jnp.int32)
    bb = jnp.zeros((B, TL_out), jnp.int32)
    cc = jnp.zeros((B, TL_out), jnp.int32)

    # tail: K_INT(cont) then K_FLUSH
    is_tail0 = ~is_hdr & ~is_pay & (t_off == 0)
    is_tail1 = ~is_hdr & ~is_pay & (t_off == 1) & (last_g > 0)
    kk = jnp.where(is_tail0, K_INT, kk)
    aa = jnp.where(is_tail0, last_g, aa)
    kk = jnp.where(is_tail1, K_FLUSH, kk)
    aa = jnp.where(is_tail1, 0, aa)

    # payload
    in_seg = is_pay & is_lz_g & (p < segl_g)
    kk = jnp.where(in_seg, lz_k, kk)
    aa = jnp.where(in_seg, lz_a, aa)
    bb = jnp.where(in_seg, lz_b, bb)
    cc = jnp.where(in_seg, lz_c, cc)
    at_sent = is_pay & is_lz_g & (p == segl_g)
    kk = jnp.where(at_sent, K_SENT, kk)
    aa = jnp.where(at_sent, 64, aa)
    bb = jnp.where(at_sent, 0, bb)
    is_badp = is_pay & is_bad_g
    kk = jnp.where(is_badp, K_RAW, kk)
    aa = jnp.where(is_badp,
                   jnp.where(pair_full, (d0 << 8) | d1, d0), aa)
    bb = jnp.where(is_badp, jnp.where(pair_full, 16, 8), bb)
    is_dlt_g = type_g >= DT_DLT
    is_entp = is_pay & ~is_lz_g & ~is_bad_g & ~is_dlt_g
    kk = jnp.where(is_entp, K_ELIT, kk)
    aa = jnp.where(is_entp, d0, aa)
    bb = jnp.where(is_entp, 0, bb)
    if aux is not None:
        # DLT payload: unpack kind<<30 | b<<8 | a from the aux tape
        is_dltp = is_pay & is_dlt_g
        astart_g = g(astart)
        AUXL = aux.shape[1]
        ai = jnp.clip(astart_g + pc, 0, AUXL - 1)
        packed = jnp.take_along_axis(aux, ai, axis=1)
        kk = jnp.where(is_dltp,
                       jnp.where(packed >> 30 != 0, K_RLEN, K_DLIT), kk)
        aa = jnp.where(is_dltp, packed & 0xFF, aa)
        bb = jnp.where(is_dltp, (packed >> 8) & 0x3FFFFF, bb)
    else:
        is_dltp = jnp.zeros_like(is_entp)

    # header (written last: precedence irrelevant, masks are disjoint)
    is_h0 = is_hdr & (off == 0)
    is_h1 = is_hdr & (off == 1)
    kk = jnp.where(is_h0 | is_h1, K_INT, kk)
    aa = jnp.where(is_h0, type_g, aa)
    aa = jnp.where(is_h1, decl_g, aa)
    bb = jnp.where(is_hdr, 0, bb)
    cc = jnp.where(is_hdr | at_sent | is_badp | is_entp
                   | is_tail0 | is_tail1, 0, cc)

    # beyond total: K_END fill
    past = o >= total
    kk = jnp.where(past, K_END, kk)
    aa = jnp.where(past, 0, aa)
    bb = jnp.where(past, 0, bb)
    cc = jnp.where(past, 0, cc)

    if fill_from_data:
        # The Pallas parse kernel emits (kind, dist_code, wire_len) only;
        # literal bytes (tok_a of K_LIT) and last-match bytes (tok_c)
        # are reconstructed here: each LZ token's byte position is the
        # run's LZ-input offset plus the cumulative consumed length of
        # LZ tokens within the run (skip runs contribute no LZ tokens,
        # so a per-run correction re-bases the cumulative sum).
        is_lzk = ((kk == K_LIT) | (kk == K_REP0L1) | (kk == K_MATCH)
                  | (kk == K_REP)) & in_seg
        consumed = jnp.where((kk == K_MATCH) | (kk == K_REP), bb + 2,
                             jnp.where(is_lzk, 1, 0))
        consumed = jnp.where(is_lzk, consumed, 0)
        cex = jnp.cumsum(consumed, axis=1) - consumed
        lz_rlen = jnp.where((rtype < DT_NO_LZ) & (rvalid > 0), rlen, 0)
        lzcum = jnp.cumsum(lz_rlen, axis=1) - lz_rlen     # [B, R]
        lzcum_g = g(lzcum)
        posn = jnp.clip(loff_g + cex - lzcum_g, 0, N - 1)
        dlit = jnp.take_along_axis(data_dev, posn,
                                   axis=1).astype(jnp.int32)
        dlast = jnp.take_along_axis(
            data_dev,
            jnp.clip(posn + jnp.maximum(consumed - 1, 0), 0, N - 1),
            axis=1).astype(jnp.int32)
        aa = jnp.where(is_lzk & (kk == K_LIT), dlit, aa)
        cc = jnp.where(is_lzk, dlast, cc)
    return kk, aa, bb, cc


def stitch_device(final_state, data_dev, run_tables, tl_out=None):
    """Stitch the fast-parse output state into phase-B tapes on device
    (XLA fast-parse flavor: tapes carry a and c)."""
    return stitch_device_tapes(
        (final_state["tok_kind"], final_state["tok_a"],
         final_state["tok_b"], final_state["tok_c"]),
        data_dev, run_tables, tl_out=tl_out)


def stitch_device_tapes(tapes, data_dev, run_tables, tl_out=None,
                        fill_from_data=False):
    """Stitch parse tapes into phase-B tapes on device.

    tapes: (tk, ta, tb, tc) device arrays [B, TL_in].  run_tables: list
    of per-stream run tables from encode_host.plan_stream.  Returns
    (tkk, taa, tbb, tcc) device arrays [B, TL_out] plus TL_out.
    fill_from_data: reconstruct literal bytes / last-match bytes from
    data (the Pallas parse kernel emits neither).  DT_DLT runs ride the
    packed aux token tape (module docstring): the host computes the RLE
    skeleton per run and uploads 4 B/token."""
    from .pipeline import _bucket

    tk = tapes[0]
    B, TL_in = tk.shape
    R = max(len(rt) for rt in run_tables)
    rtype = np.zeros((B, R), np.int32)
    rdecl = np.zeros((B, R), np.int32)
    rlen = np.zeros((B, R), np.int32)
    rlast = np.zeros((B, R), np.int32)
    rvalid = np.zeros((B, R), np.int32)
    loff = np.zeros((B, R), np.int32)
    for j, rt in enumerate(run_tables):
        acc = 0
        for k, (t, ln, decl, last, _pl) in enumerate(rt):
            rtype[j, k] = t
            rdecl[j, k] = decl
            rlen[j, k] = ln
            rlast[j, k] = 1 if last else 0
            rvalid[j, k] = 1
            loff[j, k] = acc
            acc += ln
    # DT_DLT aux tape: per-run RLE skeletons, packed kind<<30 | b<<8 | a
    aux = astart = aplen_d = None
    if any(t >= DT_DLT for rt in run_tables for (t, *_r) in rt):
        from .encode_host import rle_tape
        from .encode_bits import K_RLEN as _KR
        dlt_toks = [[0] * len(rt) for rt in run_tables]
        packs = [[] for _ in run_tables]
        astart_np = np.zeros((B, R), np.int32)
        aplen_np = np.zeros((B, R), np.int32)
        for j, rt in enumerate(run_tables):
            acc = 0
            for k, (t, ln, decl, last, pl) in enumerate(rt):
                if t >= DT_DLT:
                    kk_, aa_, bb_ = rle_tape(np.frombuffer(pl, np.uint8))
                    # bb_ shares bits 8..29 with the kind flag at bit 30:
                    # a run length >= 2^22+11 would corrupt the packing
                    # (unreachable below ~4 MB payloads, but the encode
                    # cap is env-tunable)
                    assert int(bb_.max(initial=0)) < (1 << 22), \
                        "DLT run length overflows aux-tape packing"
                    packs[j].append(((kk_ == _KR).astype(np.int32) << 30)
                                    | (bb_ << 8) | aa_)
                    dlt_toks[j][k] = len(kk_)
                    astart_np[j, k] = acc
                    aplen_np[j, k] = len(kk_)
                    acc += len(kk_)
        auxl = _bucket(max(1, max(sum(len(p) for p in ps)
                                  for ps in packs)), 256)
        aux_np = np.zeros((B, auxl), np.int32)
        for j, ps in enumerate(packs):
            if ps:
                cat = np.concatenate(ps)
                aux_np[j, :len(cat)] = cat
        aux = jnp.asarray(aux_np)
        astart = jnp.asarray(astart_np)
        aplen_d = jnp.asarray(aplen_np)
    else:
        dlt_toks = None
    if tl_out is None:
        from .pallas_decode import _bucket15
        tl_out = _bucket15(plan_out_bound(run_tables, TL_in, dlt_toks),
                           1024)
    kk, aa, bb, cc = _stitch_dev(
        tapes, data_dev, jnp.asarray(rtype), jnp.asarray(rdecl),
        jnp.asarray(rlen), jnp.asarray(rlast), jnp.asarray(rvalid),
        jnp.asarray(loff), int(tl_out), bool(fill_from_data),
        aux=aux, astart=astart, aplen=aplen_d)
    return kk, aa, bb, cc, int(tl_out)
