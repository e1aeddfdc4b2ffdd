"""Vectorized match-finder precompute for the TPU-native fast parse.

The reference finds matches by mutating hash tables one position at a
time (csc_mf.cpp:243-495) — a random-access pattern a TPU cannot do
fast.  The TPU-native reformulation: candidates are *previous
occurrences of the same hash*, so for the no-window-wrap archiver case
they can all be computed up front with batched sorts and gathers, and
their match lengths with data-parallel word-compare sweeps.  The
sequential parse then only folds precomputed candidates (plus live
rep-distance probes) per token.

Approximation vs the reference finder (documented, format-safe): the
occurrence chains treat EVERY position as inserted, while the reference
skips ht6 inserts on the stride-4 fast path inside matches >=129 bytes
(csc_mf.cpp:145) and dedups consecutive same-hash MTF shifts.  Streams
with such matches may parse slightly differently — output remains a
valid CSC stream with equivalent ratio; the bit-exact XLA/golden paths
remain available (CSC_ENCODE_PARSE=exact).

Hash functions mirror csc_mf.cpp:26-43 exactly (same table sizes), and
lookahead bytes at each 8KB sub-block boundary are masked to zero the
way the reference's window copy makes them (csc_lz.cpp:63-67).
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp

MASK32 = 0xFFFFFFFF
# Bulk extension cap; longer matches extend live.  Each extension round
# costs one ~135 ms q-side gather at [288,32K] (tools/spike_gather2.py),
# so the cap trades precompute gathers against in-kernel extension
# rounds; 8 (two gathers) measured best end-to-end.  Both parse paths
# share this value, so token output is unaffected (live extension
# continues where the cap stops); the packed dist<<5|len encoding
# allows up to 31.
EXT_CAP = 8


def _u32(x):
    return x.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _hashes(data, blk_end, hash_bits, N):
    """h2/h3/h6 per position with sub-block lookahead masking."""
    d = data.astype(jnp.uint32)
    z = jnp.zeros((data.shape[0], 8), jnp.uint32)
    dd = jnp.concatenate([d, z], axis=1)
    in4 = (dd[:, :N] | (dd[:, 1:N + 1] << 8) | (dd[:, 2:N + 2] << 16)
           | (dd[:, 3:N + 3] << 24))
    in2 = dd[:, :N] | (dd[:, 1:N + 1] << 8)
    v2b = dd[:, 4:N + 4] | (dd[:, 5:N + 5] << 8)

    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    rem = blk_end - pos
    m4 = jnp.where(rem >= 4, jnp.uint32(0xFFFFFFFF),
                   jnp.where(rem == 3, jnp.uint32(0x00FFFFFF),
                             jnp.where(rem == 2, jnp.uint32(0x0000FFFF),
                                       jnp.where(rem == 1,
                                                 jnp.uint32(0xFF),
                                                 jnp.uint32(0)))))
    rem2 = rem - 4
    m2b = jnp.where(rem2 >= 2, jnp.uint32(0xFFFF),
                    jnp.where(rem2 == 1, jnp.uint32(0xFF), jnp.uint32(0)))
    m2 = jnp.where(rem >= 2, jnp.uint32(0xFFFF),
                   jnp.where(rem == 1, jnp.uint32(0xFF), jnp.uint32(0)))
    v2 = in2 & m2
    v4 = in4 & m4
    v2bm = v2b & m2b

    h2 = ((v2 * 65521) & 0x3FFF).astype(jnp.int32)
    b0 = v2 & 0xFF
    b1 = (v2 >> 8) & 0xFF
    b2 = (v4 >> 16) & 0xFF
    h3 = (((b0 << 8) ^ (b1 << 5) ^ b2) & 0xFFFF).astype(jnp.int32)
    h6full = ((v4 ^ (v2bm << 13)) * jnp.uint32(2654435761))
    h6 = (h6full >> (32 - hash_bits)).astype(jnp.int32)
    return in4, h2, h3, h6


@jax.jit
def _prev_occ(h):
    """prev[p] = largest q < p with h[q] == h[p], else -1 (batched)."""
    B, N = h.shape
    order = jnp.argsort(h, axis=1, stable=True)      # pos grouped by hash
    h_s = jnp.take_along_axis(h, order, axis=1)
    prev_s = jnp.where(h_s[:, 1:] == h_s[:, :-1], order[:, :-1], -1)
    prev_s = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), prev_s.astype(jnp.int32)],
        axis=1)
    out = jnp.zeros_like(h)
    return jnp.put_along_axis(out, order, prev_s, axis=1,
                              inplace=False)


@functools.partial(jax.jit, static_argnums=(3,))
def _ext_lens(in4, qpos, blk_end, cap):
    """Match length between p and candidate qpos[p] (or -1), capped at
    min(cap, blk_end[p]-p).  Data-parallel 4-byte sweeps.

    An XLA element gather at this size costs ~135 ms on-chip
    (tools/spike_gather2.py), so the sweep is restructured to ONE
    gather per round: while a lane is active its length is exactly
    4*round, so the p-side word in4[p + 4*round] is a STATIC shift of
    in4, and only the q side needs a gather."""
    B, N = qpos.shape
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    climit = jnp.minimum(blk_end - pos, cap)
    l = jnp.zeros((B, N), jnp.int32)
    active = qpos >= 0
    rounds = (cap + 3) // 4
    in4_pad = jnp.pad(in4, ((0, 0), (0, 4 * rounds)))

    for it in range(rounds):
        sh = 4 * it
        w1 = in4_pad[:, sh:sh + N]
        qi = jnp.clip(qpos + sh, 0, N - 1)
        w2 = jnp.take_along_axis(in4, qi, axis=1)
        x = w1 ^ w2
        eq = jnp.where(x == 0, 4,
                       jnp.where((x & 0xFF) != 0, 0,
                                 jnp.where((x & 0xFFFF) != 0, 1,
                                           jnp.where((x & 0xFFFFFF) != 0,
                                                     2, 3))))
        adv = jnp.minimum(eq, jnp.maximum(climit - l, 0))
        l = jnp.where(active, l + adv, l)
        active = active & (eq == 4) & (adv == 4) & (l < climit)
    return l


@functools.partial(jax.jit, static_argnums=(2,))
def _blk_end_dev(run_ends, run_starts, N):
    """blk_end [B, N] from the per-run cumulative end table ([B, R],
    R small): each position's 8KB sub-block end, clamped to its run end
    (csc_lz.cpp:63-67 sub-block structure).  Device-side — shipping the
    precomputed [B, N] i32 table over the ~20 MB/s axon tunnel cost more
    than every other precompute stage combined."""
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    R = run_ends.shape[1]
    run_idx = jnp.zeros((run_ends.shape[0], N), jnp.int32)
    for r in range(R):
        run_idx += (pos >= run_ends[:, r:r + 1]).astype(jnp.int32)
    ridx = jnp.clip(run_idx, 0, R - 1)
    run_start = jnp.take_along_axis(run_starts, ridx, axis=1)
    run_end = jnp.take_along_axis(run_ends, ridx, axis=1)
    blk_off = run_start + ((pos - run_start) // 8192) * 8192
    return jnp.minimum(blk_off + 8192, run_end).astype(jnp.int32)


def precompute_candidates(data_np, sizes, run_ends_np, hash_bits,
                          hash_width, cap=EXT_CAP):
    """data_np: [B, N] u8 (host or device); run_ends_np: [B, R]
    cumulative run ends.

    Returns (cand [B, C, N] int32 with C = 2*(2+hash_width) as
    (dist, len) pairs ordered ht2, ht3, ht6_0..w-1; dist 0 = no
    candidate; len == cap means 'extend live'), plus the device copy of
    data (reusable by make_fast_state — one tunnel upload, not two)."""
    import os as _os
    import time as _time
    _dbg = bool(_os.environ.get("CSC_ENC_DEBUG"))
    _t0 = _time.time()
    B, N = data_np.shape
    run_ends_np = np.asarray(run_ends_np, np.int32)
    starts_np = np.concatenate([np.zeros((B, 1), np.int32),
                                run_ends_np[:, :-1]], axis=1)
    data_d = jnp.asarray(data_np)
    blk_end_d = _blk_end_dev(jnp.asarray(run_ends_np),
                             jnp.asarray(starts_np), N)
    if _dbg:
        jax.block_until_ready((data_d, blk_end_d))
        print(f"[pre] h2d+blk_end {_time.time() - _t0:.3f}s")
        _t0 = _time.time()
    if _dbg and _os.environ.get("CSC_PRE_DEBUG2"):
        # decomposed stage timing on the real inputs
        B = data_d.shape[0]
        def _tt(tag, f, *a):
            nonlocal _t0
            r = f(*a)
            jax.block_until_ready(r)
            print(f"[pre2] {tag} {_time.time() - _t0:.3f}s")
            _t0 = _time.time()
            return r
        in4, h2, h3, h6 = _tt("hashes", _hashes, data_d, blk_end_d,
                              int(hash_bits), N)
        hs = _tt("concat", jnp.concatenate, [h2, h3, h6], 0)
        prev = _tt("prev_occ", _prev_occ, hs)
        chains = [prev[:B], prev[B:2 * B], prev[2 * B:]]
        qs = _tt("concat2", jnp.concatenate, chains, 0)
        in4_t = jnp.tile(in4, (3, 1))
        blk_t = jnp.tile(blk_end_d, (3, 1))
        lns = _tt("ext_lens", _ext_lens, in4_t, qs, blk_t, int(cap))
    cand = _precompute_staged(data_d, blk_end_d, int(hash_bits),
                              int(hash_width), int(cap))
    if _dbg:
        jax.block_until_ready(cand)
        print(f"[pre] device {_time.time() - _t0:.3f}s")
    return cand, data_d


@functools.partial(jax.jit, static_argnums=(2,))
def _chains_dev(p6, N, hash_width):
    chains = [p6]
    cur = p6
    for _ in range(1, hash_width):
        nxt = jnp.take_along_axis(cur, jnp.clip(cur, 0, N - 1), axis=1)
        cur = jnp.where(cur >= 0, nxt, -1)
        chains.append(cur)
    return chains


@jax.jit
def _assemble_dev(chains, lns_list):
    out = []
    N = chains[0].shape[1]
    posn = jnp.arange(N, dtype=jnp.int32)[None, :]
    for q, ln in zip(chains, lns_list):
        out.append(jnp.where(q >= 0, posn - q, 0))
        out.append(ln)
    return jnp.stack(out, axis=1)


def _precompute_staged(data_d, blk_end_d, hash_bits, hash_width, cap):
    """Stage-jitted variant of _precompute_dev: the fully fused program
    MISCOMPILES on the axon XLA backend at some batch shapes (observed:
    B=3 x 393216 — the extension-length rows silently come back 0 while
    the decomposed stages are correct; chip-vs-CPU diff recorded round
    4).  Stage boundaries keep every op identical, only fusion differs;
    throughput is within noise (the stages are all big ops)."""
    B, N = data_d.shape
    in4, h2, h3, h6 = _hashes(data_d, blk_end_d, hash_bits, N)
    hs = jnp.concatenate([h2, h3, h6], axis=0)
    prev = _prev_occ(hs)
    chains = [prev[:B], prev[B:2 * B]] + _chains_dev(prev[2 * B:], N,
                                                    hash_width)
    nc = len(chains)
    qs = jnp.concatenate(chains, axis=0)
    in4_t = jnp.tile(in4, (nc, 1))
    blk_t = jnp.tile(blk_end_d, (nc, 1))
    lns = _ext_lens(in4_t, qs, blk_t, cap)
    lns_list = [lns[k * B:(k + 1) * B] for k in range(nc)]
    return _assemble_dev(chains, lns_list)


@functools.partial(jax.jit, static_argnums=(1,))
def mk_in4_dev(data, n_lanes):
    """[B, N] u8 -> [B, n_lanes/128, 128] i32 of 4-byte LE words at each
    position (the match-compare unit), zero-padded."""
    d = data.astype(jnp.uint32)
    B, N = data.shape
    dd = jnp.concatenate([d, jnp.zeros((B, 8), jnp.uint32)], axis=1)
    in4 = (dd[:, :N] | (dd[:, 1:N + 1] << 8) | (dd[:, 2:N + 2] << 16)
           | (dd[:, 3:N + 3] << 24)).astype(jnp.int32)
    return jnp.pad(in4, ((0, 0), (0, n_lanes - N))).reshape(
        B, n_lanes // 128, 128)


@jax.jit
def pack_candidates(cand):
    """[B, 2C, N] (dist,len) row pairs -> [B, C, N] dist<<5 | len for
    the Pallas parse kernel (len <= EXT_CAP fits 5 bits; dist 0 = no
    candidate encodes as 0)."""
    d = cand[:, 0::2, :]
    ln = cand[:, 1::2, :]
    return jnp.where(d > 0, (d << 5) | jnp.clip(ln, 0, 31), 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _precompute_dev(data_d, blk_end_d, hash_bits, hash_width, cap):
    """One fused device program: hashes, all prev-occurrence chains in a
    single stacked argsort, all extension lengths in a single stacked
    compare sweep (batched big ops beat many medium ones on TPU)."""
    B, N = data_d.shape
    in4, h2, h3, h6 = _hashes(data_d, blk_end_d, hash_bits, N)

    # one argsort for all three hash streams
    hs = jnp.concatenate([h2, h3, h6], axis=0)           # [3B, N]
    prev = _prev_occ(hs)
    p2, p3, p6 = prev[:B], prev[B:2 * B], prev[2 * B:]
    chains = [p2, p3, p6]
    cur = p6
    for _ in range(1, hash_width):
        nxt = jnp.take_along_axis(cur, jnp.clip(cur, 0, N - 1), axis=1)
        cur = jnp.where(cur >= 0, nxt, -1)
        chains.append(cur)

    # one extension sweep for every chain (stacked along batch)
    nc = len(chains)
    qs = jnp.concatenate(chains, axis=0)                 # [nc*B, N]
    in4_t = jnp.tile(in4, (nc, 1))
    blk_t = jnp.tile(blk_end_d, (nc, 1))
    lns = _ext_lens(in4_t, qs, blk_t, cap)

    out = []
    posn = jnp.arange(N, dtype=jnp.int32)[None, :]
    for k, q in enumerate(chains):
        dist = jnp.where(q >= 0, posn - q, 0)
        out.append(dist)
        out.append(lns[k * B:(k + 1) * B])
    # stays on device: [B, C, N] feeds make_fast_state directly (the
    # axon host<->device tunnel is ~20 MB/s; never round-trip this)
    return jnp.stack(out, axis=1)
