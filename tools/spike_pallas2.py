"""Round-2 Pallas primitive spikes for the lockstep decode kernel.

Design question being answered: the decode FSM needs, per lockstep step,
  (a) a one-hot gather+update bit-step over small VMEM prob tables,
  (b) single-byte window reads/writes at per-stream dynamic offsets,
  (c) multi-byte window copies at per-stream dynamic (unaligned) offsets,
  (d) literal-prob row swaps VMEM<->HBM keyed by per-stream ctx,
  (e) a scalar service loop that can see per-stream registers (SMEM).

Mosaic forbids unaligned dynamic lane offsets for vector loads (seen:
"index in dimension 1 is a multiple of 128"), so (c) must be DMA; this
spike measures whether byte-granular unaligned VMEM->VMEM DMA works and
what issues/waits cost, plus the cost of every other ingredient.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_pallas2.py [probe]
"""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=3, inner=1):
    fn(*args)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[0] if isinstance(r, (tuple, list)) else r)
        best = min(best, time.perf_counter() - t0)
    return best / inner


# ------------------------------------------------------------------ s1
def onehot_window_byte(B=256, W=16384, steps=300):
    """single-byte gather + RMW scatter over [B, W] u8 window."""
    def kern(pos_ref, wnd_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

        def body(i, carry):
            acc, pos = carry
            oh = lane == pos[:, None]
            byte = jnp.sum(jnp.where(oh, wnd_ref[:], 0).astype(jnp.int32),
                           axis=1)
            wpos = (pos + 7) % W
            ohw = lane == wpos[:, None]
            wnd_ref[:] = jnp.where(
                ohw, ((byte + 1) & 0xFF)[:, None].astype(jnp.uint8),
                wnd_ref[:])
            return acc + byte, (pos * 5 + 3) % W

        acc, _ = jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((B,), jnp.int32), pos_ref[0, :]))
        out_ref[0, :] = acc

    pos = (jnp.arange(B, dtype=jnp.int32) * 17 % W)[None, :]
    wnd = jnp.zeros((B, W), jnp.uint8)
    f = jax.jit(lambda p, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, w))
    return timeit(f, pos, wnd, inner=steps)


# ------------------------------------------------------------------ s2
def dma_window_copy(B=256, W=16384, CH=128, steps=200, active=32):
    """per-stream unaligned u8 VMEM->VMEM DMA copies from a scalar loop.

    `active` streams per step issue one CH-byte copy at odd offsets.
    Checks correctness of byte-granular unaligned DMA, then measures.
    """
    def kern(src_ref, dst_ref, wnd_ref, out_ref, sems):
        def step(s, _):
            def body(c, _2):
                b = c * (B // active)
                so = src_ref[b]
                do = dst_ref[b]
                pltpu.make_async_copy(
                    wnd_ref.at[b, pl.ds(so, CH)],
                    wnd_ref.at[b, pl.ds(do, CH)],
                    sems.at[c]).start()
                return _2
            jax.lax.fori_loop(0, active, body, _)

            def waitb(c, _2):
                b = c * (B // active)
                pltpu.make_async_copy(
                    wnd_ref.at[b, pl.ds(0, CH)],
                    wnd_ref.at[b, pl.ds(W - CH, CH)],
                    sems.at[c]).wait()
                return _2
            return jax.lax.fori_loop(0, active, waitb, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = wnd_ref[0:1, :]

    src = jnp.arange(B, dtype=jnp.int32) * 7 % (W // 2) + 1   # odd-ish
    dst = jnp.arange(B, dtype=jnp.int32) * 11 % (W // 2) + W // 2 + 3
    wnd = jnp.tile(jnp.arange(W, dtype=jnp.int32)[None, :] & 0xFF,
                   (B, 1)).astype(jnp.uint8)
    f = jax.jit(lambda s_, d_, w_: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((active,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(s_, d_, w_))
    # correctness: single step on row 0
    r = np.asarray(f(src, dst, wnd))
    so, do = int(src[0]), int(dst[0])
    expect = (np.arange(W) & 0xFF).astype(np.uint8)
    expect[do:do + CH] = expect[so:so + CH]
    ok = np.array_equal(r[0], expect)
    t = timeit(f, src, dst, wnd, inner=steps)
    return ok, t


# ------------------------------------------------------------------ s3
def vmem_to_smem_block(B=256, K=8, steps=300):
    """[K, B] i32 request-block VMEM->SMEM DMA latency per step."""
    def kern(req_ref, out_ref, smem, sem):
        def step(s, acc):
            dma = pltpu.make_async_copy(req_ref, smem, sem)
            dma.start()
            dma.wait()
            return acc + smem[0, 0] + smem[K - 1, B - 1]
        acc = jax.lax.fori_loop(0, steps, step, 0)
        out_ref[0] = acc

    req = jnp.arange(K * B, dtype=jnp.int32).reshape(K, B)
    f = jax.jit(lambda r: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((K, B), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(r))
    return timeit(f, req, inner=steps)


# ------------------------------------------------------------------ s4
def hbm_row_swap(B=256, steps=200, active=32):
    """per-stream 256-i32 row writeback+fetch HBM<->VMEM from scalar loop."""
    ROWS = 256

    def kern(ctx_ref, hbm_ref, cache_ref, out_ref, sems):
        def step(s, _):
            def body(c, _2):
                b = c * (B // active)
                ct = ctx_ref[b]
                pltpu.make_async_copy(
                    cache_ref.at[b, :],
                    hbm_ref.at[b, pl.ds(ct * 256, 256)],
                    sems.at[c, 0]).start()
                ct2 = (ct * 3 + 1) % ROWS
                pltpu.make_async_copy(
                    hbm_ref.at[b, pl.ds(ct2 * 256, 256)],
                    cache_ref.at[b, :],
                    sems.at[c, 1]).start()
                return _2
            jax.lax.fori_loop(0, active, body, _)

            def waitb(c, _2):
                b = c * (B // active)
                pltpu.make_async_copy(
                    cache_ref.at[b, :], hbm_ref.at[b, pl.ds(0, 256)],
                    sems.at[c, 0]).wait()
                pltpu.make_async_copy(
                    hbm_ref.at[b, pl.ds(0, 256)], cache_ref.at[b, :],
                    sems.at[c, 1]).wait()
                return _2
            return jax.lax.fori_loop(0, active, waitb, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = cache_ref[0:1, :]

    ctx = jnp.arange(B, dtype=jnp.int32) % ROWS
    hbm = jnp.zeros((B, ROWS * 256), jnp.int32)
    cache = jnp.zeros((B, 256), jnp.int32)
    f = jax.jit(lambda c, h, ca: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((active, 2))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(c, h, ca))
    return timeit(f, ctx, hbm, cache, inner=steps)


# ------------------------------------------------------------------ s5
def bitstep_full(B=256, NP=2048, steps=1000, dtype=jnp.int32):
    """small-table one-hot gather+update + [B,256] cache RMW + ~60
    register-transition selects: the projected per-bit-step vector work."""
    def kern(pidx_ref, tbl_ref, cache_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)

        def body(i, carry):
            acc, pidx, node = carry
            in_cache = pidx >= NP
            sp = jnp.where(in_cache, 0, pidx)
            oh = lane == sp[:, None]
            p1 = jnp.sum(jnp.where(oh, tbl_ref[:], 0), axis=1)
            ohc = lane_c == node[:, None]
            p2 = jnp.sum(jnp.where(ohc, cache_ref[:], 0), axis=1)
            p = jnp.where(in_cache, p2, p1)
            bit = (p & 1).astype(jnp.int32)
            newp = jnp.where(bit == 1, p + ((4095 - p) >> 5), p - (p >> 5))
            tbl_ref[:] = jnp.where(oh & (~in_cache)[:, None],
                                   newp[:, None], tbl_ref[:])
            cache_ref[:] = jnp.where(ohc & in_cache[:, None],
                                     newp[:, None], cache_ref[:])
            # ~60 select transitions
            a, bb, c = pidx, node, acc
            for k in range(20):
                m = (a > bb)
                a = jnp.where(m, a + 1, a - c) & 0xFFFF
                bb = jnp.where(m, bb * 2 + 1, bb) & 0xFF
                c = jnp.where((c & 3) == 1, c + a, c + 1) & 0xFFFF
            pidx = (pidx * 5 + 1 + bit) % (NP + 256)
            node = (node * 2 + bit) & 0xFF
            return acc + p, pidx, node

        acc, _, _ = jax.lax.fori_loop(
            0, steps, body,
            (jnp.zeros((B,), dtype), pidx_ref[0, :],
             jnp.zeros((B,), jnp.int32)))
        out_ref[0, :] = acc

    pidx = jnp.arange(B, dtype=jnp.int32)[None, :] % (NP + 256)
    tbl = jnp.full((B, NP), 2048, dtype)
    cache = jnp.full((B, 256), 2048, dtype)
    f = jax.jit(lambda pi, t, ca: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pi, t, ca))
    return timeit(f, pidx, tbl, cache, inner=steps)


# ------------------------------------------------------------------ s6
def scalar_sweep(B=256, steps=500, active=32):
    """scalar fori over B reading SMEM, mostly-false guard, no DMA."""
    def kern(flag_ref, out_ref):
        def step(s, acc):
            def body(b, a):
                return jax.lax.cond(flag_ref[b] < active,
                                    lambda x: x + flag_ref[b],
                                    lambda x: x, a)
            return jax.lax.fori_loop(0, B, body, acc)
        out_ref[0] = jax.lax.fori_loop(0, steps, step, 0)

    flag = jnp.arange(B, dtype=jnp.int32) % B
    f = jax.jit(lambda fl: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(fl))
    return timeit(f, flag, inner=steps)


# ------------------------------------------------------------------ s7
def take_along_axis_in_kernel(B=256, W=4096):
    """does Mosaic lower a per-row dynamic gather at all? cost if yes."""
    def kern(pos_ref, wnd_ref, out_ref):
        def body(i, carry):
            acc, pos = carry
            byte = jnp.take_along_axis(wnd_ref[:], pos[:, None],
                                       axis=1)[:, 0]
            return acc + byte.astype(jnp.int32), (pos * 5 + 3) % W
        acc, _ = jax.lax.fori_loop(
            0, 300, body, (jnp.zeros((B,), jnp.int32), pos_ref[0, :]))
        out_ref[0, :] = acc

    pos = (jnp.arange(B, dtype=jnp.int32) * 17 % W)[None, :]
    wnd = jnp.zeros((B, W), jnp.int32)
    f = jax.jit(lambda p, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, w))
    return timeit(f, pos, wnd, inner=300)


PROBES = {
    "s1": lambda: print(f"s1 onehot wnd byte RMW [256,16384]u8: "
                        f"{onehot_window_byte()*1e6:8.3f} us/step"),
    "s2": lambda: (lambda ok_t: print(
        f"s2 dma wnd copy 32x128B unaligned: ok={ok_t[0]} "
        f"{ok_t[1]*1e6:8.3f} us/step"))(dma_window_copy()),
    "s3": lambda: print(f"s3 vmem->smem [8,256]i32 block: "
                        f"{vmem_to_smem_block()*1e6:8.3f} us/step"),
    "s4": lambda: print(f"s4 hbm row swap 32 streams (wb+fetch): "
                        f"{hbm_row_swap()*1e6:8.3f} us/step"),
    "s5": lambda: [print(f"s5 full bitstep B={b} NP=2048+cache: "
                         f"{bitstep_full(B=b)*1e6:8.3f} us/step")
                   for b in (256, 512)],
    "s6": lambda: print(f"s6 scalar sweep B=256 guarded: "
                        f"{scalar_sweep()*1e6:8.3f} us/step"),
    "s7": lambda: print(f"s7 take_along_axis [256,4096]: "
                        f"{take_along_axis_in_kernel()*1e6:8.3f} us/step"),
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(PROBES)
    for name in which:
        try:
            PROBES[name]()
        except Exception as e:  # noqa
            print(f"{name} FAILED: {str(e)[:300]}")
