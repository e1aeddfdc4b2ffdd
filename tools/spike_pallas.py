"""Pallas primitive cost spike for the lockstep decode kernel design.

Measures, on the real chip:
  1. one-hot gather+update step over [B, NP] tables at various B/NP
  2. register-transition op cost ([1,B] vector select chains)
  3. scalar fori_loop over B with SMEM reads (service-loop skeleton)
  4. per-stream dynamic-slice VMEM row copy inside a scalar loop
  5. VMEM->SMEM transfer of a [1,B] vector (DMA) -- feasibility
  6. HBM row DMA issue cost in a scalar loop

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_pallas.py
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=3, inner=1):
    fn(*args)  # compile+warm
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[0] if isinstance(r, (tuple, list)) else r)
        best = min(best, time.perf_counter() - t0)
    return best / inner


# ---------------------------------------------------------------- spike 1
def onehot_step_cost(B, NP, steps=1000, dtype=jnp.int32):
    """gather p = tbl[b, pidx[b]] via one-hot; adapt; write back."""
    def kern(pidx_ref, tbl_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

        def body(i, carry):
            acc, pidx = carry
            oh = (lane == pidx[:, None])
            p = jnp.sum(jnp.where(oh, tbl_ref[:], 0), axis=1)
            bit = (p & 1).astype(jnp.int32)
            newp = jnp.where(bit == 1, p + ((4095 - p) >> 5), p - (p >> 5))
            tbl_ref[:] = jnp.where(oh, newp[:, None], tbl_ref[:])
            pidx = (pidx * 5 + 1 + bit) % NP
            return acc + p, pidx

        acc, _ = jax.lax.fori_loop(
            0, steps, body,
            (jnp.zeros((B,), dtype), pidx_ref[0, :]))
        out_ref[0, :] = acc

    pidx = jnp.arange(B, dtype=jnp.int32)[None, :] % NP
    tbl = jnp.full((B, NP), 2048, dtype)
    f = jax.jit(lambda pi, t: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pi, t))
    return timeit(f, pidx, tbl, inner=steps)


# ---------------------------------------------------------------- spike 2
def transition_cost(B, nops=300, steps=1000):
    """chains of [1,B] select/arith ops approximating FSM transitions."""
    def kern(x_ref, out_ref):
        def body(i, regs):
            a, b, c = regs
            for k in range(nops // 6):
                m = (a > b)
                a = jnp.where(m, a + 1, a - c)
                b = jnp.where(m, b * 2 + 1, b)
                c = jnp.where((c & 3) == 1, c + a, c + 1) & 0xFFFF
            return a, b, c

        a = x_ref[0, :]
        a, b, c = jax.lax.fori_loop(0, steps, body, (a, a + 1, a + 2))
        out_ref[0, :] = a + b + c

    x = jnp.arange(B, dtype=jnp.int32)[None, :]
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    return timeit(f, x, inner=steps)


# ---------------------------------------------------------------- spike 3
def scalar_loop_cost(B, steps=200, active_frac=1.0):
    """fori_loop over B with SMEM read + conditional tiny vector op."""
    W = 256

    def kern(act_ref, wnd_ref, out_ref):
        def step(s, _):
            def body(b, _2):
                @pl.when(act_ref[b] < int(B * active_frac))
                def _():
                    off = (act_ref[b] * 8) % (W - 16)
                    wnd_ref[b, pl.ds(off, 16)] = wnd_ref[b, pl.ds(off + 16, 16)] + 1
                return _2
            return jax.lax.fori_loop(0, B, body, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = wnd_ref[0:1, :]

    act = jnp.arange(B, dtype=jnp.int32)
    wnd = jnp.zeros((B, W), jnp.int32)
    f = jax.jit(lambda a, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, w))
    return timeit(f, act, wnd, inner=steps)


# ---------------------------------------------------------------- spike 4
def row_swap_cost(B, NROW, steps=200):
    """per-stream dynamic row copy within a big VMEM table (u16-ish i32)."""
    W = 256

    def kern(ctx_ref, big_ref, cache_ref, out_ref):
        def step(s, _):
            def body(b, _2):
                c = ctx_ref[b]
                cache_ref[b, :] = big_ref[b, pl.ds(c * W, W)]
                return _2
            return jax.lax.fori_loop(0, B, body, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = cache_ref[0:1, :]

    ctx = jnp.arange(B, dtype=jnp.int32) % NROW
    big = jnp.zeros((B, NROW * W), jnp.int32)
    cache = jnp.zeros((B, W), jnp.int32)
    f = jax.jit(lambda c, bg, ca: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(c, big, ca))
    return timeit(f, ctx, big, cache, inner=steps)


# ---------------------------------------------------------------- spike 5
def vmem_to_smem(B):
    """can we DMA a [1,B] vector from VMEM to SMEM scratch + read scalars?"""
    def kern(x_ref, out_ref, smem, sem):
        dma = pltpu.make_async_copy(x_ref, smem, sem)
        dma.start()
        dma.wait()
        acc = 0
        def body(b, acc):
            return acc + smem[0, b]
        acc = jax.lax.fori_loop(0, B, body, acc)
        out_ref[0] = acc

    x = jnp.arange(B, dtype=jnp.int32)[None, :]
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1, B), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(x))
    r = np.asarray(f(x))
    return r[0] == B * (B - 1) // 2


def vmem_to_smem_latency(B, steps=200):
    def kern(x_ref, out_ref, smem, sem):
        def step(s, acc):
            dma = pltpu.make_async_copy(x_ref, smem, sem)
            dma.start()
            dma.wait()
            return acc + smem[0, 0]
        acc = jax.lax.fori_loop(0, steps, step, 0)
        out_ref[0] = acc

    x = jnp.arange(B, dtype=jnp.int32)[None, :]
    f = jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((1, B), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )(x))
    return timeit(f, x, inner=steps)


# ---------------------------------------------------------------- spike 6
def hbm_row_dma_cost(B, steps=100, rows_per_step=None):
    """issue per-stream HBM->VMEM row DMAs in a scalar loop, then wait."""
    W = 256
    NROW = 64
    R = rows_per_step or B

    def kern(ctx_ref, big_ref, cache_ref, out_ref, sems):
        def step(s, _):
            def issue(b, _2):
                c = ctx_ref[b]
                pltpu.make_async_copy(
                    big_ref.at[b, pl.ds(c * W, W)],
                    cache_ref.at[b, :],
                    sems.at[b]).start()
                return _2
            jax.lax.fori_loop(0, R, issue, _)

            def wait(b, _2):
                pltpu.make_async_copy(
                    big_ref.at[b, pl.ds(0, W)],
                    cache_ref.at[b, :],
                    sems.at[b]).wait()
                return _2
            return jax.lax.fori_loop(0, R, wait, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = cache_ref[0:1, :]

    ctx = jnp.arange(B, dtype=jnp.int32) % NROW
    big = jnp.zeros((B, NROW * W), jnp.int32)
    cache = jnp.zeros((B, W), jnp.int32)
    f = jax.jit(lambda c, bg, ca: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((B,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(c, big, ca))
    return timeit(f, ctx, big, cache, inner=steps)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "1"):
        for B in (128, 256, 512, 1024):
            for NP in (256, 1280, 2048):
                t = onehot_step_cost(B, NP)
                print(f"onehot B={B:5d} NP={NP:5d}: {t*1e6:8.3f} us/step")
    if which in ("all", "2"):
        for B in (256, 1024):
            t = transition_cost(B)
            print(f"transitions(300 ops) B={B}: {t*1e6:8.3f} us/step")
    if which in ("all", "3"):
        for B in (256,):
            for af in (1.0, 0.125):
                t = scalar_loop_cost(B, active_frac=af)
                print(f"scalar loop B={B} active={af}: {t*1e6:8.3f} us/sweep")
    if which in ("all", "4"):
        t = row_swap_cost(256, 64)
        print(f"row swap sweep B=256 rows=64x256: {t*1e6:8.3f} us/sweep")
    if which in ("all", "5"):
        ok = vmem_to_smem(256)
        print(f"vmem->smem DMA works: {ok}")
        t = vmem_to_smem_latency(256)
        print(f"vmem->smem DMA latency: {t*1e6:8.3f} us")
    if which in ("all", "6"):
        t = hbm_row_dma_cost(256)
        print(f"hbm row dma sweep B=256: {t*1e6:8.3f} us/sweep (256 rows)")
        t = hbm_row_dma_cost(256, rows_per_step=32)
        print(f"hbm row dma sweep B=256 rows/step=32: {t*1e6:8.3f} us/sweep")
