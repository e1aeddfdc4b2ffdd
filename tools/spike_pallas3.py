"""Surgical probes behind spike_pallas2's headline numbers.

Questions:
  p1/p2 — is the 214ns/iter scalar loop cost the cond or the loop itself?
  p3    — decompose the 82us VMEM->SMEM DMA+wait: start-only vs wait.
  p4    — amortized cost of N independent parallel DMAs (issue all, wait all).
  p5    — can scalar code read VMEM directly (ref[0, b], b dynamic)?
  p6    — aligned dynamic vector store: ref[b, pl.ds(off,256)] with off
          a multiple of 256 and b a loop scalar; compiles? cost?
  p7    — chunked one-hot byte gather over [B,16384] u8 with static 2048-lane
          tiles (bounded intermediates; avoids the 21MB scoped-vmem OOM).
  p8    — one-hot gather+RMW over [B,1280] u16 (optimized small bit-step).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_pallas3.py [probe...]
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


def _smem_loop(body_maker, B=256, steps=500):
    def kern(flag_ref, out_ref):
        body = body_maker(flag_ref)

        def step(s, acc):
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


def p1():
    def mk(flag_ref):
        def body(b, a):
            v = flag_ref[b]
            return a + jnp.where(v < 32, v, 0)
        return body
    t = _smem_loop(mk)
    print(f"p1 scalar loop B=256 select-arith: {t*1e6:8.3f} us/sweep "
          f"({t*1e9/256:6.1f} ns/iter)")


def p2():
    def mk(flag_ref):
        def body(b, a):
            return a + b * 3 + 1
        return body
    t = _smem_loop(mk)
    print(f"p2 scalar loop B=256 pure arith:  {t*1e6:8.3f} us/sweep "
          f"({t*1e9/256:6.1f} ns/iter)")


def p3(B=256, steps=300):
    """start-only DMAs (wait once at end) vs start+wait each step."""
    def kern_start(req_ref, out_ref, smem, sems):
        def step(s, acc):
            pltpu.make_async_copy(req_ref, smem, sems.at[s % 8]).start()
            return acc + 1
        acc = jax.lax.fori_loop(0, steps, step, 0)

        def wfin(i, _):
            pltpu.make_async_copy(req_ref, smem, sems.at[i]).wait()
            return _
        # drain: each sem got steps/8 signals; wait them down
        def drain(i, _):
            def w(j, _2):
                pltpu.make_async_copy(req_ref, smem, sems.at[i]).wait()
                return _2
            return jax.lax.fori_loop(0, steps // 8, w, _)
        jax.lax.fori_loop(0, 8, drain, 0)
        out_ref[0] = acc + smem[0, 0]

    req = jnp.arange(8 * B, dtype=jnp.int32).reshape(8, B)
    f = jax.jit(lambda r: pl.pallas_call(
        kern_start,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((8, B), jnp.int32),
                        pltpu.SemaphoreType.DMA((8,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(r))
    t = timeit(f, req, inner=steps)
    print(f"p3 vmem->smem DMA start-only:      {t*1e6:8.3f} us/step")


def p3b(B=256, steps=300):
    def kern(req_ref, out_ref, smem, sem):
        def step(s, acc):
            d = pltpu.make_async_copy(req_ref, smem, sem)
            d.start()
            d.wait()
            return acc + 1
        out_ref[0] = jax.lax.fori_loop(0, steps, step, 0) + smem[0, 0]

    req = jnp.arange(8 * B, dtype=jnp.int32).reshape(8, B)
    f = jax.jit(lambda r: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((8, B), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(r))
    t = timeit(f, req, inner=steps)
    print(f"p3b vmem->smem DMA start+wait:     {t*1e6:8.3f} us/step")


def p4(B=256, N=32, steps=200):
    """N parallel VMEM->VMEM 128B u8 DMAs per step: issue all, wait all."""
    W = 16384

    def kern(wnd_ref, out_ref, sems):
        def step(s, _):
            def issue(c, _2):
                b = c * (B // N)
                so = (s * 131 + c * 977) % (W // 2)
                do = W // 2 + ((s * 57 + c * 389) % (W // 2 - 256))
                pltpu.make_async_copy(
                    wnd_ref.at[b, pl.ds(so, 128)],
                    wnd_ref.at[b, pl.ds(do, 128)],
                    sems.at[c]).start()
                return _2
            jax.lax.fori_loop(0, N, issue, _)

            def waitb(c, _2):
                b = c * (B // N)
                pltpu.make_async_copy(
                    wnd_ref.at[b, pl.ds(0, 128)],
                    wnd_ref.at[b, pl.ds(256, 128)],
                    sems.at[c]).wait()
                return _2
            return jax.lax.fori_loop(0, N, waitb, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = wnd_ref[0:1, :]

    wnd = jnp.zeros((B, W), jnp.uint8)
    f = jax.jit(lambda w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w))
    t = timeit(f, wnd, inner=steps)
    print(f"p4 {N} par. vmem dma128 issue+wait: {t*1e6:8.3f} us/step "
          f"({t*1e6/N:6.3f} us/dma)")


def p5(B=256, steps=200):
    """scalar dynamic read from VMEM: ref[0, b]."""
    def kern(x_ref, out_ref):
        def step(s, acc):
            def body(b, a):
                return a + x_ref[0, b]
            return jax.lax.fori_loop(0, B, body, acc)
        out_ref[0] = jax.lax.fori_loop(0, steps, step, 0)

    x = jnp.arange(B, dtype=jnp.int32)[None, :]
    f = jax.jit(lambda x_: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x))
    t = timeit(f, x, inner=steps)
    print(f"p5 scalar VMEM read sweep B=256:   {t*1e6:8.3f} us/sweep "
          f"({t*1e9/256:6.1f} ns/read)")


def p6(B=256, W=16384, steps=200, nflush=2):
    """aligned dynamic vector store: wnd[b, ds(off,256)] = tile[b_mod,:]."""
    def kern(off_ref, tile_ref, wnd_ref, out_ref):
        def step(s, _):
            def body(c, _2):
                b = (s + c * 37) % B
                off = pl.multiple_of(off_ref[b] * 256, 256)
                wnd_ref[b, pl.ds(off, 256)] = tile_ref[b, :]
                return _2
            return jax.lax.fori_loop(0, nflush, body, _)
        jax.lax.fori_loop(0, steps, step, 0)
        out_ref[:] = wnd_ref[0:1, :]

    off = jnp.arange(B, dtype=jnp.int32) % (W // 256)
    tile = jnp.ones((B, 256), jnp.uint8)
    wnd = jnp.zeros((B, W), jnp.uint8)
    f = jax.jit(lambda o, t_, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(o, t_, w))
    t = timeit(f, off, tile, wnd, inner=steps)
    print(f"p6 aligned dyn store x{nflush}:         {t*1e6:8.3f} us/step")


def p7(B=256, W=16384, steps=300):
    """chunked one-hot byte gather over [B,W] u8, 2048-lane static tiles."""
    CH = 2048

    def kern(pos_ref, wnd_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, CH), 1)

        def body(i, carry):
            acc, pos = carry
            byte = jnp.zeros((B,), jnp.int32)
            for blk in range(W // CH):
                oh = lane == (pos[:, None] - blk * CH)
                byte = byte + jnp.sum(
                    jnp.where(oh, wnd_ref[:, blk * CH:(blk + 1) * CH],
                              jnp.uint8(0)).astype(jnp.int32), axis=1)
            return acc + byte, (pos * 5 + 3) % W

        acc, _ = jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((B,), jnp.int32), pos_ref[0, :]))
        out_ref[0, :] = acc

    pos = (jnp.arange(B, dtype=jnp.int32) * 17 % W)[None, :]
    wnd = jnp.zeros((B, W), jnp.uint8)
    f = jax.jit(lambda p, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, w))
    t = timeit(f, pos, wnd, inner=steps)
    print(f"p7 chunked onehot gather [256,16K]u8: {t*1e6:8.3f} us/step")


def p8(B=256, NP=1280, steps=1000):
    """one-hot gather+RMW over [B,NP] u16."""
    def kern(pidx_ref, tbl_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

        def body(i, carry):
            acc, pidx = carry
            oh = lane == pidx[:, None]
            p = jnp.sum(jnp.where(oh, tbl_ref[:], jnp.uint16(0))
                        .astype(jnp.int32), axis=1)
            bit = (p & 1).astype(jnp.int32)
            newp = jnp.where(bit == 1, p + ((4095 - p) >> 5), p - (p >> 5))
            tbl_ref[:] = jnp.where(oh, newp[:, None].astype(jnp.uint16),
                                   tbl_ref[:])
            return acc + p, (pidx * 5 + 1 + bit) % NP

        acc, _ = jax.lax.fori_loop(
            0, steps, body, (jnp.zeros((B,), jnp.int32), pidx_ref[0, :]))
        out_ref[0, :] = acc

    pidx = jnp.arange(B, dtype=jnp.int32)[None, :] % NP
    tbl = jnp.full((B, NP), 2048, jnp.uint16)
    f = jax.jit(lambda pi, t: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pi, tbl))
    t = timeit(f, pidx, tbl, inner=steps)
    print(f"p8 onehot RMW [256,1280]u16:       {t*1e6:8.3f} us/step")


PROBES = {n: globals()[n] for n in
          ("p1", "p2", "p3", "p3b", "p4", "p5", "p6", "p7", "p8")}

if __name__ == "__main__":
    for name in (sys.argv[1:] or list(PROBES)):
        try:
            PROBES[name]()
        except Exception as e:  # noqa
            msg = str(e)
            key = [l for l in msg.splitlines() if "error" in l.lower()
                   or "Mosaic" in l or "NotImplemented" in l][:3]
            print(f"{name} FAILED: {' | '.join(key) if key else msg[:200]}")
