"""Marginal-cost Pallas probes (axon has ~24 ms fixed per-call overhead,
so every cost is measured as (T(n_big)-T(n_small))/(n_big-n_small)).

Probes (all costs per lockstep FSM step unless noted):
  m1  one-hot gather+RMW [B,2048] i32          (small prob tables)
  m1b one-hot gather+RMW [B,1280] u16
  m2  single-byte one-hot gather [B,16384] u8  (window read)
  m3  16-byte one-hot gather + RMW scatter over [B,16384] u8 (copy op)
  m4  scalar sweep over B with SMEM reads
  m5  VMEM->SMEM [8,B] DMA start+wait
  m5b N=32 parallel per-stream VMEM->VMEM 128B DMAs (tile-legal shapes)
  m6  transitions: 300 chained [1,B] select/arith ops
  m6b same unrolled x8
  m7  take_along_axis gather [B,2048] i32 (does Mosaic lower it? cost?)
  m8  take_along_axis gather [B,65536] i32 rows... VMEM-infeasible; use
      [B,16384] u8 per-lane gather (window read the easy way)
  m9  dynamic-slice row read tbl[b, pl.ds(ctx*256,256)] inside vector code
      via one-hot contraction variant with 3D reshape (row-gather cost)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_marginal.py [m...]
"""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SMALL = 200
N_BIG = 4000


def marginal(make_fn, n_small=N_SMALL, n_big=N_BIG, reps=3):
    """make_fn(steps) -> (callable, args). Returns marginal sec/step."""
    f1, a1 = make_fn(n_small)
    f2, a2 = make_fn(n_big)
    r = f1(*a1)
    np.asarray(r[0] if isinstance(r, (tuple, list)) else r)
    r = f2(*a2)
    np.asarray(r[0] if isinstance(r, (tuple, list)) else r)
    t1 = t2 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f1(*a1)
        np.asarray(r[0] if isinstance(r, (tuple, list)) else r)
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        r = f2(*a2)
        np.asarray(r[0] if isinstance(r, (tuple, list)) else r)
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (n_big - n_small)


def _pc(kern, ins, out_shape, scratch=None, side=False):
    kwargs = {}
    if scratch:
        kwargs["scratch_shapes"] = scratch
    if side:
        kwargs["compiler_params"] = pltpu.CompilerParams(has_side_effects=True)
    smem_in = kwargs.pop("smem_in", None)
    return jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **kwargs,
    )(*a))


def m1(B=256, NP=2048, dtype=jnp.int32, label="m1  onehot RMW [256,2048]i32"):
    def make(steps):
        def kern(pidx_ref, tbl_ref, out_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

            def body(i, carry):
                acc, pidx = carry
                oh = lane == pidx[:, None]
                p = jnp.sum(jnp.where(oh, tbl_ref[:],
                                      jnp.zeros((), dtype)).astype(jnp.int32),
                            axis=1)
                bit = (p & 1).astype(jnp.int32)
                newp = jnp.where(bit == 1, p + ((4095 - p) >> 5),
                                 p - (p >> 5))
                tbl_ref[:] = jnp.where(oh, newp[:, None].astype(dtype),
                                       tbl_ref[:])
                return acc + p, (pidx * 5 + 1 + bit) % NP

            acc, _ = jax.lax.fori_loop(
                0, steps, body,
                (jnp.zeros((B,), jnp.int32), pidx_ref[0, :]))
            out_ref[0, :] = acc

        pidx = jnp.arange(B, dtype=jnp.int32)[None, :] % NP
        tbl = jnp.full((B, NP), 2048, dtype)
        f = _pc(kern, [pidx, tbl], jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (pidx, tbl)

    print(f"{label}: {marginal(make)*1e6:8.3f} us/step")


def m2(B=256, W=16384):
    def make(steps):
        def kern(pos_ref, wnd_ref, out_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

            def body(i, carry):
                acc, pos = carry
                oh = lane == pos[:, None]
                byte = jnp.sum(jnp.where(oh, wnd_ref[:], jnp.uint8(0))
                               .astype(jnp.int32), axis=1)
                return acc + byte, (pos * 5 + 3) % W

            acc, _ = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((B,), jnp.int32), pos_ref[0, :]))
            out_ref[0, :] = acc

        pos = (jnp.arange(B, dtype=jnp.int32) * 17 % W)[None, :]
        wnd = jnp.zeros((B, W), jnp.uint8)
        f = _pc(kern, [pos, wnd], jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (pos, wnd)

    print(f"m2  onehot byte gather [256,16K]u8: {marginal(make)*1e6:8.3f} us/step")


def m3(B=256, W=16384, CH=16):
    def make(steps):
        def kern(pos_ref, wnd_ref, out_ref):
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            karange = jax.lax.broadcasted_iota(jnp.int32, (B, CH), 1)

            def body(i, carry):
                acc, pos = carry
                src = (pos * 7 + 11) % (W - 2 * CH)
                rel = lane - src[:, None]
                inr = (rel >= 0) & (rel < CH)
                # gather 16 bytes: for k, sum over lanes where rel==k
                got = jnp.zeros((B, CH), jnp.int32)
                for k in range(CH):
                    got = got.at[:, k].set(jnp.sum(
                        jnp.where(rel == k, wnd_ref[:], jnp.uint8(0))
                        .astype(jnp.int32), axis=1))
                # scatter 16 bytes at dst
                dst = pos
                reld = lane - dst[:, None]
                val = jnp.zeros((B, W), jnp.uint8)
                for k in range(CH):
                    val = jnp.where(reld == k,
                                    got[:, k][:, None].astype(jnp.uint8), val)
                wnd_ref[:] = jnp.where((reld >= 0) & (reld < CH), val,
                                       wnd_ref[:])
                return acc + got[:, 0], (pos * 5 + 3) % (W - 2 * CH)

            acc, _ = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((B,), jnp.int32), pos_ref[0, :]))
            out_ref[0, :] = acc

        pos = (jnp.arange(B, dtype=jnp.int32) * 17 % (W - 2 * CH))[None, :]
        wnd = jnp.zeros((B, W), jnp.uint8)
        f = _pc(kern, [pos, wnd], jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (pos, wnd)

    print(f"m3  onehot 16B copy RMW [256,16K]u8: {marginal(make, 100, 1000)*1e6:8.3f} us/step")


def m4(B=256):
    def make(steps):
        def kern(flag_ref, out_ref):
            def step(s, acc):
                def body(b, a):
                    v = flag_ref[b]
                    return a + jnp.where(v < 32, v, 0)
                return jax.lax.fori_loop(0, B, body, acc)
            out_ref[0] = jax.lax.fori_loop(0, steps, step, 0)

        flag = jnp.arange(B, dtype=jnp.int32) % B
        f = jax.jit(lambda fl: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(fl))
        return f, (flag,)

    t = marginal(make, 100, 2000)
    print(f"m4  scalar sweep B=256: {t*1e6:8.3f} us/sweep "
          f"({t*1e9/B:6.1f} ns/iter)")


def m5(B=256):
    def make(steps):
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
        return f, (req,)

    print(f"m5  vmem->smem [8,256] DMA rt: {marginal(make, 100, 2000)*1e6:8.3f} us/step")


def m5b(B=256, N=32):
    """N per-stream VMEM->VMEM DMAs; window as [B, W/128, 128] u8 3D,
    slices .at[b, r, :] -> last two dims (1,128)... try (8,128) rows."""
    W = 16384
    R = W // 128

    def make(steps):
        def kern(wnd_ref, out_ref, sems):
            def step(s, _):
                def issue(c, _2):
                    b = c * (B // N)
                    r0 = (s * 7 + c * 13) % (R - 16)
                    pltpu.make_async_copy(
                        wnd_ref.at[b, pl.ds(r0, 8), :],
                        wnd_ref.at[b, pl.ds(r0 + 8, 8), :],
                        sems.at[c]).start()
                    return _2
                jax.lax.fori_loop(0, N, issue, _)

                def waitb(c, _2):
                    b = c * (B // N)
                    pltpu.make_async_copy(
                        wnd_ref.at[b, pl.ds(0, 8), :],
                        wnd_ref.at[b, pl.ds(8, 8), :],
                        sems.at[c]).wait()
                    return _2
                return jax.lax.fori_loop(0, N, waitb, _)
            jax.lax.fori_loop(0, steps, step, 0)
            out_ref[0, :] = wnd_ref[0, 0, :].astype(jnp.int32)

        wnd = jnp.zeros((B, R, 128), jnp.uint8)
        f = jax.jit(lambda w: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((N,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(w))
        return f, (wnd,)

    print(f"m5b 32 par vmem dma 8x128 rows: {marginal(make, 50, 500)*1e6:8.3f} us/step")


def m6(B=256, nops=300, unroll=1, label="m6  transitions 300ops"):
    def make(steps):
        def kern(x_ref, out_ref):
            def body(i, regs):
                a, b, c = regs
                for _ in range(unroll):
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
        f = _pc(kern, [x], jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (x,)

    t = marginal(make, 100, 2000) / unroll
    print(f"{label}: {t*1e6:8.3f} us/step ({t*1e9/nops:6.2f} ns/op)")


def m7(B=256, NP=2048):
    def make(steps):
        def kern(pidx_ref, tbl_ref, out_ref):
            def body(i, carry):
                acc, pidx = carry
                p = jnp.take_along_axis(tbl_ref[:], pidx[:, None],
                                        axis=1)[:, 0]
                return acc + p, (pidx * 5 + 1 + (p & 1)) % NP

            acc, _ = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((B,), jnp.int32), pidx_ref[0, :]))
            out_ref[0, :] = acc

        pidx = jnp.arange(B, dtype=jnp.int32)[None, :] % NP
        tbl = jnp.full((B, NP), 2048, jnp.int32)
        f = _pc(kern, [pidx, tbl], jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (pidx, tbl)

    print(f"m7  take_along_axis [256,2048]i32: {marginal(make)*1e6:8.3f} us/step")


def m8(B=256, W=16384):
    def make(steps):
        def kern(pos_ref, wnd_ref, out_ref):
            def body(i, carry):
                acc, pos = carry
                byte = jnp.take_along_axis(wnd_ref[:], pos[:, None],
                                           axis=1)[:, 0].astype(jnp.int32)
                return acc + byte, (pos * 5 + 3) % W

            acc, _ = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((B,), jnp.int32), pos_ref[0, :]))
            out_ref[0, :] = acc

        pos = (jnp.arange(B, dtype=jnp.int32) * 17 % W)[None, :]
        wnd = jnp.zeros((B, W), jnp.uint8)
        f = _pc(kern, [pos, wnd], jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (pos, wnd)

    print(f"m8  take_along_axis [256,16K]u8: {marginal(make)*1e6:8.3f} us/step")


def m9(B=256, NROW=64):
    """row gather: cache[b,:] = tbl3[b, ctx[b], :] via one-hot over rows."""
    def make(steps):
        def kern(ctx_ref, tbl_ref, cache_ref, out_ref):
            rowid = jax.lax.broadcasted_iota(jnp.int32, (B, NROW, 1), 1)

            def body(i, carry):
                acc, ctx = carry
                oh = rowid == ctx[:, None, None]
                cache_ref[:] = jnp.sum(
                    jnp.where(oh, tbl_ref[:], 0), axis=1)
                acc = acc + cache_ref[:, 0]
                return acc, (ctx * 3 + 1) % NROW

            acc, _ = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((B,), jnp.int32), ctx_ref[0, :]))
            out_ref[0, :] = acc

        ctx = (jnp.arange(B, dtype=jnp.int32) % NROW)[None, :]
        tbl = jnp.full((B, NROW, 256), 2048, jnp.int32)
        cache = jnp.full((B, 256), 2048, jnp.int32)
        f = _pc(kern, [ctx, tbl, cache],
                jax.ShapeDtypeStruct((1, B), jnp.int32))
        return f, (ctx, tbl, cache)

    print(f"m9  row gather [256,64,256]i32: {marginal(make, 100, 1000)*1e6:8.3f} us/step")


PROBES = ["m1", "m1b", "m2", "m3", "m4", "m5", "m5b", "m6", "m6b",
          "m7", "m8", "m9"]

if __name__ == "__main__":
    for name in (sys.argv[1:] or PROBES):
        try:
            if name == "m1b":
                m1(NP=1280, dtype=jnp.uint16,
                   label="m1b onehot RMW [256,1280]u16")
            elif name == "m6b":
                m6(unroll=8, label="m6b transitions 300ops x8unroll")
            else:
                globals()[name]()
        except Exception as e:  # noqa
            msg = str(e)
            key = [l for l in msg.splitlines() if "error:" in l.lower()
                   or "Mosaic" in l][:2]
            print(f"{name} FAILED: {' | '.join(key) if key else msg[:160]}")
