"""DMA-legality and cost probes for the decode kernel service loop.

w1 — 1D u8 VMEM->VMEM DMA at arbitrary (odd) byte offsets: legal? cost?
w1b— same but HBM->VMEM and VMEM->HBM
w2 — [B, R, 128] u8 8-row-aligned per-stream DMA slices (row swaps)
w3 — take_along_axis in-kernel: real error or cost
w4 — row gather via one-hot over [B, 64, 256] i32 with 3D iota
w5 — scalar sweep issuing N=32 1D u8 DMAs from SMEM state: full service
     sweep cost (the projected per-step service)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_dma.py [w...]
"""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SMALL = 100
N_BIG = 1000


def marginal(make_fn, n_small=N_SMALL, n_big=N_BIG, reps=3):
    f1, a1 = make_fn(n_small)
    f2, a2 = make_fn(n_big)
    for f, a in ((f1, a1), (f2, a2)):
        r = f(*a)
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


def w1(CH=1024, N=32):
    L = 1 << 20

    def make(steps):
        def kern(buf_ref, out_ref, sems):
            def step(s, _):
                def issue(c, _2):
                    so = (((s * 131 + c * 977) % (L // 2)) // 1024) * 1024
                    do = L // 2 + ((((s * 57 + c * 389) % (L // 2 - CH)) // 1024) * 1024)
                    pltpu.make_async_copy(
                        buf_ref.at[pl.ds(so, CH)],
                        buf_ref.at[pl.ds(do, CH)],
                        sems.at[c]).start()
                    return _2
                jax.lax.fori_loop(0, N, issue, _)

                def waitb(c, _2):
                    pltpu.make_async_copy(
                        buf_ref.at[pl.ds(0, CH)],
                        buf_ref.at[pl.ds(CH, CH)],
                        sems.at[c]).wait()
                    return _2
                return jax.lax.fori_loop(0, N, waitb, _)
            jax.lax.fori_loop(0, steps, step, 0)
            out_ref[0] = buf_ref[0].astype(jnp.int32)

        buf = jnp.arange(L, dtype=jnp.int32).astype(jnp.uint8)
        f = jax.jit(lambda b: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((N,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(b))
        return f, (buf,)

    # correctness single-step
    def ck_kern(buf_ref, out_ref, sem):
        pltpu.make_async_copy(buf_ref.at[pl.ds(1024, 1024)],
                              buf_ref.at[pl.ds(4096, 1024)], sem).start()
        pltpu.make_async_copy(buf_ref.at[pl.ds(1024, 1024)],
                              buf_ref.at[pl.ds(4096, 1024)], sem).wait()
        out_ref[:] = buf_ref[pl.ds(0, 2048)]

    ckf = jax.jit(lambda b: pl.pallas_call(
        ck_kern,
        out_shape=jax.ShapeDtypeStruct((2048,), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(b))
    base = (np.arange(1 << 20) & 0xFF).astype(np.uint8)
    got = np.asarray(ckf(jnp.asarray(base)))
    exp = base[:2048].copy()
    ok = np.array_equal(got, exp)  # self-copy of same values; legality only
    t = marginal(make)
    print(f"w1  1D u8 dma odd offsets x{N}: ok={ok} {t*1e6:8.3f} us/step "
          f"({t*1e6/N:6.3f} us/dma)")


def w1b(CH=1024, N=32):
    L = 1 << 22

    def make(steps):
        def kern(hbm_ref, stage_ref, out_ref, sems):
            def step(s, _):
                def issue(c, _2):
                    so = (((s * 131 + c * 977) % (L - CH)) // 1024) * 1024
                    pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(so, CH)],
                        stage_ref.at[pl.ds(c * CH, CH)],
                        sems.at[c]).start()
                    return _2
                jax.lax.fori_loop(0, N, issue, _)

                def waitb(c, _2):
                    pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(0, CH)],
                        stage_ref.at[pl.ds(c * CH, CH)],
                        sems.at[c]).wait()
                    return _2
                return jax.lax.fori_loop(0, N, waitb, _)
            jax.lax.fori_loop(0, steps, step, 0)
            out_ref[0] = 1

        hbm = jnp.zeros(L, jnp.uint8)
        stage = jnp.zeros(N * CH, jnp.uint8)
        f = jax.jit(lambda h, st: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((N,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(h, st))
        return f, (hbm, stage)

    t = marginal(make)
    print(f"w1b hbm->vmem 1D u8 dma x{N}: {t*1e6:8.3f} us/step "
          f"({t*1e6/N:6.3f} us/dma)")


def w2(B=256, N=32):
    R = 128

    def make(steps):
        def kern(wnd_ref, out_ref, sems):
            def step(s, _):
                def issue(c, _2):
                    b = c * (B // N)
                    r0 = pl.multiple_of((((s * 7 + c * 13) % (R - 16)) // 8) * 8, 8)
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

    t = marginal(make)
    print(f"w2  [B,R,128] 8-row dma x{N}: {t*1e6:8.3f} us/step "
          f"({t*1e6/N:6.3f} us/dma)")


def w3(B=256, W=2048):
    def kern(pos_ref, wnd_ref, out_ref):
        byte = jnp.take_along_axis(wnd_ref[:], pos_ref[0, :][:, None],
                                   axis=1)[:, 0]
        out_ref[0, :] = byte.astype(jnp.int32)

    pos = (jnp.arange(B, dtype=jnp.int32) * 17 % W)[None, :]
    wnd = jnp.zeros((B, W), jnp.int32)
    f = jax.jit(lambda p, w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(p, w))
    print("w3 take_along_axis:", np.asarray(f(pos, wnd))[0, :3])


def w4(B=256, NROW=64):
    def make(steps):
        def kern(ctx_ref, tbl_ref, cache_ref, out_ref):
            rowid = jax.lax.broadcasted_iota(jnp.int32, (B, NROW, 256), 1)

            def body(i, carry):
                acc, ctx = carry
                oh = rowid == ctx[:, None, None]
                cache_ref[:] = jnp.sum(jnp.where(oh, tbl_ref[:], 0), axis=1)
                acc = acc + cache_ref[:, 0]
                return acc, (ctx * 3 + 1) % NROW

            acc, _ = jax.lax.fori_loop(
                0, steps, body, (jnp.zeros((B,), jnp.int32), ctx_ref[0, :]))
            out_ref[0, :] = acc

        ctx = (jnp.arange(B, dtype=jnp.int32) % NROW)[None, :]
        tbl = jnp.full((B, NROW, 256), 2048, jnp.int32)
        cache = jnp.full((B, 256), 2048, jnp.int32)
        f = jax.jit(lambda c, t_, ca: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(c, t_, ca))
        return f, (ctx, tbl, cache)

    t = marginal(make)
    print(f"w4  onehot row gather [B,64,256]i32: {t*1e6:8.3f} us/step")


def w5(B=256, N=32, CH=1024):
    """full projected service sweep: VMEM->SMEM req DMA + scalar loop over
    B with guarded per-stream 1D u8 DMA issue + wait-all."""
    L = 1 << 20

    def make(steps):
        def kern(req_ref, buf_ref, out_ref, smem, rsem, sems):
            def step(s, _):
                d = pltpu.make_async_copy(req_ref, smem, rsem)
                d.start()
                d.wait()

                def body(b, cnt):
                    def issue(c):
                        so = (((smem[0, b] + s) % (L // 2)) // 1024) * 1024
                        do = L // 2 + ((((smem[1, b] + s) % (L // 2 - CH)) // 1024) * 1024)
                        pltpu.make_async_copy(
                            buf_ref.at[pl.ds(so, CH)],
                            buf_ref.at[pl.ds(do, CH)],
                            sems.at[c % N]).start()
                        return c + 1
                    return jax.lax.cond(smem[2, b] < N, issue,
                                        lambda c: c, cnt)
                cnt = jax.lax.fori_loop(0, B, body, 0)

                def waitb(c, _2):
                    pltpu.make_async_copy(
                        buf_ref.at[pl.ds(0, CH)],
                        buf_ref.at[pl.ds(CH, CH)],
                        sems.at[c]).wait()
                    return _2
                jax.lax.fori_loop(0, N, waitb, _)
                return _
            jax.lax.fori_loop(0, steps, step, 0)
            out_ref[0] = smem[0, 0]

        req = np.zeros((3, B), np.int32)
        req[0] = np.arange(B) * 37 % (L // 2)
        req[1] = np.arange(B) * 53 % (L // 2)
        req[2] = np.where(np.arange(B) % (B // N) == 0, 0, N + 7)
        req = jnp.asarray(req)
        buf = jnp.zeros(L, jnp.uint8)
        f = jax.jit(lambda r, b: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((3, B), jnp.int32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA((N,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(r, b))
        return f, (req, buf)

    t = marginal(make)
    print(f"w5  full service sweep (req DMA + B-scan + {N} dma): "
          f"{t*1e6:8.3f} us/step")


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["w1", "w1b", "w2", "w4", "w5", "w3"]):
        try:
            globals()[name]()
        except Exception as e:  # noqa
            msg = str(e)
            key = [l for l in msg.splitlines() if "error:" in l.lower()
                   or "Mosaic" in l or "Unimplemented" in l][:2]
            print(f"{name} FAILED: {' | '.join(key) if key else msg[:160]}")
