"""Raw VPU/VMEM roofline + loop-overhead probes for the axon v5e-lite chip.

r1 — elementwise RMW bandwidth on [256,2048] i32 inside fori_loop
r2 — same body unrolled x8 inside fori_loop (does unrolling amortize
     the ~200ns scalar loop-iteration overhead?)
r3 — one-hot gather+RMW [256,2048] i32 unrolled x8
r4 — big elementwise pass (16MB into 8MB VMEM? use 4MB) single-shot
r5 — fori_loop with empty-ish vector body (loop overhead floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/spike_roofline.py
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


def _run(kern, inputs, out_shape, steps):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a))
    return timeit(f, *inputs, inner=steps)


def r1(B=256, NP=2048, steps=1000):
    def kern(tbl_ref, out_ref):
        def body(i, acc):
            tbl_ref[:] = tbl_ref[:] + 1
            return acc + 1
        jax.lax.fori_loop(0, steps, body, 0)
        out_ref[0, :] = tbl_ref[:, 0]

    t = _run(kern, [jnp.zeros((B, NP), jnp.int32)],
             jax.ShapeDtypeStruct((1, B), jnp.int32), steps)
    mb = B * NP * 4 * 2 / 1e6
    print(f"r1 RMW [256,2048]i32 fori:      {t*1e6:8.3f} us/step "
          f"({mb/t/1e3:7.1f} GB/s)")


def r2(B=256, NP=2048, steps=125, unroll=8):
    def kern(tbl_ref, out_ref):
        def body(i, acc):
            for _ in range(unroll):
                tbl_ref[:] = tbl_ref[:] + 1
            return acc + 1
        jax.lax.fori_loop(0, steps, body, 0)
        out_ref[0, :] = tbl_ref[:, 0]

    t = _run(kern, [jnp.zeros((B, NP), jnp.int32)],
             jax.ShapeDtypeStruct((1, B), jnp.int32), steps * unroll)
    mb = B * NP * 4 * 2 / 1e6
    print(f"r2 RMW unrolled x8:             {t*1e6:8.3f} us/step "
          f"({mb/t/1e3:7.1f} GB/s)")


def r3(B=256, NP=2048, steps=125, unroll=8):
    def kern(pidx_ref, tbl_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, NP), 1)

        def body(i, carry):
            acc, pidx = carry
            for _ in range(unroll):
                oh = lane == pidx[:, None]
                p = jnp.sum(jnp.where(oh, tbl_ref[:], 0), axis=1)
                bit = (p & 1).astype(jnp.int32)
                newp = jnp.where(bit == 1, p + ((4095 - p) >> 5),
                                 p - (p >> 5))
                tbl_ref[:] = jnp.where(oh, newp[:, None], tbl_ref[:])
                pidx = (pidx * 5 + 1 + bit) % NP
            return acc + p, pidx

        acc, _ = jax.lax.fori_loop(
            0, steps, body,
            (jnp.zeros((B,), jnp.int32), pidx_ref[0, :]))
        out_ref[0, :] = acc

    pidx = jnp.arange(B, dtype=jnp.int32)[None, :] % NP
    t = _run(kern, [pidx, jnp.full((B, NP), 2048, jnp.int32)],
             jax.ShapeDtypeStruct((1, B), jnp.int32), steps * unroll)
    print(f"r3 onehot RMW unrolled x8:      {t*1e6:8.3f} us/step")


def r4(MB=4, steps=100):
    n = MB * 1024 * 1024 // 4 // 1024

    def kern(x_ref, out_ref):
        def body(i, acc):
            x_ref[:] = x_ref[:] + 1
            return acc + 1
        jax.lax.fori_loop(0, steps, body, 0)
        out_ref[0, :] = x_ref[:, 0][:1]

    t = _run(kern, [jnp.zeros((n, 1024), jnp.int32)],
             jax.ShapeDtypeStruct((1, 1), jnp.int32), steps)
    print(f"r4 RMW {MB}MB pass:               {t*1e6:8.3f} us/pass "
          f"({2*MB/1e3/t:7.1f} GB/s)")


def r5(B=256, steps=2000):
    def kern(x_ref, out_ref):
        def body(i, acc):
            return acc + x_ref[0, :]
        out_ref[0, :] = jax.lax.fori_loop(
            0, steps, body, jnp.zeros((B,), jnp.int32))

    t = _run(kern, [jnp.ones((1, B), jnp.int32)],
             jax.ShapeDtypeStruct((1, B), jnp.int32), steps)
    print(f"r5 fori tiny-body floor:        {t*1e6:8.3f} us/step")


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["r5", "r1", "r2", "r4", "r3"]):
        try:
            globals()[name]()
        except Exception as e:  # noqa
            print(f"{name} FAILED: {str(e)[:200]}")
