"""Spike: cost of [B] register ops and select-LUT chains in a Pallas loop.

Variants: base (minimal loop), reg50/reg200 (N extra [B] ops),
lut35 (35-select LUT chain like an in-loop phase transition table).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128

def make(kind):
    def kernel(ms_ref, x_ref, out_ref):
        def body(c):
            step, a, b_, d = c
            if kind == "base":
                a = a + 1
            elif kind.startswith("reg"):
                n = int(kind[3:])
                for i in range(n // 4):
                    a = a + b_
                    b_ = b_ ^ d
                    d = jnp.where(a > b_, d + 1, d)
                    a = a & 0xFFFF
            elif kind == "lut35":
                ph = a & 15
                nxt = jnp.zeros_like(ph)
                for i in range(24):
                    nxt = jnp.where(ph == (i % 12), i * 3 + 1, nxt)
                prm = jnp.zeros_like(ph)
                for i in range(11):
                    prm = jnp.where(nxt == i, i * 257, prm)
                a = a + nxt + (prm >> 4)
            return step + 1, a, b_, d
        def cond(c):
            return c[0] < ms_ref[0, 0]
        z = x_ref[0, :]
        _, a, b_, d = jax.lax.while_loop(
            cond, body, (jnp.int32(0), z, z + 1, z + 2))
        out_ref[0, :] = a + b_ + d

    @jax.jit
    def run(ms, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ms, x)
    x = jnp.asarray(np.random.randint(0, 1000, (1, B)).astype(np.int32))
    def bench(n):
        t0 = time.time()
        r = run(jnp.asarray(np.array([[n]], np.int32)), x)
        _ = int(np.asarray(r)[0, 0])
        return time.time() - t0
    bench(100)
    t1 = bench(1000); t2 = bench(41000)
    return (t2 - t1) / 40000 * 1e6

base = None
for kind in ["base", "reg100", "reg400", "lut35"]:
    us = make(kind)
    note = ""
    if kind == "base":
        base = us
    else:
        note = f"  (delta {us - base:.3f} us)"
    print(f"{kind}: {us:.3f} us/step{note}")
