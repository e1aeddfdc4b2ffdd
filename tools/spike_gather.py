"""Microbenchmark of per-bit gather strategies for the decode kernel.

Times, per while-loop iteration inside one pallas_call:
  a) one-hot + sum gather from [B,256]            (current per-bit cost)
  b) static-lane read [B,256][:, k]               (bit-reversed-tree read)
  c) conditional roll of [B,256] by static shift  (bit-reversed-tree adv)
  d) static-mask adapt write into [B,256]
  e) one-hot + sum gather from [B,128]
  f) full per-stream log-rotate of [B,256]
Usage: python tools/spike_gather.py [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def make_run(mode, reps):
    def kernel(ns_ref, x_ref, out_ref):
        lane256 = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)

        def body(carry):
            i, acc, arr = carry
            idx = (acc & 0xFF)
            for r in range(reps):
                if mode == "onehot256":
                    oh = lane256 == ((idx + r) & 0xFF)[:, None]
                    v = jnp.sum(jnp.where(oh, arr, 0), axis=1)
                    acc = acc + v
                elif mode == "statlane":
                    k = (r * 37) % 256
                    v = arr[:, k]
                    acc = acc + v
                elif mode == "condroll":
                    sh = 1 << (r % 8)
                    m = (acc & (1 << (r % 8)))[:, None] != 0
                    arr = jnp.where(m,
                                    pltpu.roll(arr, 256 - sh, 1), arr)
                    acc = acc + arr[:, 0]
                elif mode == "adaptwrite":
                    k = (r * 37) % 256
                    newp = acc + r
                    arr = jnp.where((lane256 == k)
                                    & ((acc & 1) == 0)[:, None],
                                    jnp.broadcast_to(newp[:, None],
                                                     (B, 256)), arr)
                    acc = acc + arr[:, 0]
                elif mode == "onehot128":
                    half = arr[:, :128]
                    oh = lane128 == ((idx + r) & 0x7F)[:, None]
                    v = jnp.sum(jnp.where(oh, half, 0), axis=1)
                    acc = acc + v
                elif mode == "logrot":
                    k = acc & 0xFF
                    a2 = arr
                    j = 1
                    while j < 256:
                        a2 = jnp.where((k & j)[:, None] != 0,
                                       pltpu.roll(a2, 256 - j, 1), a2)
                        j *= 2
                    acc = acc + a2[:, 0]
                elif mode == "base":
                    acc = acc + 1
            return i + 1, acc, arr

        def cond(carry):
            return carry[0] < ns_ref[0, 0]

        _, acc, arr = jax.lax.while_loop(
            cond, body, (jnp.int32(0),
                         jnp.zeros((B,), jnp.int32), x_ref[:]))
        out_ref[:] = acc[:, None] + arr[:, :1]

    @jax.jit
    def run(ns, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ns, x)
    return run


x = jnp.asarray(np.random.randint(0, 4096, (B, 256), dtype=np.int32))
REPS = 16
for mode in ["base", "onehot256", "onehot128", "statlane", "condroll",
             "adaptwrite", "logrot"]:
    run = make_run(mode, REPS)
    n1 = jnp.asarray(np.array([[200]], np.int32))
    n2 = jnp.asarray(np.array([[2200]], np.int32))
    run(n1, x).block_until_ready()
    t0 = time.time(); np.asarray(run(n1, x)); t1 = time.time()
    np.asarray(run(n2, x)); t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / 2000 / REPS * 1e9
    print(f"{mode:12s} {per:8.1f} ns/op   t1={t1-t0:.4f}s t2={t2-t1:.4f}s")
