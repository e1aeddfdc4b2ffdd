"""Spike: while-loop carry pressure in a Pallas kernel.

Compares per-step cost of carrying N per-stream registers as
  A) a tuple of N separate [B] i32 vectors (the decode kernel today)
  B) one [Npad, B] i32 array, rows extracted/reinserted each step
  C) tuple of N//2 separate [B] vectors (scaling check)

Each step does the same representative work per register (add, select,
shift mix) so the only difference is carry/layout handling.

Usage: python tools/spike_carry.py [B] [N]
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 48


def work(rs):
    """Representative per-register mixing (all [B] vector ops)."""
    out = []
    n = len(rs)
    for i, r in enumerate(rs):
        a = rs[(i + 1) % n]
        b = rs[(i + 7) % n]
        v = r + (a >> 3)
        v = jnp.where(b > r, v ^ a, v + 1)
        out.append(v)
    return out


def mk_kernel(variant, n):
    npad = -(-n // 8) * 8

    def kernel(ms_ref, init_ref, out_ref):
        steps = ms_ref[0, 0]

        if variant == "tuple":
            def cond(c):
                return c[0] < steps

            def body(c):
                i, rs = c
                return i + 1, tuple(work(list(rs)))

            r0 = tuple(init_ref[i, :] for i in range(n))
            _, rf = jax.lax.while_loop(cond, body, (jnp.int32(0), r0))
            for i in range(n):
                out_ref[i, :] = rf[i]
        else:  # packed
            def cond(c):
                return c[0] < steps

            def body(c):
                i, rp = c
                rs = [rp[j, :] for j in range(n)]
                ns = work(rs)
                rp2 = jnp.concatenate(
                    [v[None, :] for v in ns]
                    + [rp[n:, :]], axis=0)
                return i + 1, rp2

            _, rf = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), init_ref[:, :]))
            out_ref[:, :] = rf

    return kernel, npad


@jax.jit
def run_tuple(ms, init):
    k, npad = mk_kernel("tuple", N)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((-(-N // 8) * 8, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ms, init)


@jax.jit
def run_packed(ms, init):
    k, npad = mk_kernel("packed", N)
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((-(-N // 8) * 8, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ms, init)


def measure(fn, tag):
    npad = -(-N // 8) * 8
    init = jnp.asarray(np.random.randint(0, 1 << 20, (npad, B), np.int32))
    n1, n2 = 2000, 22000
    fn(jnp.asarray([[n1]], np.int32), init).block_until_ready()
    t0 = time.time()
    fn(jnp.asarray([[n1]], np.int32), init).block_until_ready()
    t1 = time.time()
    fn(jnp.asarray([[n2]], np.int32), init).block_until_ready()
    t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e6
    print(f"{tag:8s} B={B} N={N}: {per:8.3f} us/step "
          f"(t1={t1-t0:.3f} t2={t2-t1:.3f})")


if __name__ == "__main__":
    measure(run_tuple, "tuple")
    measure(run_packed, "packed")
