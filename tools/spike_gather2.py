"""Accurate XLA gather costs on the chip (axon block_until_ready does
not actually block — force with a dependent scalar pull).

Measures, at [R, N] = [288, 32768] i32:
  one take_along_axis          (element gather)
  8 chained take_along_axis    (the _ext_lens pattern)
  slice-gather (8 lanes/pos)   (jax.lax.gather slice_sizes=(1,8))
  shifted-stack + one gather   (8 pre-shifted arrays, same index)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

R, N = 288, 32768
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1 << 20, (R, N)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, N, (R, N)).astype(np.int32))


def force(x):
    return float(jnp.sum(x[..., ::129].astype(jnp.int64) & 0xFF))


def timeit(tag, fn, reps=3):
    force(fn())  # compile+warm
    t0 = time.time()
    for _ in range(reps):
        force(fn())
    dt = (time.time() - t0) / reps
    print(f"{tag:28s} {dt*1e3:9.2f} ms")
    return dt


@jax.jit
def g1(a, idx):
    return jnp.take_along_axis(a, idx, axis=1)


@jax.jit
def g8(a, idx):
    out = jnp.zeros_like(a)
    for l in range(8):
        out = out + jnp.take_along_axis(
            a, jnp.clip(idx + l, 0, N - 1), axis=1)
    return out


@jax.jit
def gslice(a, idx):
    # one gather pulling 8 consecutive elements per position
    ap = jnp.pad(a, ((0, 0), (0, 8)))
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(),
        start_index_map=(1,), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    out = jax.lax.gather(ap, idx[:, :, None], dn, slice_sizes=(1, 8),
                         mode="clip")
    return jnp.sum(out, axis=2)


@jax.jit
def gstack(a, idx):
    # 8 pre-shifted copies, gathered with the SAME index per copy
    outs = []
    for l in range(8):
        sh = jnp.concatenate([a[:, l:], jnp.zeros((R, l), jnp.int32)],
                             axis=1)
        outs.append(jnp.take_along_axis(sh, idx, axis=1))
    return sum(outs)


timeit("take_along_axis x1", lambda: g1(a, idx))
timeit("take_along_axis x8 (+l)", lambda: g8(a, idx))
try:
    timeit("slice-gather (1,8)", lambda: gslice(a, idx))
except Exception as e:
    print("slice-gather failed:", repr(e)[:200])
timeit("shifted-stack x8 same idx", lambda: gstack(a, idx))
