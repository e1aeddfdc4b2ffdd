"""Time the encode-precompute internals on the real chip.

Usage: python tools/prof_encode_pre.py [B] [N]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from csc_tpu.ops import parse_pre  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

rng = np.random.default_rng(0)
words = [b"the", b"quick", b"brown", b"compression", b"window", b"entropy"]
out = bytearray()
while len(out) < B * N:
    out += words[rng.integers(len(words))] + b" "
data = np.frombuffer(bytes(out[:B * N]), np.uint8).reshape(B, N)
blk_end = np.minimum((np.arange(N)[None, :] // 8192 + 1) * 8192,
                     N).astype(np.int32) * np.ones((B, 1), np.int32)

data_d = jnp.asarray(data)
blk_d = jnp.asarray(blk_end)


def t(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(*a)
    jax.block_until_ready(r)
    return r, time.time() - t0


_, dt = t(parse_pre._hashes, data_d, blk_d, 18, N)
print(f"hashes      {dt*1e3:8.1f} ms")
in4, h2, h3, h6 = parse_pre._hashes(data_d, blk_d, 18, N)

hs = jnp.concatenate([h2, h3, h6], axis=0)
_, dt = t(parse_pre._prev_occ, hs)
print(f"prev_occ    {dt*1e3:8.1f} ms   (argsort [%d,%d])" % hs.shape)
prev = parse_pre._prev_occ(hs)

qs = jnp.concatenate([prev[:B], prev[B:2*B], prev[2*B:]], axis=0)
in4_t = jnp.tile(in4, (3, 1))
blk_t = jnp.tile(blk_d, (3, 1))
_, dt = t(parse_pre._ext_lens, in4_t, qs, blk_t, 32)
print(f"ext_lens    {dt*1e3:8.1f} ms   ([%d,%d])" % qs.shape)

_, dt = t(parse_pre._precompute_dev, data_d, blk_d, 18, 1, 32)
print(f"total       {dt*1e3:8.1f} ms")

# raw gather cost for calibration
idx = jnp.asarray(rng.integers(0, N, (3 * B, N)).astype(np.int32))


@jax.jit
def g(a, i):
    return jnp.take_along_axis(a, i, axis=1)


_, dt = t(g, in4_t, idx)
print(f"one gather  {dt*1e3:8.1f} ms   ([%d,%d])" % idx.shape)
