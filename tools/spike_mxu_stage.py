"""Spike: MXU (dot_general) row staging vs the 16-row select scan.

Measures, inside a minimal pallas while-loop kernel at B=128:
  a) select-scan staging of a [B,256] pair from a [B,16,128] i32 tile
  b) batched dot_general staging from an f32 tile
  c) same for writeback (outer-product add vs 16-row select)
Run: python tools/spike_mxu_stage.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, TS = 128, 16

def make(kind):
    def kernel(ms_ref, tile_ref, sub_ref, out_ref):
        def body(c):
            step, acc = c
            sub = sub_ref[0, :] + (step & 3)  # vary rows
            if kind.startswith("sel"):
                oh = (jax.lax.broadcasted_iota(jnp.int32, (B, TS), 1)
                      == (sub[:, None] & (TS - 1)))
                lo = jnp.zeros((B, 128), tile_ref.dtype)
                hi = jnp.zeros((B, 128), tile_ref.dtype)
                for s in range(TS):
                    row = tile_ref[:, s, :]
                    lo = lo + jnp.where(oh[:, s:s+1], row, 0)
                    hi = hi + jnp.where(oh[:, (s-1) % TS:(s-1) % TS + 1], row, 0)
                acc = acc + lo[:, 0] + hi[:, 0]
            elif kind.startswith("mxu"):
                oh = (jax.lax.broadcasted_iota(jnp.int32, (B, TS), 1)
                      == (sub[:, None] & (TS - 1))).astype(jnp.float32)
                oh2 = (jax.lax.broadcasted_iota(jnp.int32, (B, TS), 1)
                       == ((sub[:, None] + 1) & (TS - 1))).astype(jnp.float32)
                ohb = jnp.stack([oh, oh2], axis=1)        # [B,2,TS]
                pair = jax.lax.dot_general(
                    ohb, tile_ref[:, :, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [B,2,128]
                acc = acc + pair[:, 0, 0].astype(jnp.int32) \
                    + pair[:, 1, 0].astype(jnp.int32)
            elif kind == "wb_sel":
                oh = (jax.lax.broadcasted_iota(jnp.int32, (B, TS), 1)
                      == (sub[:, None] & (TS - 1)))
                newrow = jnp.broadcast_to(acc[:, None].astype(tile_ref.dtype), (B, 128))
                for s in range(TS):
                    tile_ref[:, s, :] = jnp.where(oh[:, s:s+1], newrow,
                                                  tile_ref[:, s, :])
                acc = acc + 1
            elif kind == "wb_mxu":
                ohf = (jax.lax.broadcasted_iota(jnp.int32, (B, TS), 1)
                       == (sub[:, None] & (TS - 1))).astype(jnp.float32)
                delta = jnp.broadcast_to(
                    acc[:, None].astype(jnp.float32), (B, 128))
                upd = jax.lax.dot_general(
                    ohf[:, :, None], delta[:, None, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [B,TS,128]
                tile_ref[:, :, :] = tile_ref[:, :, :] + upd
                acc = acc + 1
            return step + 1, acc
        def cond(c):
            return c[0] < ms_ref[0, 0]
        _, acc = jax.lax.while_loop(cond, body,
                                    (jnp.int32(0), jnp.zeros((B,), jnp.int32)))
        out_ref[0, :] = acc

    dt = jnp.float32 if ("mxu" in kind or kind.endswith("f32")) else jnp.int32
    @jax.jit
    def run(ms, tile, sub):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ms, tile, sub)
    dtn = np.float32 if dt == jnp.float32 else np.int32
    tile = jnp.asarray(np.random.randint(0, 4096, (B, TS, 128)).astype(dtn))
    sub = jnp.asarray(np.random.randint(0, TS, (1, B)).astype(np.int32))
    def bench(n):
        t0 = time.time()
        r = run(jnp.asarray(np.array([[n]], np.int32)), tile, sub)
        _ = int(np.asarray(r)[0, 0])
        return time.time() - t0
    bench(100)
    t1 = bench(1000); t2 = bench(21000)
    return (t2 - t1) / 20000 * 1e6

for kind in ["sel_i32", "mxu_f32", "wb_sel", "wb_mxu"]:
    try:
        us = make(kind)
        print(f"{kind}: {us:.3f} us/step")
    except Exception as e:
        print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:300]}")
