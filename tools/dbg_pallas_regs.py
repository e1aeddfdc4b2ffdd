"""Debug: run pallas decode on one case, dump final regs + step count."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.golden.encoder import encode_stream  # noqa: E402
from csc_tpu.ops import pallas_decode as pd  # noqa: E402
from csc_tpu.ops import framing  # noqa: E402

max_steps_arg = int(sys.argv[1]) if len(sys.argv) > 1 else 0

d = bytes(np.random.default_rng(1).integers(0, 200, 600, dtype=np.uint8))
p = props_init(32 * 1024, 1)
p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
blob = encode_stream(p, d)

rc, bc, re_, be_ = framing.demux_stream(blob, 0, p.csc_blocksize)
print(f"rc len={len(rc)} bc len={len(bc)} rc_ends={re_} bc_ends={be_}")

b = 1
rcp = framing.batch_pad([rc], 0, np.uint8)
bcp = framing.batch_pad([bc], 0, np.uint8)
rc_ends = framing.pad_ends([re_])
bc_ends = framing.pad_ends([be_])
nb = max(rc_ends.shape[1], bc_ends.shape[1])
re2 = np.full((b, nb), 0x7FFFFFFF, np.int32)
re2[:, :rc_ends.shape[1]] = rc_ends
be2 = np.full((b, nb), 0x7FFFFFFF, np.int32)
be2[:, :bc_ends.shape[1]] = bc_ends

nrc = pd._bucket(rcp.shape[1] + pd.TILE + 8)
nbc = pd._bucket(bcp.shape[1] + pd.TILE + 8)
rc_i = np.zeros((b, nrc), np.int32)
rc_i[:, :rcp.shape[1]] = rcp
bc_i = np.zeros((b, nbc), np.int32)
bc_i[:, :bcp.shape[1]] = bcp
wmax = max(len(d), 1024)
nw = pd._bucket(wmax + 2 * pd.TILE, 4096)
max_steps = max_steps_arg or int(8 * rcp.shape[1] + bcp.shape[1] + 64 + 2 * wmax)

import jax.numpy as jnp  # noqa: E402
regs = np.zeros((pd.NR, b), np.int32)
regs[pd._RI["fsm"], :] = pd.F_PRIME
regs[pd._RI["rc_base"], :] = -(1 << 20)
regs[pd._RI["bc_base"], :] = -(1 << 20)
regs[pd._RI["rd_base"], :] = -(1 << 20)
regs[pd._RI["grp_key"], :] = -1

wnd = jnp.zeros((b, nw // 128, 128), jnp.int32)
plit = jnp.full((b, 512, 128), 2048, jnp.int32)
pdlt = jnp.full((b, 512, 128), 2048, jnp.int32)
ms = np.array([[max_steps]], np.int32)

outs = pd._run(b, nw // 128, nrc // 128, nbc // 128, nb, True,
               jnp.asarray(ms), jnp.asarray(re2), jnp.asarray(be2),
               jnp.asarray(regs),
               jnp.asarray(rc_i.reshape(b, nrc // 128, 128)),
               jnp.asarray(bc_i.reshape(b, nbc // 128, 128)),
               wnd, plit, pdlt)
wnd_o, _, _, regs_o, blklog, steps = outs
regs_np = np.asarray(regs_o)
print(f"steps={np.asarray(steps)[0, 0]} max_steps={max_steps}")
for i, name in enumerate(pd.REGS):
    print(f"  {name:12s} = {regs_np[i, 0]}")
wnd_np = np.asarray(wnd_o).reshape(b, -1).astype(np.uint8)
wp = regs_np[pd._RI["wnd_pos"], 0]
got = wnd_np[0, :min(wp, len(d))].tobytes()
diff = next((k for k in range(len(got)) if got[k] != d[k]), len(got))
print(f"wnd_pos={wp} want_len={len(d)} first_diff_at={diff}")
print(f"got [{max(0, diff - 4)}:{diff + 8}]: "
      f"{got[max(0, diff - 4):diff + 8].hex()}")
print(f"want[{max(0, diff - 4)}:{diff + 8}]: "
      f"{d[max(0, diff - 4):diff + 8].hex()}")
blk = np.asarray(blklog)[0]
print("blklog:", blk[:2 * max(regs_np[pd._RI['blk_cnt'], 0], 1)])
