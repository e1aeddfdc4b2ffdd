"""End-to-end decode wall-time breakdown on the real chip.

Times each stage of decode_batch_pallas separately: host demux, device
transfer+widen, kernel, pack+pull, host filters.  Usage:
  python tools/prof_decode_e2e.py [B] [CHUNK]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

import glob  # noqa: E402
import pickle  # noqa: E402
from csc_tpu.golden import compress  # noqa: E402
from csc_tpu.props import read_properties  # noqa: E402

bufs, total = [], 0
for f in sorted(glob.glob("/usr/lib/python3*/*.py")):
    with open(f, "rb") as fh:
        bufs.append(fh.read())
    total += len(bufs[-1])
    if total > 4 * 1024 * 1024:
        break
data = b"".join(bufs)
while len(data) < B * CH:
    data += data
chunks = [data[i * CH:(i + 1) * CH] for i in range(B)]
cache = f"/tmp/bench_blobs_{B}_{CH}.pkl"
if os.path.exists(cache):
    with open(cache, "rb") as f:
        blobs = pickle.load(f)
else:
    blobs = [compress(c, level=1, dict_size=CH) for c in chunks]
    with open(cache, "wb") as f:
        pickle.dump(blobs, f)

props_list = [read_properties(b[:10]) for b in blobs]
bodies = [b[10:] for b in blobs]

from csc_tpu.ops import framing  # noqa: E402
from csc_tpu.ops import pallas_decode as pd  # noqa: E402

out_sizes = [CH] * B


def once():
    t = {}
    t0 = time.time()
    rcs, bcs, rce, bce = [], [], [], []
    for props, blob in zip(props_list, bodies):
        rc, bc, re_, be_ = framing.demux_stream(blob, 0, props.csc_blocksize)
        rcs.append(rc); bcs.append(bc); rce.append(re_); bce.append(be_)
    rc = framing.batch_pad(rcs, 0, np.uint8)
    bc = framing.batch_pad(bcs, 0, np.uint8)
    rc_ends = framing.pad_ends(rce)
    bc_ends = framing.pad_ends(bce)
    nb = max(rc_ends.shape[1], bc_ends.shape[1])
    re2 = np.full((B, nb), 0x7FFFFFFF, np.int32)
    re2[:, :rc_ends.shape[1]] = rc_ends
    be2 = np.full((B, nb), 0x7FFFFFFF, np.int32)
    be2[:, :bc_ends.shape[1]] = bc_ends
    nrc = pd._bucket(rc.shape[1] + pd.TILE + 8)
    nbc = pd._bucket(bc.shape[1] + pd.TILE + 8)
    rc_i = np.zeros((B, nrc), np.uint8); rc_i[:, :rc.shape[1]] = rc
    bc_i = np.zeros((B, nbc), np.uint8); bc_i[:, :bc.shape[1]] = bc
    t["demux"] = time.time() - t0

    t0 = time.time()
    rc_d = pd._widen(jnp.asarray(rc_i), nrc // 128)
    bc_d = pd._widen(jnp.asarray(bc_i), nbc // 128)
    rc_d.block_until_ready()
    t["xfer_in"] = time.time() - t0

    t0 = time.time()
    wmax = max(max(out_sizes), 1024)
    nw = pd._bucket(wmax + 2 * pd.TILE, 4096)
    steps_cap = int(8 * rc.shape[1] + bc.shape[1] + 64 + 2 * wmax)
    regs = np.zeros((pd.NR, B), np.int32)
    regs[pd._RI["fsm"], :] = pd.F_PRIME
    regs[pd._RI["rc_base"], :] = -(1 << 20)
    regs[pd._RI["bc_base"], :] = -(1 << 20)
    regs[pd._RI["rd_base"], :] = -(1 << 20)
    regs[pd._RI["grp_key"], :] = -1
    wnd = jnp.zeros((B, nw // 128, 128), jnp.int32)
    plit = jnp.full((B, 512, 128), 2048, jnp.int32)
    pdlt = jnp.full((B, 512, 128), 2048, jnp.int32)
    ms = np.array([[steps_cap]], np.int32)
    outs = pd._run(B, nw // 128, nrc // 128, nbc // 128, nb, False,
                   jnp.asarray(ms), jnp.asarray(re2), jnp.asarray(be2),
                   jnp.asarray(regs), rc_d, bc_d, wnd, plit, pdlt)
    wnd_o, _, _, regs_o, blklog, steps = outs
    regs_o.block_until_ready()
    t["kernel"] = time.time() - t0

    t0 = time.time()
    regs_np = np.asarray(regs_o)
    blklog_np = np.asarray(blklog)
    lmax = pd._bucket(max(int(regs_np[pd._RI["wnd_pos"]].max()), 4), 1024)
    lmax = min(lmax, nw)
    wnd_np = np.asarray(pd._pack_bytes(wnd_o, lmax)).view(np.uint8)
    t["pack_pull"] = time.time() - t0

    t0 = time.time()
    out_pos = regs_np[pd._RI["wnd_pos"]]
    outputs = []
    for i in range(B):
        outputs.append(bytes(wnd_np[i, :out_pos[i]]))
    t["host_out"] = time.time() - t0
    t["steps"] = int(np.asarray(steps)[0, 0])
    return t, outputs


t1, _ = once()
t2, outputs = once()
ok = all(o == c for o, c in zip(outputs, chunks))
print("warm:", {k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in t2.items()}, "roundtrip_ok:", ok)
