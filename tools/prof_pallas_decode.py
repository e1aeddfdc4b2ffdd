"""Marginal profiling of the pallas decode kernel on the real chip.

Usage: PDK_PROF={,novec,noserv} python tools/prof_pallas_decode.py [B]
Times _run directly with fixed max_steps (marginal across two step counts).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.golden.encoder import encode_stream  # noqa: E402
from csc_tpu.ops import pallas_decode as pd  # noqa: E402
from csc_tpu.ops import framing  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
variant = os.environ.get("PDK_PROF", "full") or "full"


def mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


import pickle
cache = f"/tmp/prof_blobs_{B}.pkl" if CH == 16384 \
    else f"/tmp/prof_blobs_{B}_{CH}.pkl"
ps = []
for _ in range(B):
    p = props_init(max(32 * 1024, CH), 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    ps.append(p)
if os.path.exists(cache):
    with open(cache, "rb") as f:
        datas, blobs = pickle.load(f)
else:
    datas = [mk_text(CH, s) for s in range(B)]
    from concurrent.futures import ProcessPoolExecutor
    with ProcessPoolExecutor(4) as _pool:
        blobs = list(_pool.map(encode_stream, ps, datas))
    with open(cache, "wb") as f:
        pickle.dump((datas, blobs), f)

rcs, bcs, rce, bce = [], [], [], []
for p, blob in zip(ps, blobs):
    rc, bc, re_, be_ = framing.demux_stream(blob, 0, p.csc_blocksize)
    rcs.append(rc); bcs.append(bc); rce.append(re_); bce.append(be_)
rcp = framing.batch_pad(rcs, 0, np.uint8)
bcp = framing.batch_pad(bcs, 0, np.uint8)
rc_ends = framing.pad_ends(rce)
bc_ends = framing.pad_ends(bce)
nb = max(rc_ends.shape[1], bc_ends.shape[1])
re2 = np.full((B, nb), 0x7FFFFFFF, np.int32); re2[:, :rc_ends.shape[1]] = rc_ends
be2 = np.full((B, nb), 0x7FFFFFFF, np.int32); be2[:, :bc_ends.shape[1]] = bc_ends
nrc = pd._bucket(rcp.shape[1] + pd.TILE + 8)
nbc = pd._bucket(bcp.shape[1] + pd.TILE + 8)
rc_i = np.zeros((B, nrc), np.int32); rc_i[:, :rcp.shape[1]] = rcp
bc_i = np.zeros((B, nbc), np.int32); bc_i[:, :bcp.shape[1]] = bcp
wmax = CH
nw = pd._bucket(wmax + 2 * pd.TILE, 4096)

regs = np.zeros((pd.NR, B), np.int32)
regs[pd._RI["fsm"], :] = pd.F_PRIME
regs[pd._RI["rc_base"], :] = -(1 << 20)
regs[pd._RI["bc_base"], :] = -(1 << 20)
regs[pd._RI["rd_base"], :] = -(1 << 20)
regs[pd._RI["grp_key"], :] = -1

wnd = jnp.zeros((B, nw // 128, 128), jnp.int32)
plit = jnp.full((B, 512, 128), 2048.0, jnp.float32)
pdlt = jnp.full((B, 512, 128), 2048.0, jnp.float32)
rc_d = jnp.asarray(rc_i.reshape(B, nrc // 128, 128))
bc_d = jnp.asarray(bc_i.reshape(B, nbc // 128, 128))
re_d = jnp.asarray(re2); be_d = jnp.asarray(be2)
regs_d = jnp.asarray(regs)


def run(nsteps):
    ms = jnp.asarray(np.array([[nsteps]], np.int32))
    outs = pd._run(B, nw // 128, nrc // 128, nbc // 128, nb, False,
                   ms, re_d, be_d, regs_d, rc_d, bc_d, wnd, plit, pdlt)
    return int(np.asarray(outs[5])[0, 0])


N1 = int(os.environ.get("PDK_N1", "2000"))
N2 = int(os.environ.get("PDK_N2", "22000"))
REPS = int(os.environ.get("PDK_REPS", "5"))
run(N1)  # compile + warm
run(N2)
best = None
for _ in range(REPS):
    t0 = time.time(); s1 = run(N1); t1 = time.time()
    s2 = run(N2); t2 = time.time()
    per = (t2 - t1 - (t1 - t0)) / max(s2 - s1, 1) * 1e6
    if best is None or per < best:
        best, bt1, bt2, bs1, bs2 = per, t1 - t0, t2 - t1, s1, s2
dup = os.environ.get("PDK_DUP", "")
print(f"variant={variant} dup={dup} B={B} t(N1={bs1})={bt1:.3f}s "
      f"t(N2={bs2})={bt2:.3f}s marginal={best:.2f} us/step")
