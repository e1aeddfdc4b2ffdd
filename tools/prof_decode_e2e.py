"""End-to-end decode wall-time breakdown on the real chip (round 4).

Times the real product path decode_batch_pallas with stage timers:
demux+pad (host), fused device call (transfer+kernel+pack), output pull,
host post-pass.  Usage: python tools/prof_decode_e2e.py [B] [CHUNK]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pickle  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.golden.encoder import encode_stream  # noqa: E402
from csc_tpu.ops.pallas_decode import decode_batch_pallas  # noqa: E402


def mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


cache = f"/tmp/prof_blobs_{B}.pkl"
ps = []
for _ in range(B):
    p = props_init(32 * 1024, 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    ps.append(p)
if os.path.exists(cache):
    with open(cache, "rb") as f:
        datas, blobs = pickle.load(f)
else:
    datas = [mk_text(CH, s) for s in range(B)]
    blobs = [encode_stream(p, d) for p, d in zip(ps, datas)]
    with open(cache, "wb") as f:
        pickle.dump((datas, blobs), f)

os.environ["CSC_DECODE_TIMING"] = "1"
sizes = [len(d) for d in datas]


def once():
    t0 = time.time()
    outs, fb, steps = decode_batch_pallas(ps, blobs, out_sizes=sizes)
    t1 = time.time()
    assert fb == []
    for o, d in zip(outs, datas):
        assert o == d
    return t1 - t0, steps


once()   # warm/compile
from csc_tpu.ops import pallas_decode as pd  # noqa: E402
w, steps = once()
total = B * CH / 1e6
print(f"B={B} CH={CH} wall={w:.3f}s steps={steps} "
      f"device_call={pd.LAST_KERNEL_SECONDS:.3f}s "
      f"host={w - pd.LAST_KERNEL_SECONDS:.3f}s "
      f"e2e={total / w:.2f} MB/s")
