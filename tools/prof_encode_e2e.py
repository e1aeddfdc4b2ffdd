"""Phase budget for the TPU encode path on the real chip.

Usage: python tools/prof_encode_e2e.py [B] [CH]
Prints per-phase wall times (CSC_ENC_DEBUG) for one warm encode_batch.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 16 * 1024

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

from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.ops.pipeline import encode_batch  # noqa: E402

eprops = [props_init(CH, 1) for _ in range(B)]
for p in eprops:
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0

t0 = time.time()
outs = encode_batch(eprops, chunks)   # compile + warm
t1 = time.time()
print(f"warm pass: {t1 - t0:.2f}s")

os.environ["CSC_ENC_DEBUG"] = "1"
t2 = time.time()
outs = encode_batch(eprops, chunks)
t3 = time.time()
print(f"timed pass: {t3 - t2:.2f}s -> {B * CH / (t3 - t2) / 1e6:.3f} MB/s")

# round-trip spot check
from csc_tpu.golden.decoder import decode_stream  # noqa: E402
for j in (0, B // 2, B - 1):
    out = b"".join(decode_stream(eprops[j], outs[j]))
    assert out == chunks[j], f"round-trip mismatch stream {j}"
print("round-trip ok")
