"""Run the pallas decode kernel on the real axon TPU chip (Mosaic compile).

Usage: python tools/dev_pallas_tpu.py [case ...]  (default: lit)
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
print("devices:", jax.devices())

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


def run_case(name, datas, props_list):
    blobs = [encode_stream(p, d) for p, d in zip(props_list, datas)]
    import time
    t0 = time.time()
    outs, fb, steps = decode_batch_pallas(
        props_list, blobs, out_sizes=[len(d) for d in datas],
        interpret=False)
    t1 = time.time()
    outs, fb, steps = decode_batch_pallas(
        props_list, blobs, out_sizes=[len(d) for d in datas],
        interpret=False)
    t2 = time.time()
    ok = all(o == d for o, d in zip(outs, datas))
    tot = sum(len(d) for d in datas)
    mbs = tot / (t2 - t1) / 1e6
    print(f"{name}: {'OK' if ok else 'FAIL'} steps={steps} fb={fb} "
          f"compile+run={t1 - t0:.2f}s run={t2 - t1:.3f}s bytes={tot} "
          f"agg={mbs:.2f} MB/s us_per_step={(t2 - t1) / steps * 1e6:.2f}")
    if not ok:
        for i, (o, d) in enumerate(zip(outs, datas)):
            if o != d:
                diff = next((k for k in range(min(len(o or b''), len(d)))
                             if o[k] != d[k]), min(len(o or b''), len(d)))
                print(f"  stream {i} first diff at {diff}")
    return ok


CASES = {}
def case(f):
    CASES[f.__name__[5:]] = f
    return f

@case
def case_lit():
    d = bytes(np.random.default_rng(1).integers(0, 200, 600, dtype=np.uint8))
    p = props_init(32 * 1024, 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return run_case("lit", [d], [p])

@case
def case_text():
    ds = [mk_text(16000, s) for s in range(8)]
    ps = []
    for _ in ds:
        p = props_init(32 * 1024, 2)
        p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
        ps.append(p)
    return run_case("text", ds, ps)

@case
def case_b64():
    ds = [mk_text(16384, s) for s in range(64)]
    ps = []
    for _ in ds:
        p = props_init(32 * 1024, 1)
        p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
        ps.append(p)
    return run_case("b64", ds, ps)


if __name__ == "__main__":
    names = sys.argv[1:] or ["lit"]
    allok = True
    for n in names:
        allok &= CASES[n]()
    sys.exit(0 if allok else 1)
