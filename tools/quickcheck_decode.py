"""Fast real-chip decode validation for kernel iteration (round 5).

Round-trips a diverse batch (real text, synthetic text, exe bytes,
random/BAD, multichunk resets) through the product decode path on the
current backend and asserts byte equality.  ~1 min warm vs ~6 min for
the interpret-mode pytest matrix; run the pytest matrix at milestones.
"""
import os
import sys
import glob

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.golden.encoder import encode_stream  # noqa: E402
from csc_tpu.ops.pipeline import decode_batch  # noqa: E402
from csc_tpu.ops import pipeline  # noqa: E402


def mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def main():
    bufs = []
    for f in sorted(glob.glob("/usr/lib/python3*/*.py")):
        bufs.append(open(f, "rb").read())
        if sum(len(b) for b in bufs) > 1 << 20:
            break
    text = b"".join(bufs)
    exe = open("/usr/bin/bash", "rb").read()
    rng = np.random.default_rng(7)

    datas, props = [], []

    def add(d, level=1, dict_size=64 * 1024, bsize=None, filters=True):
        p = props_init(dict_size, level)
        if bsize:
            p.csc_blocksize = bsize
        if not filters:
            p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
        datas.append(d)
        props.append(p)

    add(text[:16384])                                   # real text m1
    add(text[16384:32768], level=2)                     # real text m2
    add(mk_text(16384, 1), filters=False)               # synthetic
    add(exe[4096:20480])                                # exe (E89)
    add(rng.bytes(8192))                                # BAD
    add(text[:65536], bsize=16 * 1024)                  # multichunk resets
    add(text[32768:32768 + 300])                        # tiny
    add(bytes(np.tile(np.arange(4, dtype=np.uint8), 2048)))  # delta-ish
    while len(datas) < 16:                              # pad batch
        add(text[len(datas) * 1024:len(datas) * 1024 + 12288])

    from concurrent.futures import ProcessPoolExecutor
    import pickle
    cache = "/tmp/quickcheck_blobs.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            cd, blobs = pickle.load(f)
        if cd != [len(d) for d in datas]:
            blobs = None
    else:
        blobs = None
    if blobs is None:
        with ProcessPoolExecutor(4) as pool:
            blobs = list(pool.map(encode_stream, props, datas))
        with open(cache, "wb") as f:
            pickle.dump(([len(d) for d in datas], blobs), f)

    outs = decode_batch(props, blobs, out_sizes=[len(d) for d in datas])
    bad = [i for i, (o, d) in enumerate(zip(outs, datas)) if o != d]
    print(f"fallbacks={pipeline.LAST_DECODE_FALLBACKS} mismatches={bad}")
    assert not bad, f"decode mismatch at {bad}"
    print("PASS")


if __name__ == "__main__":
    main()
