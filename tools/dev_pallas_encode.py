"""Dev harness: pallas encode phase B vs golden, interpret mode on CPU.

Runs pipeline.encode_batch with CSC_ENCODE_BITS=pallas (interpret) and
compares the final physical streams byte-for-byte against the golden
encoder (the XLA phase-B path is already golden-identical, so equality
proves the kernel).

Usage: python tools/dev_pallas_encode.py [case ...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")
os.environ["CSC_ENCODE_BITS"] = "pallas"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.golden.encoder import encode_stream  # noqa: E402
from csc_tpu.ops.pipeline import encode_batch  # noqa: E402


def mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def run_case(name, datas, props_list):
    want = [encode_stream(p, d) for p, d in zip(props_list, datas)]
    got = encode_batch(props_list, datas)
    ok = True
    for i, (g, w) in enumerate(zip(got, want)):
        if g != w:
            ok = False
            diff = next((k for k in range(min(len(g), len(w)))
                         if g[k] != w[k]), min(len(g), len(w)))
            print(f"  [{name}] stream {i}: MISMATCH at byte {diff} "
                  f"(len {len(g)} vs {len(w)}) "
                  f"got {g[max(0, diff - 3):diff + 5].hex()} "
                  f"want {w[max(0, diff - 3):diff + 5].hex()}")
    print(f"{name}: {'OK' if ok else 'FAIL'}")
    return ok


def _props(level=1, dict_size=32 * 1024):
    p = props_init(dict_size, level)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return p


def case_lit():
    d = bytes(np.random.default_rng(1).integers(0, 200, 600,
                                                dtype=np.uint8))
    return run_case("lit", [d], [_props()])


def case_match():
    d = (b"abcdefgh" * 40 + b"XYZ" + b"abcdefgh" * 40)[:600]
    return run_case("match", [d], [_props()])


def case_text():
    return run_case("text", [mk_text(3000, s) for s in range(4)],
                    [_props(2) for _ in range(4)])


def case_longmatch():
    d = (b"A" * 5000 + mk_text(2000, 3) + b"A" * 5000)
    return run_case("longmatch", [d], [_props()])


def case_multichunk():
    p = _props()
    p.raw_blocksize = 8192     # chunk flushes (F_FLUSH path)
    return run_case("multichunk", [mk_text(20000, 7)], [p])


def case_mixed():
    ds = [mk_text(2500, 11), (b"runrunrun" * 300)[:2500],
          mk_text(1000, 5)]
    return run_case("mixed", ds, [_props() for _ in ds])


CASES = {n[5:]: f for n, f in list(globals().items())
         if n.startswith("case_")}



def case_bad():
    rng = np.random.default_rng(3)
    d = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
    p = props_init(len(d), 2)       # filters ON: analyzer types DT_BAD
    return run_case("bad", [d], [p])


def case_entropy():
    rng = np.random.default_rng(5)
    syms = np.array([3, 17, 58, 91, 130, 171, 202, 251], np.uint8)
    d = bytes(syms[rng.integers(0, 8, 20000)])
    p = props_init(len(d), 2)       # DT_ENTROPY runs
    return run_case("entropy", [d], [p])


CASES["bad"] = case_bad
CASES["entropy"] = case_entropy


if __name__ == "__main__":
    names = sys.argv[1:] or ["lit", "match", "text", "longmatch",
                             "multichunk", "mixed", "bad", "entropy"]
    allok = True
    for n in names:
        try:
            allok &= CASES[n]()
        except Exception:
            import traceback
            traceback.print_exc()
            allok = False
    sys.exit(0 if allok else 1)
