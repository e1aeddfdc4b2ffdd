"""Dev harness: pallas decode kernel vs golden, interpret mode on CPU.

Usage: python tools/dev_pallas_decode.py [case ...]
Cases: lit match text multichunk bad rnd exe corrupt
"""
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
from csc_tpu.ops.pallas_decode import decode_batch_pallas  # noqa: E402


def mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def run_case(name, datas, props_list, expect_fallback=False):
    blobs = [encode_stream(p, d) for p, d in zip(props_list, datas)]
    outs, fb, steps = decode_batch_pallas(
        props_list, blobs, out_sizes=[len(d) for d in datas],
        interpret=True)
    ok = True
    for i, (o, d) in enumerate(zip(outs, datas)):
        if expect_fallback and i in fb:
            continue
        if o != d:
            ok = False
            if o is None:
                print(f"  [{name}] stream {i}: fell back unexpectedly")
            else:
                diff = next((k for k in range(min(len(o), len(d)))
                             if o[k] != d[k]), min(len(o), len(d)))
                print(f"  [{name}] stream {i}: MISMATCH at byte {diff} "
                      f"(len {len(o)} vs {len(d)}) "
                      f"got {o[max(0,diff-3):diff+5].hex()} "
                      f"want {d[max(0,diff-3):diff+5].hex()}")
    print(f"{name}: {'OK' if ok else 'FAIL'} (steps={steps}, fb={fb})")
    return ok


def case_lit():
    d = bytes(np.random.default_rng(1).integers(0, 200, 600,
                                                dtype=np.uint8))
    p = props_init(32 * 1024, 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return run_case("lit", [d], [p])


def case_match():
    d = (b"abcdefgh" * 40 + b"XYZ" + b"abcdefgh" * 40)[:600]
    p = props_init(32 * 1024, 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return run_case("match", [d], [p])


def case_text():
    ds = [mk_text(3000, s) for s in range(4)]
    ps = []
    for _ in ds:
        p = props_init(32 * 1024, 2)
        p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
        ds_p = p
        ps.append(ds_p)
    return run_case("text", ds, ps)


def case_multichunk():
    d = mk_text(20000, 7)
    p = props_init(32 * 1024, 1)
    p.raw_blocksize = 8192           # force chunk resets (F_PRIME path)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return run_case("multichunk", [d], [p])


def case_bad():
    d = bytes(np.random.default_rng(3).integers(0, 256, 9000,
                                                dtype=np.uint8))
    p = props_init(32 * 1024, 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return run_case("bad", [d], [p])


def case_rnd():
    # mixed batch: text + random + matchy
    ds = [mk_text(2500, 11),
          bytes(np.random.default_rng(5).integers(0, 256, 2500,
                                                  dtype=np.uint8)),
          (b"runrunrun" * 300)[:2500]]
    ps = []
    for _ in ds:
        p = props_init(32 * 1024, 1)
        p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
        ps.append(p)
    return run_case("rnd", ds, ps)


def case_exe():
    with open("/usr/bin/ls", "rb") as f:
        d = f.read(6000)
    p = props_init(32 * 1024, 2)   # filters ON: DT_EXE path + host E89
    return run_case("exe", [d], [p])


def case_corrupt():
    d = mk_text(2000, 13)
    p = props_init(32 * 1024, 1)
    p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    blob = bytearray(encode_stream(p, d))
    blob[len(blob) // 2] ^= 0xFF
    from csc_tpu.golden.decoder import DecodeError
    try:
        outs, fb, steps = decode_batch_pallas(
            [p], [bytes(blob)], out_sizes=[len(d)], interpret=True)
        if outs[0] == d:
            print("corrupt: FAIL (flip decoded identically?)")
            return False
        print(f"corrupt: OK (garbage-or-error tolerated, steps={steps})")
        return True
    except DecodeError:
        print("corrupt: OK (DecodeError raised)")
        return True
    except RuntimeError as e:
        print(f"corrupt: OK-ish ({e})")
        return True


CASES = {n[5:]: f for n, f in list(globals().items())
         if n.startswith("case_")}

if __name__ == "__main__":
    names = sys.argv[1:] or ["lit", "match", "text", "multichunk",
                             "bad", "rnd", "exe", "corrupt"]
    allok = True
    for n in names:
        try:
            allok &= CASES[n]()
        except Exception as e:  # noqa
            import traceback
            traceback.print_exc()
            print(f"{n}: EXCEPTION {str(e)[:200]}")
            allok = False
    sys.exit(0 if allok else 1)
