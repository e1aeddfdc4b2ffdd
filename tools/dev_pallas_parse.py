"""Dev loop for the Pallas parse kernel: interpret mode vs the XLA fast
parse on small cases (token-tape identity).

Usage: JAX_PLATFORMS=cpu python tools/dev_pallas_parse.py [case...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from csc_tpu.props import props_init  # noqa: E402
from csc_tpu.ops import parse_pre  # noqa: E402
from csc_tpu.ops.encode_scan_fast import (make_fast_state,  # noqa: E402
                                          run_fast_parse)
from csc_tpu.ops import pallas_parse as pp  # noqa: E402
from csc_tpu.ops.encode_scan import K_LIT  # noqa: E402


def mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def run_case(name, datas, level=1, run_tables=None):
    B = len(datas)
    N = pp._bucket(max(len(d) for d in datas) + 16, 1024)
    arr = np.zeros((B, N), np.uint8)
    for j, d in enumerate(datas):
        arr[j, :len(d)] = np.frombuffer(d, np.uint8)
    sizes = [len(d) for d in datas]
    p = props_init(max(sizes), level)
    dict_sizes = [p.dict_size] * B
    if run_tables is None:
        run_ends = np.asarray(sizes, np.int32)[:, None]
        run_types = np.zeros((B, 1), np.int32)
    else:
        R = max(len(rt) for rt in run_tables)
        run_ends = np.zeros((B, R), np.int32)
        run_types = np.zeros((B, R), np.int32)
        for j, rt in enumerate(run_tables):
            acc = 0
            for k, (t, ln) in enumerate(rt):
                acc += ln
                run_ends[j, k] = acc
                run_types[j, k] = t
            run_ends[j, len(rt):] = acc

    cand, data_dev = parse_pre.precompute_candidates(
        arr, sizes, run_ends, p.hash_bits, p.hash_width)

    # XLA fast parse (oracle)
    max_tokens = N + 2 * run_ends.shape[1] + 8
    st, cfg = make_fast_state(B, data_dev, sizes, dict_sizes, cand,
                              run_ends, max_tokens, p.hash_width,
                              run_types=run_types)
    final, steps_x = run_fast_parse(st, cfg, p.good_len,
                                    jnp.int32(8 * N + 4096))
    tc_x = np.asarray(final["tok_cnt"])
    tk_x = np.asarray(final["tok_kind"])
    ta_x = np.asarray(final["tok_a"])
    tb_x = np.asarray(final["tok_b"])

    # Pallas kernel (interpret)
    candp = parse_pre.pack_candidates(cand)
    w0, w1, tc_k, steps_k = pp.parse_batch_pallas(
        data_dev, candp, sizes, dict_sizes, run_ends, run_types,
        p.good_len, p.hash_width, interpret=True)
    w0 = np.asarray(w0)
    w1 = np.asarray(w1)

    ok = True
    for j in range(B):
        if tc_k[j] != tc_x[j]:
            print(f"[{name}] stream {j}: tok_cnt {tc_k[j]} != {tc_x[j]}")
            ok = False
        n = min(int(tc_k[j]), int(tc_x[j]))
        kk = w0[j, :n] & 7
        bb = w0[j, :n] >> 3
        aa = w1[j, :n]
        mk = kk != tk_x[j, :n]
        mb = bb != tb_x[j, :n]
        ma = (aa != ta_x[j, :n]) & (kk != K_LIT)
        bad = np.flatnonzero(mk | mb | ma)
        if len(bad):
            t0 = int(bad[0])
            print(f"[{name}] stream {j}: first diff at token {t0}: "
                  f"kernel (k={kk[t0]},a={aa[t0]},b={bb[t0]}) vs "
                  f"xla (k={tk_x[j, t0]},a={ta_x[j, t0]},"
                  f"b={tb_x[j, t0]})")
            print("  ctx kernel:",
                  [(int(kk[t]), int(aa[t]), int(bb[t]))
                   for t in range(max(0, t0 - 3), min(n, t0 + 3))])
            print("  ctx xla:   ",
                  [(int(tk_x[j, t]), int(ta_x[j, t]), int(tb_x[j, t]))
                   for t in range(max(0, t0 - 3), min(n, t0 + 3))])
            ok = False
    print(f"[{name}] {'OK' if ok else 'FAIL'} "
          f"(B={B}, steps xla={int(steps_x)} kernel={steps_k})")
    return ok


cases = sys.argv[1:] or ["lit", "text", "runs", "multi", "skip", "far"]
allok = True
rng = np.random.default_rng(7)
if "lit" in cases:
    allok &= run_case("lit", [bytes(rng.integers(0, 250, 400,
                                                 dtype=np.uint8))])
if "text" in cases:
    allok &= run_case("text", [mk_text(3000, 1), mk_text(2500, 2)])
if "runs" in cases:
    allok &= run_case("runs", [b"A" * 2000 + mk_text(800, 3)
                               + b"B" * 1500])
if "multi" in cases:
    allok &= run_case("multi", [mk_text(9000, 4)],
                      run_tables=[[(1, 8192), (1, 808)]])
if "skip" in cases:
    d = mk_text(4000, 5) + bytes(rng.integers(0, 256, 4096,
                                              dtype=np.uint8)) \
        + mk_text(3000, 6)
    allok &= run_case("skip", [d],
                      run_tables=[[(1, 4000), (8, 4096), (1, 3000)]])
if "far" in cases:
    seg = mk_text(1200, 8)
    d = seg + bytes(rng.integers(0, 250, 3000, dtype=np.uint8)) + seg
    allok &= run_case("far", [d])
print("ALL OK" if allok else "FAILURES")
sys.exit(0 if allok else 1)
