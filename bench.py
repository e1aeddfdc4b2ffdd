#!/usr/bin/env python3
"""Benchmark: batched TPU decode throughput (Pallas lockstep kernel).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference C++ decoder is single-stream, single-core; on
this corpus at -m1 it measures 30.9 MB/s (BASELINE.md).  The TPU path
decodes B independent streams in lockstep (the archiver's task/-p
parallelism model), so the honest comparison is aggregate end-to-end
decode MB/s on one chip (host demux + kernel + inverse filters) vs one
reference core.  Extra keys report the per-step kernel cost and the
encode path for trend tracking.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_DEC_MBPS = 30.9   # BASELINE.md: corpus_text -m1 decode, 1 core
REF_ENC_MBPS = 13.8   # BASELINE.md: corpus_text -m1 encode, 1 core


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from csc_tpu.golden import compress
    from csc_tpu.props import read_properties
    from csc_tpu.ops.pipeline import decode_batch

    # corpus: python stdlib text (deterministic; Silesia unavailable)
    import glob
    bufs, total = [], 0
    for f in sorted(glob.glob("/usr/lib/python3*/*.py")):
        with open(f, "rb") as fh:
            bufs.append(fh.read())
        total += len(bufs[-1])
        if total > 4 * 1024 * 1024:
            break
    data = b"".join(bufs)

    B = int(os.environ.get("BENCH_STREAMS", "128"))
    CH = int(os.environ.get("BENCH_CHUNK", str(16 * 1024)))
    need = B * CH
    while len(data) < need:
        data += data
    chunks = [data[i * CH:(i + 1) * CH] for i in range(B)]
    import pickle
    cache = f"/tmp/bench_blobs_{B}_{CH}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            blobs = pickle.load(f)
    else:
        blobs = [compress(c, level=1, dict_size=len(c)) for c in chunks]
        with open(cache, "wb") as f:
            pickle.dump(blobs, f)
    props = [read_properties(b[:10]) for b in blobs]

    # compile + warm
    outs = decode_batch(props, blobs, [10] * B, out_sizes=[CH] * B)
    ok = all(o == c for o, c in zip(outs, chunks))

    os.environ["CSC_DECODE_TIMING"] = "1"
    t0 = time.time()
    outs = decode_batch(props, blobs, [10] * B, out_sizes=[CH] * B)
    t1 = time.time()
    del os.environ["CSC_DECODE_TIMING"]
    ok = ok and all(o == c for o, c in zip(outs, chunks))

    mbps = (B * CH) / (t1 - t0) / 1e6
    from csc_tpu.ops import pallas_decode as _pd
    kmbps = ((B * CH) / _pd.LAST_KERNEL_SECONDS / 1e6
             if _pd.LAST_KERNEL_SECONDS else 0.0)

    # encode metric (fast parse + Pallas phase B); round-trip verified
    from csc_tpu.ops.pipeline import encode_batch
    from csc_tpu.props import props_init
    EB = int(os.environ.get("BENCH_ENC_STREAMS", "96"))
    eprops = [props_init(CH, 1) for _ in range(EB)]
    for p in eprops:
        p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    enc_in = chunks[:EB]
    eouts = encode_batch(eprops, enc_in)         # compile + warm
    t2 = time.time()
    eouts = encode_batch(eprops, enc_in)
    t3 = time.time()
    eok = all(decode_batch([p], [o], [0], out_sizes=[CH])[0] == d
              for p, o, d in zip(eprops[:4], eouts[:4], enc_in[:4]))
    embps = (EB * CH) / (t3 - t2) / 1e6

    print(json.dumps({
        "metric": "batched_decode_throughput"
                  + ("" if ok and eok else "_INVALID"),
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / REF_DEC_MBPS, 4),
        "streams": B,
        "chunk_bytes": CH,
        "wall_s": round(t1 - t0, 3),
        "decode_kernel_mbps": round(kmbps, 3),
        "encode_mbps": round(embps, 3),
        "encode_vs_ref_1core": round(embps / REF_ENC_MBPS, 4),
    }))
    return 0 if (ok and eok) else 1


if __name__ == "__main__":
    sys.exit(main())
