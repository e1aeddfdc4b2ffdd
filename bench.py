#!/usr/bin/env python3
"""Benchmark: batched TPU decode throughput on the text corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C++ decoder is single-stream, single-core; on this
corpus at -m1 it measures ~20-30 MB/s (BASELINE.md, corpus_text m1 dec
30.9 MB/s — we use that, the fastest measured reference config).  The TPU
path decodes B independent streams in lockstep (the archiver's task/-p
parallelism model), so the honest comparison is aggregate decode MB/s on
one chip vs one reference core.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_DEC_MBPS = 30.9   # BASELINE.md: corpus_text -m1 decode, 1 core


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tpu")
    import numpy as np
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from csc_tpu.golden import compress
    from csc_tpu.props import read_properties
    from csc_tpu.ops import framing
    from csc_tpu.ops.decode_scan import make_decode_state, run_decode

    # corpus: python stdlib text (deterministic; Silesia unavailable offline)
    import glob
    bufs = []
    total = 0
    for f in sorted(glob.glob("/usr/lib/python3.11/*.py")):
        with open(f, "rb") as fh:
            bufs.append(fh.read())
        total += len(bufs[-1])
        if total > 4 * 1024 * 1024:
            break
    data = b"".join(bufs)

    B = int(os.environ.get("BENCH_STREAMS", "64"))
    CH = int(os.environ.get("BENCH_CHUNK", str(16 * 1024)))
    need = B * CH
    while len(data) < need:
        data += data
    chunks = [data[i * CH:(i + 1) * CH] for i in range(B)]
    blobs = [compress(c, level=1, dict_size=len(c)) for c in chunks]
    props = read_properties(blobs[0][:10])
    rcs, bcs, res, bes = [], [], [], []
    for b in blobs:
        rc, bc, re_, be_ = framing.demux_stream(b, 10, props.csc_blocksize)
        rcs.append(rc)
        bcs.append(bc)
        res.append(re_)
        bes.append(be_)
    rcp = framing.batch_pad(rcs, 0, np.uint8)
    bcp = framing.batch_pad(bcs, 0, np.uint8)
    ree = framing.pad_ends(res)
    bee = framing.pad_ends(bes)
    wnd = CH + 10 * 1024 + 16

    f = jax.jit(run_decode, static_argnums=(1,))
    # warm-up / compile
    st = make_decode_state(B, wnd, rcp, bcp, ree, bee)
    fin, steps = f(st, wnd, np.int32(50_000_000))
    _ = np.asarray(fin["wnd"][:1, :1])

    st = make_decode_state(B, wnd, rcp, bcp, ree, bee)
    t0 = time.time()
    fin, steps = f(st, wnd, np.int32(50_000_000))
    w = np.asarray(fin["wnd"])          # host transfer forces completion
    t1 = time.time()

    pos = np.asarray(fin["wnd_pos"])
    done = np.asarray(fin["done"])
    ok = bool(done.all())
    # correctness spot check on the raw window (text blocks may be
    # ENGTXT-filtered in-window; decode via the full pipeline for 4 streams)
    from csc_tpu.ops.pipeline import decode_batch
    outs = decode_batch([props] * 4, blobs[:4], [10] * 4,
                        out_sizes=[CH] * 4)
    ok = ok and all(o == c for o, c in zip(outs, chunks[:4]))

    mbps = (B * CH) / (t1 - t0) / 1e6
    print(json.dumps({
        "metric": "batched_decode_throughput" + ("" if ok else "_INVALID"),
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / REF_DEC_MBPS, 4),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
