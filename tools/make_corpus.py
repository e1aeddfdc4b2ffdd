#!/usr/bin/env python3
"""Generate deterministic test corpora for csc_tpu benchmarks and tests.

Silesia/enwik are unavailable offline; these stand-ins exercise the same codec
paths (reference analyzer types, csc_analyzer.cpp:184-239): English-ish text
(DT_ENGTXT), x86-64 executable (DT_EXE), high-entropy random (DT_BAD),
channel-structured data (DT_DLT).
"""
import argparse
import glob
import os
import random
import sys


def build(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)

    files = sorted(glob.glob('/usr/lib/python3.11/*.py'))
    buf = b''
    for f in files:
        with open(f, 'rb') as fh:
            buf += fh.read()
        if len(buf) > 8 * 1024 * 1024:
            break
    with open(os.path.join(outdir, 'corpus_text.bin'), 'wb') as fh:
        fh.write(buf[:8 * 1024 * 1024])
    with open(os.path.join(outdir, 'corpus_text1m.bin'), 'wb') as fh:
        fh.write(buf[:1024 * 1024])

    with open('/usr/bin/python3.11', 'rb') as fh:
        exe = fh.read()
    with open(os.path.join(outdir, 'corpus_exe.bin'), 'wb') as fh:
        fh.write(exe)

    rng = random.Random(42)
    with open(os.path.join(outdir, 'corpus_random.bin'), 'wb') as fh:
        fh.write(bytes(rng.getrandbits(8) for _ in range(1024 * 1024)))

    # 4-channel slowly-varying data: triggers DT_DLT with channel idx 4.
    vals = []
    x = [1000, 2000, 3000, 4000]
    for i in range(256 * 1024):
        c = i % 4
        x[c] = (x[c] + rng.randint(-3, 3)) & 0xFFFF
        vals.append(x[c] & 0xFF)
    with open(os.path.join(outdir, 'corpus_delta.bin'), 'wb') as fh:
        fh.write(bytes(vals))

    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        print(name, os.path.getsize(p))


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('outdir', nargs='?', default='/tmp/csc_corpus')
    args = ap.parse_args()
    build(args.outdir)
