"""Device-side tape stitch (stitch_dev.py) vs the host stitcher.

The stitched tape feeds phase B directly, so the correctness bar is
byte-identical output streams between the two stitch paths on every
run-type mix the device stitch accepts (LZ / ENGTXT headers / BAD /
ENTROPY payloads, chunk flushes), plus golden-decoder round-trip."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from csc_tpu.props import props_init
from csc_tpu.golden.api import decompress_stream


def _props(level=1, ds=32 * 1024, filters=False):
    p = props_init(ds, level)
    if not filters:
        p.DLTFilter = p.EXEFilter = p.TXTFilter = 0
    return p


def _mk_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"compression", b"window",
             b"entropy", b"coder", b"range", b"match", b"finder"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
    return bytes(out[:n])


def _encode_both(ps, datas, monkeypatch):
    from csc_tpu.ops.pipeline import encode_batch
    monkeypatch.setenv("CSC_ENCODE_PARSE", "fast")
    # host stitch (scan bits): the validated baseline
    monkeypatch.setenv("CSC_ENCODE_BITS", "scan")
    host = encode_batch(ps, datas)
    # device stitch + pallas bits (interpret on CPU)
    monkeypatch.setenv("CSC_ENCODE_BITS", "pallas")
    dev = encode_batch(ps, datas)
    return host, dev


def test_stitch_dev_matches_host_lz(monkeypatch, corpus_dir):
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(16384)
    datas = [text, _mk_text(5000, 1)]
    ps = [_props(1) for _ in datas]
    host, dev = _encode_both(ps, datas, monkeypatch)
    for p, h, d, raw in zip(ps, host, dev, datas):
        assert h == d
        assert decompress_stream(p, d, 0) == raw


def test_stitch_dev_engtxt_headers_and_multichunk(monkeypatch,
                                                  corpus_dir):
    # filters on -> DT_ENGTXT runs with declared-size headers; small
    # raw_blocksize -> chunk-flush tails mid-stream
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(40000)
    p = props_init(64 * 1024, 2)
    p.raw_blocksize = 16384
    host, dev = _encode_both([p], [text], monkeypatch)
    assert host[0] == dev[0]
    assert decompress_stream(p, dev[0], 0) == text


def test_stitch_dev_bad_entropy_payloads(monkeypatch):
    rng = np.random.default_rng(3)
    rnd = bytes(rng.integers(0, 256, 12000, dtype=np.uint8))  # DT_BAD
    few = bytes(rng.integers(0, 4, 9000, dtype=np.uint8) * 67)  # entropy-ish
    mixed = _mk_text(8192, 5) + bytes(
        rng.integers(0, 256, 8192, dtype=np.uint8))
    datas = [rnd, few, mixed]
    ps = [_props(1, filters=True) for _ in datas]
    host, dev = _encode_both(ps, datas, monkeypatch)
    for p, h, d, raw in zip(ps, host, dev, datas):
        assert h == d
        assert decompress_stream(p, d, 0) == raw


def test_stitch_dev_dlt_aux_tape(monkeypatch, corpus_dir):
    # DT_DLT runs ride the packed aux token tape (stitch_dev module
    # docstring; csc_model.cpp:471-513 CompressRLE skeleton) instead of
    # forcing the whole stream onto the host stitcher
    with open(os.path.join(corpus_dir, "corpus_delta.bin"), "rb") as f:
        delta = f.read()
    datas = [delta[:8192], _mk_text(8192, 7),
             delta[8192:16384] + _mk_text(4096, 8)]
    ps = [props_init(len(d), 2) for d in datas]
    host, dev = _encode_both(ps, datas, monkeypatch)
    from csc_tpu.ops import pipeline
    assert pipeline.LAST_ENCODE_FALLBACKS == 0
    for p, h, d, raw in zip(ps, host, dev, datas):
        assert h == d
        assert decompress_stream(p, d, 0) == raw
