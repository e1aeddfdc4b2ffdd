"""Pallas parse kernel (interpret mode) vs the XLA fast parse.

Token-tape identity is covered by tools/dev_pallas_parse.py cases; here
the bar is end-to-end: the kernel-parse + device-stitch + pallas-bits
pipeline must produce byte-identical streams to the validated XLA
fast-parse + host-stitch + scan-bits pipeline, and round-trip through
the golden decoder."""
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
    monkeypatch.setenv("CSC_ENCODE_BITS", "scan")
    ref = encode_batch(ps, datas)
    monkeypatch.setenv("CSC_ENCODE_PARSE", "pallas")
    monkeypatch.setenv("CSC_ENCODE_BITS", "pallas")
    ker = encode_batch(ps, datas)
    return ref, ker


def test_pallas_parse_text_batch(monkeypatch, corpus_dir):
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(16384)
    datas = [text, _mk_text(5000, 1),
             b"A" * 3000 + _mk_text(1000, 2) + b"A" * 2000]
    ps = [_props(1) for _ in datas]
    ref, ker = _encode_both(ps, datas, monkeypatch)
    for p, r, k, raw in zip(ps, ref, ker, datas):
        assert r == k
        assert decompress_stream(p, k, 0) == raw


def test_pallas_parse_m2_filters_multichunk(monkeypatch, corpus_dir):
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(40000)
    p = props_init(64 * 1024, 2)
    p.raw_blocksize = 16384
    ref, ker = _encode_both([p], [text], monkeypatch)
    assert ref[0] == ker[0]
    assert decompress_stream(p, ker[0], 0) == text


def test_pallas_parse_bad_entropy(monkeypatch):
    rng = np.random.default_rng(3)
    mixed = _mk_text(8192, 5) + bytes(
        rng.integers(0, 256, 8192, dtype=np.uint8)) + _mk_text(4000, 6)
    ps = [_props(1, filters=True)]
    ref, ker = _encode_both(ps, [mixed], monkeypatch)
    assert ref[0] == ker[0]
    assert decompress_stream(ps[0], ker[0], 0) == mixed


def _mk_delta(n, chn=4):
    t = np.arange(n // chn)
    cols = [(t // (3 + 2 * i) + 7 * i) % 256 for i in range(chn)]
    return np.stack(cols, 1).astype(np.uint8).reshape(-1).tobytes()[:n]


def test_pallas_parse_dlt_aux_tape(monkeypatch):
    """DT_DLT runs ride the aux tape on the KERNEL-parse device-stitch
    path too (ADVICE r4: the fast-parse path had coverage, this one
    did not): byte-identical to the XLA fast-parse pipeline and
    round-trips."""
    d = _mk_delta(24 * 1024)
    mix = _mk_text(8192, 5) + _mk_delta(16 * 1024) + _mk_text(4096, 6)
    datas = [d, mix]
    ps = [props_init(len(x), 2) for x in datas]   # filters ON: DLT typing
    from csc_tpu.ops import encode_host
    plan = encode_host.plan_stream(ps[0], d, allow_nolz=True)
    assert plan is not None and plan[1][0][0] >= 0x10  # DT_DLT+idx run
    ref, ker = _encode_both(ps, datas, monkeypatch)
    assert ker == ref
    for p, o, x in zip(ps, ker, datas):
        assert decompress_stream(p, o, 0) == x
