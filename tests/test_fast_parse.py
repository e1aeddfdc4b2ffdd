"""TPU-native fast parse (precomputed-chain finder): correctness bar.

The fast parse may legally differ from the reference's token choices
(parse_pre.py documents the chain approximation), so the tests assert
what the format requires — round-trip through the golden decoder and
the reference binary — plus the empirically stable m1 byte-identity on
corpora without >=EXT_CAP-quirk matches, and a ratio envelope.
"""
import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from csc_tpu.props import props_init, write_properties
from csc_tpu.golden.encoder import encode_stream
from csc_tpu.golden.api import decompress_stream


@pytest.fixture(autouse=True)
def _force_fast(monkeypatch):
    monkeypatch.setenv("CSC_ENCODE_PARSE", "fast")
    monkeypatch.setenv("CSC_ENCODE_BITS", "scan")


def _props(level=1, ds=32 * 1024):
    p = props_init(ds, level)
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


def test_fast_parse_roundtrip_and_m1_identity(corpus_dir):
    from csc_tpu.ops.pipeline import encode_batch
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(16384)
    datas = [text, _mk_text(3000, 1),
             (b"A" * 5000 + _mk_text(2000, 3) + b"A" * 5000)]
    ps = [_props(1) for _ in datas]
    outs = encode_batch(ps, datas)
    for p, o, d in zip(ps, outs, datas):
        assert decompress_stream(p, o, 0) == d
        # m1 parses have been byte-identical on every test corpus
        assert o == encode_stream(p, d)


def test_fast_parse_m2_ratio_envelope(corpus_dir):
    from csc_tpu.ops.pipeline import encode_batch
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(16384)
    p = _props(2)
    o = encode_batch([p], [text])[0]
    assert decompress_stream(p, o, 0) == text
    g = encode_stream(p, text)
    assert len(o) <= len(g) * 1.06, (len(o), len(g))


def test_fast_parse_reference_binary_decodes(ref_build, tmp_path,
                                             corpus_dir):
    from csc_tpu.ops.pipeline import encode_batch
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        text = f.read(16384)
    p = props_init(len(text), 2)   # filters ON: DT_ENGTXT runs included
    o = encode_batch([p], [text])[0]
    blob = write_properties(p) + o
    src = tmp_path / "f.csc"
    src.write_bytes(blob)
    out = tmp_path / "f.out"
    r = subprocess.run([os.path.join(ref_build, "decomp"), str(src),
                        str(out)], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    assert out.read_bytes() == text


def test_fast_parse_bad_entropy_runs():
    """BAD/ENTROPY payload runs ride the tape (K_RAW/K_ELIT) instead of
    falling back to golden (CompressBad/CompressLiterals,
    csc_model.cpp:448-469); both have been byte-identical."""
    from csc_tpu.ops.pipeline import encode_batch
    from csc_tpu.ops import encode_host
    rng = np.random.default_rng(3)
    rnd = bytes(rng.integers(0, 256, 24000, dtype=np.uint8))
    syms = np.array([3, 17, 58, 91, 130, 171, 202, 251], np.uint8)
    ent = bytes(syms[rng.integers(0, 8, 24000)])
    for d, want_type in ((rnd, 8), (ent, 7)):
        p = props_init(len(d), 2)          # filters ON: analyzer typing
        plan = encode_host.plan_stream(p, d, allow_nolz=True)
        assert plan is not None and plan[1][0][0] == want_type
        o = encode_batch([p], [d])[0]
        assert decompress_stream(p, o, 0) == d
        assert o == encode_stream(p, d)


def _mk_delta(n, chn=4):
    t = np.arange(n // chn)
    cols = [(t // (3 + 2 * i) + 7 * i) % 256 for i in range(chn)]
    return np.stack(cols, 1).astype(np.uint8).reshape(-1).tobytes()[:n]


def test_fast_parse_dlt_rle_runs():
    """DT_DLT runs ride the tape (K_DLIT/K_RLEN through p_delta +
    p_rle_flag, CompressRLE csc_model.cpp:471-513) instead of falling
    back to golden; the RLE skeleton is deterministic, so output is
    byte-identical when typing matches."""
    from csc_tpu.ops.pipeline import encode_batch
    from csc_tpu.ops import encode_host
    d = _mk_delta(24 * 1024)
    p = props_init(len(d), 2)              # filters ON: analyzer typing
    plan = encode_host.plan_stream(p, d, allow_nolz=True)
    assert plan is not None and plan[1][0][0] >= 0x10   # DT_DLT+idx
    o = encode_batch([p], [d])[0]
    assert decompress_stream(p, o, 0) == d
    assert o == encode_stream(p, d)


def test_fast_parse_dlt_rle_long_runs(monkeypatch):
    """Runs >= 11 hit the K_RLEN matchlen_2 escape (incl. the >=143
    long-length loop) on both phase-B backends."""
    from csc_tpu.ops.pipeline import encode_batch
    base = _mk_delta(6 * 1024)
    # splice constant stretches into the delta domain: repeated bytes
    d = bytearray(base)
    d[512:1024] = b"\x42" * 512            # post-delta run of zeros
    d[2048:2400] = bytes(range(88, 132)) * 8
    d = bytes(d)
    p = props_init(len(d), 2)
    for impl in ("scan", "pallas"):
        monkeypatch.setenv("CSC_ENCODE_BITS", impl)
        o = encode_batch([p], [d])[0]
        assert decompress_stream(p, o, 0) == d, impl
        assert o == encode_stream(p, d), impl


def test_rle_tape_skeleton_matches_reference_rule():
    """rle_tape vs a direct transcription of the CompressRLE scan."""
    from csc_tpu.ops.encode_host import rle_tape
    from csc_tpu.ops.encode_bits import K_DLIT, K_RLEN
    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(1, 400))
        vals = rng.integers(0, 4, n).astype(np.uint8)
        if trial % 3 == 0:
            vals = np.repeat(vals, rng.integers(1, 30))[:n]
        ref = []                            # (is_run, byte-or-len, ctx)
        s_ctx, i, size = 0, 0, len(vals)
        while i < size:
            if (i > 0 and size - i > 3 and vals[i - 1] == vals[i]
                    and vals[i] == vals[i + 1] and vals[i] == vals[i + 2]):
                j, length = i + 3, 3
                while j < size and vals[j] == vals[j - 1]:
                    length += 1
                    j += 1
                if length > 10:
                    s_ctx = int(vals[j - 1])
                    ref.append((1, length - 11, 0))
                    i = j
                    continue
            ref.append((0, int(vals[i]), s_ctx))
            s_ctx = int(vals[i])
            i += 1
        kk, aa, bb = rle_tape(vals)
        got = [(1, int(b), 0) if k == K_RLEN else (0, int(a), int(b))
               for k, a, b in zip(kk, aa, bb)]
        assert got == ref, (trial, n)
