"""Native host runtime vs golden: filters, adler32, analyzer parity."""
import os
import random

import pytest

from csc_tpu import native
from csc_tpu.golden import filters as gf
from csc_tpu.golden import analyzer as ga
from csc_tpu.archiver.adler32 import adler32 as py_adler


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_adler32_parity():
    rng = random.Random(1)
    for n in (0, 1, 5551, 5552, 5553, 100000):
        data = bytes(rng.getrandbits(8) for _ in range(n))
        assert native.adler32(data, 0) == py_adler(data, 0)
        assert native.adler32(data, 0x12345678) == py_adler(data, 0x12345678)


def test_e89_parity(corpus_dir):
    with open(os.path.join(corpus_dir, "corpus_exe.bin"), "rb") as f:
        data = f.read(96 * 1024)
    a = bytearray(data)
    b = bytearray(data)
    native.e89_forward(a)
    gf.forward_e89(b, len(b))
    assert a == b
    a2 = bytearray(a)
    native.e89_inverse(a2)
    assert bytes(a2) == data


def test_delta_parity(corpus_dir):
    with open(os.path.join(corpus_dir, "corpus_delta.bin"), "rb") as f:
        data = f.read(32 * 1024)
    for chn in (1, 2, 3, 4, 8):
        a = bytearray(data)
        b = bytearray(data)
        native.delta_forward(a, chn)
        gf.forward_delta(b, len(b), chn)
        assert a == b
        native.delta_inverse(a, chn)
        assert bytes(a) == data


def test_analyzer_parity(corpus_dir):
    for fname in ("corpus_text1m.bin", "corpus_exe.bin", "corpus_random.bin",
                  "corpus_delta.bin"):
        with open(os.path.join(corpus_dir, fname), "rb") as f:
            data = f.read(64 * 1024)
        for off in range(0, len(data), 8192):
            blk = data[off:off + 8192]
            assert native.analyze(blk) == ga.analyze(blk, len(blk)), \
                (fname, off)
