"""Golden encoder vs the reference C++ binary.

Strongest check: our encoder output is byte-identical to the reference
binary at every level (which requires exact match-finder, parser, analyzer,
filter, and coder emulation).  Also: the reference `decomp` binary decodes
our streams, and round-trips hold.
"""
import os
import subprocess

import pytest

from csc_tpu.golden import compress, decompress


def _ref_compress(ref_build, data, level, tmpdir):
    src = os.path.join(tmpdir, "in.bin")
    dst = os.path.join(tmpdir, "out.csc")
    with open(src, "wb") as f:
        f.write(data)
    subprocess.run([os.path.join(ref_build, "csc"), "c", f"-m{level}", src, dst],
                   check=True, capture_output=True)
    with open(dst, "rb") as f:
        return f.read()


def _ref_decompress(ref_build, blob, tmpdir):
    src = os.path.join(tmpdir, "in.csc")
    dst = os.path.join(tmpdir, "out.bin")
    with open(src, "wb") as f:
        f.write(blob)
    subprocess.run([os.path.join(ref_build, "decomp"), src, dst],
                   check=True, capture_output=True)
    with open(dst, "rb") as f:
        return f.read()


def _our_compress_like_cli(data, level):
    # csc.cpp:133-134 clamps dict to file size
    return compress(data, level=level, dict_size=len(data))


CASES = [
    ("corpus_text1m.bin", 64 * 1024, 1),
    ("corpus_text1m.bin", 64 * 1024, 2),
    ("corpus_exe.bin", 96 * 1024, 1),
    ("corpus_random.bin", 48 * 1024, 1),
    ("corpus_delta.bin", 64 * 1024, 2),
    ("corpus_text1m.bin", 64 * 1024, 3),
    ("corpus_text1m.bin", 48 * 1024, 5),
]


@pytest.mark.parametrize("fname,size,level", CASES)
def test_encode_byte_identical(ref_build, corpus_dir, tmp_path, fname, size, level):
    with open(os.path.join(corpus_dir, fname), "rb") as f:
        data = f.read(size)
    ref = _ref_compress(ref_build, data, level, str(tmp_path))
    ours = _our_compress_like_cli(data, level)
    assert ours == ref


@pytest.mark.parametrize("level", [1, 2])
def test_reference_decodes_ours(ref_build, corpus_dir, tmp_path, level):
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        data = f.read(80 * 1024)
    ours = _our_compress_like_cli(data, level)
    assert _ref_decompress(ref_build, ours, str(tmp_path)) == data


@pytest.mark.parametrize("level", [1, 2, 5])
def test_roundtrip(corpus_dir, level):
    with open(os.path.join(corpus_dir, "corpus_exe.bin"), "rb") as f:
        data = f.read(64 * 1024)
    assert decompress(_our_compress_like_cli(data, level)) == data


def test_roundtrip_tiny():
    for data in [b"", b"a", b"abcabcabcabc" * 10, bytes(range(256)) * 4]:
        blob = compress(data, level=2, dict_size=max(len(data), 1))
        assert decompress(blob) == data
