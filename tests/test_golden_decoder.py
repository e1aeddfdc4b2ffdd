"""Golden decoder vs the reference C++ binary: decode reference-produced
.csc files bit-for-bit (SURVEY.md §4 acceptance (b))."""
import os
import subprocess

import pytest

from csc_tpu.golden import decompress


def _ref_compress(ref_build, data, level, dict_size=None, tmpdir="/tmp"):
    src = os.path.join(tmpdir, "ref_in.bin")
    dst = os.path.join(tmpdir, "ref_out.csc")
    with open(src, "wb") as f:
        f.write(data)
    args = [os.path.join(ref_build, "csc"), "c", f"-m{level}"]
    if dict_size:
        args.append(f"-d{dict_size}")
    args += [src, dst]
    subprocess.run(args, check=True, capture_output=True)
    with open(dst, "rb") as f:
        return f.read()


CASES = [
    # (corpus file, slice size, level)
    ("corpus_text1m.bin", 64 * 1024, 1),
    ("corpus_text1m.bin", 64 * 1024, 2),
    ("corpus_text1m.bin", 200 * 1024, 5),
    ("corpus_exe.bin", 128 * 1024, 2),
    ("corpus_random.bin", 64 * 1024, 2),
    ("corpus_delta.bin", 256 * 1024, 2),
    ("corpus_text1m.bin", 100 * 1024, 3),
    ("corpus_text1m.bin", 100 * 1024, 4),
]


@pytest.mark.parametrize("fname,size,level", CASES)
def test_decode_reference_stream(ref_build, corpus_dir, tmp_path, fname, size, level):
    with open(os.path.join(corpus_dir, fname), "rb") as f:
        data = f.read(size)
    blob = _ref_compress(ref_build, data, level, tmpdir=str(tmp_path))
    assert decompress(blob) == data


def test_decode_mixed_types(ref_build, corpus_dir, tmp_path):
    """One stream mixing text, exe, random, delta content → exercises all
    block types and type-run merging."""
    parts = []
    for fname, size in [("corpus_text1m.bin", 40 * 1024),
                        ("corpus_random.bin", 20 * 1024),
                        ("corpus_exe.bin", 40 * 1024),
                        ("corpus_delta.bin", 30 * 1024),
                        ("corpus_text1m.bin", 30 * 1024)]:
        with open(os.path.join(corpus_dir, fname), "rb") as f:
            parts.append(f.read(size))
    data = b"".join(parts)
    blob = _ref_compress(ref_build, data, 2, tmpdir=str(tmp_path))
    assert decompress(blob) == data
