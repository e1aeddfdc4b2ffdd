"""Archiver format parity: round-trip, cross-compat with reference csarc."""
import os
import subprocess

import pytest

from csc_tpu.archiver.csarc import main as csarc_main
from csc_tpu.archiver.adler32 import adler32, adler32_combine


def _mktree(root):
    os.makedirs(os.path.join(root, "sub"), exist_ok=True)
    files = {
        "a.txt": b"hello world, this is a text file.\n" * 300,
        "b.txt": b"the quick brown fox jumps over the lazy dog\n" * 500,
        "data.bin": bytes((i * 7 + 3) & 0xFF for i in range(50000)),
        "sub/c.txt": b"nested file content here\n" * 200,
        "sub/empty": b"",
    }
    for name, content in files.items():
        p = os.path.join(root, name)
        with open(p, "wb") as f:
            f.write(content)
    return files


def _tree_bytes(root):
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as f:
                out[rel] = f.read()
    return out


def test_adler32_combine():
    a = b"hello world" * 100
    b = b"foo bar baz" * 123
    c1 = adler32(a, 0)
    c2 = adler32(b, 0)
    assert adler32_combine(c1, c2, len(b)) == adler32(b, adler32(a, 0))


def test_roundtrip_ours(tmp_path):
    src = tmp_path / "src"
    files = _mktree(str(src))
    arc = str(tmp_path / "test.csa")
    out = str(tmp_path / "out")
    cwd = os.getcwd()
    try:
        os.chdir(str(src))
        assert csarc_main(["a", "-r", "-f", arc, "."]) == 0
    finally:
        os.chdir(cwd)
    assert csarc_main(["l", arc]) == 0
    assert csarc_main(["t", arc]) == 0
    os.makedirs(out, exist_ok=True)
    assert csarc_main(["x", "-o", out, arc]) == 0
    got = {os.path.normpath(k): v for k, v in _tree_bytes(out).items()}
    for name, content in files.items():
        assert got[os.path.normpath(name)] == content


def test_reference_extracts_ours(ref_build, tmp_path):
    src = tmp_path / "src"
    files = _mktree(str(src))
    arc = str(tmp_path / "ours.csa")
    out = str(tmp_path / "refout")
    cwd = os.getcwd()
    try:
        os.chdir(str(src))
        assert csarc_main(["a", "-r", "-f", arc, "."]) == 0
    finally:
        os.chdir(cwd)
    os.makedirs(out, exist_ok=True)
    r = subprocess.run([os.path.join(ref_build, "csarc"), "x", "-o", out, arc],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    got = {os.path.normpath(k): v for k, v in _tree_bytes(out).items()}
    for name, content in files.items():
        assert got[os.path.normpath(name)] == content
    # reference `t` (checksum verify) must also pass
    r = subprocess.run([os.path.join(ref_build, "csarc"), "t", arc],
                       capture_output=True)
    assert r.returncode == 0
    assert b"failed" not in r.stderr


def test_ours_extracts_reference(ref_build, tmp_path):
    src = tmp_path / "src"
    files = _mktree(str(src))
    arc = str(tmp_path / "ref.csa")
    out = str(tmp_path / "ourout")
    r = subprocess.run([os.path.join(ref_build, "csarc"), "a", "-r", "-f",
                        arc, "."], capture_output=True, cwd=str(src))
    assert r.returncode == 0, r.stderr
    os.makedirs(out, exist_ok=True)
    assert csarc_main(["x", "-o", out, arc]) == 0
    got = {os.path.normpath(k): v for k, v in _tree_bytes(out).items()}
    for name, content in files.items():
        assert got[os.path.normpath(name)] == content


def test_ours_tests_reference_archive(ref_build, tmp_path):
    src = tmp_path / "src"
    _mktree(str(src))
    arc = str(tmp_path / "ref2.csa")
    r = subprocess.run([os.path.join(ref_build, "csarc"), "a", "-r", "-f",
                        arc, "."], capture_output=True, cwd=str(src))
    assert r.returncode == 0, r.stderr
    assert csarc_main(["t", arc]) == 0


def test_single_file_split(tmp_path):
    big = tmp_path / "big.bin"
    data = (b"some repetitive data pattern " * 200000)[:4 * 1048576]
    big.write_bytes(data)
    arc = str(tmp_path / "split.csa")
    out = str(tmp_path / "splitout")
    assert csarc_main(["a", "-f", "-p3", arc, str(big)]) == 0
    os.makedirs(out, exist_ok=True)
    assert csarc_main(["x", "-o", out, arc]) == 0
    extracted = _tree_bytes(out)
    assert list(extracted.values())[0] == data


def test_tpu_backend_extract(tmp_path):
    src = tmp_path / "src"
    files = _mktree(str(src))
    arc = str(tmp_path / "tpu.csa")
    out = str(tmp_path / "tpuout")
    cwd = os.getcwd()
    try:
        os.chdir(str(src))
        assert csarc_main(["a", "-r", "-f", arc, "."]) == 0
    finally:
        os.chdir(cwd)
    os.makedirs(out, exist_ok=True)
    assert csarc_main(["x", "--backend=tpu", "-o", out, arc]) == 0
    got = {os.path.normpath(k): v for k, v in _tree_bytes(out).items()}
    for name, content in files.items():
        assert got[os.path.normpath(name)] == content


def test_wildcard_selection(tmp_path):
    src = tmp_path / "src"
    files = _mktree(str(src))
    arc = str(tmp_path / "w.csa")
    out = str(tmp_path / "wout")
    cwd = os.getcwd()
    try:
        os.chdir(str(src))
        assert csarc_main(["a", "-r", "-f", arc, "."]) == 0
    finally:
        os.chdir(cwd)
    os.makedirs(out, exist_ok=True)
    # extract only *.txt (ispath wildcard match, csarc.cpp:17-37)
    assert csarc_main(["x", "-o", out, arc, "*.txt"]) == 0
    got = {os.path.normpath(k) for k in _tree_bytes(out)}
    assert any(k.endswith("a.txt") for k in got)
    assert not any(k.endswith("data.bin") for k in got)


def test_mtime_mode_restore(tmp_path):
    src = tmp_path / "src"
    _mktree(str(src))
    special = src / "a.txt"
    os.chmod(str(special), 0o640)
    os.utime(str(special), (1500000000, 1500000000))
    arc = str(tmp_path / "m.csa")
    out = str(tmp_path / "mout")
    cwd = os.getcwd()
    try:
        os.chdir(str(src))
        assert csarc_main(["a", "-r", "-f", arc, "."]) == 0
    finally:
        os.chdir(cwd)
    os.makedirs(out, exist_ok=True)
    assert csarc_main(["x", "-o", out, arc]) == 0
    restored = os.path.join(out, "a.txt")
    st = os.stat(restored)
    assert (st.st_mode & 0o777) == 0o640
    # decimal_time round-trips to second granularity
    assert abs(st.st_mtime - 1500000000) < 2


def test_mt8_roundtrip(tmp_path):
    src = tmp_path / "src"
    files = _mktree(str(src))
    arc = str(tmp_path / "t8.csa")
    out = str(tmp_path / "t8out")
    cwd = os.getcwd()
    try:
        os.chdir(str(src))
        assert csarc_main(["a", "-r", "-f", "-t8", arc, "."]) == 0
    finally:
        os.chdir(cwd)
    assert csarc_main(["t", "-t8", arc]) == 0
    os.makedirs(out, exist_ok=True)
    assert csarc_main(["x", "-t8", "-o", out, arc]) == 0
    got = {os.path.normpath(k): v for k, v in _tree_bytes(out).items()}
    for name, content in files.items():
        assert got[os.path.normpath(name)] == content


def test_reference_archive_list_matches(ref_build, tmp_path):
    """`l` output lists the same files/sizes as the reference's own list."""
    import subprocess
    src = tmp_path / "src"
    _mktree(str(src))
    arc = str(tmp_path / "l.csa")
    r = subprocess.run([os.path.join(ref_build, "csarc"), "a", "-r", "-f",
                        arc, "."], capture_output=True, cwd=str(src))
    assert r.returncode == 0
    ref = subprocess.run([os.path.join(ref_build, "csarc"), "l", arc],
                         capture_output=True, text=True)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert csarc_main(["l", arc]) == 0
    ours = {ln.split()[0]: ln.split()[1] for ln in buf.getvalue().splitlines()
            if ln.strip()}
    theirs = {ln.split()[0]: ln.split()[1] for ln in ref.stdout.splitlines()
              if ln.strip() and not ln.startswith("CSArc")}
    assert ours == theirs
