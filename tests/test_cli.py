"""csc CLI surface tests (golden backend; fast paths only)."""
import os
import subprocess
import sys

from csc_tpu.cli import main as cli_main


def test_cli_roundtrip(tmp_path, corpus_dir):
    src = tmp_path / "in.bin"
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        src.write_bytes(f.read(40 * 1024))
    comp = str(tmp_path / "out.csc")
    dec = str(tmp_path / "out.bin")
    assert cli_main(["c", "-m", "2", str(src), comp]) == 0
    assert cli_main(["d", comp, dec]) == 0
    assert open(dec, "rb").read() == src.read_bytes()


def test_cli_matches_reference(ref_build, tmp_path, corpus_dir):
    src = tmp_path / "in.bin"
    with open(os.path.join(corpus_dir, "corpus_exe.bin"), "rb") as f:
        src.write_bytes(f.read(50 * 1024))
    ours = str(tmp_path / "ours.csc")
    ref = str(tmp_path / "ref.csc")
    assert cli_main(["c", "-m", "2", "-d", "51200", str(src), ours]) == 0
    subprocess.run([os.path.join(ref_build, "csc"), "c", "-m2", str(src), ref],
                   check=True, capture_output=True)
    assert open(ours, "rb").read() == open(ref, "rb").read()


def test_cli_filter_flags(tmp_path, corpus_dir):
    """--ftxt0 etc. map to the reference's -ftxt0 family (csc.cpp:52-58)."""
    src = tmp_path / "in.bin"
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        src.write_bytes(f.read(30 * 1024))
    a = str(tmp_path / "a.csc")
    b = str(tmp_path / "b.csc")
    assert cli_main(["c", "-m", "1", str(src), a]) == 0
    assert cli_main(["c", "-m", "1", "--ftxt0", "--fexe0", "--fdelta0",
                     str(src), b]) == 0
    assert os.path.getsize(a) != os.path.getsize(b)  # filters changed output
    dec = str(tmp_path / "dec.bin")
    assert cli_main(["d", b, dec]) == 0
    assert open(dec, "rb").read() == src.read_bytes()
