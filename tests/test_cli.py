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


def test_est_mem_usage_matches_reference(ref_build, tmp_path, corpus_dir):
    """est_mem_usage replicates CSCEnc_EstMemUsage (csc_enc.cpp:99-112):
    the 'Estimated memory usage: N MB' stderr line must match the
    reference csc binary for every level."""
    import re
    from csc_tpu.props import props_init, est_mem_usage

    src = tmp_path / "in.bin"
    with open(os.path.join(corpus_dir, "corpus_text1m.bin"), "rb") as f:
        src.write_bytes(f.read(200 * 1024))
    for level in (1, 2, 3, 4, 5):
        r = subprocess.run(
            [os.path.join(ref_build, "csc"), "c", f"-m{level}", str(src),
             str(tmp_path / "o.csc")], capture_output=True, text=True)
        m = re.search(r"Estimated memory usage: (\d+) MB", r.stderr)
        assert m, r.stderr
        # reference clamps dict to file size (csc.cpp:133)
        p = props_init(200 * 1024, level)
        assert est_mem_usage(p) // 1048576 == int(m.group(1)), level
