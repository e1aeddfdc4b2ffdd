"""Multi-host dp archiver: 2 jax.distributed processes produce one
archive (rank 0 writes), byte-valid for our extractor and the reference
csarc binary.  DCN-shaped test: two local processes, CPU platform,
coordinator over localhost (csarc.cpp:361-400 writer semantics gathered
to the lead rank — see csc_tpu/parallel/dist.py)."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _mk_tree(root):
    os.makedirs(os.path.join(root, "sub"), exist_ok=True)
    import numpy as np
    rng = np.random.default_rng(42)
    files = {
        "a.txt": (b"the quick brown fox " * 400),
        "b.bin": bytes(rng.integers(0, 256, 9000, dtype=np.uint8)),
        "sub/c.txt": (b"compression window entropy " * 300),
        "sub/d.dat": (b"\x01\x02\x03\x04" * 2500),
    }
    for name, data in files.items():
        with open(os.path.join(root, name), "wb") as f:
            f.write(data)
    return files


def _run_rank(pid, nprocs, coord, arcname, tree, cwd):
    env = dict(os.environ)
    env.update({
        "CSC_DIST_COORD": coord,
        "CSC_DIST_NPROCS": str(nprocs),
        "CSC_DIST_PID": str(pid),
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jaxcache-cpu",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    return subprocess.Popen(
        [sys.executable, "-m", "csc_tpu.archiver.csarc", "a", "-r", "-f",
         "-m1", arcname, tree], env=env, cwd=cwd,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)


@pytest.mark.parametrize("nprocs", [2])
def test_distributed_archive(tmp_path, nprocs):
    tree = str(tmp_path / "tree")
    files = _mk_tree(tree)
    arc = str(tmp_path / "out.csa")
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_run_rank(i, nprocs, coord, arc, "tree", str(tmp_path))
             for i in range(nprocs)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, (out.decode(), err.decode())
    assert os.path.exists(arc)

    # our extractor round-trips it
    xdir = tmp_path / "x"
    xdir.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "csc_tpu.archiver.csarc", "x", arc],
        cwd=str(xdir), capture_output=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": REPO + os.pathsep + os.environ.get(
                 "PYTHONPATH", "")})
    assert r.returncode == 0, r.stderr.decode()
    for name, data in files.items():
        with open(os.path.join(str(xdir), "tree", name), "rb") as f:
            assert f.read() == data, name


def test_distributed_archive_ref_extracts(tmp_path, ref_build):
    """The rank-0 archive is bit-valid for the reference csarc binary."""
    tree = str(tmp_path / "tree")
    files = _mk_tree(tree)
    arc = str(tmp_path / "out.csa")
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_run_rank(i, 2, coord, arc, "tree", str(tmp_path))
             for i in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, (out.decode(), err.decode())

    xdir = tmp_path / "refx"
    xdir.mkdir()
    r = subprocess.run([os.path.join(ref_build, "csarc"), "x", arc],
                       cwd=str(xdir), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    for name, data in files.items():
        with open(os.path.join(str(xdir), "tree", name), "rb") as f:
            assert f.read() == data, name
    t = subprocess.run([os.path.join(ref_build, "csarc"), "t", arc],
                       capture_output=True)
    assert t.returncode == 0, t.stderr.decode()
