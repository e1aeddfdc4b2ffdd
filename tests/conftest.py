import os
import subprocess
import sys

# Simulate an 8-device mesh on CPU for all sharding tests; the TPU bench
# path sets its own platform explicitly.  (The environment pins
# JAX_PLATFORMS=axon for the real chip — tests must override, not default.)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)
# persistent XLA compile cache: the scan kernels take minutes to compile
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache-cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# The axon environment routes compiles through a remote service targeting
# the TPU host's CPU (avx512); executing those artifacts here miscomputes
# silently.  Always compile locally for CPU tests.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize (axon plugin) imports jax at interpreter start, snapshotting
# JAX_PLATFORMS=axon before this file runs; the env override above is then
# ignored.  Force the platform via config (works while backends are
# uninitialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-cpu")

import pytest  # noqa: E402

REF_SRC = "/root/reference/src"
REF_BUILD = "/tmp/refbuild"


def _ensure_ref_build():
    csc = os.path.join(REF_BUILD, "csc")
    if os.path.exists(csc):
        return REF_BUILD
    if not os.path.isdir(REF_SRC):
        return None
    import shutil
    shutil.copytree(REF_SRC, REF_BUILD, dirs_exist_ok=True)
    r = subprocess.run(["make", "-j4"], cwd=REF_BUILD, capture_output=True)
    if r.returncode != 0 or not os.path.exists(csc):
        return None
    return REF_BUILD


@pytest.fixture(scope="session")
def ref_build():
    """Path to a built reference checkout, or skip."""
    path = _ensure_ref_build()
    if path is None:
        pytest.skip("reference build unavailable")
    return path


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic test corpora (see tools/make_corpus.py)."""
    d = tmp_path_factory.mktemp("corpus")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import make_corpus
    make_corpus.build(str(d))
    return str(d)
