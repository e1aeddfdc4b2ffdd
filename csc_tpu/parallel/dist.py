"""Multi-host distributed runtime for the archiver dp axis.

The reference scales with threads inside one process (csarc.cpp:338-474:
compress_mt workers pull tasks, the writer records each task's archive
blocks + per-file frags in completion order).  The TPU-native analogue
spans *hosts*: every process compresses a deterministic subset of the
task list with its local chip(s), then the per-task streams are gathered
to process 0 over the fabric, which lays out the archive in task order
and writes the index trailer — the same frag bookkeeping
(csarc.cpp:361-400), executed once on the lead host.

Process group setup is standard `jax.distributed` (coordinator + rank),
configured explicitly or via CSC_DIST_* environment variables so the
archiver CLI works unchanged under any launcher (mpirun, k8s, slurm):

    CSC_DIST_COORD=host0:29500 CSC_DIST_NPROCS=4 CSC_DIST_PID=k \
        python -m csc_tpu.archiver.csarc a arc.csa tree/

Payload transport: device all_gather over DCN/ICI (process_allgather on
u8 arrays, gloo/ICI under the hood), with the coordination-service
key-value store as fallback for platforms without cross-process
collectives.
"""
import os

import numpy as np
import jax

_ENV_COORD = "CSC_DIST_COORD"
_ENV_NPROCS = "CSC_DIST_NPROCS"
_ENV_PID = "CSC_DIST_PID"

_initialized = False


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Join the process group.  No-op for single-process runs (the
    default when neither arguments nor CSC_DIST_* env are present)."""
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROCS):
        num_processes = int(os.environ[_ENV_NPROCS])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])
    if not coordinator or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id or 0)
    _initialized = True
    return True


def is_distributed():
    return _initialized and jax.process_count() > 1


def process_index():
    return jax.process_index() if _initialized else 0


def process_count():
    return jax.process_count() if _initialized else 1


def allgather_bytes(payload: bytes):
    """All-gather one byte string per process; returns a list of
    process_count() byte strings, indexed by rank.  Rides the device
    fabric (length-padded u8 all_gather); falls back to the coordination
    service KV store when cross-process device collectives are
    unavailable on the platform."""
    if not is_distributed():
        return [payload]
    try:
        from jax.experimental import multihost_utils
        n = np.array([len(payload)], np.int64)
        lens = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
        maxlen = max(int(lens.max()), 1)
        buf = np.zeros(maxlen, np.uint8)
        buf[:len(payload)] = np.frombuffer(payload, np.uint8)
        g = np.asarray(multihost_utils.process_allgather(buf))
        return [g[i, :int(lens[i])].tobytes() for i in range(len(lens))]
    except Exception:
        return _allgather_bytes_kv(payload)


def _allgather_bytes_kv(payload: bytes):
    """KV-store fallback: post base85 chunks under per-rank keys, then
    blocking-get every other rank's.  Control-plane bandwidth only — fine
    for index-sized payloads, the collective path is preferred for
    data."""
    import base64
    from jax._src import distributed
    client = distributed.global_state.client
    pid, n = process_index(), process_count()
    epoch = _next_epoch()
    chunk = 1 << 20
    data = base64.b85encode(payload).decode("ascii")
    parts = [data[i:i + chunk] for i in range(0, len(data), chunk)] or [""]
    client.key_value_set(f"csc/ag{epoch}/{pid}/n", str(len(parts)))
    for i, part in enumerate(parts):
        client.key_value_set(f"csc/ag{epoch}/{pid}/{i}", part)
    out = []
    for r in range(n):
        if r == pid:
            out.append(payload)
            continue
        k = int(client.blocking_key_value_get(f"csc/ag{epoch}/{r}/n",
                                              600_000))
        s = "".join(client.blocking_key_value_get(f"csc/ag{epoch}/{r}/{i}",
                                                  600_000)
                    for i in range(k))
        out.append(base64.b85decode(s))
    return out


_epoch = 0


def _next_epoch():
    global _epoch
    _epoch += 1
    return _epoch


def barrier(name="csc_barrier"):
    if is_distributed():
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"{name}{_next_epoch()}")
