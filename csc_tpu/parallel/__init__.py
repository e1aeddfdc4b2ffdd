"""Multi-chip sharding of stream batches (SURVEY.md §2.3).

CSC's parallelism units are independent compressed streams: archiver
tasks/solid groups (dp) and -p byte-range splits of one file (sp).  Both
are batch shardings — the codec state of one stream never crosses devices,
so the hot path needs no collectives and scales linearly by construction.
"""

from .mesh import make_stream_mesh, shard_state, decode_batch_sharded  # noqa: F401
