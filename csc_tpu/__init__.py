"""csc_tpu — a TPU-native rebuild of the CSC compression framework.

Two products, mirroring the reference (fusiyuan2010/CSC):

* ``csc_tpu.golden`` — a pure-Python, bit-exact implementation of the CSC
  stream format (libcsc).  It is the correctness oracle for every TPU kernel
  and the fallback codec for rarely-hit block types.
* ``csc_tpu.ops`` / ``csc_tpu.parallel`` — the TPU compute path: batched
  multi-stream kernels (JAX/XLA/Pallas) plus mesh sharding of independent
  archiver tasks.
* ``csc_tpu.archiver`` — the CSArc-compatible multithreaded archiver.

Format reference: /root/reference/src/libcsc (see SURVEY.md §3.5).
"""

__version__ = "0.1.0"

from .props import CSCProps, props_init, write_properties, read_properties  # noqa: F401
