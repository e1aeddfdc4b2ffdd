"""Bit-exact pure-Python implementation of the CSC stream format.

This is the *oracle*: every TPU kernel in csc_tpu.ops is validated against it,
and it decodes/encodes streams byte-identically to the reference C++ build.
It is deliberately scalar and simple; throughput comes from csc_tpu.ops.
"""

from .api import compress, decompress, compress_stream, decompress_stream  # noqa: F401
