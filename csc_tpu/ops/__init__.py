"""TPU compute path: batched multi-stream kernels (JAX/XLA/Pallas).

Everything here is validated bit-for-bit against csc_tpu.golden.
"""
