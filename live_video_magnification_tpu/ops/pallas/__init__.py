"""Pallas TPU kernels for the hot ops.

Each kernel has a reference-equivalent jnp fallback in ops/; numerics are
identical (same f32 arithmetic, same tap order) and covered by equivalence
tests that run the kernels in interpreter mode on CPU.
"""
