"""hifiasm-tpu: a TPU-native haplotype-resolved de novo assembler.

A from-scratch re-design of hifiasm's capabilities (chhylp123/hifiasm) for
TPU hardware: batched JAX/XLA array programs and Pallas kernels for the
compute path (minimizer sketching, k-mer indexing, anchor chaining, banded
bit-parallel alignment, consensus), host-side orchestration for I/O and
string-graph pointer-chasing, and jax.sharding meshes for multi-chip scale.

Reference parity targets are cited per-module as ``file:line`` into the
upstream C++ tree (see SURVEY.md).
"""

__version__ = "0.1.0"

from hifiasm_tpu.config import HifiasmConfig  # noqa: F401
