"""The yak invertible 64-bit integer hash (htab.h:150-160).

Two implementations with identical semantics: numpy uint64 (host path) and
(hi, lo) uint32 pairs (device path, see ops/u64.py). The k-mer hash used
throughout the assembler is ``yak_hash64_64(kmer_low) + yak_hash64_64
(kmer_high)`` on the strand-canonical 1-bit-per-base words (sketch.cpp:508).
"""

from __future__ import annotations

import numpy as np

from hifiasm_tpu.ops import u64 as U


def yak_hash64_np(key: np.ndarray) -> np.ndarray:
    """numpy uint64 version of yak_hash64_64 (wrapping arithmetic)."""
    key = np.asarray(key, dtype=np.uint64)
    with np.errstate(over="ignore"):
        key = ~key + (key << np.uint64(21))
        key = key ^ (key >> np.uint64(24))
        key = key + (key << np.uint64(3)) + (key << np.uint64(8))
        key = key ^ (key >> np.uint64(14))
        key = key + (key << np.uint64(2)) + (key << np.uint64(4))
        key = key ^ (key >> np.uint64(28))
        key = key + (key << np.uint64(31))
    return key


def yak_hash64_u32pair(key: U.U64) -> U.U64:
    """(hi, lo) uint32-pair version of yak_hash64_64 for TPU."""
    key = U.add(U.bnot(key), U.shl(key, 21))
    key = U.xor(key, U.shr(key, 24))
    key = U.add(U.add(key, U.shl(key, 3)), U.shl(key, 8))
    key = U.xor(key, U.shr(key, 14))
    key = U.add(U.add(key, U.shl(key, 2)), U.shl(key, 4))
    key = U.xor(key, U.shr(key, 28))
    key = U.add(key, U.shl(key, 31))
    return key


def kmer_hash_np(x_low: np.ndarray, x_high: np.ndarray) -> np.ndarray:
    """Hash of a canonical k-mer given its two 1-bit-per-base words."""
    return yak_hash64_np(x_low) + yak_hash64_np(x_high)


def kmer_hash_u32pair(x_low: U.U64, x_high: U.U64) -> U.U64:
    return U.add(yak_hash64_u32pair(x_low), yak_hash64_u32pair(x_high))
