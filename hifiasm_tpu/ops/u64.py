"""64-bit unsigned integer arithmetic as (hi, lo) uint32 pairs for TPU.

TPUs have no native 64-bit integer path; XLA emulates x64 slowly and JAX
defaults to 32-bit. K-mer hashes need 64 bits, so device code carries them
as explicit (hi, lo) uint32 pairs. Shift counts are Python ints (static),
which is all the yak hash (htab.h:150-160) needs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

U64 = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo), both uint32


def u64(hi, lo) -> U64:
    return jnp.asarray(hi, jnp.uint32), jnp.asarray(lo, jnp.uint32)


def from_np64(x) -> U64:
    import numpy as np

    x = np.asarray(x, np.uint64)
    return (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def to_np64(a: U64):
    import numpy as np

    hi, lo = a
    return (np.asarray(hi, np.uint64) << np.uint64(32)) | np.asarray(lo, np.uint64)


def add(a: U64, b: U64) -> U64:
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(jnp.uint32)
    return a[0] + b[0] + carry, lo


def xor(a: U64, b: U64) -> U64:
    return a[0] ^ b[0], a[1] ^ b[1]


def bnot(a: U64) -> U64:
    return ~a[0], ~a[1]


def band(a: U64, b: U64) -> U64:
    return a[0] & b[0], a[1] & b[1]


def bor(a: U64, b: U64) -> U64:
    return a[0] | b[0], a[1] | b[1]


def shl(a: U64, n: int) -> U64:
    """Left shift by a static amount n in [0, 64)."""
    hi, lo = a
    if n == 0:
        return hi, lo
    if n < 32:
        return (hi << n) | (lo >> (32 - n)), lo << n
    if n == 32:
        return lo, jnp.zeros_like(lo)
    return lo << (n - 32), jnp.zeros_like(lo)


def shr(a: U64, n: int) -> U64:
    """Logical right shift by a static amount n in [0, 64)."""
    hi, lo = a
    if n == 0:
        return hi, lo
    if n < 32:
        return hi >> n, (lo >> n) | (hi << (32 - n))
    if n == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (n - 32)


def lt(a: U64, b: U64) -> jnp.ndarray:
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def eq(a: U64, b: U64) -> jnp.ndarray:
    return (a[0] == b[0]) & (a[1] == b[1])


def where(pred, a: U64, b: U64) -> U64:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])
