"""Batched anchor-chain DP on device.

Device version of ops/chain.py (``lchain_qdp`` scoring, Hash_Table.cpp:1515
``comput_sc_ch_ec``, :1475 ``cal_bw``): a ``lax.scan`` over anchor index i
computes, for every problem in the batch, the vectorized lookback over all
predecessors j < i in one masked [B, N] step — the CPU skip/max_skip
heuristics are pruning-only and are dropped (same or better chains).

Anchor groups are padded to N (``n`` gives true lengths); scores use int32
(max chain score << 2^30).  Cross-validated against the host DP in tests.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF32 = jnp.int32(-(1 << 30))

# ChainParams.for_k(51) integer Q16/Q4 defaults (ops/chain.ChainParams);
# i32-safe on TPU because sketch spans are < 256 and max_dis = 5000
from hifiasm_tpu.ops.chain import ChainParams as _CP
_D = _CP.for_k(51)
_PG_Q16, _PSKIP_Q16 = _D.pg_q16, _D.pskip_q16
_BW_Q16, _INVBW_Q4 = _D.bw_q16, _D.invbw_q4


@functools.partial(jax.jit, static_argnames=(
    "max_iter", "pg_q16", "pskip_q16", "bw_q16", "invbw_q4"))
def chain_scores_batch(self_off, t_off, span, weight, n, xl, yl,
                       max_iter: int = 5000, pg_q16: int = _PG_Q16,
                       pskip_q16: int = _PSKIP_Q16, bw_q16: int = _BW_Q16,
                       invbw_q4: int = _INVBW_Q4):
    """[B, N] anchor columns -> (f, pre): best chain score ending at each
    anchor and its predecessor (-1 if chain starts there).  Penalties use
    the integer fixed-point semantics shared by every engine
    (ops/chain._pen_int_np)."""
    B, N = self_off.shape
    self_off = self_off.astype(jnp.int32)
    t_off = t_off.astype(jnp.int32)
    span = span.astype(jnp.int32)
    weight = weight.astype(jnp.int32)
    xl = xl.astype(jnp.int32)[:, None]
    yl = yl.astype(jnp.int32)[:, None]
    n = n.astype(jnp.int32)

    jidx = jnp.arange(N, dtype=jnp.int32)

    def step(f_prev, i):
        # anchor i of every problem vs all predecessors j
        si = jnp.take_along_axis(self_off, i[None, None], axis=1)  # [B,1]
        oi = jnp.take_along_axis(t_off, i[None, None], axis=1)
        spi = jnp.take_along_axis(span, i[None, None], axis=1)
        wi = jnp.take_along_axis(weight, i[None, None], axis=1)
        dq = si - self_off                               # [B, N]
        dr = oi - t_off
        valid = (jidx[None, :] < i) & (jidx[None, :] >= i - max_iter) & \
            (jidx[None, :] < n[:, None]) & (dq > 0) & (dr > 0) & \
            (dq <= 5000) & (dr <= 5000)   # max_dis (anchor.cpp:2276)
        dd = jnp.abs(dr - dq)
        dg = jnp.minimum(dr, dq)
        sf_s = jnp.maximum(self_off - t_off, 0)
        sf_r = xl - (si + 1)
        ot_r = yl - (oi + 1)
        sf_e = jnp.where(sf_r <= ot_r, xl, si + 1 + ot_r)
        bw = (jnp.maximum(sf_e - sf_s, 0) * jnp.int32(bw_q16)) >> 16
        valid &= (dd <= 16) | (dd <= bw)

        sc = jnp.minimum(spi, dg)
        sc = jnp.where(sc >= wi, sc // jnp.maximum(wi, 1), 1)
        # i32-safe operand clips: on invalid lanes dd/dg/sc are garbage
        # (discarded by the mask) but must not overflow the products
        ddc = jnp.clip(dd, 0, 8191)
        scc = jnp.clip(sc, 0, 1023)
        dgc = jnp.maximum(dg, 1)
        lin_q4 = (jnp.int32(pg_q16) * ddc) >> 12
        apen_q4 = (scc * ddc * jnp.int32(invbw_q4)) // dgc
        cho = jnp.where(dd < 4, jnp.minimum(lin_q4, apen_q4),
                        jnp.maximum(lin_q4, apen_q4))
        skip_q4 = (jnp.int32(pskip_q16) * jnp.clip(dg, 0, 262143)) >> 12
        pen = jnp.where((dd != 0) | (dg > spi), (cho + skip_q4) >> 4, 0)
        pair = jnp.where(valid, sc - pen, NEG_INF32)

        tot = jnp.where(pair == NEG_INF32, NEG_INF32, pair + f_prev)
        bj = jnp.argmax(tot, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(tot, bj[:, None], axis=1)[:, 0]
        base = spi[:, 0]
        use = best > base
        f_i = jnp.where(use, best, base)
        pre_i = jnp.where(use, bj, -1)
        in_range = i < n
        f_i = jnp.where(in_range, f_i, NEG_INF32)
        pre_i = jnp.where(in_range, pre_i, -1)
        f_new = f_prev.at[:, i].set(f_i)
        return f_new, (f_i, pre_i)

    f0 = jnp.full((B, N), NEG_INF32)
    f_fin, (f_cols, pre_cols) = lax.scan(step, f0, jidx)
    return f_cols.T, pre_cols.T
