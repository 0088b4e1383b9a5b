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

# ChainParams.for_k(51) defaults (set_lchain_dp_op, anchor.cpp:2272)
_BW_RATE = 0.02
_CHN_PEN_GAP = 0.5 * float(np.exp(-0.01 * 51))
_CHN_PEN_SKIP = 0.0005 * float(np.exp(-0.01 * 51))


@functools.partial(jax.jit, static_argnames=("max_iter",))
def chain_scores_batch(self_off, t_off, span, weight, n, xl, yl,
                       max_iter: int = 5000):
    """[B, N] anchor columns -> (f, pre): best chain score ending at each
    anchor and its predecessor (-1 if chain starts there)."""
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
        bw = ((sf_e - sf_s).astype(jnp.float32) * _BW_RATE).astype(jnp.int32)
        valid &= (dd <= 16) | (dd <= bw)

        sc = jnp.minimum(spi, dg)
        sc = jnp.where(sc >= wi, sc // jnp.maximum(wi, 1), 1)
        ddf = dd.astype(jnp.float32)
        dgf = jnp.maximum(dg, 1).astype(jnp.float32)
        lin = _CHN_PEN_GAP * ddf
        a_pen = sc.astype(jnp.float32) * (ddf / dgf) / _BW_RATE
        lin = jnp.where(dd < 4, jnp.minimum(lin, a_pen),
                        jnp.maximum(lin, a_pen))
        lin = lin + _CHN_PEN_SKIP * dg.astype(jnp.float32)
        pen = jnp.where((dd != 0) | (dg > spi), lin.astype(jnp.int32), 0)
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
