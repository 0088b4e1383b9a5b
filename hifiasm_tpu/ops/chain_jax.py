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


# ---------------------------------------------------------------------------
# exact-semantics batch DP: bit-identical with the scalar/native engine

def _pair_sc_vec(si, oi, spi, wi, so, to, xl, yl,
                 pg_q16, pskip_q16, bw_q16, invbw_q4):
    """comput_sc_ch_ec for anchor i vs a j-vector, integer penalties.
    Returns (sc, valid); sc is garbage where ~valid."""
    dq = si - so
    dr = oi - to
    ok = (dq > 0) & (dr > 0)
    dd = jnp.abs(dr - dq)
    dg = jnp.minimum(dr, dq)
    sf_s = jnp.maximum(so - to, 0)
    sf_r = xl - (si + 1)
    ot_r = yl - (oi + 1)
    sf_e = jnp.where(sf_r <= ot_r, xl, si + 1 + ot_r)
    bw = (jnp.maximum(sf_e - sf_s, 0) * jnp.int32(bw_q16)) >> 16
    ok &= (dd <= 16) | (dd <= bw)
    sc = jnp.minimum(spi, dg)
    sc = jnp.where(sc >= wi, sc // jnp.maximum(wi, 1), 1)
    ddc = jnp.clip(dd, 0, 8191)
    scc = jnp.clip(sc, 0, 1023)
    dgc = jnp.maximum(dg, 1)
    lin_q4 = (jnp.int32(pg_q16) * ddc) >> 12
    apen_q4 = (scc * ddc * jnp.int32(invbw_q4)) // dgc
    cho = jnp.where(dd < 4, jnp.minimum(lin_q4, apen_q4),
                    jnp.maximum(lin_q4, apen_q4))
    skip_q4 = (jnp.int32(pskip_q16) * jnp.clip(dg, 0, 262143)) >> 12
    pen = jnp.where((dd != 0) | (dg > spi), (cho + skip_q4) >> 4, 0)
    return sc - pen, ok


def _rev_cum(x, op):
    """Reversed (suffix) cumulative op along the last axis."""
    ax = x.ndim - 1
    return jnp.flip(op(jnp.flip(x, ax), axis=ax), ax)


def _quick_prepass_tr(so, to, span, weight, n, xl, yl, consts,
                      quick_check: bool):
    """Vector form of quick_ck_lchain (Hash_Table.cpp:2007): scores the
    consecutive-link chain and decides whether it IS the optimum.
    Inputs already int32; returns (in_g, fq, pre_q, quick)."""
    B, N = so.shape
    jidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B)
    bw_q16 = consts[2]
    so_p = jnp.concatenate([so[:, :1], so[:, :-1]], axis=1)   # z-1
    to_p = jnp.concatenate([to[:, :1], to[:, :-1]], axis=1)
    link_sc, link_ok = _pair_sc_vec(so, to, span, weight, so_p, to_p,
                                    xl, yl, *consts)
    dd_l = jnp.abs((to - to_p) - (so - so_p))
    in_g = jidx < n[:, None]
    fq = span[:, :1] + jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(
            jnp.where(in_g, link_sc, 0)[:, 1:], axis=1)], axis=1)
    cond = link_ok & (fq >= span) & in_g
    cond = cond.at[:, 0].set(in_g[:, 0])
    unbroken = jnp.cumprod(cond.astype(jnp.int32), axis=1) > 0
    quick_complete = jnp.sum(unbroken.astype(jnp.int32), axis=1) == n
    fqm = jnp.where(in_g, fq, NEG_INF32)
    mx_q = jnp.max(fqm, axis=1, keepdims=True)
    msc_i0 = jnp.max(jnp.where(fqm == mx_q, jidx, -1), axis=1)  # LAST >=
    ddt = jnp.sum(jnp.where(in_g, dd_l, 0)[:, 1:] *
                  unbroken[:, 1:].astype(jnp.int32), axis=1)
    last = jnp.maximum(n - 1, 0)
    so0, to0 = so[:, 0], to[:, 0]
    soL = so[rows, last]
    toL = to[rows, last]
    sf_s0 = jnp.maximum(so0 - to0, 0)
    sf_r0 = xl[:, 0] - (soL + 1)
    ot_r0 = yl[:, 0] - (toL + 1)
    sf_e0 = jnp.where(sf_r0 <= ot_r0, xl[:, 0], soL + 1 + ot_r0)
    bw_g = (jnp.maximum(sf_e0 - sf_s0, 0) * jnp.int32(bw_q16)) >> 16
    ddt_bad = (n >= 2) & (ddt > 16) & (ddt > bw_g)
    quick = quick_check & quick_complete & (msc_i0 == n - 1) & \
        ~ddt_bad & (n > 0)
    pre_q = jnp.where(in_g & (jidx > 0), jidx - 1, -1)
    return in_g, fq, pre_q, quick


@functools.partial(jax.jit, static_argnames=(
    "pg_q16", "pskip_q16", "bw_q16", "invbw_q4", "quick_check"))
def chain_quick_batch(so, to, span, weight, n, xl, yl,
                      quick_check: bool = True,
                      pg_q16: int = _PG_Q16, pskip_q16: int = _PSKIP_Q16,
                      bw_q16: int = _BW_Q16, invbw_q4: int = _INVBW_Q4):
    """Quick pre-pass alone: (fq, pre_q, quick) for [B, N] groups.

    On HiFi EC workloads ~99.9% of (read, target, strand) groups
    complete here (measured on the 24 Mb bench workload), so the device
    pipeline runs ONLY this O(B*N) kernel and routes the rare non-quick
    groups to the bit-identical host scalar DP — the same structural
    shortcut the reference takes (quick_ck_lchain before
    lchain_qdp_mcopy_fast, Hash_Table.cpp:2007/2097)."""
    so = so.astype(jnp.int32)
    to = to.astype(jnp.int32)
    span = span.astype(jnp.int32)
    weight = weight.astype(jnp.int32)
    n = n.astype(jnp.int32)
    xl = xl.astype(jnp.int32)[:, None]
    yl = yl.astype(jnp.int32)[:, None]
    consts = (pg_q16, pskip_q16, bw_q16, invbw_q4)
    in_g, fq, pre_q, quick = _quick_prepass_tr(
        so, to, span, weight, n, xl, yl, consts, quick_check)
    return jnp.where(in_g, fq, NEG_INF32), pre_q, quick


@functools.partial(jax.jit, static_argnames=(
    "max_iter", "max_skip", "max_dis", "pg_q16", "pskip_q16", "bw_q16",
    "invbw_q4", "quick_check"))
def chain_exact_batch(so, to, span, weight, n, xl, yl,
                      max_iter: int = 5000, max_skip: int = 25,
                      max_dis: int = 5000, quick_check: bool = True,
                      pg_q16: int = _PG_Q16, pskip_q16: int = _PSKIP_Q16,
                      bw_q16: int = _BW_Q16, invbw_q4: int = _INVBW_Q4):
    """Batched chain DP with the scalar engine's EXACT control flow —
    quick_ck_lchain pre-pass, backward-scan max_skip break (via a
    clamped-counter suffix scan), and the max_ii long-range fallback
    carried across steps — so (f, pre, quick) match ht_chain_dp /
    ops/chain.chain_dp_ref bit for bit (cross-validated in
    tests/test_chain_exact_jax.py).  [B, N] padded groups, int32.

    Reference control flow: lchain_qdp_mcopy_fast Hash_Table.cpp:2097,
    quick_ck_lchain :2007, the minimap2-style t[]/n_skip break, and the
    max_ii fallback."""
    B, N = so.shape
    so = so.astype(jnp.int32)
    to = to.astype(jnp.int32)
    span = span.astype(jnp.int32)
    weight = weight.astype(jnp.int32)
    n = n.astype(jnp.int32)
    xl = xl.astype(jnp.int32)[:, None]
    yl = yl.astype(jnp.int32)[:, None]
    jidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B)
    consts = (pg_q16, pskip_q16, bw_q16, invbw_q4)

    in_g, fq, pre_q, quick = _quick_prepass_tr(
        so, to, span, weight, n, xl, yl, consts, quick_check)

    # ---- full DP scan over i ----
    def step(carry, i):
        f, pre, max_ii = carry
        si = so[rows, i][:, None]
        oi = to[rows, i][:, None]
        spi = span[rows, i][:, None]
        wi = weight[rows, i][:, None]
        sc_j, ok = _pair_sc_vec(si, oi, spi, wi, so, to, xl, yl, *consts)
        st = jnp.maximum(i - max_iter, 0)
        window = (jidx >= st) & (jidx < i) & in_g
        valid = ok & window
        tot = jnp.where(valid, sc_j + f, NEG_INF32)
        # t[] marks: j was recorded as a predecessor by a valid j' > j
        midx = jnp.where(valid & (pre >= 0), pre, N)
        mark = jnp.zeros((B, N + 1), bool).at[rows[:, None], midx] \
            .set(True)[:, :N]
        # improvement / skip deltas in visit order (descending j)
        suf_inc = _rev_cum(tot, jax.lax.cummax)            # max tot[j..]
        m_after = jnp.concatenate(
            [suf_inc[:, 1:], jnp.full((B, 1), NEG_INF32)], axis=1)
        m_after = jnp.maximum(m_after, spi)
        imp = valid & (tot > m_after)
        d = jnp.where(imp, -1, jnp.where(valid & mark, 1, 0)) \
            .astype(jnp.int32)
        P = _rev_cum(d, jnp.cumsum)                        # sum d[j..i-1]
        p_after = jnp.concatenate(
            [P[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        min_after = jnp.minimum(_rev_cum(p_after, jax.lax.cummin), 0)
        s_cnt = P - min_after
        bad = window & (s_cnt > max_skip)
        stopped_above = jnp.concatenate(
            [(_rev_cum(bad.astype(jnp.int32), jax.lax.cummax)[:, 1:] > 0),
             jnp.zeros((B, 1), bool)], axis=1)
        visited = window & ~stopped_above
        contrib = valid & visited & ~bad
        totc = jnp.where(contrib, tot, NEG_INF32)
        best = jnp.maximum(jnp.max(totc, axis=1), spi[:, 0])
        has = best > spi[:, 0]
        max_j = jnp.where(
            has, jnp.max(jnp.where(totc == best[:, None], jidx, -1),
                         axis=1), -1)
        j_b = jnp.max(jnp.where(bad & visited, jidx, -1), axis=1)
        end_j = jnp.where(j_b >= 0, j_b, st - 1)
        # max_ii fallback
        mii_c = jnp.clip(max_ii, 0, N - 1)
        so_mii = so[rows, mii_c]
        stale = (max_ii < 0) | (si[:, 0] > so_mii + max_dis)
        wm = window & (si <= max_dis + so)
        fwm = jnp.where(wm, f, NEG_INF32)
        mxw = jnp.max(fwm, axis=1)
        mii_new = jnp.max(jnp.where(fwm == mxw[:, None], jidx, -1),
                          axis=1)
        mii_new = jnp.where(jnp.any(wm, axis=1), mii_new, -1)
        max_ii = jnp.where(stale, mii_new, max_ii)
        mii_c = jnp.clip(max_ii, 0, N - 1)
        tmp, tok = _pair_sc_vec(
            si[:, 0], oi[:, 0], spi[:, 0], wi[:, 0],
            so[rows, mii_c], to[rows, mii_c], xl[:, 0], yl[:, 0], *consts)
        cand = tmp + f[rows, mii_c]
        use_fb = (max_ii >= 0) & (max_ii < end_j) & tok & (best < cand)
        f_i = jnp.where(use_fb, cand, best)
        pre_i = jnp.where(use_fb, max_ii, max_j)
        in_r = i < n
        f_i = jnp.where(in_r, f_i, NEG_INF32)
        pre_i = jnp.where(in_r, pre_i, -1)
        f = f.at[rows, i].set(f_i)
        pre = pre.at[rows, i].set(pre_i)
        # maintenance
        mii_c = jnp.clip(max_ii, 0, N - 1)
        keep = (max_ii < 0) | ((si[:, 0] <= max_dis + so[rows, mii_c]) &
                               (f[rows, mii_c] < f_i))
        max_ii = jnp.where(in_r & keep, i, max_ii)
        return (f, pre, max_ii), None

    f0 = jnp.full((B, N), NEG_INF32)
    pre0 = jnp.full((B, N), -1, jnp.int32)
    mii0 = jnp.full(B, -1, jnp.int32)
    (f_full, pre_full, _), _ = lax.scan(
        step, (f0, pre0, mii0), jnp.arange(N, dtype=jnp.int32))

    fq_out = jnp.where(in_g, fq, NEG_INF32)
    f_out = jnp.where(quick[:, None], fq_out, f_full)
    pre_out = jnp.where(quick[:, None], pre_q, pre_full)
    return f_out, pre_out, quick


# ---------------------------------------------------------------------------
# exact-semantics batch extraction: best chain + mcopy secondaries

_BIG32 = jnp.int32(1 << 30)


@functools.partial(jax.jit, static_argnames=(
    "mcopy_num", "mcopy_khit_cut", "mcopy_q16"))
def extract_chains_batch(f, pre, quick, so, to, n, xl, yl,
                         mcopy_num: int = 3, mcopy_khit_cut: int = 32,
                         mcopy_q16: int = 45875):
    """Batched chain extraction matching ops/chain.extract_chains (and
    the native ht_chain_groups traceback) BIT FOR BIT: best-chain
    selection with the quick/full tie-breaks, pointer-chase traceback,
    and the sequential multi-copy peeling (candidates in descending
    fpos, ascending index; failed segments un-used; scores
    fpos[e] - f[stop]).  Returns per-anchor chain labels [B, N] int32
    (-1 = unused) plus per-chain (count, score, first, last) — the
    label order is discovery order, so hits of chain k are the label-k
    anchors in ascending index.

    Reference: lchain_qdp_mcopy_fast traceback + mcopy
    (Hash_Table.cpp:2097-2284)."""
    B, N = f.shape
    f = f.astype(jnp.int32)
    pre = pre.astype(jnp.int32)
    so = so.astype(jnp.int32)
    to = to.astype(jnp.int32)
    n = n.astype(jnp.int32)
    xl = xl.astype(jnp.int32)
    yl = yl.astype(jnp.int32)
    jidx = jnp.arange(N, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B)
    in_g = jidx < n[:, None]
    has = n > 0

    fm = jnp.where(in_g, f, NEG_INF32)
    msc = jnp.max(fm, axis=1)
    is_max = fm == msc[:, None]
    last_max = jnp.max(jnp.where(is_max, jidx, -1), axis=1)
    # full-DP tie: smallest projected overlap length, first index
    xb = jnp.where(so <= to, 0, so - to)
    xr = xl[:, None] - so - 1
    yr = yl[:, None] - to - 1
    xe2 = jnp.where(xr <= yr, xl[:, None] - 1, so + yr)
    ovl = xe2 - xb + 1
    ovl_c = jnp.where(is_max, ovl, _BIG32)
    movl = jnp.min(ovl_c, axis=1)
    first_minovl = jnp.min(
        jnp.where(is_max & (ovl_c == movl[:, None]), jidx, _BIG32),
        axis=1)
    msc_i = jnp.where(quick, last_max, first_minovl).astype(jnp.int32)
    msc_i = jnp.where(has, msc_i, -1)

    # ---- trace the best chain (label 0) ----
    label = jnp.full((B, N), -1, jnp.int32)

    def trace_cond(st):
        cur, label = st
        return jnp.any(cur >= 0)

    def trace_body(st):
        cur, label = st
        act = cur >= 0
        curc = jnp.clip(cur, 0, N - 1)
        label = label.at[rows, curc].set(
            jnp.where(act, 0, label[rows, curc]))
        nxt = pre[rows, curc]
        return (jnp.where(act, nxt, -1), label)

    _, label = lax.while_loop(trace_cond, trace_body, (msc_i, label))

    cnt = jnp.ones(B, jnp.int32) * has
    sc_out = jnp.full((B, mcopy_num), NEG_INF32)
    sc_out = sc_out.at[:, 0].set(jnp.where(has, msc, NEG_INF32))

    if mcopy_num > 1:
        # ---- multi-copy peeling ----
        n_hits0 = jnp.sum((label == 0).astype(jnp.int32), axis=1)
        # min over IN-GROUP f only (padded lanes are NEG_INF32 and would
        # overflow the fixed-point min_sc product)
        plus = jnp.minimum(
            jnp.min(jnp.where(in_g, f, _BIG32), axis=1), 0)
        plus = jnp.where(has, plus, 0)
        min_sc = ((msc - plus) * jnp.int32(mcopy_q16)) >> 16
        fpos = f - plus[:, None]
        cand0 = in_g & (label < 0) & (fpos >= min_sc[:, None]) & \
            (n_hits0 >= mcopy_khit_cut)[:, None] & has[:, None]

        def peel_cond(st):
            cand, label, cnt, sc_out = st
            return jnp.any(jnp.any(cand, axis=1) & (cnt < mcopy_num))

        def peel_body(st):
            cand, label, cnt, sc_out = st
            grp = jnp.any(cand, axis=1) & (cnt < mcopy_num)
            fp_c = jnp.where(cand & (label < 0), fpos, NEG_INF32)
            mx = jnp.max(fp_c, axis=1)
            e = jnp.min(jnp.where(fp_c == mx[:, None], jidx, _BIG32),
                        axis=1).astype(jnp.int32)
            pickable = grp & (mx > NEG_INF32)
            e = jnp.where(pickable, e, -1)
            # already-used candidates are just dropped (host: continue)
            ec = jnp.clip(e, 0, N - 1)
            # inner trace with stop_at_used, temporary label = cnt
            def t_cond(s):
                cur, lab, head = s
                return jnp.any(cur >= 0)

            def t_body(s):
                cur, lab, head = s
                act = cur >= 0
                cc = jnp.clip(cur, 0, N - 1)
                lab = lab.at[rows, cc].set(
                    jnp.where(act, -2, lab[rows, cc]))   # tmp mark
                head = jnp.where(act, cur, head)
                nxt = pre[rows, cc]
                stop = (nxt < 0) | \
                    (jnp.where(act, label[rows, jnp.clip(nxt, 0, N - 1)],
                               -1) >= 0)
                return (jnp.where(act & ~stop, nxt, -1), lab, head)

            start = jnp.where(pickable, e, -1)
            (_, lab2, head) = lax.while_loop(
                t_cond, t_body, (start, label, jnp.full(B, -1, jnp.int32)))
            seg_len = jnp.sum((lab2 == -2).astype(jnp.int32), axis=1)
            headc = jnp.clip(head, 0, N - 1)
            stopj = jnp.where(head >= 0, pre[rows, headc], -1)
            sc = jnp.where(
                stopj < 0, fpos[rows, ec],
                fpos[rows, ec] - f[rows, jnp.clip(stopj, 0, N - 1)])
            commit = pickable & (sc >= min_sc) & (seg_len > 1)
            newlab = jnp.where(
                lab2 == -2,
                jnp.where(commit[:, None], cnt[:, None], -1), lab2)
            sc_out = sc_out.at[rows, jnp.clip(cnt, 0, mcopy_num - 1)].set(
                jnp.where(commit, sc + plus,
                          sc_out[rows, jnp.clip(cnt, 0, mcopy_num - 1)]))
            cnt = cnt + commit.astype(jnp.int32)
            # drop e (tried) and anything now used from the candidate
            # set — otherwise a group whose remaining candidates all
            # became used would spin forever
            cand = cand & (jidx != e[:, None]) & (newlab < 0)
            return (cand, newlab, cnt, sc_out)

        (cand, label, cnt, sc_out) = lax.while_loop(
            peel_cond, peel_body, (cand0, label, cnt, sc_out))

    # per-chain endpoints
    firsts = []
    lasts = []
    for k in range(mcopy_num):
        mk = label == k
        firsts.append(jnp.min(jnp.where(mk, jidx, _BIG32), axis=1))
        lasts.append(jnp.max(jnp.where(mk, jidx, -1), axis=1))
    first = jnp.stack(firsts, axis=1)
    last = jnp.stack(lasts, axis=1)
    nh = jnp.stack([jnp.sum((label == k).astype(jnp.int32), axis=1)
                    for k in range(mcopy_num)], axis=1)
    return label, cnt, sc_out, first, last, nh
