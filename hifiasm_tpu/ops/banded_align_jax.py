"""Batched banded Myers alignment — the JAX/XLA device engine.

The TPU-native replacement for the reference's SSE banded BPM engines
(Levenshtein_distance.h:3857 Reserve_Banded_BPM, :4477 4-way SSE,
:3127+ ed_band_cal_*): the 2e+1 <= 63-diagonal band packs into a
(hi, lo) pair of uint32 lanes per problem (TPUs are 32-bit native), and a
``lax.scan`` marches all B window problems through the text in lock-step —
every scan step is ~30 elementwise uint32 VPU ops on [B]-vectors, so one
launch aligns thousands of windows.  Traceback also runs on device as a
masked backward ``fori_loop`` using the stored per-step bit-words.

Semantics are bit-identical to ops/banded_batch.banded_batch_np (the host
oracle; cross-validated in tests): x aligns globally, y-start free in
[0, 2e], y-end free in [xlen, xlen+2e], err <= e or -1.

jit-compiled per static (XL, YL, e, traceback); batch B is bucketed to
powers of two to bound recompilation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from hifiasm_tpu.ops.banded_batch import BatchAlign

U32 = jnp.uint32
_ONE = np.uint32(1)


def _u64_mask(W: int) -> Tuple[np.uint32, np.uint32]:
    m = (1 << W) - 1
    return np.uint32(m & 0xFFFFFFFF), np.uint32(m >> 32)


def _shr1(hi, lo):
    return hi >> _ONE, (lo >> _ONE) | (hi << np.uint32(31))


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    hi = ahi + bhi + carry
    return hi, lo


def _getbit(hi, lo, b):
    """Dynamic per-element bit extract; b is [B] int32 in [0, 63]."""
    blo = jnp.clip(b, 0, 31).astype(U32)
    bhi = jnp.clip(b - 32, 0, 31).astype(U32)
    return jnp.where(b < 32, (lo >> blo) & _ONE, (hi >> bhi) & _ONE)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _banded_jax(x, xlen, y, ylen, e: int, traceback: bool):
    return banded_core(x, xlen, y, ylen, e, traceback)


def banded_core(x, xlen, y, ylen, e: int, traceback: bool):
    """Pure-jnp kernel body; composable inside larger jitted programs
    (the device-resident EC megakernel calls this after building windows
    on device)."""
    B, XL = x.shape
    YL = y.shape[1]
    W = 2 * e + 1
    mlo, mhi = _u64_mask(W)
    xlen = xlen.astype(jnp.int32)
    ylen = ylen.astype(jnp.int32)

    # initial Peq from y[:, :W]
    peq_hi = jnp.zeros((B, 4), U32)
    peq_lo = jnp.zeros((B, 4), U32)
    ypos = jnp.arange(min(W, YL))
    yw = y[:, :min(W, YL)].astype(jnp.int32)            # [B, W0]
    valid = ypos[None, :] < ylen[:, None]
    for c in range(4):
        sel = valid & (yw == c)                         # [B, W0]
        bits_lo = jnp.where((ypos < 32)[None, :] & sel,
                            _ONE << jnp.minimum(ypos, 31).astype(U32)[None, :],
                            np.uint32(0))
        bits_hi = jnp.where((ypos >= 32)[None, :] & sel,
                            _ONE << jnp.maximum(ypos - 32, 0).astype(U32)[None, :],
                            np.uint32(0))
        peq_lo = peq_lo.at[:, c].set(bits_lo.sum(axis=1, dtype=U32))
        peq_hi = peq_hi.at[:, c].set(bits_hi.sum(axis=1, dtype=U32))

    # per-step inputs: x column and the admitted y base (y[:, i+W])
    x_t = x.T.astype(jnp.int32)                         # [XL, B]
    pad = jnp.full((B, XL), 4, jnp.int32)
    y_ext = jnp.concatenate([y.astype(jnp.int32), pad], axis=1)
    y_adm = y_ext[:, W:W + XL].T                        # y[:, i+W] per step i

    def step(carry, inp):
        (vp_hi, vp_lo, vn_hi, vn_lo, p_hi, p_lo, err, i) = carry
        xc, yc = inp
        live = i < xlen
        eq_hi = jnp.zeros(B, U32)
        eq_lo = jnp.zeros(B, U32)
        for c in range(4):
            m = xc == c
            eq_hi = jnp.where(m, p_hi[:, c], eq_hi)
            eq_lo = jnp.where(m, p_lo[:, c], eq_lo)
        x_hi = eq_hi | vn_hi
        x_lo = eq_lo | vn_lo
        t_hi = x_hi & vp_hi
        t_lo = x_lo & vp_lo
        s_hi, s_lo = _add64(vp_hi, vp_lo, t_hi, t_lo)
        s_hi &= mhi
        s_lo &= mlo
        d0_hi = (s_hi ^ vp_hi) | x_hi
        d0_lo = (s_lo ^ vp_lo) | x_lo
        hn_hi = vp_hi & d0_hi
        hn_lo = vp_lo & d0_lo
        hp_hi = vn_hi | (~(vp_hi | d0_hi) & mhi)
        hp_lo = vn_lo | (~(vp_lo | d0_lo) & mlo)
        x2_hi, x2_lo = _shr1(d0_hi, d0_lo)
        nvn_hi = x2_hi & hp_hi
        nvn_lo = x2_lo & hp_lo
        nvp_hi = (hn_hi | (~(x2_hi | hp_hi) & mhi)) & mhi
        nvp_lo = (hn_lo | (~(x2_lo | hp_lo) & mlo)) & mlo
        vp_hi2 = jnp.where(live, nvp_hi, vp_hi)
        vp_lo2 = jnp.where(live, nvp_lo, vp_lo)
        vn_hi2 = jnp.where(live, nvn_hi, vn_hi)
        vn_lo2 = jnp.where(live, nvn_lo, vn_lo)
        err2 = jnp.where(live, err + 1 - (d0_lo & _ONE).astype(jnp.int32),
                         err)
        # shift Peq right, admit y[i+W]
        np_hi, np_lo = _shr1(p_hi, p_lo)
        adm = live & (i + W < ylen)
        top_lo = np.uint32(1 << (W - 1)) if W <= 32 else np.uint32(0)
        top_hi = np.uint32(1 << (W - 33)) if W > 32 else np.uint32(0)
        for c in range(4):
            m = adm & (yc == c)
            np_lo = np_lo.at[:, c].add(jnp.where(m, top_lo, np.uint32(0)))
            np_hi = np_hi.at[:, c].add(jnp.where(m, top_hi, np.uint32(0)))
        out = (jnp.where(live, d0_hi, 0), jnp.where(live, d0_lo, 0),
               jnp.where(live, hp_hi, 0), jnp.where(live, hp_lo, 0),
               vp_hi2, vp_lo2) if traceback else ()
        return (vp_hi2, vp_lo2, vn_hi2, vn_lo2, np_hi, np_lo, err2,
                i + 1), out

    zero = jnp.zeros(B, U32)
    carry0 = (zero, zero, zero, zero, peq_hi, peq_lo,
              jnp.zeros(B, jnp.int32), jnp.int32(0))
    carry, stored = lax.scan(step, carry0, (x_t, y_adm))
    vp_hi, vp_lo, vn_hi, vn_lo, _, _, err, _ = carry

    # free-end scan over y endpoints xlen .. min(xlen+2e, ylen)
    nb_max = jnp.minimum(2 * e, ylen - xlen)
    best_err = err
    best_n = xlen
    e2 = err
    e3 = err
    for b0 in range(2 * e):
        bit_p = ((vp_lo >> np.uint32(b0)) & _ONE if b0 < 32
                 else (vp_hi >> np.uint32(b0 - 32)) & _ONE).astype(jnp.int32)
        bit_n = ((vn_lo >> np.uint32(b0)) & _ONE if b0 < 32
                 else (vn_hi >> np.uint32(b0 - 32)) & _ONE).astype(jnp.int32)
        e2 = e2 + bit_p - bit_n
        better = (b0 < nb_max) & (e2 < best_err)
        best_err = jnp.where(better, e2, best_err)
        best_n = jnp.where(better, xlen + b0 + 1, best_n)
        if b0 < e:
            e3 = e3 + bit_p - bit_n
    # ungap preference: centre-diagonal end ties the best -> end there
    pref = (ylen - xlen >= e) & (e3 == best_err)
    best_n = jnp.where(pref, xlen + e, best_n)

    ok = best_err <= e
    out_err = jnp.where(ok, best_err, -1).astype(jnp.int32)
    if not traceback:
        z = jnp.zeros(1, jnp.uint8)
        return (out_err, jnp.full(B, -1, jnp.int32),
                best_n.astype(jnp.int32), z, z, z)

    st_d0hi, st_d0lo, st_hphi, st_hplo, st_vphi, st_vplo = stored  # [XL, B]

    # light traceback: carry only (ii, jj), emit a per-step MOVE code;
    # the per-position tb/ins arrays are decoded host-side in one
    # vectorized pass (no [B, XL] scatters inside the loop)
    def tb_step(carry, _):
        ii, jj = carry
        act = ii > 0
        i_s = jnp.maximum(ii, 1)
        gidx = (i_s - 1)[None, :]
        d0hi = jnp.take_along_axis(st_d0hi, gidx, axis=0)[0]
        d0lo = jnp.take_along_axis(st_d0lo, gidx, axis=0)[0]
        hphi = jnp.take_along_axis(st_hphi, gidx, axis=0)[0]
        hplo = jnp.take_along_axis(st_hplo, gidx, axis=0)[0]
        vphi = jnp.take_along_axis(st_vphi, gidx, axis=0)[0]
        vplo = jnp.take_along_axis(st_vplo, gidx, axis=0)[0]
        bb = jj - ii
        in_band = (bb >= 0) & (bb <= 2 * e)
        xc = jnp.take_along_axis(
            x, jnp.clip(i_s - 1, 0, XL - 1)[:, None], axis=1)[:, 0]
        jc = jnp.clip(jj - 1, 0, YL - 1)
        yc = jnp.take_along_axis(y, jc[:, None], axis=1)[:, 0]
        matches = (xc == yc) & (xc < 4) & (jj - 1 < ylen) & (jj >= 1)
        d0bit = _getbit(d0hi, d0lo, jnp.clip(bb, 0, 2 * e)).astype(bool)
        diag_ok = act & in_band & (jj >= 1) & (jj - 1 >= ii - 1) & \
            ((matches & d0bit) | (~matches & ~d0bit))
        vp_bit = _getbit(vphi, vplo, jnp.clip(bb - 1, 0, 2 * e)).astype(bool)
        horiz_ok = act & (jj - 1 >= ii) & (bb - 1 >= 0) & vp_bit
        hp_bit = _getbit(hphi, hplo, jnp.clip(bb, 0, 2 * e)).astype(bool)
        vert_ok = act & in_band & (jj <= ii - 1 + 2 * e) & hp_bit
        do_diag = diag_ok
        do_horiz = ~do_diag & horiz_ok
        do_vert = ~do_diag & ~do_horiz & vert_ok
        move = (do_diag.astype(jnp.uint8) + 2 * do_horiz.astype(jnp.uint8)
                + 3 * do_vert.astype(jnp.uint8))
        ii = ii - do_diag.astype(jnp.int32) - do_vert.astype(jnp.int32)
        jj = jj - do_diag.astype(jnp.int32) - do_horiz.astype(jnp.int32)
        return (ii, jj), move

    ii0 = jnp.where(ok, xlen, 0).astype(jnp.int32)
    jj0 = jnp.where(ok, best_n, 0).astype(jnp.int32)
    S = XL + 2 * e + 1
    (ii, jj), moves = lax.scan(tb_step, (ii0, jj0), None, length=S)
    y_start = jnp.where(ok, jj, -1).astype(jnp.int32)

    # decode the move-log into per-position traceback arrays ON DEVICE with
    # three one-shot scatters (host transfer of the move-log is fragmented
    # and slow; flat [B*XL] uint8 outputs stream back contiguously)
    diag = moves == 1
    horiz = moves == 2
    vert = moves == 3
    adv_i = (diag | vert).astype(jnp.int32)
    adv_j = (diag | horiz).astype(jnp.int32)
    ii_b = xlen[None, :].astype(jnp.int32) - (jnp.cumsum(adv_i, axis=0)
                                              - adv_i)
    jj_b = best_n[None, :].astype(jnp.int32) - (jnp.cumsum(adv_j, axis=0)
                                                - adv_j)
    p = ii_b - 1                                  # x position of each move
    yj = jj_b - 1
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :],
                             (S, B))
    ych = jnp.take_along_axis(
        y, jnp.clip(yj, 0, YL - 1).T, axis=1).T.astype(jnp.uint8)

    flat_idx = b_idx * XL + jnp.clip(p, 0, XL - 1)
    oob = jnp.int32(B * XL)                       # dropped via mode="drop"
    tbv = jnp.where(diag, ych, jnp.uint8(4))
    tb_idx = jnp.where(diag | vert, flat_idx, oob).reshape(-1)
    tb = jnp.full(B * XL, 5, jnp.uint8).at[tb_idx].set(
        tbv.reshape(-1), mode="drop")
    ic_idx = jnp.where(horiz, flat_idx, oob).reshape(-1)
    ic = jnp.zeros(B * XL, jnp.int32).at[ic_idx].add(1, mode="drop")
    ic = jnp.minimum(ic, 255).astype(jnp.uint8)
    # the sequential traceback overwrites ins_base on every horiz move, so
    # the LAST-executed (largest k) wins: scatter-max of (k << 8 | base)
    kk = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, B))
    ibv = jnp.where(horiz, (kk << 8) | ych.astype(jnp.int32), -1)
    ib_enc = jnp.full(B * XL, -1, jnp.int32).at[ic_idx].max(
        ibv.reshape(-1), mode="drop")
    ib = jnp.where(ib_enc >= 0, ib_enc & 0xFF, 0).astype(jnp.uint8)
    return (out_err, y_start, best_n.astype(jnp.int32), tb, ic, ib)


BLOCK = 4096  # static device batch: every launch pads to this (one compile;
#               the scan's sequential latency dominates, extra lanes are free)


def _bucket(b: int) -> int:
    if b <= BLOCK:
        return BLOCK
    n = BLOCK
    while n < b:
        n *= 2
    return n


def banded_batch_jax(x: np.ndarray, xlen: np.ndarray, y: np.ndarray,
                     ylen: np.ndarray, e: int,
                     traceback: bool = True) -> BatchAlign:
    """Engine-API wrapper: pads B to the static block, runs the jitted
    kernel (traceback decoded on device, streamed back flat)."""
    B, XL = x.shape
    Bp = _bucket(B)
    if Bp != B:
        x = np.concatenate([x, np.full((Bp - B, XL), 4, np.uint8)])
        y = np.concatenate([y, np.full((Bp - B, y.shape[1]), 4, np.uint8)])
        xlen = np.concatenate([xlen, np.zeros(Bp - B, xlen.dtype)])
        ylen = np.concatenate([ylen, np.zeros(Bp - B, ylen.dtype)])
    err, ys, yn, tb, ic, ib = _banded_jax(
        jnp.asarray(x), jnp.asarray(xlen), jnp.asarray(y),
        jnp.asarray(ylen), e, traceback)
    err = np.asarray(err)
    ys = np.asarray(ys)
    yn = np.asarray(yn)
    if not traceback:
        z = np.zeros((B, XL), np.uint8)
        return BatchAlign(err[:B], ys[:B], yn[:B], z, z.copy(), z.copy())
    tb = np.asarray(tb).reshape(Bp, XL)
    ic = np.asarray(ic).reshape(Bp, XL)
    ib = np.asarray(ib).reshape(Bp, XL)
    return BatchAlign(err[:B], ys[:B], yn[:B], tb[:B], ic[:B], ib[:B])
