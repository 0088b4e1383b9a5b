"""Pallas TPU kernel: banded Myers forward scan (scoring mode).

The speed-of-light path for window verification: the whole 775-step Myers
recurrence runs INSIDE one kernel with all state in VMEM/registers — no
per-step XLA op dispatch, no HBM round-trips for the bit-planes.  Each
grid step processes a block of ``BB`` window problems as (1, BB) uint32
row vectors on the VPU; the band's 2e+1 <= 63 bits live in (hi, lo) lane
pairs exactly like ops/banded_align_jax.py (same semantics, cross-checked
in tests via interpret mode).

Scoring mode returns (err, y_end); the traceback path stays on the XLA
scan engine (per-lane dynamic row gathers during backtrack do not map
onto the VPU; the forward scan is ~half the device work).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hifiasm_tpu.ops.banded_batch import BatchAlign

BB = 512          # problems per grid block (lane dimension)


def _mk_kernel(XL: int, YL: int, e: int):
    W = 2 * e + 1
    mlo = np.uint32(((1 << W) - 1) & 0xFFFFFFFF)
    mhi = np.uint32(((1 << W) - 1) >> 32)
    one = np.uint32(1)
    thirty1 = np.uint32(31)

    def kernel(x_ref, y_ref, xlen_ref, ylen_ref, err_ref, yend_ref):
        xlen = xlen_ref[0, :].astype(jnp.int32)
        ylen = ylen_ref[0, :].astype(jnp.int32)
        nb = xlen.shape[0]
        zeros = jnp.zeros((nb,), jnp.uint32)

        # initial Peq over y[:W]
        def init_peq(b0, peq):
            yb = y_ref[b0, :].astype(jnp.int32)
            valid = b0 < ylen
            bit_lo = jnp.where(
                (b0 < 32) & valid,
                one << jnp.uint32(b0 if b0 < 32 else 0), np.uint32(0))
            bit_hi = jnp.where(
                (b0 >= 32) & valid,
                one << jnp.uint32(b0 - 32 if b0 >= 32 else 0), np.uint32(0))
            out = []
            for c in range(4):
                ph, plo = peq[2 * c], peq[2 * c + 1]
                m = yb == c
                out.append(jnp.where(m, ph | bit_hi, ph))
                out.append(jnp.where(m, plo | bit_lo, plo))
            return tuple(out)

        peq = (zeros,) * 8
        for b0 in range(min(W, YL)):     # static unroll, W <= 63
            peq = init_peq(b0, peq)

        def step(i, carry):
            (vp_hi, vp_lo, vn_hi, vn_lo, err, *pq) = carry
            pq = tuple(pq)
            xc = x_ref[i, :].astype(jnp.int32)
            live = i < xlen
            eq_hi = zeros
            eq_lo = zeros
            for c in range(4):
                m = xc == c
                eq_hi = jnp.where(m, pq[2 * c], eq_hi)
                eq_lo = jnp.where(m, pq[2 * c + 1], eq_lo)
            x_hi = eq_hi | vn_hi
            x_lo = eq_lo | vn_lo
            t_hi = x_hi & vp_hi
            t_lo = x_lo & vp_lo
            s_lo = vp_lo + t_lo
            carry_bit = (s_lo < vp_lo).astype(jnp.uint32)
            s_hi = (vp_hi + t_hi + carry_bit) & mhi
            s_lo = s_lo & mlo
            d0_hi = (s_hi ^ vp_hi) | x_hi
            d0_lo = (s_lo ^ vp_lo) | x_lo
            hn_hi = vp_hi & d0_hi
            hn_lo = vp_lo & d0_lo
            hp_hi = vn_hi | (~(vp_hi | d0_hi) & mhi)
            hp_lo = vn_lo | (~(vp_lo | d0_lo) & mlo)
            x2_hi = d0_hi >> one
            x2_lo = (d0_lo >> one) | (d0_hi << thirty1)
            nvn_hi = x2_hi & hp_hi
            nvn_lo = x2_lo & hp_lo
            nvp_hi = (hn_hi | (~(x2_hi | hp_hi) & mhi)) & mhi
            nvp_lo = (hn_lo | (~(x2_lo | hp_lo) & mlo)) & mlo
            vp_hi = jnp.where(live, nvp_hi, vp_hi)
            vp_lo = jnp.where(live, nvp_lo, vp_lo)
            vn_hi = jnp.where(live, nvn_hi, vn_hi)
            vn_lo = jnp.where(live, nvn_lo, vn_lo)
            err = jnp.where(live,
                            err + 1 - (d0_lo & one).astype(jnp.int32), err)
            # Peq shift + admit y[i + W]
            adm_row = i + W
            yc = jnp.where(adm_row < YL + 0,
                           y_ref[jnp.minimum(adm_row, YL - 1), :].astype(
                               jnp.int32), 4)
            adm = live & (adm_row < ylen)
            top_lo = np.uint32(1 << (W - 1)) if W <= 32 else np.uint32(0)
            top_hi = np.uint32(1 << (W - 33)) if W > 32 else np.uint32(0)
            npq = []
            for c in range(4):
                ph, plo = pq[2 * c], pq[2 * c + 1]
                nlo = (plo >> one) | (ph << thirty1)
                nh = ph >> one
                m = adm & (yc == c)
                npq.append(jnp.where(m, nh | top_hi, nh))
                npq.append(jnp.where(m, nlo | top_lo, nlo))
            return (vp_hi, vp_lo, vn_hi, vn_lo, err) + tuple(npq)

        carry0 = (zeros, zeros, zeros, zeros,
                  jnp.zeros((nb,), jnp.int32)) + peq
        vp_hi, vp_lo, vn_hi, vn_lo, err, *_ = lax.fori_loop(
            0, XL, step, carry0)

        # free-end scan over endpoints xlen .. min(xlen + 2e, ylen)
        nb_max = jnp.minimum(2 * e, ylen - xlen)

        def end_step(b0, st):
            e2, e3, best_err, best_n = st
            bit_p = jnp.where(
                b0 < 32, (vp_lo >> jnp.uint32(b0)) & one,
                (vp_hi >> jnp.uint32(jnp.maximum(b0 - 32, 0))) & one
            ).astype(jnp.int32)
            bit_n = jnp.where(
                b0 < 32, (vn_lo >> jnp.uint32(b0)) & one,
                (vn_hi >> jnp.uint32(jnp.maximum(b0 - 32, 0))) & one
            ).astype(jnp.int32)
            e2 = e2 + bit_p - bit_n
            better = (b0 < nb_max) & (e2 < best_err)
            best_err = jnp.where(better, e2, best_err)
            best_n = jnp.where(better, xlen + b0 + 1, best_n)
            e3 = jnp.where(b0 < e, e3 + bit_p - bit_n, e3)
            return e2, e3, best_err, best_n

        e2, e3, best_err, best_n = lax.fori_loop(
            0, 2 * e, end_step, (err, err, err, xlen))
        pref = (ylen - xlen >= e) & (e3 == best_err)
        best_n = jnp.where(pref, xlen + e, best_n)
        ok = best_err <= e
        err_ref[0, :] = jnp.where(ok, best_err, -1)
        yend_ref[0, :] = best_n

    return kernel


@functools.partial(jax.jit, static_argnums=(4, 5))
def _pallas_forward(x_t, y_t, xlen, ylen, e: int, interpret: bool):
    XL, B = x_t.shape
    YL = y_t.shape[0]
    kernel = _mk_kernel(XL, YL, e)
    grid = (B // BB,)
    err, yend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((XL, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((YL, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )(x_t, y_t, xlen, ylen)
    return err[0], yend[0]


def banded_forward_pallas(x: np.ndarray, xlen: np.ndarray, y: np.ndarray,
                          ylen: np.ndarray, e: int,
                          traceback: bool = False,
                          interpret: bool = False) -> BatchAlign:
    """Engine-compatible scoring call (traceback is ignored/False)."""
    B, XL = x.shape
    Bp = ((B + BB - 1) // BB) * BB
    if Bp != B:
        x = np.concatenate([x, np.full((Bp - B, XL), 4, np.uint8)])
        y = np.concatenate([y, np.full((Bp - B, y.shape[1]), 4, np.uint8)])
        xlen = np.concatenate([xlen, np.zeros(Bp - B, xlen.dtype)])
        ylen = np.concatenate([ylen, np.zeros(Bp - B, ylen.dtype)])
    err, yend = _pallas_forward(
        jnp.asarray(x.T.astype(np.int32)),
        jnp.asarray(y.T.astype(np.int32)),
        jnp.asarray(xlen.astype(np.int32)[None, :]),
        jnp.asarray(ylen.astype(np.int32)[None, :]), e, interpret)
    z = np.zeros((B, XL), np.uint8)
    return BatchAlign(np.asarray(err)[:B], np.full(B, -1, np.int32),
                      np.asarray(yend)[:B], z, z.copy(), z.copy())
