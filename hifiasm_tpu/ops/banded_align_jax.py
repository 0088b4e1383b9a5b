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

    # ---- row-sweep traceback: one scan step per x row, NO gathers ----
    # The naive per-move pointer chase needs a dynamic row gather per
    # step (per-lane ii differs), which XLA lowers to catastrophically
    # slow TPU gathers (~100x the forward scan).  Instead sweep rows
    # i = XL-1 .. 0 with STATIC indexing: at row ii = i+1 every lane
    # consumes its run of horizontal moves plus one diag/vert move in
    # CLOSED FORM — the move choice is a find-highest-set-bit over the
    # packed per-row move masks:
    #   HORIZ = vp << 1 (bit b: vp_bit(b-1) and b>=1)
    #   DIAG  = matches XNOR d0   (band bits only)
    #   b*    = msb(( DIAG | ~HORIZ ) & bits[0..bb]);  t = bb - b*
    # which emits ic[i] = t horizontal moves, tb[i] from the final
    # diag/vert, and bb' = b* (diag) or b*+1 (vert).  Every step output
    # is the [B] column at static position i, so tb/ic/ib assemble as
    # plain scan stacks (no scatters).  Bit-identical with the host
    # decode (tests/test_banded_align_jax.py, tests/test_device_ec.py).
    W2 = 2 * e
    WIN = 64
    y_pad = jnp.concatenate(
        [y.astype(jnp.uint8), jnp.full((B, WIN), 4, jnp.uint8)], axis=1)
    bb0 = jnp.where(ok, best_n - xlen, 0).astype(jnp.int32)
    band_mask_lo, band_mask_hi = _u64_mask(W2 + 1)     # bits 0..2e
    vert_mask_lo, vert_mask_hi = _u64_mask(W2) if W2 > 0 else (0, 0)

    bit_w_lo = (_ONE << jnp.arange(32, dtype=U32))     # [32]
    pos_b = jnp.arange(WIN, dtype=jnp.int32)           # [WIN]

    def _msb_pair(hi, lo):
        """Highest set bit of a (hi, lo) pair (undefined when 0)."""
        use_hi = hi != 0
        v = jnp.where(use_hi, hi, lo)
        p = jnp.zeros_like(v, dtype=jnp.int32)
        for s in (16, 8, 4, 2, 1):
            m = v >> np.uint32(s)
            take = m != 0
            v = jnp.where(take, m, v)
            p = p + s * take.astype(jnp.int32)
        return p + jnp.where(use_hi, 32, 0)

    def _sel_win(w, idx):
        """w [B, WIN] uint8, idx [B] in [0, WIN): per-lane select via
        6-level binary mux (cheap on TPU; avoids a gather)."""
        cur = w
        width = WIN
        while width > 1:
            half = width // 2
            bitv = (idx >= half)
            lo_h = cur[:, :half]
            hi_h = cur[:, half:half * 2]
            cur = jnp.where(bitv[:, None], hi_h, lo_h)
            idx = jnp.where(bitv, idx - half, idx)
            width = half
        return cur[:, 0]

    def row_step(carry, xs):
        bb, jdone, i = carry
        xc, d0hi, d0lo, hphi, hplo, vphi, vplo = xs
        active = (i < xlen) & ok & ~jdone
        ysl = lax.dynamic_slice(y_pad, (jnp.int32(0), i), (B, WIN))
        # matches window (exact tb_step semantics, jj-1 = i + b)
        mt = (ysl.astype(jnp.int32) == xc[:, None]) & \
            (xc[:, None] < 4) & ((i + pos_b)[None, :] < ylen[:, None])
        m_lo = jnp.sum(jnp.where(mt[:, :32], bit_w_lo[None, :],
                                 np.uint32(0)), axis=1, dtype=U32)
        m_hi = jnp.sum(jnp.where(mt[:, 32:64], bit_w_lo[None, :],
                                 np.uint32(0)), axis=1, dtype=U32)
        diag_hi = (~(m_hi ^ d0hi)) & band_mask_hi
        diag_lo = (~(m_lo ^ d0lo)) & band_mask_lo
        horiz_hi = (vphi << _ONE) | (vplo >> np.uint32(31))
        horiz_lo = vplo << _ONE
        stop_hi = diag_hi | (~horiz_hi)
        stop_lo = diag_lo | (~horiz_lo) | _ONE     # b=0 never horiz
        # bits 0..bb only
        bbc = jnp.clip(bb, 0, 63)
        keep_lo = jnp.where(
            bbc >= 31, np.uint32(0xFFFFFFFF),
            (_ONE << (bbc + 1).astype(U32)) - _ONE)
        keep_hi = jnp.where(
            bbc < 32, np.uint32(0),
            jnp.where(bbc >= 63, np.uint32(0xFFFFFFFF),
                      (_ONE << jnp.clip(bbc - 31, 0, 31).astype(U32))
                      - _ONE))
        bs = _msb_pair(stop_hi & keep_hi, stop_lo & keep_lo)
        t = bb - bs
        diag_take = _getbit(diag_hi, diag_lo, bs).astype(bool)
        vert_bit = _getbit(hphi & vert_mask_hi, hplo & vert_mask_lo,
                           bs).astype(bool)
        vert_take = ~diag_take & vert_bit
        ych = _sel_win(ysl, jnp.clip(bs, 0, WIN - 1))
        ych_ins = _sel_win(ysl, jnp.clip(bs + 1, 0, WIN - 1))
        tb_col = jnp.where(
            active & diag_take, ych,
            jnp.where(active & vert_take, jnp.uint8(4), jnp.uint8(5)))
        ic_col = jnp.where(active, jnp.clip(t, 0, 255), 0).astype(
            jnp.uint8)
        ib_col = jnp.where(active & (t > 0), ych_ins, jnp.uint8(0))
        stall = active & ~diag_take & ~vert_take & (t == 0)
        bb_new = jnp.where(
            active & ~stall,
            jnp.where(diag_take, bs, jnp.where(vert_take, bs + 1, bb)),
            bb)
        jdone = jnp.where(active & stall, True, jdone)
        return (bb_new, jdone, i - 1), (tb_col, ic_col, ib_col)

    carry0 = (bb0, jnp.zeros(B, bool), jnp.int32(XL - 1))
    xs_rows = (jnp.flip(x.T.astype(jnp.int32), 0),
               jnp.flip(st_d0hi, 0), jnp.flip(st_d0lo, 0),
               jnp.flip(st_hphi, 0), jnp.flip(st_hplo, 0),
               jnp.flip(st_vphi, 0), jnp.flip(st_vplo, 0))
    (bb_fin, _, _), (tb_rows, ic_rows, ib_rows) = lax.scan(
        row_step, carry0, xs_rows)
    # rows were emitted i = XL-1 .. 0; un-flip then transpose to [B, XL]
    tb = jnp.flip(tb_rows, 0).T.reshape(-1)
    ic = jnp.flip(ic_rows, 0).T.reshape(-1)
    ib = jnp.flip(ib_rows, 0).T.reshape(-1)
    y_start = jnp.where(ok, bb_fin, -1).astype(jnp.int32)
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
