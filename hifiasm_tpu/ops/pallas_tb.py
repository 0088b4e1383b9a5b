"""Fused Pallas TPU kernel: banded Myers forward scan + traceback.

The production device engine for EC window verification (replaces the
XLA-scan engine of ops/banded_align_jax.py on TPU backends; reference
hot kernel: Levenshtein_distance.h:3857 Reserve_Banded_BPM(_PATH)).
Bit-identical outputs with ``banded_align_jax.banded_core(traceback=True)``
(cross-validated in tests/test_pallas_tb.py).

Why fused / why fast:

- Every state plane is an (S=8, 128) uint32 VPU tile (the XLA engine's
  [B] vectors lower to 1-of-8-sublane tiles; the banded_pallas.py
  scoring kernel used (1, BB) rows — both waste 7/8 of the VPU).
- The whole 775-step recurrence runs inside ONE kernel: no per-step XLA
  op dispatch and, crucially, NO move-log spill through HBM.  The XLA
  traceback stored 6 uint32 planes per row per window (~18 KB/window)
  to HBM and read them back; here the forward pass checkpoints carry
  state every ``RC=64`` rows into VMEM (~13 x 12 tiles), and the
  backward sweep re-derives each 64-row segment's move planes into a
  1.5 MB VMEM scratch — recompute instead of spill.
- x/y characters are byte-packed 4-per-uint32 so all loads are aligned
  u32 tiles (no int8 sub-tile traffic).
- The backward sweep needs per-lane y characters at dynamic band
  offsets; instead of a 64-wide mux it maintains three y-code bit
  planes (low bit / high bit / is-pad) that shift-admit one row per
  backward step, so the select is three dynamic bit-extracts.
- tb/ic/ib bytes pack into one uint32 per row written straight to the
  output block.

Semantics (identical to the host oracle ops/banded_batch.py): x aligns
globally, y-start free in [0, 2e], y-end free in [xlen, xlen+2e],
err <= e or -1.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RC = 64           # checkpoint segment length (rows)
LANES = 128

_U32 = jnp.uint32


def _c(v):
    return np.uint32(v & 0xFFFFFFFF)


def _masks(nbits: int):
    m = (1 << nbits) - 1
    return _c(m), _c(m >> 32)


def _mk_kernel(XL: int, XLR: int, YW: int, e: int, S: int,
               stream_out: bool = True):
    """Kernel for static (XL, e, lanes-per-block = S*128).

    ``stream_out=True`` (TPU) keeps the move log in HBM and DMAs each
    RC-row segment out of a small VMEM staging scratch — the full
    (XLR, S, 128) out block was the largest VMEM resident and blocked
    the 2048-lane config.  ``stream_out=False`` (CPU interpret mode,
    where ``pl.program_id`` inside the DMA index does not lower) writes
    the out block directly; the two variants share every other line."""
    W = 2 * e + 1
    NC = XLR // RC
    mlo, mhi = _masks(W)
    band_lo, band_hi = _masks(W)               # bits 0..2e
    vert_lo, vert_hi = _masks(2 * e)           # bits 0..2e-1
    one = _c(1)
    top_lo = _c(1 << (W - 1)) if W <= 32 else _c(0)
    top_hi = _c(1 << (W - 33)) if W > 32 else _c(0)

    def kernel(xp_ref, yp_ref, xlen_ref, ylen_ref,
               out_ref, err_ref, ys_ref, yn_ref, ckpt_ref, seg_ref,
               stage_ref=None, dma_sem=None):
        xlen = xlen_ref[:].astype(jnp.int32)
        ylen = ylen_ref[:].astype(jnp.int32)
        zero = jnp.zeros((S, LANES), _U32)

        def ychar(idx):
            """y_pad[idx] as (S, 128) uint32; idx static or traced."""
            w = yp_ref[idx >> 2]
            sh = (jnp.asarray(idx, jnp.int32) & 3).astype(_U32) * _U32(8)
            return (w >> sh) & _U32(0xFF)

        def xchar(i):
            w = xp_ref[i >> 2]
            sh = (jnp.asarray(i, jnp.int32) & 3).astype(_U32) * _U32(8)
            return (w >> sh) & _U32(0xFF)

        # ---- initial Peq over y[0..W-1] ----
        peq = [zero] * 8                  # [c*2] = hi, [c*2+1] = lo
        for b0 in range(W):
            yc = ychar(b0).astype(jnp.int32)
            valid = b0 < ylen
            for c in range(4):
                m = valid & (yc == c)
                if b0 < 32:
                    peq[2 * c + 1] = jnp.where(
                        m, peq[2 * c + 1] | _c(1 << b0), peq[2 * c + 1])
                else:
                    peq[2 * c] = jnp.where(
                        m, peq[2 * c] | _c(1 << (b0 - 32)), peq[2 * c])

        def fwd_step(i, st, store_seg, k, xc=None, yc2=None):
            """One Myers step from state st at row i; optionally stores
            (diag, hp, vp') planes into seg_ref[k].  ``xc``/``yc2`` may
            be pre-extracted by the 4-row unrolled drivers (one aligned
            word load + static byte shifts per 4 rows, instead of a
            dynamic-index load and dynamic shift per row — Mosaic
            pipelines the static form)."""
            (vp_hi, vp_lo, vn_hi, vn_lo, err, *pq) = st
            if xc is None:
                xc = xchar(i).astype(jnp.int32)
            live = i < xlen
            eq_hi = zero
            eq_lo = zero
            for c in range(4):
                m = xc == c
                eq_hi = jnp.where(m, pq[2 * c], eq_hi)
                eq_lo = jnp.where(m, pq[2 * c + 1], eq_lo)
            x_hi = eq_hi | vn_hi
            x_lo = eq_lo | vn_lo
            t_hi = x_hi & vp_hi
            t_lo = x_lo & vp_lo
            s_lo = vp_lo + t_lo
            carry = (s_lo < vp_lo).astype(_U32)
            s_hi = (vp_hi + t_hi + carry) & mhi
            s_lo = s_lo & mlo
            d0_hi = (s_hi ^ vp_hi) | x_hi
            d0_lo = (s_lo ^ vp_lo) | x_lo
            hn_hi = vp_hi & d0_hi
            hn_lo = vp_lo & d0_lo
            hp_hi = vn_hi | (~(vp_hi | d0_hi) & mhi)
            hp_lo = vn_lo | (~(vp_lo | d0_lo) & mlo)
            x2_hi = d0_hi >> one
            x2_lo = (d0_lo >> one) | (d0_hi << _c(31))
            nvn_hi = x2_hi & hp_hi
            nvn_lo = x2_lo & hp_lo
            nvp_hi = (hn_hi | (~(x2_hi | hp_hi) & mhi)) & mhi
            nvp_lo = (hn_lo | (~(x2_lo | hp_lo) & mlo)) & mlo
            vp_hi2 = jnp.where(live, nvp_hi, vp_hi)
            vp_lo2 = jnp.where(live, nvp_lo, vp_lo)
            vn_hi2 = jnp.where(live, nvn_hi, vn_hi)
            vn_lo2 = jnp.where(live, nvn_lo, vn_lo)
            err2 = jnp.where(live,
                             err + 1 - (d0_lo & one).astype(jnp.int32),
                             err)
            if store_seg:
                seg_ref[k, 0] = (~(eq_hi ^ d0_hi)) & band_hi
                seg_ref[k, 1] = (~(eq_lo ^ d0_lo)) & band_lo
                seg_ref[k, 2] = hp_hi
                seg_ref[k, 3] = hp_lo
                seg_ref[k, 4] = vp_hi2
                seg_ref[k, 5] = vp_lo2
            # Peq shift + admit y[i + W]
            if yc2 is None:
                yc2 = ychar(i + W).astype(jnp.int32)
            adm = live & ((i + W) < ylen)
            npq = []
            for c in range(4):
                ph, plo = pq[2 * c], pq[2 * c + 1]
                nlo = (plo >> one) | (ph << _c(31))
                nh = ph >> one
                m = adm & (yc2 == c)
                npq.append(jnp.where(m, nh | top_hi, nh))
                npq.append(jnp.where(m, nlo | top_lo, nlo))
            return (vp_hi2, vp_lo2, vn_hi2, vn_lo2, err2) + tuple(npq)

        def fwd4(wi, st, store_seg, k0):
            """Four unrolled Myers rows starting at i = 4*wi: ONE
            aligned x-word load and (at most) two y-word loads with
            STATIC byte shifts replace the per-row dynamic-index loads
            and dynamic shifts."""
            xw = xp_ref[wi]
            # admit chars y[4*wi + sub + W]: words wi + (sub+W)>>2
            woffs = sorted({(sub + W) >> 2 for sub in range(4)})
            ywords = {off: yp_ref[wi + off] for off in woffs}
            for sub in range(4):
                xc = ((xw >> _c(8 * sub)) & _U32(0xFF)).astype(jnp.int32)
                yw = ywords[(sub + W) >> 2]
                yb = (sub + W) & 3
                yc2 = ((yw >> _c(8 * yb)) & _U32(0xFF)).astype(jnp.int32)
                st = fwd_step(4 * wi + sub, st, store_seg,
                              k0 + sub, xc=xc, yc2=yc2)
            return st

        # ---- pass A: forward with checkpoints every RC rows ----
        def passA(wi, st):
            @pl.when((4 * wi) % RC == 0)
            def _():
                c = (4 * wi) // RC
                for p in range(12):
                    ckpt_ref[c, p] = st[(0, 1, 2, 3)[p]] if p < 4 \
                        else st[5 + (p - 4)]
            return fwd4(wi, st, False, 0)

        st0 = (zero, zero, zero, zero,
               jnp.zeros((S, LANES), jnp.int32)) + tuple(peq)
        stf = lax.fori_loop(0, XLR // 4, passA, st0)
        vp_hi, vp_lo, vn_hi, vn_lo, err = stf[:5]

        # ---- free-end scan over endpoints xlen .. min(xlen+2e, ylen) ----
        nb_max = jnp.minimum(2 * e, ylen - xlen)
        best_err = err
        best_n = xlen
        e2 = err
        e3 = err
        for b0 in range(2 * e):
            if b0 < 32:
                bit_p = ((vp_lo >> _c(b0)) & one).astype(jnp.int32)
                bit_n = ((vn_lo >> _c(b0)) & one).astype(jnp.int32)
            else:
                bit_p = ((vp_hi >> _c(b0 - 32)) & one).astype(jnp.int32)
                bit_n = ((vn_hi >> _c(b0 - 32)) & one).astype(jnp.int32)
            e2 = e2 + bit_p - bit_n
            better = (b0 < nb_max) & (e2 < best_err)
            best_err = jnp.where(better, e2, best_err)
            best_n = jnp.where(better, xlen + b0 + 1, best_n)
            if b0 < e:
                e3 = e3 + bit_p - bit_n
        pref = (ylen - xlen >= e) & (e3 == best_err)
        best_n = jnp.where(pref, xlen + e, best_n)
        ok = best_err <= e
        err_ref[:] = jnp.where(ok, best_err, -1)
        yn_ref[:] = best_n

        # ---- pass B: per-segment recompute + backward row sweep ----
        def getbit(hi, lo, b):
            blo = jnp.clip(b, 0, 31).astype(_U32)
            bhi = jnp.clip(b - 32, 0, 31).astype(_U32)
            return jnp.where(b < 32, (lo >> blo) & one, (hi >> bhi) & one)

        def msb_pair(hi, lo):
            use_hi = hi != _U32(0)
            v = jnp.where(use_hi, hi, lo)
            p = jnp.zeros((S, LANES), jnp.int32)
            for s in (16, 8, 4, 2, 1):
                m = v >> _c(s)
                take = m != _U32(0)
                v = jnp.where(take, m, v)
                p = p + s * take.astype(jnp.int32)
            return p + jnp.where(use_hi, 32, 0)

        bb0 = jnp.where(ok, best_n - xlen, 0).astype(jnp.int32)
        done0 = (~ok).astype(jnp.int32)   # bool carries fail Mosaic's
        #                                   scf.for legalization
        # y-code planes for virtual row XLR (bits b = y_pad[XLR + b]);
        # each backward step shift-admits one row so row i's planes are
        # always bits b = y_pad[i + b], b in 0..63.
        y0h = y0l = y1h = y1l = y4h = y4l = zero
        for b in range(64):
            yc = ychar(XLR + b)
            b0v = (yc & one)
            b1v = (yc >> one) & one
            b4v = (yc == _U32(4)).astype(_U32)
            if b < 32:
                sh = _c(b)
                y0l = y0l | (b0v << sh)
                y1l = y1l | (b1v << sh)
                y4l = y4l | (b4v << sh)
            else:
                sh = _c(b - 32)
                y0h = y0h | (b0v << sh)
                y1h = y1h | (b1v << sh)
                y4h = y4h | (b4v << sh)

        def seg_body(sidx, carry):
            i0 = (NC - 1 - sidx) * RC
            # recompute the segment's move planes from the checkpoint
            cp = [ckpt_ref[NC - 1 - sidx, p] for p in range(12)]
            stc = (cp[0], cp[1], cp[2], cp[3],
                   jnp.zeros((S, LANES), jnp.int32)) + tuple(cp[4:])

            def re_k(wj, st):
                return fwd4(i0 // 4 + wj, st, True, 4 * wj)

            lax.fori_loop(0, RC // 4, re_k, stc)

            def bwd4(j, c2):
                """Four unrolled backward rows kk = RC-1-4j .. RC-4-4j:
                one aligned y-word load, static byte shifts."""
                yw = yp_ref[i0 // 4 + (RC // 4 - 1 - j)]
                for s in range(4):
                    yc = (yw >> _c(8 * (3 - s))) & _U32(0xFF)
                    c2 = bwd_row(RC - 1 - 4 * j - s, yc, c2)
                return c2

            def bwd_row(kk, yc, c2):
                (bb, done, y0h, y0l, y1h, y1l, y4h, y4l) = c2
                i = i0 + kk
                # shift-admit y_pad[i] -> planes now describe row i
                y0h = (y0h << one) | (y0l >> _c(31))
                y0l = (y0l << one) | (yc & one)
                y1h = (y1h << one) | (y1l >> _c(31))
                y1l = (y1l << one) | ((yc >> one) & one)
                y4h = (y4h << one) | (y4l >> _c(31))
                y4l = (y4l << one) | (yc == _U32(4)).astype(_U32)
                dgh = seg_ref[kk, 0]
                dgl = seg_ref[kk, 1]
                hph = seg_ref[kk, 2]
                hpl = seg_ref[kk, 3]
                vph = seg_ref[kk, 4]
                vpl = seg_ref[kk, 5]
                active = (i < xlen) & (done == 0)
                horiz_hi = (vph << one) | (vpl >> _c(31))
                horiz_lo = vpl << one
                stop_hi = dgh | (~horiz_hi)
                stop_lo = dgl | (~horiz_lo) | one
                bbc = jnp.clip(bb, 0, 63)
                keep_lo = jnp.where(
                    bbc >= 31, _U32(0xFFFFFFFF),
                    (one << jnp.clip(bbc + 1, 0, 31).astype(_U32)) - one)
                keep_hi = jnp.where(
                    bbc < 32, _U32(0),
                    jnp.where(bbc >= 63, _U32(0xFFFFFFFF),
                              (one << jnp.clip(bbc - 31, 0, 31)
                               .astype(_U32)) - one))
                bs = msb_pair(stop_hi & keep_hi, stop_lo & keep_lo)
                t = bb - bs
                diag_take = getbit(dgh, dgl, bs).astype(bool)
                vert_take = ~diag_take & getbit(
                    hph & vert_hi, hpl & vert_lo, bs).astype(bool)
                bch = getbit(y0h, y0l, bs) | (getbit(y1h, y1l, bs)
                                              << one)
                ych = jnp.where(getbit(y4h, y4l, bs) != 0,
                                _U32(4), bch)
                bsi = jnp.clip(bs + 1, 0, 63)
                bchi = getbit(y0h, y0l, bsi) | (getbit(y1h, y1l, bsi)
                                                << one)
                ych_ins = jnp.where(getbit(y4h, y4l, bsi) != 0,
                                    _U32(4), bchi)
                tb = jnp.where(active & diag_take, ych,
                               jnp.where(active & vert_take,
                                         _U32(4), _U32(5)))
                ic = jnp.where(active, jnp.clip(t, 0, 255), 0) \
                    .astype(_U32)
                ib = jnp.where(active & (t > 0), ych_ins, _U32(0))
                word = tb | (ic << _c(8)) | (ib << _c(16))
                if stream_out:
                    stage_ref[kk] = word
                else:
                    out_ref[i] = word
                stall = active & ~diag_take & ~vert_take & (t == 0)
                bb = jnp.where(
                    active & ~stall,
                    jnp.where(diag_take, bs,
                              jnp.where(vert_take, bs + 1, bb)), bb)
                done = done | stall.astype(jnp.int32)
                return (bb, done, y0h, y0l, y1h, y1l, y4h, y4l)

            carry = lax.fori_loop(0, RC // 4, bwd4, carry)
            if stream_out:
                # stream this segment's move-log rows VMEM -> HBM: the
                # full (XLR, S, 128) out block was the largest VMEM
                # resident and blocked the 2048-lane config
                bs = pl.program_id(0) * S
                dma = pltpu.make_async_copy(
                    stage_ref,
                    out_ref.at[pl.ds(i0, RC), pl.ds(bs, S), :],
                    dma_sem)
                dma.start()
                dma.wait()
            return carry

        carryf = lax.fori_loop(
            0, NC, seg_body,
            (bb0, done0, y0h, y0l, y1h, y1l, y4h, y4l))
        ys_ref[:] = jnp.where(ok, carryf[0], -1)

    return kernel, NC


def _pack4(rowsT):
    """[Nrows, B] uint32 char columns -> [Nrows//4, B] byte-packed."""
    return (rowsT[0::4] | (rowsT[1::4] << 8) | (rowsT[2::4] << 16)
            | (rowsT[3::4] << 24)).astype(_U32)


def pallas_tb_core(x, xlen, y, ylen, e: int, bb_lanes: int = 2048,
                   interpret: bool = False):
    """jnp-composable fused align+traceback; returns
    (err, y_start, y_end, tb, ic, ib) bit-identical to
    banded_align_jax.banded_core(..., traceback=True).  tb/ic/ib are
    flat [B*XL] uint8 in window-major order.  B must be a multiple of
    ``bb_lanes`` (callers pad).

    Default 2048 lanes/block: with the move log streamed to HBM the
    16-tile config fits VMEM and runs ~10% faster per marginal window
    than 1024 (measured r5: 2.52 M win/s at 256k windows vs 2.06 M for
    the r4 VMEM-resident kernel; outputs bit-identical across lane
    configs)."""
    B, XL = x.shape
    YL = y.shape[1]
    assert B % bb_lanes == 0, (B, bb_lanes)
    # the two-uint32 band planes and the 64-row y bit-plane shift window
    # hold W = 2e+1 <= 63 band columns; a larger e would silently produce
    # garbage masks/traceback (same uint64 Myers-lane bound as ul.py)
    assert 0 <= e <= 31, f"band half-width e={e} exceeds the 64-bit lanes"
    S = bb_lanes // LANES
    XLR = -(-XL // RC) * RC
    YW = XLR + 64
    nb = B // bb_lanes

    xT = x.T.astype(_U32)
    if XLR > XL:
        xT = jnp.concatenate(
            [xT, jnp.full((XLR - XL, B), 4, _U32)], axis=0)
    yT = y.T.astype(_U32)
    if YW > YL:
        yT = jnp.concatenate(
            [yT, jnp.full((YW - YL, B), 4, _U32)], axis=0)
    else:
        yT = yT[:YW]
    xp = _pack4(xT).reshape(XLR // 4, nb * S, LANES)
    yp = _pack4(yT).reshape(YW // 4, nb * S, LANES)
    xl2 = xlen.astype(jnp.int32).reshape(nb * S, LANES)
    yl2 = ylen.astype(jnp.int32).reshape(nb * S, LANES)

    stream_out = not interpret
    kernel, NC = _mk_kernel(XL, XLR, YW, e, S, stream_out)
    out_spec = pl.BlockSpec(memory_space=pltpu.ANY) if stream_out else \
        pl.BlockSpec((XLR, S, LANES), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((NC, 12, S, LANES), _U32),
        pltpu.VMEM((RC, 6, S, LANES), _U32),
    ]
    if stream_out:
        scratch += [pltpu.VMEM((RC, S, LANES), _U32),
                    pltpu.SemaphoreType.DMA(())]
    out, err, ys, yn = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((XLR // 4, S, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((YW // 4, S, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # move log: HBM + segment-streamed DMA on TPU, plain VMEM
            # block in interpret mode (see _mk_kernel)
            out_spec,
            pl.BlockSpec((S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((XLR, nb * S, LANES), _U32),
            jax.ShapeDtypeStruct((nb * S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * S, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * S, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, yp, xl2, yl2)

    outw = out[:XL].reshape(XL, B).T          # [B, XL] u32
    tb = (outw & 0xFF).astype(jnp.uint8).reshape(-1)
    ic = ((outw >> 8) & 0xFF).astype(jnp.uint8).reshape(-1)
    ib = ((outw >> 16) & 0xFF).astype(jnp.uint8).reshape(-1)
    return (err.reshape(B), ys.reshape(B), yn.reshape(B), tb, ic, ib)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _jit_tb(x, xlen, y, ylen, e, bb_lanes, interpret):
    return pallas_tb_core(x, xlen, y, ylen, e, bb_lanes, interpret)


def pallas_banded_tb(x: np.ndarray, xlen: np.ndarray, y: np.ndarray,
                     ylen: np.ndarray, e: int, bb_lanes: int = 2048,
                     interpret: bool = False):
    """Host-array wrapper (pads B to a lane-block multiple)."""
    B, XL = x.shape
    Bp = -(-B // bb_lanes) * bb_lanes
    if Bp != B:
        x = np.concatenate([x, np.full((Bp - B, XL), 4, np.uint8)])
        y = np.concatenate(
            [y, np.full((Bp - B, y.shape[1]), 4, np.uint8)])
        xlen = np.concatenate([xlen, np.zeros(Bp - B, xlen.dtype)])
        ylen = np.concatenate([ylen, np.zeros(Bp - B, ylen.dtype)])
    err, ys, yn, tb, ic, ib = _jit_tb(
        jnp.asarray(x), jnp.asarray(xlen), jnp.asarray(y),
        jnp.asarray(ylen), e, bb_lanes, interpret)
    return (np.asarray(err)[:B], np.asarray(ys)[:B], np.asarray(yn)[:B],
            np.asarray(tb).reshape(Bp, XL)[:B],
            np.asarray(ic).reshape(Bp, XL)[:B],
            np.asarray(ib).reshape(Bp, XL)[:B])
