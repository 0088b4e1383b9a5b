"""Batched device HPC minimizer sketching (jax/XLA).

The TPU half of ``ops/sketch.py``: one jitted program sketches a CHUNK of
reads as fixed-shape [R, L] planes, so the whole minimizer selection of the
reference's ``mz1_ha_sketch`` (sketch.cpp:454-579) runs on the accelerator
with zero data-dependent shapes:

  1. HPC compression  — run ends found by neighbour compares; ONE batched
     scatter compacts (code, raw_end, run_len, stretch) per read row;
  2. k-mer words      — the four 1-bit-per-base strand words are built with
     log-step shift-or ladders over the bit planes (no rolling loop), as
     (hi, lo) uint32 pairs (ops/u64.py; TPUs have no native 64-bit ints);
  3. keys             — yak hashes (ops/hashes.yak_hash64_u32pair) composed
     with filter-table counts into (cnt, hash) composite keys; the filter
     table lookup is a data-parallel branchless binary search;
  4. selection        — the (w,k)-window minimum becomes two log-step
     sliding-extrema sweeps (leading min over window starts, trailing max
     over covering windows), exactly the formulation of ops/sketch.py;
  5. emission         — selected entries compact into a [R, K] buffer with
     a cumsum scatter; only that small buffer leaves the device.

The high-occurrence streak rescue (sketch.cpp:247-330) stays on the host
over the few selected minimizers per read — identical to the numpy path's
post-selection `_highocc_filter`.

Cross-validated byte-identical with ``ops/sketch.sketch_read`` in
tests/test_sketch_jax.py (Ns, homopolymers, ties, filter tables,
is_unique).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from hifiasm_tpu.ops import u64 as U
from hifiasm_tpu.ops.hashes import yak_hash64_u32pair
from hifiasm_tpu.ops.sketch import Minimizers, _highocc_filter

_INF_CNT = np.uint32(0xFFFFFFFF)
_U32_MAX = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# plane helpers (axis -1 = position)

def _shift_from_left(x, p, fill):
    """out[..., j] = x[..., j-p] (positions < p get `fill`)."""
    if p == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (p,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-p]], axis=-1)


def _shift_from_right(x, p, fill):
    """out[..., j] = x[..., j+p] (positions >= L-p get `fill`)."""
    if p == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (p,), fill, x.dtype)
    return jnp.concatenate([x[..., p:], pad], axis=-1)


def _shift_u64_from_left(a: U.U64, p: int) -> U.U64:
    z = jnp.uint32(0)
    return (_shift_from_left(a[0], p, z), _shift_from_left(a[1], p, z))


def _compact(mask, slots, fields, fills):
    """Batched stable compaction: scatter fields[i][r, c] to row slot
    (cumsum(mask)-1) — the device analog of a[mask] per read row."""
    R, L = mask.shape
    dump = jnp.where(mask, slots, L)           # invalid -> dump column
    outs = []
    for f, fill in zip(fields, fills):
        buf = jnp.full((R, L + 1), fill, f.dtype)
        buf = buf.at[jnp.arange(R)[:, None], dump].set(f)
        outs.append(buf[:, :L])
    return outs


# ---------------------------------------------------------------------------
# k-mer word ladders

def _fwd_words(bit, k: int) -> U.U64:
    """F[j] = sum_t bit[j-k+1+t] << t  (LSB at j-k+1), per row."""
    zero = jnp.zeros_like(bit, jnp.uint32)
    P = (zero, bit.astype(jnp.uint32))        # window size 1 ending at j
    R: Optional[U.U64] = None
    m = 0
    p = 1
    kk = k
    while kk:
        if kk & 1:
            if R is None:
                R, m = P, p
            else:
                # upper m bits from R[j], lower p bits from P[j-m]
                R = U.bor(U.shl(R, p), _shift_u64_from_left(P, m))
                m += p
        kk >>= 1
        if kk:
            P = U.bor(_shift_u64_from_left(P, p), U.shl(P, p))
            p *= 2
    return R


def _rev_words(bit, k: int) -> U.U64:
    """G[j] = sum_t bit[j-t] << t, per row."""
    zero = jnp.zeros_like(bit, jnp.uint32)
    Q = (zero, bit.astype(jnp.uint32))
    R: Optional[U.U64] = None
    m = 0
    p = 1
    kk = k
    while kk:
        if kk & 1:
            if R is None:
                R, m = Q, p
            else:
                # lower m bits from G[j], upper p bits from Q[j-m] << m
                R = U.bor(R, U.shl(_shift_u64_from_left(Q, m), m))
                m += p
        kk >>= 1
        if kk:
            Q = U.bor(Q, U.shl(_shift_u64_from_left(Q, p), p))
            p *= 2
    return R


# ---------------------------------------------------------------------------
# composite-key sliding extrema (cnt, hash_hi, hash_lo)

def _key_less(c1, h1, l1, c2, h2, l2):
    return (c2 < c1) | ((c2 == c1) &
                        ((h2 < h1) | ((h2 == h1) & (l2 < l1))))


def _slide(c, h, l, w: int, trailing: bool, op_min: bool, fill):
    """Leading (out[j] = op over x[j..j+w-1]) or trailing
    (out[j] = op over x[j-w+1..j]) sliding extreme, log-step."""
    fc, fh, fl = fill
    shift = _shift_from_left if trailing else _shift_from_right

    def comb(a, b):
        c1, h1, l1 = a
        c2, h2, l2 = b
        if op_min:
            take2 = _key_less(c1, h1, l1, c2, h2, l2)
        else:
            take2 = _key_less(c2, h2, l2, c1, h1, l1)
        return (jnp.where(take2, c2, c1), jnp.where(take2, h2, h1),
                jnp.where(take2, l2, l1))

    cur = (c, h, l)
    p = 1
    while p * 2 <= w:
        sh = (shift(cur[0], p, fc), shift(cur[1], p, fh),
              shift(cur[2], p, fl))
        cur = comb(cur, sh)
        p *= 2
    if p < w:
        d = w - p
        sh = (shift(cur[0], d, fc), shift(cur[1], d, fh),
              shift(cur[2], d, fl))
        cur = comb(cur, sh)
    return cur


# ---------------------------------------------------------------------------
# filter-table lookup: branchless binary search over sorted u64 (hi, lo)

def _ft_lookup(q: U.U64, ft_hi, ft_lo, ft_cnt, n_steps: int):
    n = ft_hi.shape[0]
    lo_i = jnp.zeros(q[0].shape, jnp.int32)
    hi_i = jnp.full(q[0].shape, n, jnp.int32)
    for _ in range(n_steps):
        active = lo_i < hi_i
        mid = (lo_i + hi_i) >> 1
        midc = jnp.minimum(mid, n - 1)
        mh = ft_hi[midc]
        ml = ft_lo[midc]
        less = (mh < q[0]) | ((mh == q[0]) & (ml < q[1]))
        lo_i = jnp.where(active & less, mid + 1, lo_i)
        hi_i = jnp.where(active & ~less, mid, hi_i)
    idx = jnp.minimum(lo_i, n - 1)
    hit = (ft_hi[idx] == q[0]) & (ft_lo[idx] == q[1])
    return jnp.where(hit, ft_cnt[idx].astype(jnp.uint32), jnp.uint32(0))


# ---------------------------------------------------------------------------
# the kernel

@functools.partial(jax.jit, static_argnames=("k", "w", "K", "is_unique",
                                             "ft_steps"))
def _sketch_kernel(bank, lens, ft_hi, ft_lo, ft_cnt, *, k: int, w: int,
                   K: int, is_unique: bool, ft_steps: int):
    """bank [R, L] uint8 (pad 4), lens [R] int32 -> per-read minimizers
    packed into [R, K] planes + counts.  Mirrors ops/sketch.sketch_read."""
    R, L = bank.shape
    pos_i = jnp.arange(L, dtype=jnp.int32)[None, :]            # [1, L]
    rows = jnp.arange(R)[:, None]
    valid_raw = pos_i < lens[:, None]

    # ---- 1. HPC compression (one scatter) ----
    c = bank
    nxt = _shift_from_right(c, 1, jnp.uint8(255))
    run_end = valid_raw & ((pos_i + 1 == lens[:, None]) | (c != nxt))
    keep_run = run_end & (c < 4)
    # previous run end (any code) for run_len
    e_mark = jnp.where(run_end, pos_i, -1)
    prev_end = _shift_from_left(
        jax.lax.associative_scan(jnp.maximum, e_mark, axis=-1), 1,
        jnp.int32(-1))
    run_len_raw = pos_i - prev_end
    run_slot = jnp.cumsum(run_end.astype(jnp.int32), axis=-1) - 1
    kept_slot = jnp.cumsum(keep_run.astype(jnp.int32), axis=-1) - 1
    stretch_raw = run_slot - kept_slot        # dropped runs before
    comp2, ends2, rl2, stretch = _compact(
        keep_run, kept_slot,
        [c, pos_i.astype(jnp.int32) + jnp.zeros_like(kept_slot),
         run_len_raw, stretch_raw],
        [jnp.uint8(0), jnp.int32(0), jnp.int32(1), jnp.int32(0)])
    ncomp = kept_slot[:, -1] + 1               # [R]
    cpos = pos_i                                # compressed index plane
    valid_c = cpos < ncomp[:, None]

    # ---- 2. k-mer words ----
    b0 = (comp2 & 1).astype(jnp.uint32)
    b1 = ((comp2 >> 1) & 1).astype(jnp.uint32)
    mask64 = U.from_np64(np.uint64((1 << k) - 1))
    mask64 = (jnp.broadcast_to(mask64[0], b0.shape),
              jnp.broadcast_to(mask64[1], b0.shape))
    x0 = U.band(_rev_words(b0, k), mask64)
    x1 = U.band(_rev_words(b1, k), mask64)
    x2 = U.band(U.bnot(_fwd_words(b0, k)), mask64)
    x3 = U.band(U.bnot(_fwd_words(b1, k)), mask64)

    valid_j = valid_c & (cpos >= k - 1)
    sym = U.eq(x1, x3) & valid_j
    rev = jnp.where(U.lt(x1, x3), jnp.uint8(0), jnp.uint8(1))
    h_f = U.add(yak_hash64_u32pair(x0), yak_hash64_u32pair(x1))
    h_r = U.add(yak_hash64_u32pair(x2), yak_hash64_u32pair(x3))
    hsh = U.where(rev == 0, h_f, h_r)

    ends_km1 = _shift_from_left(ends2, k - 1, jnp.int32(0))
    rl_km1 = _shift_from_left(rl2, k - 1, jnp.int32(1))
    span = ends2 - (ends_km1 - rl_km1 + 1) + 1
    same_stretch = stretch == _shift_from_left(stretch, k - 1,
                                               jnp.int32(-1))

    # ---- eligibility / lcount (per-stretch running count) ----
    elig = valid_c & ((cpos < k - 1) | ~sym)
    e_i = elig.astype(jnp.int32)
    cs = jnp.cumsum(e_i, axis=-1)
    new_s = (cpos == 0) | (stretch != _shift_from_left(stretch, 1,
                                                       jnp.int32(-1)))
    base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_s, cs - e_i, 0), axis=-1)
    lcount = cs - base

    complete = (~sym) & (lcount >= k) & (span < 256) & same_stretch & \
        valid_j

    # ---- 3. composite keys ----
    if ft_steps > 0:
        cnt = jnp.where(complete,
                        _ft_lookup(hsh, ft_hi, ft_lo, ft_cnt, ft_steps),
                        jnp.uint32(0))
    else:
        cnt = jnp.zeros_like(b0)
    filtered = cnt >= jnp.uint32(1 << 28)
    if is_unique:
        filtered |= (cnt == 0) & ~filtered & complete
        cnt = jnp.where(cnt == 1, jnp.uint32(0), cnt)
    dummy = ~complete | filtered

    # ---- 4. eligible-sequence compaction + window selection ----
    eslot = cs - 1                              # cumsum(elig)-1
    good_key = elig & ~dummy                    # has a usable k-mer key
    key_c_src = jnp.where(good_key, cnt, _INF_CNT)
    key_h_src = U.where(good_key, hsh, (jnp.full_like(b0, _U32_MAX),
                                        jnp.full_like(b0, _U32_MAX)))
    (key_c, key_hh, key_hl, estretch, el, esrc) = _compact(
        elig, eslot,
        [key_c_src, key_h_src[0], key_h_src[1], stretch, lcount,
         cpos + jnp.zeros_like(eslot)],
        [_INF_CNT, _U32_MAX, _U32_MAX, jnp.int32(-1), jnp.int32(0),
         jnp.int32(0)])
    ne = cs[:, -1]                              # [R] eligible entries

    inf_fill = (_INF_CNT, _U32_MAX, _U32_MAX)
    wmin = _slide(key_c, key_hh, key_hl, w, trailing=False, op_min=True,
                  fill=inf_fill)
    s_idx = pos_i
    e_idx = s_idx + (w - 1)
    e_cl = jnp.minimum(e_idx, jnp.maximum(ne[:, None] - 1, 0))
    take = jnp.take_along_axis
    est_ecl = take(estretch, e_cl, axis=-1)
    el_ecl = take(el, e_cl, axis=-1)
    valid_w = (e_idx < ne[:, None]) & (estretch == est_ecl) & \
        (el_ecl >= w + k - 1)
    vm = (jnp.where(valid_w, wmin[0], jnp.uint32(0)),
          jnp.where(valid_w, wmin[1], jnp.uint32(0)),
          jnp.where(valid_w, wmin[2], jnp.uint32(0)))
    mm = _slide(vm[0], vm[1], vm[2], w, trailing=True, op_min=False,
                fill=(jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)))
    emit = (key_c != _INF_CNT) & (mm[0] == key_c) & \
        (mm[1] == key_hh) & (mm[2] == key_hl)

    # ---- tail push: min (last-tie-wins) of the final window ----
    last_e = jnp.maximum(ne - 1, 0)
    last_st = take(estretch, last_e[:, None], axis=-1)          # [R, 1]
    in_last = (estretch == last_st) & (pos_i < ne[:, None])
    n_last = jnp.sum(in_last.astype(jnp.int32), axis=-1)
    lo_b = jnp.maximum(ne - jnp.minimum(n_last, w), 0)[:, None]
    cand = (pos_i >= lo_b) & (pos_i < ne[:, None]) & \
        (key_c != _INF_CNT)
    big_c = jnp.where(cand, key_c, _INF_CNT)
    m1 = jnp.min(big_c, axis=-1, keepdims=True)
    t1 = cand & (key_c == m1)
    big_h = jnp.where(t1, key_hh, _U32_MAX)
    m2 = jnp.min(big_h, axis=-1, keepdims=True)
    t2 = t1 & (key_hh == m2)
    big_l = jnp.where(t2, key_hl, _U32_MAX)
    m3 = jnp.min(big_l, axis=-1, keepdims=True)
    t3 = t2 & (key_hl == m3)
    bi = jnp.max(jnp.where(t3, pos_i, -1), axis=-1)             # [R]
    has_tail = (bi >= 0) & (ne > 0)
    emit = emit.at[rows[:, 0], jnp.maximum(bi, 0)].set(
        jnp.where(has_tail, True,
                  emit[rows[:, 0], jnp.maximum(bi, 0)]))

    # ---- 5. output compaction to [R, K] ----
    # gather k-mer fields at the entry's source compressed position
    src = esrc
    o_hh = take(hsh[0], src, axis=-1)
    o_hl = take(hsh[1], src, axis=-1)
    o_pos = take(ends2, src, axis=-1)
    o_rev = take(rev, src, axis=-1)
    o_span = take(span, src, axis=-1)
    o_cnt = take(cnt, src, axis=-1)
    oslot = jnp.cumsum(emit.astype(jnp.int32), axis=-1) - 1
    dump = jnp.where(emit & (oslot < K), oslot, K)
    out = []
    for f, fill in [(o_hh, _U32_MAX), (o_hl, _U32_MAX),
                    (o_pos, jnp.int32(0)), (o_rev, jnp.uint8(0)),
                    (o_span, jnp.int32(0)), (o_cnt, jnp.uint32(0))]:
        buf = jnp.full((R, K + 1), fill, f.dtype)
        out.append(buf.at[rows, dump].set(f)[:, :K])
    n_out = jnp.sum(emit.astype(jnp.int32), axis=-1)
    return tuple(out) + (n_out,)


# ---------------------------------------------------------------------------
# host wrapper

def sketch_many_jax(codes_list, k: int, w: int, ft=None,
                    sample_dist: int = 500, is_unique: bool = False,
                    row_chunk: int = 0, l_bucket: int = 2048,
                    ) -> List[Minimizers]:
    """Device-batched sketch of many reads; mirrors ops/sketch.sketch_many
    (including the host-side high-occ streak rescue)."""
    n = len(codes_list)
    if n == 0:
        return []
    if row_chunk <= 0:
        # 128 rows everywhere: larger R (256/1024) makes the XLA TPU
        # compile of the ladder kernel pathological (>15 min, never
        # finished) — per-launch latency must amortize via the chunked
        # async dispatch instead
        row_chunk = 128
    ft_lookup = ft.lookup if ft is not None else None
    if ft is not None and len(ft.hashes):
        fh = np.asarray(ft.hashes, np.uint64)
        ft_hi = jnp.asarray((fh >> np.uint64(32)).astype(np.uint32))
        ft_lo = jnp.asarray((fh & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        ft_cnt = jnp.asarray(np.asarray(ft.counts, np.uint16))
        ft_steps = max(int(np.ceil(np.log2(len(fh) + 1))), 1)
    else:
        ft_hi = jnp.zeros(1, jnp.uint32)
        ft_lo = jnp.zeros(1, jnp.uint32)
        ft_cnt = jnp.zeros(1, jnp.uint16)
        ft_steps = 0
    out: List[Minimizers] = []
    # dispatch every chunk first (async), convert afterwards — each
    # blocking conversion pays a tunnel round-trip, so pipelining the
    # launches hides the per-chunk latency behind compute
    pending = []
    for c0 in range(0, n, row_chunk):
        chunk = codes_list[c0:c0 + row_chunk]
        maxlen = max((len(x) for x in chunk), default=1)
        L = ((max(maxlen, k + w) + l_bucket - 1) // l_bucket) * l_bucket
        R = row_chunk
        bank = np.full((R, L), 4, np.uint8)
        lens = np.zeros(R, np.int32)
        for i, x in enumerate(chunk):
            bank[i, :len(x)] = x
            lens[i] = len(x)
        K = max(64, (2 * L) // max(w, 1) + 32)
        r = _sketch_kernel(jnp.asarray(bank), jnp.asarray(lens),
                           ft_hi, ft_lo, ft_cnt, k=k, w=w, K=K,
                           is_unique=is_unique, ft_steps=ft_steps)
        pending.append((chunk, r))
    for chunk, r in pending:
        hh, hl, pos, rv, span, cnt, cnts = (np.asarray(x) for x in r)
        for i in range(len(chunk)):
            m = int(cnts[i])
            if m > K:                     # overflow: host fallback
                from hifiasm_tpu.ops.sketch import sketch_read
                out.append(sketch_read(chunk[i], k, w, ft_lookup,
                                       sample_dist=sample_dist,
                                       is_unique=is_unique))
                continue
            h = (hh[i, :m].astype(np.uint64) << np.uint64(32)) | \
                hl[i, :m].astype(np.uint64)
            p = pos[i, :m].astype(np.int64)
            rvv = rv[i, :m]
            sp = span[i, :m].astype(np.int64)
            ct = cnt[i, :m].astype(np.uint32)
            if ft_lookup is not None and sample_dist > w and len(h):
                keep = _highocc_filter(ct, h, p, sp, len(chunk[i]),
                                       sample_dist)
                h, p, rvv, sp, ct = (h[keep], p[keep], rvv[keep],
                                     sp[keep], ct[keep])
            out.append(Minimizers(h, p, rvv, sp, ct))
    return out
