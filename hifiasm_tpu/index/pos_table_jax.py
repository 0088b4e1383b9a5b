"""Device-resident minimizer position table + anchor gather (jax/XLA).

The TPU half of ``index/pos_table.py`` + ``overlap/anchors.py``'s
collection stage — the index that the reference keeps in ``ha_pt_t``
(htab.cpp:1232-1287) and queries with ``ha_pt_get`` (htab.cpp:518) lives
in HBM as sorted columnar postings:

  build   — one multi-key ``lax.sort`` by (hash, rid, pos) replaces the
            4096-bucket insertion of the reference; group boundaries,
            CSR offsets, the occurrence histogram, and the
            [keep_min, keep_max] band filter are cumsum/scatter passes;
  lookup  — branchless data-parallel binary search over the (hi, lo)
            hash columns (TPUs have no native u64: ops/u64 pairs);
  anchors — two fixed-shape passes: a count pass sizes the expansion,
            then a fill pass maps every output slot back to its
            (query minimizer, occurrence) by searchsorted over the
            cumulative counts, gathers the posting, applies the
            occurrence-class weight (anchor.cpp:1063-1071, via an
            integer LUT so float pow never runs on device), and one
            multi-key sort yields the host path's exact
            (qread, tid, rev, qpos, t_off) anchor order.

Cross-validated byte-identical with the host ``build_position_table`` /
``collect_anchors_many`` in tests/test_pos_table_jax.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from hifiasm_tpu.index.count import (
    YAK_MAX_COUNT, YAK_N_COUNTS, analyze_count,
)
from hifiasm_tpu.utils.devsync import fetch_all
from hifiasm_tpu.utils.logging import log

_U32_MAX = np.uint32(0xFFFFFFFF)


def _bucket(n: int, lo: int = 1024) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _split_u64(h: np.ndarray):
    h = np.asarray(h, np.uint64)
    return ((h >> np.uint64(32)).astype(np.uint32),
            (h & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def _join_u64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    return (np.asarray(hi, np.uint64) << np.uint64(32)) | \
        np.asarray(lo, np.uint64)


# ---------------------------------------------------------------------------
# build

@jax.jit
def _build_kernel(pad, h_hi, h_lo, rid, pos, rev, span,
                  n_valid, keep_min, keep_max):
    P = h_hi.shape[0]
    i = jnp.arange(P, dtype=jnp.int32)
    srt = lax.sort((pad, h_hi, h_lo, rid, pos, rev, span), num_keys=5)
    _, h_hi, h_lo, rid, pos, rev, span = srt
    valid = i < n_valid
    new = valid & ((i == 0) | (h_hi != jnp.roll(h_hi, 1)) |
                   (h_lo != jnp.roll(h_lo, 1)))
    gid = jnp.cumsum(new.astype(jnp.int32)) - 1
    n_groups = jnp.sum(new.astype(jnp.int32))
    # first posting index per group (compacted), sentinel n_valid
    gslot = jnp.where(new, gid, P)
    first = jnp.full(P + 1, 0, jnp.int32).at[gslot].set(i)[:P]
    nxt = jnp.where(jnp.arange(P) + 1 < n_groups,
                    jnp.roll(first, -1), n_valid)
    counts = jnp.where(jnp.arange(P) < n_groups, nxt - first, 0)
    # occurrence histogram over real groups (capped)
    capped = jnp.minimum(counts, YAK_MAX_COUNT)
    hist = jnp.zeros(YAK_N_COUNTS, jnp.int32).at[capped].add(
        jnp.where(jnp.arange(P) < n_groups, 1, 0).astype(jnp.int32))
    hist = hist.at[0].set(0)
    # band filter
    keepg = (counts >= keep_min) & (counts <= keep_max) & \
        (jnp.arange(P) < n_groups)
    # compact kept groups
    kg_slot = jnp.cumsum(keepg.astype(jnp.int32)) - 1
    kdump = jnp.where(keepg, kg_slot, P)
    out_hi = jnp.full(P + 1, _U32_MAX, jnp.uint32).at[kdump].set(
        jnp.take(h_hi, jnp.minimum(first, P - 1)))[:P]
    out_lo = jnp.full(P + 1, _U32_MAX, jnp.uint32).at[kdump].set(
        jnp.take(h_lo, jnp.minimum(first, P - 1)))[:P]
    out_cnt = jnp.zeros(P + 1, jnp.int32).at[kdump].set(counts)[:P]
    n_kept = jnp.sum(keepg.astype(jnp.int32))
    start = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(out_cnt)[:-1]])
    start = jnp.where(jnp.arange(P) < n_kept, start, 0)
    # compact kept postings
    keep_post = valid & jnp.take(keepg, jnp.maximum(gid, 0))
    p_slot = jnp.cumsum(keep_post.astype(jnp.int32)) - 1
    pdump = jnp.where(keep_post, p_slot, P)
    o_rid = jnp.zeros(P + 1, jnp.uint32).at[pdump].set(rid)[:P]
    o_pos = jnp.zeros(P + 1, jnp.uint32).at[pdump].set(pos)[:P]
    o_rev = jnp.zeros(P + 1, jnp.uint8).at[pdump].set(rev)[:P]
    o_span = jnp.zeros(P + 1, jnp.uint16).at[pdump].set(span)[:P]
    n_pos = jnp.sum(keep_post.astype(jnp.int32))
    return (out_hi, out_lo, start, out_cnt, n_kept,
            o_rid, o_pos, o_rev, o_span, n_pos, hist)


@dataclass
class DevicePositionTable:
    """HBM-resident minimizer index (padded device arrays + true sizes)."""

    h_hi: jnp.ndarray      # [Hp] uint32, sorted (hi, lo)
    h_lo: jnp.ndarray
    start: jnp.ndarray     # [Hp] int32
    count: jnp.ndarray     # [Hp] int32
    rid: jnp.ndarray       # [Pp] uint32 (sorted by hash, rid, pos)
    pos: jnp.ndarray       # [Pp] uint32
    rev: jnp.ndarray       # [Pp] uint8
    span: jnp.ndarray      # [Pp] uint16
    n_distinct: int
    tot_pos: int

    @property
    def search_steps(self) -> int:
        return max(int(np.ceil(np.log2(self.h_hi.shape[0] + 1))) + 1, 1)

    def to_host(self):
        """Materialize as the host PositionTable (trimmed, uint64)."""
        from hifiasm_tpu.index.pos_table import PositionTable
        H, P = self.n_distinct, self.tot_pos
        return PositionTable(
            hashes=_join_u64(np.asarray(self.h_hi)[:H],
                             np.asarray(self.h_lo)[:H]),
            start=np.asarray(self.start)[:H].astype(np.int64),
            count=np.asarray(self.count)[:H],
            rid=np.asarray(self.rid)[:P],
            pos=np.asarray(self.pos)[:P],
            rev=np.asarray(self.rev)[:P],
            span=np.asarray(self.span)[:P],
        )


def build_position_table_jax(mz_per_read: Sequence, keep_min: int = 2,
                             keep_max: int = YAK_MAX_COUNT - 1,
                             min_hist_cnt: int = 5):
    """Per-read Minimizers -> device table (+ coverage peaks).

    Mirrors the tail of index/pos_table.build_position_table (the sort /
    unique / band-filter CSR layout) with every pass on the device."""
    n_tot = int(sum(len(m) for m in mz_per_read))
    Pp = _bucket(max(n_tot, 1))
    h = np.full(Pp, 0, np.uint64)
    rid = np.zeros(Pp, np.uint32)
    pos = np.zeros(Pp, np.uint32)
    rev = np.zeros(Pp, np.uint8)
    span = np.zeros(Pp, np.uint16)
    padf = np.ones(Pp, np.uint8)
    o = 0
    for r, mz in enumerate(mz_per_read):
        n = len(mz)
        h[o:o + n] = mz.hash
        rid[o:o + n] = r
        pos[o:o + n] = mz.pos.astype(np.uint32)
        rev[o:o + n] = mz.rev
        span[o:o + n] = mz.span.astype(np.uint16)
        padf[o:o + n] = 0
        o += n
    hi, lo = _split_u64(h)
    r = _build_kernel(jnp.asarray(padf), jnp.asarray(hi), jnp.asarray(lo),
                      jnp.asarray(rid), jnp.asarray(pos), jnp.asarray(rev),
                      jnp.asarray(span), jnp.int32(n_tot),
                      jnp.int32(keep_min), jnp.int32(keep_max))
    (t_hi, t_lo, start, cnt, n_kept, o_rid, o_pos, o_rev, o_span,
     n_pos, hist) = r
    peak_hom, peak_het = analyze_count(np.asarray(hist),
                                       start_cnt=min_hist_cnt)
    if peak_hom > 0:
        log("build_position_table_jax",
            f"peak_hom: {peak_hom}; peak_het: {peak_het}")
    table = DevicePositionTable(
        h_hi=t_hi, h_lo=t_lo, start=start, count=cnt,
        rid=o_rid, pos=o_pos, rev=o_rev, span=o_span,
        n_distinct=int(n_kept), tot_pos=int(n_pos))
    log("build_position_table_jax",
        f"indexed {table.tot_pos} positions, {table.n_distinct} distinct "
        f"minimizer k-mers (device)")
    return table, peak_hom, peak_het


def device_table_from_host(pt) -> "DevicePositionTable":
    """Upload a host-built PositionTable as the HBM-resident table.

    The host build (native sketch + numpy lexsort) runs ~10x faster
    than the device sort build through this environment (4.3 s vs 40 s
    at 120 Mb) and the columns are small (~15 B/posting, h2d at
    ~80 MB/s) — so the production device frontend BUILDS on host and
    SERVES from HBM.  Same padded CSR layout as build_position_table_jax
    (byte-identical lookups)."""
    H, P = len(pt.hashes), len(pt.rid)
    Hp, Pp = _bucket(max(H, 1)), _bucket(max(P, 1))
    hi, lo = _split_u64(pt.hashes)

    def _pad(a, n, fill, dt):
        out = np.full(n, fill, dt)
        out[:len(a)] = a
        return jnp.asarray(out)

    tbl = DevicePositionTable(
        h_hi=_pad(hi, Hp, 0xFFFFFFFF, np.uint32),
        h_lo=_pad(lo, Hp, 0xFFFFFFFF, np.uint32),
        start=_pad(pt.start.astype(np.int32), Hp, 0, np.int32),
        count=_pad(pt.count.astype(np.int32), Hp, 0, np.int32),
        rid=_pad(pt.rid, Pp, 0, np.uint32),
        pos=_pad(pt.pos, Pp, 0, np.uint32),
        rev=_pad(pt.rev, Pp, 0, np.uint8),
        span=_pad(pt.span, Pp, 0, np.uint16),
        n_distinct=H, tot_pos=P)
    # force the uploads to COMPLETE here: jnp.asarray only enqueues the
    # h2d, and the first consumer (the chunk-1 anchor lookup) otherwise
    # blocks on hundreds of MB at whatever rate the tunnel grants that
    # minute — the r4 "chunk-1 anchor variance" (22-300 s swings) was
    # exactly this deferred transfer.  A 1-element fetch per array is
    # the only reliable sync through the tunnel (block_until_ready
    # returns early there).
    import time as _time
    _t0 = _time.time()
    mb = (Hp * 16 + Pp * 11) / 1e6
    for a in (tbl.h_hi, tbl.h_lo, tbl.start, tbl.count, tbl.rid,
              tbl.pos, tbl.rev, tbl.span):
        np.asarray(a[:1])
    from hifiasm_tpu.utils.logging import log
    log("device_table",
        f"{mb:.0f} MB resident in {_time.time() - _t0:.1f}s "
        f"({H} keys, {P} postings)")
    return tbl


def build_position_table_device(read_codes, k: int, w: int, ft=None,
                                min_hist_cnt: int = 5, keep_min: int = 2,
                                keep_max: int = YAK_MAX_COUNT - 1):
    """Device-frontend analog of index/pos_table.build_position_table:
    sketch on device (ops/sketch_jax) then build the HBM table.  Returns
    (DevicePositionTable, peak_hom, peak_het, mz_per_read)."""
    from hifiasm_tpu.ops.sketch_jax import sketch_many_jax
    mzs = sketch_many_jax(list(read_codes), k, w, ft=ft)
    table, peak_hom, peak_het = build_position_table_jax(
        mzs, keep_min=keep_min, keep_max=keep_max,
        min_hist_cnt=min_hist_cnt)
    return table, peak_hom, peak_het, mzs


# ---------------------------------------------------------------------------
# lookup + anchor gather

@functools.partial(jax.jit, static_argnames=("n_steps",))
def _lookup_kernel(q_hi, q_lo, t_hi, t_lo, t_cnt, n_distinct,
                   n_steps: int):
    n = n_distinct
    lo_i = jnp.zeros(q_hi.shape, jnp.int32)
    hi_i = jnp.full(q_hi.shape, n, jnp.int32)
    for _ in range(n_steps):
        active = lo_i < hi_i
        mid = (lo_i + hi_i) >> 1
        midc = jnp.minimum(mid, jnp.maximum(n - 1, 0))
        mh = t_hi[midc]
        ml = t_lo[midc]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_i = jnp.where(active & less, mid + 1, lo_i)
        hi_i = jnp.where(active & ~less, mid, hi_i)
    idx = jnp.minimum(lo_i, jnp.maximum(n - 1, 0))
    found = (t_hi[idx] == q_hi) & (t_lo[idx] == q_lo) & (n > 0)
    cnt = jnp.where(found, t_cnt[idx], 0)
    return idx, found, cnt


def collect_anchors_device(mzs, table: DevicePositionTable, rids,
                           tlens: np.ndarray, hom_cov: int,
                           chunk_mz: int = 400_000) -> List:
    """Device anchor gather for many reads -> list[Anchors] (host order,
    byte-identical with overlap/anchors.collect_anchors_many)."""
    from hifiasm_tpu.overlap.anchors import HA_KMER_GOOD_RATIO, Anchors

    max_cnt = max(int(hom_cov * (2.0 - HA_KMER_GOOD_RATIO)), 2)
    min_cnt = max(int(hom_cov * HA_KMER_GOOD_RATIO), 2)
    # occurrence-class weight LUT (anchor.cpp:1063-1071) in float64 on
    # host so device arithmetic stays integer
    occ_ax = np.arange(YAK_N_COUNTS, dtype=np.int64)
    wl = np.ones(YAK_N_COUNTS, np.int64)
    wl[occ_ax <= min_cnt] = 2
    hi_m = occ_ax >= max_cnt
    wh = 1 + ((occ_ax[hi_m] + (max_cnt << 1) - 1) // (max_cnt << 1))
    wl[hi_m] = np.floor(np.power(wh.astype(np.float64), 1.1)).astype(
        np.int64)
    wlut = jnp.asarray(np.minimum(wl, 0xFFFFFF).astype(np.int32))
    # pow2-padded read-length gather source: a raw store size keys a
    # fresh remote compile of the anchor kernels per input size (pad
    # entries are never indexed — postings only name real reads)
    _tl = np.asarray(tlens, np.int64).astype(np.int32)
    _rp = 1024
    while _rp < len(_tl):
        _rp *= 2
    _tlp = np.zeros(_rp, np.int32)
    _tlp[:len(_tl)] = _tl
    lens_d = jnp.asarray(_tlp)

    empty = lambda: Anchors(*(np.zeros(0, t) for t in (
        np.uint32, np.uint8, np.int64, np.int64, np.int64, np.int64)))
    out = [empty() for _ in rids]
    c0 = 0
    while c0 < len(rids):
        c1, nm = c0, 0
        while c1 < len(rids) and (nm == 0 or nm < chunk_mz):
            nm += len(mzs[rids[c1]])
            c1 += 1
        sub = rids[c0:c1]
        M = max(nm, 1)
        Mp = _bucket(M)
        q_h = np.zeros(Mp, np.uint64)
        q_read = np.zeros(Mp, np.uint32)
        q_pos = np.zeros(Mp, np.int32)
        q_rev = np.zeros(Mp, np.uint8)
        q_span = np.zeros(Mp, np.int32)
        o = 0
        for rr in sub:
            mz = mzs[rr]
            n = len(mz)
            q_h[o:o + n] = mz.hash
            q_read[o:o + n] = rr
            q_pos[o:o + n] = mz.pos.astype(np.int32)
            q_rev[o:o + n] = mz.rev
            q_span[o:o + n] = mz.span.astype(np.int32)
            o += n
        qhi, qlo = _split_u64(q_h)
        slot, found, cnt = _lookup_kernel(
            jnp.asarray(qhi), jnp.asarray(qlo), table.h_hi, table.h_lo,
            table.count, jnp.int32(table.n_distinct),
            n_steps=table.search_steps)
        # zero counts beyond the real queries
        mvalid = jnp.arange(Mp) < o
        cnt = jnp.where(mvalid & found, cnt, 0)
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(cnt)])
        total = int(cum[-1])
        if total == 0:
            c0 = c1
            continue
        Sp = _bucket(total)
        rid_base = int(min(sub))
        assert int(max(sub)) - rid_base < (1 << 20) - 1, \
            "chunk read-id span exceeds the 20-bit sort pack"
        # tid comes from the GLOBAL table: the packed 20-bit tid lane
        # only holds < 2^20 target reads; fall back to the 4-key sort
        # beyond that (same order, byte-identical outputs)
        wide = len(tlens) >= (1 << 20)
        flds = _expand_fill(slot, cnt, cum, jnp.asarray(q_read),
                            jnp.asarray(q_pos), jnp.asarray(q_rev),
                            jnp.asarray(q_span), table.start, table.rid,
                            table.pos, table.rev, table.span, lens_d,
                            wlut, jnp.int32(total),
                            jnp.uint32(rid_base), Sp, wide=wide)
        (a_read, a_tid, a_rev, a_qpos, a_toff, a_span, a_w, n_keep) = \
            fetch_all(flds)
        nk = int(n_keep)
        a_read = a_read[:nk]
        bnd = np.flatnonzero(np.diff(a_read)) + 1
        seg_s = np.concatenate([[0], bnd])
        seg_e = np.concatenate([bnd, [nk]])
        pos_of = {rr: i + c0 for i, rr in enumerate(sub)}
        for s, e in zip(seg_s, seg_e):
            if e <= s:
                continue
            rr = int(a_read[s])
            out[pos_of[rr]] = Anchors(
                a_tid[s:e], a_rev[s:e], a_qpos[s:e].astype(np.int64),
                a_toff[s:e].astype(np.int64),
                a_span[s:e].astype(np.int64), a_w[s:e].astype(np.int64))
        c0 = c1
    return out


@functools.partial(jax.jit, static_argnames=("Sp", "wide"))
def _expand_fill(slot, cnt, cum, q_read, q_pos, q_rev, q_span,
                 t_start, t_rid, t_pos, t_rev, t_span, lens, wlut,
                 total, rid_base, Sp: int, wide: bool = False):
    s = jnp.arange(Sp, dtype=jnp.int32)
    # owner minimizer of each slot WITHOUT searchsorted: scatter each
    # non-empty minimizer's (index, posting_start - cum) pair at its cum
    # offset and run a tuple max-scan — regular memory traffic instead
    # of the 21-step binary search's ~350M random gathers at 16M slots
    mi = jnp.arange(cnt.shape[0], dtype=jnp.int32)
    pos_at = jnp.where(cnt > 0, cum[:-1], Sp)   # empties never scatter
    m0 = jnp.full(Sp, -1, jnp.int32).at[pos_at].set(mi, mode="drop")
    m = jnp.clip(lax.cummax(m0), 0, cnt.shape[0] - 1)
    occ_j = s - cum[m]
    in_range = s < total
    post = t_start[slot[m]] + occ_j
    post = jnp.clip(post, 0, t_rid.shape[0] - 1)
    tid = t_rid[post]
    tpos = t_pos[post].astype(jnp.int32)
    trev = t_rev[post]
    tspan = t_span[post].astype(jnp.int32)
    qr = q_read[m]
    keep = in_range & (tid != qr)
    rev = (q_rev[m] != trev).astype(jnp.uint8)
    tl = lens[tid]
    t_off = jnp.where(rev == 0, tpos, tl - 1 - (tpos + 1 - tspan))
    occ = cnt[m]
    w = wlut[jnp.minimum(occ, wlut.shape[0] - 1)]
    # sort: invalid last, then (qread, tid, rev, qpos, t_off); stable so
    # full-key ties keep the expansion order, like the host lexsort.
    # The 6 keys PACK into 3 u32 words + an index payload (4 sort
    # operands instead of 8): the bitonic sort network moves half the
    # data, which is the anchor stage's wall at 16M+ rows (measured
    # 5-7 s per 30 Mb chunk).  Ranges: qread/tid < 2^20 (chunked reads),
    # qpos < 2^23 (HiFi read length), t_off < 2^31; invalid rows take
    # the 2^20-1 qread sentinel so they sort last without a key bit.
    # the key words CARRY the fields (k0 = qread:20|tid_hi:12,
    # k1 = tid_lo:8|rev:1|qpos:23, k2 = t_off, p0 = span:8|w:24), so the
    # output columns decode bitwise after the sort — no payload columns
    # ride the bitonic network and no post-sort random gathers (16M
    # random gathers cost MORE than the saved sort traffic, measured)
    qru = qr.astype(jnp.uint32) - rid_base    # chunk-relative: <2^20
    tidu = tid.astype(jnp.uint32)
    qposu = q_pos[m].astype(jnp.uint32)
    qr_s = jnp.where(keep, qru, jnp.uint32((1 << 20) - 1))
    p0 = (q_span[m].astype(jnp.uint32) << 24) | w.astype(jnp.uint32)
    if wide:
        # >= 2^20 target reads: tid no longer fits the 20-bit packed
        # lane — give it a full key word (4 keys + payload).  Same sort
        # order (qread, tid, rev, qpos, t_off), stable, so outputs stay
        # byte-identical with the packed path.
        k0 = qr_s
        k1 = tidu
        k2 = (rev.astype(jnp.uint32) << 23) | qposu
        k3 = t_off.astype(jnp.uint32)
        k0, k1, k2, k3, p0 = lax.sort((k0, k1, k2, k3, p0), num_keys=4,
                                      is_stable=True)
        o_read = (k0 + rid_base).astype(qr.dtype)
        o_tid = k1.astype(tid.dtype)
        o_rev = ((k2 >> 23) & 1).astype(jnp.uint8)
        o_qpos = (k2 & 0x7FFFFF).astype(jnp.int32)
        o_toff = k3.astype(jnp.int32)
    else:
        k0 = (qr_s << 12) | (tidu >> 8)
        k1 = ((tidu & 0xFF) << 24) | (rev.astype(jnp.uint32) << 23) | qposu
        k2 = t_off.astype(jnp.uint32)
        k0, k1, k2, p0 = lax.sort((k0, k1, k2, p0), num_keys=3,
                                  is_stable=True)
        o_read = ((k0 >> 12) + rid_base).astype(qr.dtype)
        o_tid = (((k0 & 0xFFF) << 8) | (k1 >> 24)).astype(tid.dtype)
        o_rev = ((k1 >> 23) & 1).astype(jnp.uint8)
        o_qpos = (k1 & 0x7FFFFF).astype(jnp.int32)
        o_toff = k2.astype(jnp.int32)
    o_span = ((p0 >> 24) & 0xFF).astype(jnp.int32)
    o_w = (p0 & 0xFFFFFF).astype(jnp.int32)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    return o_read, o_tid, o_rev, o_qpos, o_toff, o_span, o_w, n_keep


# ---------------------------------------------------------------------------
# device anchor columns + (read, tid, rev) group detection — feeds the
# device chain DP (overlap/chain_device.py) without anchors ever
# leaving HBM

@functools.partial(jax.jit, static_argnames=("Gcap",))
def _group_detect(a_read, a_tid, a_rev, n_keep, Gcap: int):
    """Boundaries of (read, tid, rev) runs over the sorted anchors,
    plus the first-anchor group keys — ONE launch, COMPACTED to ``Gcap``
    group slots so the host fetch moves O(groups), not O(anchors)
    (anchor-padded planes were ~20x the payload through the ~25 MB/s
    dev link).  rev rides the tid plane's top bit."""
    P = a_read.shape[0]
    i = jnp.arange(P, dtype=jnp.int32)
    valid = i < n_keep
    new = valid & ((i == 0) |
                   (a_read != jnp.roll(a_read, 1)) |
                   (a_tid != jnp.roll(a_tid, 1)) |
                   (a_rev != jnp.roll(a_rev, 1)))
    gid = jnp.cumsum(new.astype(jnp.int32)) - 1
    n_groups = jnp.sum(new.astype(jnp.int32))
    gslot = jnp.where(new, jnp.minimum(gid, Gcap), Gcap)
    start = jnp.zeros(Gcap + 1, jnp.int32).at[gslot].set(i)[:Gcap]
    startc = jnp.clip(start, 0, P - 1)
    key_rt = (jnp.take(a_tid, startc).astype(jnp.uint32) |
              (jnp.take(a_rev, startc).astype(jnp.uint32) << 31))
    return (start, n_groups, jnp.take(a_read, startc), key_rt)


def collect_anchor_groups_device(mzs, table: DevicePositionTable, rids,
                                 tlens: np.ndarray, hom_cov: int,
                                 chunk_mz: int = 2_000_000):
    """Device-resident anchor collection for the device chain pipeline.

    Yields per chunk: (cols, meta) where ``cols`` are the SORTED device
    anchor columns (read u32, tid u32, rev u8, qpos i32, t_off i32,
    span i32, weight i32, plus group_start i32 [P]) and ``meta`` holds
    the small host arrays (n_keep, group starts/sizes and their
    (read, tid, rev) keys).  Chunks split on read boundaries, so groups
    never straddle chunks.  Anchor content and order are byte-identical
    with collect_anchors_device / collect_anchors_many."""
    from hifiasm_tpu.overlap.anchors import HA_KMER_GOOD_RATIO

    max_cnt = max(int(hom_cov * (2.0 - HA_KMER_GOOD_RATIO)), 2)
    min_cnt = max(int(hom_cov * HA_KMER_GOOD_RATIO), 2)
    occ_ax = np.arange(YAK_N_COUNTS, dtype=np.int64)
    wl = np.ones(YAK_N_COUNTS, np.int64)
    wl[occ_ax <= min_cnt] = 2
    hi_m = occ_ax >= max_cnt
    wh = 1 + ((occ_ax[hi_m] + (max_cnt << 1) - 1) // (max_cnt << 1))
    wl[hi_m] = np.floor(np.power(wh.astype(np.float64), 1.1)).astype(
        np.int64)
    wlut = jnp.asarray(np.minimum(wl, 0xFFFFFF).astype(np.int32))
    # pow2-padded read-length gather source: a raw store size keys a
    # fresh remote compile of the anchor kernels per input size (pad
    # entries are never indexed — postings only name real reads)
    _tl = np.asarray(tlens, np.int64).astype(np.int32)
    _rp = 1024
    while _rp < len(_tl):
        _rp *= 2
    _tlp = np.zeros(_rp, np.int32)
    _tlp[:len(_tl)] = _tl
    lens_d = jnp.asarray(_tlp)

    c0 = 0
    while c0 < len(rids):
        c1, nm = c0, 0
        while c1 < len(rids) and (nm == 0 or nm < chunk_mz):
            nm += len(mzs[rids[c1]])
            c1 += 1
        sub = rids[c0:c1]
        M = max(nm, 1)
        Mp = _bucket(M)
        q_h = np.zeros(Mp, np.uint64)
        q_read = np.zeros(Mp, np.uint32)
        q_pos = np.zeros(Mp, np.int32)
        q_rev = np.zeros(Mp, np.uint8)
        q_span = np.zeros(Mp, np.int32)
        o = 0
        for rr in sub:
            mz = mzs[rr]
            n = len(mz)
            q_h[o:o + n] = mz.hash
            q_read[o:o + n] = rr
            q_pos[o:o + n] = mz.pos.astype(np.int32)
            q_rev[o:o + n] = mz.rev
            q_span[o:o + n] = mz.span.astype(np.int32)
            o += n
        import time as _time
        _t0 = _time.time()
        qhi, qlo = _split_u64(q_h)
        slot, found, cnt = _lookup_kernel(
            jnp.asarray(qhi), jnp.asarray(qlo), table.h_hi, table.h_lo,
            table.count, jnp.int32(table.n_distinct),
            n_steps=table.search_steps)
        mvalid = jnp.arange(Mp) < o
        cnt = jnp.where(mvalid & found, cnt, 0)
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)])
        total = int(cum[-1])
        _t1 = _time.time()
        if total == 0:
            yield None, dict(reads=sub, n_keep=0)
            c0 = c1
            continue
        Sp = _bucket(total)
        rid_base = int(min(sub))
        assert int(max(sub)) - rid_base < (1 << 20) - 1, \
            "chunk read-id span exceeds the 20-bit sort pack"
        wide = len(tlens) >= (1 << 20)    # global tid > 20-bit lane
        flds = _expand_fill(slot, cnt, cum, jnp.asarray(q_read),
                            jnp.asarray(q_pos), jnp.asarray(q_rev),
                            jnp.asarray(q_span), table.start, table.rid,
                            table.pos, table.rev, table.span, lens_d,
                            wlut, jnp.int32(total),
                            jnp.uint32(rid_base), Sp, wide=wide)
        (a_read, a_tid, a_rev, a_qpos, a_toff, a_span, a_w, n_keep) = flds
        _t2 = _time.time()
        # groups run ~100-200 anchors each at HiFi coverage; Sp//32 still
        # leaves ~5x headroom and the overflow path refetches exactly
        Gcap = max(Sp // 32, 4096)
        g_start_d, n_groups, g_read_d, g_rt_d = \
            _group_detect(a_read, a_tid, a_rev, n_keep, Gcap=Gcap)
        # ONE overlapped transfer pass for every host-side scalar/array
        # (serial np.asarray fetches each paid a full link round trip)
        nk_h, ng_h, gs_p, gr_p, grt_p = fetch_all(
            (n_keep, n_groups, g_start_d, g_read_d, g_rt_d))
        nk, ng = int(nk_h), int(ng_h)
        log("anchors_device",
            f"lookup {_t1 - _t0:.1f}s expand+sort {_t2 - _t1:.1f}s "
            f"groups+fetch {_time.time() - _t2:.1f}s "
            f"({total} anchors, Sp {Sp})")
        if ng > Gcap:       # dense-group overflow (rare): exact refetch
            g_start_d, n_groups, g_read_d, g_rt_d = \
                _group_detect(a_read, a_tid, a_rev, n_keep, Gcap=Sp)
            _, _, gs_p, gr_p, grt_p = fetch_all(
                (n_keep, n_groups, g_start_d, g_read_d, g_rt_d))
        gs = gs_p[:ng]
        g_end = np.concatenate([gs[1:], [nk]]).astype(np.int64) if ng \
            else np.zeros(0, np.int64)
        g_read = gr_p[:ng]
        g_tid = (grt_p[:ng] & np.uint32(0x7FFFFFFF))
        g_rev = (grt_p[:ng] >> 31).astype(np.uint8)
        cols = dict(read=a_read, tid=a_tid, rev=a_rev, qpos=a_qpos,
                    toff=a_toff, span=a_span, w=a_w)
        meta = dict(reads=sub, n_keep=nk, g_start=gs.astype(np.int64),
                    g_end=g_end, g_read=g_read.astype(np.int64),
                    g_tid=g_tid.astype(np.int64),
                    g_rev=g_rev.astype(np.int64))
        yield cols, meta
        c0 = c1
