"""Bucket-sharded minimizer index with all-to-all query routing.

The reference's 4096-way low-bit bucketing (htab.cpp:118) maps directly
onto device shards: shard s owns every hash with ``h % n_shards == s``.
Queries are data-parallel; each device routes its query slice to the
owning shards with ``lax.all_to_all`` over ICI, owners answer by local
binary search, and answers route back — the TPU-native replacement for
the lock-free shared-memory ``ha_pt_get`` of the CPU design (htab.cpp:518)
and the §5 "anchors routed by target-read shard" exchange.

64-bit hashes travel as (hi, lo) uint32 pairs (TPУ-native 32-bit lanes, no
x64 mode); the local lookup is a vectorized lexicographic binary search.

Fixed-capacity routing: each (device, shard) lane carries up to ``cap``
queries; uniform hashing keeps overflow negligible (overflowed queries
return count 0 and are recoverable host-side; callers size cap with
headroom).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hifiasm_tpu.index.pos_table import PositionTable


def _split64(h: np.ndarray):
    h = h.astype(np.uint64)
    return (h >> np.uint64(32)).astype(np.uint32), \
        (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)


@dataclass
class ShardedIndex:
    n_shards: int
    h_hi: np.ndarray       # [S, Hmax] uint32, per-shard sorted (lex hi,lo)
    h_lo: np.ndarray
    counts: np.ndarray     # [S, Hmax] int32
    h_len: np.ndarray      # [S] int32

    @classmethod
    def build(cls, pt: PositionTable, n_shards: int) -> "ShardedIndex":
        assert n_shards & (n_shards - 1) == 0, "n_shards must be 2^k"
        shard = (pt.hashes % np.uint64(n_shards)).astype(np.int64)
        hmax = max(int(np.bincount(shard, minlength=n_shards).max())
                   if len(shard) else 0, 1)
        hh = np.full((n_shards, hmax), 0xFFFFFFFF, np.uint32)
        hl = np.full((n_shards, hmax), 0xFFFFFFFF, np.uint32)
        cn = np.zeros((n_shards, hmax), np.int32)
        ln = np.zeros(n_shards, np.int32)
        for s in range(n_shards):
            sel = shard == s
            n = int(sel.sum())
            hi, lo = _split64(pt.hashes[sel])   # sorted uint64 == lex order
            hh[s, :n] = hi
            hl[s, :n] = lo
            cn[s, :n] = pt.count[sel]
            ln[s] = n
        return cls(n_shards, hh, hl, cn, ln)


def _lex_searchsorted(h_hi, h_lo, q_hi, q_lo, n_steps: int):
    """Vectorized lower-bound over (hi, lo)-sorted arrays."""
    H = h_hi.shape[0]
    # derive the carry from the (axis-varying) queries so shard_map sees
    # matching varying-axis types across loop iterations
    lo_b = (q_hi * np.uint32(0)).astype(jnp.int32)
    hi_b = lo_b + jnp.int32(H)

    def step(_, st):
        lo_b, hi_b = st
        mid = (lo_b + hi_b) // 2
        midc = jnp.minimum(mid, H - 1)
        mh = h_hi[midc]
        ml = h_lo[midc]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
        return lo_b, hi_b

    lo_b, _ = lax.fori_loop(0, n_steps, step, (lo_b, hi_b))
    return lo_b


def make_sharded_cnt(mesh: Mesh, idx: ShardedIndex, cap: int):
    """Returns fn(q_hi, q_lo [Q] uint32) -> counts [Q]; Q = S * per_dev."""
    S = idx.n_shards
    assert len(mesh.devices) == S
    sh = NamedSharding(mesh, P("data"))
    hh_d = jax.device_put(idx.h_hi, sh)
    hl_d = jax.device_put(idx.h_lo, sh)
    cn_d = jax.device_put(idx.counts, sh)
    n_steps = int(np.ceil(np.log2(max(idx.h_hi.shape[1], 2)))) + 1
    smask = np.uint32(S - 1)

    def body(h_hi, h_lo, c_loc, q_hi, q_lo):
        h_hi, h_lo, c_loc = h_hi[0], h_lo[0], c_loc[0]
        Qd = q_hi.shape[0]
        dest = (q_lo & smask).astype(jnp.int32)
        order = jnp.argsort(dest, stable=True)
        qh_s = q_hi[order]
        ql_s = q_lo[order]
        d_srt = dest[order]
        same = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                (d_srt[1:] == d_srt[:-1]).astype(jnp.int32)])
        seg_start = jnp.where(same == 0, jnp.arange(Qd, dtype=jnp.int32), 0)
        seg_start = lax.associative_scan(jnp.maximum, seg_start)
        rank = jnp.arange(Qd, dtype=jnp.int32) - seg_start
        slot = d_srt * cap + rank
        ok = rank < cap
        oobs = jnp.where(ok, slot, S * cap)
        send_hi = jnp.zeros(S * cap, jnp.uint32).at[oobs].set(
            qh_s, mode="drop").reshape(S, cap)
        send_lo = jnp.zeros(S * cap, jnp.uint32).at[oobs].set(
            ql_s, mode="drop").reshape(S, cap)
        recv_hi = lax.all_to_all(send_hi, "data", 0, 0).reshape(-1)
        recv_lo = lax.all_to_all(send_lo, "data", 0, 0).reshape(-1)
        pos = _lex_searchsorted(h_hi, h_lo, recv_hi, recv_lo, n_steps)
        posc = jnp.minimum(pos, h_hi.shape[0] - 1)
        hit = (h_hi[posc] == recv_hi) & (h_lo[posc] == recv_lo)
        ans = jnp.where(hit, c_loc[posc], 0).astype(jnp.int32)
        back = lax.all_to_all(ans.reshape(S, cap), "data", 0, 0).reshape(-1)
        out = jnp.zeros(Qd, jnp.int32)
        got = jnp.where(ok, back[jnp.minimum(slot, S * cap - 1)], 0)
        # a skewed bucket can exceed the fixed lane capacity; count the
        # dropped queries so callers fail loudly instead of returning
        # silently-wrong counts (ADVICE r3)
        ovf = lax.psum(jnp.sum((~ok).astype(jnp.int32)), "data")
        return out.at[order].set(got), ovf

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P("data"), P("data")),
        out_specs=(P("data"), P()))

    @jax.jit
    def _query(q_hi, q_lo):
        return fn(hh_d, hl_d, cn_d, q_hi, q_lo)

    def query(q_hi, q_lo):
        out, ovf = _query(q_hi, q_lo)
        if int(ovf) > 0:
            raise RuntimeError(
                f"sharded-cnt lane overflow: {int(ovf)} queries past "
                f"cap={cap}; rebuild the query fn with a larger cap")
        return out

    return query


def sharded_cnt_np(query_fn, hashes: np.ndarray, S: int) -> np.ndarray:
    """Convenience: uint64 numpy hashes -> counts via the device fn."""
    hi, lo = _split64(hashes)
    return np.asarray(query_fn(jnp.asarray(hi), jnp.asarray(lo)))


@dataclass
class ShardedPostings:
    """Bucket-sharded postings: per-shard CSR into packed position lists.

    The device-side form of ``ha_pt_t``'s (count, offset) + ha_idxpos
    arrays (htab.h:20-22): rid/rev pack into one uint32 lane
    (rid << 1 | rev), pos into another."""

    n_shards: int
    idx: ShardedIndex
    start: np.ndarray      # [S, Hmax] int32 CSR into the posting lanes
    p_rid: np.ndarray      # [S, Pmax] uint32 (rid << 1 | rev)
    p_pos: np.ndarray      # [S, Pmax] uint32 ((span << 24) | pos)

    @classmethod
    def build(cls, pt: PositionTable, n_shards: int) -> "ShardedPostings":
        idx = ShardedIndex.build(pt, n_shards)
        shard = (pt.hashes % np.uint64(n_shards)).astype(np.int64)
        per = np.zeros(n_shards, np.int64)
        for s in range(n_shards):
            per[s] = int(pt.count[shard == s].sum())
        pmax = max(int(per.max()) if n_shards else 0, 1)
        st = np.zeros((n_shards, idx.h_hi.shape[1]), np.int32)
        pr = np.zeros((n_shards, pmax), np.uint32)
        pp = np.zeros((n_shards, pmax), np.uint32)
        for s in range(n_shards):
            sel = np.flatnonzero(shard == s)
            w = 0
            for j, g in enumerate(sel):
                st[s, j] = w
                a, b = int(pt.start[g]), int(pt.start[g] + pt.count[g])
                n = b - a
                pr[s, w:w + n] = (pt.rid[a:b].astype(np.uint32) << 1) | \
                    pt.rev[a:b]
                # span (k <= 64 fits in 8 bits) rides the top byte of the
                # pos lane; read positions stay < 2^24 for HiFi inputs
                pp[s, w:w + n] = (pt.span[a:b].astype(np.uint32) << 24) | \
                    pt.pos[a:b].astype(np.uint32)
                w += n
        return cls(n_shards, idx, st, pr, pp)


def make_sharded_postings(mesh: Mesh, sp: ShardedPostings, cap: int,
                          k_post: int):
    """Returns fn(q_hi, q_lo [Q]) -> (n [Q], rid [Q,K], pos [Q,K]):
    the multi-chip anchor gather — queries route to their bucket shard
    over ICI (all_to_all), owners gather up to K postings each, answers
    route back (§5's "anchors routed by target-read shard")."""
    S = sp.n_shards
    K = k_post
    assert len(mesh.devices) == S
    sh = NamedSharding(mesh, P("data"))
    idx = sp.idx
    hh_d = jax.device_put(idx.h_hi, sh)
    hl_d = jax.device_put(idx.h_lo, sh)
    cn_d = jax.device_put(idx.counts, sh)
    st_d = jax.device_put(sp.start, sh)
    pr_d = jax.device_put(sp.p_rid, sh)
    pp_d = jax.device_put(sp.p_pos, sh)
    n_steps = int(np.ceil(np.log2(max(idx.h_hi.shape[1], 2)))) + 1
    smask = np.uint32(S - 1)

    def body(h_hi, h_lo, c_loc, st, pr, pp, q_hi, q_lo):
        h_hi, h_lo, c_loc = h_hi[0], h_lo[0], c_loc[0]
        st, pr, pp = st[0], pr[0], pp[0]
        Qd = q_hi.shape[0]
        dest = (q_lo & smask).astype(jnp.int32)
        order = jnp.argsort(dest, stable=True)
        qh_s = q_hi[order]
        ql_s = q_lo[order]
        d_srt = dest[order]
        same = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                (d_srt[1:] == d_srt[:-1]).astype(jnp.int32)])
        seg_start = jnp.where(same == 0, jnp.arange(Qd, dtype=jnp.int32), 0)
        seg_start = lax.associative_scan(jnp.maximum, seg_start)
        rank = jnp.arange(Qd, dtype=jnp.int32) - seg_start
        slot = d_srt * cap + rank
        ok = rank < cap
        oobs = jnp.where(ok, slot, S * cap)
        send_hi = jnp.zeros(S * cap, jnp.uint32).at[oobs].set(
            qh_s, mode="drop").reshape(S, cap)
        send_lo = jnp.zeros(S * cap, jnp.uint32).at[oobs].set(
            ql_s, mode="drop").reshape(S, cap)
        recv_hi = lax.all_to_all(send_hi, "data", 0, 0).reshape(-1)
        recv_lo = lax.all_to_all(send_lo, "data", 0, 0).reshape(-1)
        pos = _lex_searchsorted(h_hi, h_lo, recv_hi, recv_lo, n_steps)
        posc = jnp.minimum(pos, h_hi.shape[0] - 1)
        hit = (h_hi[posc] == recv_hi) & (h_lo[posc] == recv_lo)
        n_loc = jnp.where(hit, jnp.minimum(c_loc[posc], K), 0)
        base = jnp.where(hit, st[posc], 0)
        gidx = base[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        gidx = jnp.minimum(gidx, pr.shape[0] - 1)
        valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n_loc[:, None]
        g_rid = jnp.where(valid, pr[gidx], 0)
        g_pos = jnp.where(valid, pp[gidx], 0)
        # route answers back: [S*cap, K] -> all_to_all on the lane axis
        back_n = lax.all_to_all(
            n_loc.astype(jnp.int32).reshape(S, cap), "data", 0, 0
        ).reshape(-1)
        back_rid = lax.all_to_all(
            g_rid.reshape(S, cap * K), "data", 0, 0).reshape(-1, K)
        back_pos = lax.all_to_all(
            g_pos.reshape(S, cap * K), "data", 0, 0).reshape(-1, K)
        slotc = jnp.minimum(slot, S * cap - 1)
        out_n = jnp.zeros(Qd, jnp.int32).at[order].set(
            jnp.where(ok, back_n[slotc], 0))
        out_rid = jnp.zeros((Qd, K), jnp.uint32).at[order].set(
            jnp.where(ok[:, None], back_rid[slotc], 0))
        out_pos = jnp.zeros((Qd, K), jnp.uint32).at[order].set(
            jnp.where(ok[:, None], back_pos[slotc], 0))
        ovf = lax.psum(jnp.sum((~ok).astype(jnp.int32)), "data")
        return out_n, out_rid, out_pos, ovf

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P("data", None), P("data", None), P("data", None),
                  P("data"), P("data")),
        out_specs=(P("data"), P("data", None), P("data", None), P()))

    @jax.jit
    def _query(q_hi, q_lo):
        return fn(hh_d, hl_d, cn_d, st_d, pr_d, pp_d, q_hi, q_lo)

    def query(q_hi, q_lo):
        n, rid_o, pos_o, ovf = _query(q_hi, q_lo)
        if int(ovf) > 0:
            raise RuntimeError(
                f"sharded-postings lane overflow: {int(ovf)} queries "
                f"past cap={cap}; rebuild with a larger cap")
        return n, rid_o, pos_o

    return query


def _make_postings_query(mesh: Mesh, hh_d, hl_d, cn_d, st_d, pr_d, pp_d,
                         h_cols: int, p_cols: int, cap: int, k_post: int):
    """Query function over ALREADY-SHARDED posting arrays (device or
    host-sourced): the routing body of ``make_sharded_postings``."""
    S = len(mesh.devices)
    K = k_post
    n_steps = int(np.ceil(np.log2(max(h_cols, 2)))) + 1
    smask = np.uint32(S - 1)

    def body(h_hi, h_lo, c_loc, st, pr, pp, q_hi, q_lo):
        h_hi, h_lo, c_loc = h_hi[0], h_lo[0], c_loc[0]
        st, pr, pp = st[0], pr[0], pp[0]
        Qd = q_hi.shape[0]
        dest = (q_lo & smask).astype(jnp.int32)
        order = jnp.argsort(dest, stable=True)
        qh_s = q_hi[order]
        ql_s = q_lo[order]
        d_srt = dest[order]
        same = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                (d_srt[1:] == d_srt[:-1]).astype(jnp.int32)])
        seg_start = jnp.where(same == 0, jnp.arange(Qd, dtype=jnp.int32), 0)
        seg_start = lax.associative_scan(jnp.maximum, seg_start)
        rank = jnp.arange(Qd, dtype=jnp.int32) - seg_start
        slot = d_srt * cap + rank
        ok = rank < cap
        oobs = jnp.where(ok, slot, S * cap)
        send_hi = jnp.zeros(S * cap, jnp.uint32).at[oobs].set(
            qh_s, mode="drop").reshape(S, cap)
        send_lo = jnp.zeros(S * cap, jnp.uint32).at[oobs].set(
            ql_s, mode="drop").reshape(S, cap)
        recv_hi = lax.all_to_all(send_hi, "data", 0, 0).reshape(-1)
        recv_lo = lax.all_to_all(send_lo, "data", 0, 0).reshape(-1)
        pos = _lex_searchsorted(h_hi, h_lo, recv_hi, recv_lo, n_steps)
        posc = jnp.minimum(pos, h_hi.shape[0] - 1)
        hit = (h_hi[posc] == recv_hi) & (h_lo[posc] == recv_lo)
        n_loc = jnp.where(hit, jnp.minimum(c_loc[posc], K), 0)
        base = jnp.where(hit, st[posc], 0)
        gidx = base[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        gidx = jnp.minimum(gidx, pr.shape[0] - 1)
        valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n_loc[:, None]
        g_rid = jnp.where(valid, pr[gidx], 0)
        g_pos = jnp.where(valid, pp[gidx], 0)
        back_n = lax.all_to_all(
            n_loc.astype(jnp.int32).reshape(S, cap), "data", 0, 0
        ).reshape(-1)
        back_rid = lax.all_to_all(
            g_rid.reshape(S, cap * K), "data", 0, 0).reshape(-1, K)
        back_pos = lax.all_to_all(
            g_pos.reshape(S, cap * K), "data", 0, 0).reshape(-1, K)
        slotc = jnp.minimum(slot, S * cap - 1)
        out_n = jnp.zeros(Qd, jnp.int32).at[order].set(
            jnp.where(ok, back_n[slotc], 0))
        out_rid = jnp.zeros((Qd, K), jnp.uint32).at[order].set(
            jnp.where(ok[:, None], back_rid[slotc], 0))
        out_pos = jnp.zeros((Qd, K), jnp.uint32).at[order].set(
            jnp.where(ok[:, None], back_pos[slotc], 0))
        ovf = lax.psum(jnp.sum((~ok).astype(jnp.int32)), "data")
        return out_n, out_rid, out_pos, ovf

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P("data", None), P("data", None), P("data", None),
                  P("data"), P("data")),
        out_specs=(P("data"), P("data", None), P("data", None), P()))

    @jax.jit
    def _query(q_hi, q_lo):
        return fn(hh_d, hl_d, cn_d, st_d, pr_d, pp_d, q_hi, q_lo)

    def query(q_hi, q_lo):
        n, rid_o, pos_o, ovf = _query(q_hi, q_lo)
        if int(ovf) > 0:
            raise RuntimeError(
                f"sharded-postings lane overflow: {int(ovf)} queries "
                f"past cap={cap}; rebuild with a larger cap")
        return n, rid_o, pos_o

    return query


def build_sharded_postings_mesh(mesh: Mesh, mz_per_read,
                                keep_min: int = 2,
                                keep_max: Optional[int] = None,
                                min_hist_cnt: int = 5,
                                cap: Optional[int] = None):
    """Build the position table SHARDED across the mesh: no single
    device (or host array) ever holds the full table.

    The distributed rebirth of the reference's bucketed two-pass
    ``ha_pt_gen`` (htab.cpp:118 4096-way bucketing, :971 insert pass):
    each device takes a contiguous slice of the flattened postings,
    routes every posting to its owner shard (hash low bits) over
    ``lax.all_to_all`` fixed-capacity lanes, owners radix-sort their
    bucket by (hash, rid, pos) and segment-reduce into the CSR form,
    and the count histogram is ``psum``-reduced across shards
    (SURVEY §5's allreduce-histogram plan).

    Returns ``(query_fn_factory, hist, h_len)`` where
    ``query_fn_factory(k_post)`` builds the routed anchor-gather
    query over the freshly built device-resident shards."""
    from hifiasm_tpu.index.count import YAK_MAX_COUNT, YAK_N_COUNTS

    if keep_max is None:
        keep_max = YAK_MAX_COUNT - 1
    S = len(mesh.devices)
    assert S & (S - 1) == 0, "mesh size must be 2^k"
    # flatten postings (host streaming; the TABLE never materializes)
    hs, rids, poss, revs, spans = [], [], [], [], []
    for rid_i, mz in enumerate(mz_per_read):
        hs.append(np.asarray(mz.hash, np.uint64))
        rids.append(np.full(len(mz.hash), rid_i, np.uint32))
        poss.append(np.asarray(mz.pos, np.uint32))
        revs.append(np.asarray(mz.rev, np.uint8))
        spans.append(np.asarray(mz.span, np.uint16))
    allh = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
    P_tot = len(allh)
    hi, lo = _split64(allh)
    rid = np.concatenate(rids) if rids else np.zeros(0, np.uint32)
    pos = np.concatenate(poss) if poss else np.zeros(0, np.uint32)
    rev = np.concatenate(revs) if revs else np.zeros(0, np.uint8)
    span = np.concatenate(spans) if spans else np.zeros(0, np.uint16)
    Pd = -(-max(P_tot, 1) // S)
    if cap is None:
        cap = int(Pd / S * 1.5) + 256
    Hcap = S * cap                       # worst case: all routed distinct

    def _pad(a, fill, dt):
        out = np.full(S * Pd, fill, dt)
        out[:P_tot] = a
        return out.reshape(S, Pd)

    hi_p = _pad(hi, 0xFFFFFFFF, np.uint32)
    lo_p = _pad(lo, 0xFFFFFFFF, np.uint32)
    rid_p = _pad(rid, 0, np.uint32)
    pos_p = _pad(pos, 0, np.uint32)
    rev_p = _pad(rev.astype(np.uint32), 0, np.uint32)
    span_p = _pad(span.astype(np.uint32), 0, np.uint32)
    vld_p = _pad(np.ones(P_tot, np.int32), 0, np.int32)
    smask = np.uint32(S - 1)

    def body(hi_s, lo_s, rid_s, pos_s, rev_s, span_s, vld_s):
        hi_s, lo_s, rid_s = hi_s[0], lo_s[0], rid_s[0]
        pos_s, rev_s, span_s, vld_s = (pos_s[0], rev_s[0], span_s[0],
                                       vld_s[0])
        Pl = hi_s.shape[0]
        dest = jnp.where(vld_s > 0, (lo_s & smask).astype(jnp.int32), S)
        order = jnp.argsort(dest, stable=True)
        d_srt = dest[order]
        same = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                (d_srt[1:] == d_srt[:-1]).astype(jnp.int32)])
        seg_start = jnp.where(same == 0, jnp.arange(Pl, dtype=jnp.int32), 0)
        seg_start = lax.associative_scan(jnp.maximum, seg_start)
        rank = jnp.arange(Pl, dtype=jnp.int32) - seg_start
        ok = (rank < cap) & (d_srt < S)
        slot = jnp.where(ok, d_srt * cap + rank, S * cap)

        def _route(a, fill):
            send = jnp.full(S * cap, fill, a.dtype).at[slot].set(
                a[order], mode="drop").reshape(S, cap)
            return lax.all_to_all(send, "data", 0, 0).reshape(-1)

        r_hi = _route(hi_s, jnp.uint32(0xFFFFFFFF))
        r_lo = _route(lo_s, jnp.uint32(0xFFFFFFFF))
        r_rid = _route(rid_s, jnp.uint32(0))
        r_pos = _route(pos_s, jnp.uint32(0))
        r_rev = _route(rev_s, jnp.uint32(0))
        r_span = _route(span_s, jnp.uint32(0))
        r_vld = _route(vld_s, jnp.int32(0))
        # local bucket sort by (valid, hash, rid, pos) — the shard's
        # radix pass (device argsort; htab.cpp:971's insert ordering)
        inv = (1 - r_vld).astype(jnp.uint32)
        sidx = jnp.lexsort((r_pos, r_rid, r_lo, r_hi, inv))
        s_hi, s_lo = r_hi[sidx], r_lo[sidx]
        s_rid, s_pos = r_rid[sidx], r_pos[sidx]
        s_rev, s_span = r_rev[sidx], r_span[sidx]
        s_vld = r_vld[sidx]
        n_loc = jnp.sum(s_vld)
        M = s_hi.shape[0]
        ar = jnp.arange(M, dtype=jnp.int32)
        newk = jnp.concatenate([
            jnp.ones(1, bool),
            (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])])
        newk = newk & (s_vld > 0)
        did = jnp.cumsum(newk.astype(jnp.int32)) - 1
        did_v = jnp.where(s_vld > 0, did, M)
        counts = jnp.zeros(M, jnp.int32).at[did_v].add(
            1, mode="drop")
        firsts = jnp.full(M, M, jnp.int32).at[did_v].min(
            ar, mode="drop")
        n_dist = jnp.sum(newk.astype(jnp.int32))
        live = ar < n_dist
        # psum'd count histogram (the allreduce-histogram of SURVEY §5)
        capped = jnp.minimum(counts, YAK_MAX_COUNT)
        hist = jnp.zeros(YAK_N_COUNTS, jnp.int32).at[
            jnp.where(live, capped, YAK_N_COUNTS)].add(1, mode="drop")
        hist = lax.psum(hist, "data")
        # filter + compact the distinct slots
        keep = live & (counts >= keep_min) & (counts <= keep_max)
        krank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        kslot = jnp.where(keep, krank, M)
        f = jnp.minimum(firsts, M - 1)
        hh = jnp.full(M, 0xFFFFFFFF, jnp.uint32).at[kslot].set(
            s_hi[f], mode="drop")
        hl = jnp.full(M, 0xFFFFFFFF, jnp.uint32).at[kslot].set(
            s_lo[f], mode="drop")
        cn = jnp.zeros(M, jnp.int32).at[kslot].set(counts, mode="drop")
        csum = jnp.cumsum(jnp.where(keep, counts, 0)) - \
            jnp.where(keep, counts, 0)
        st = jnp.zeros(M, jnp.int32).at[kslot].set(
            csum.astype(jnp.int32), mode="drop")
        h_len = jnp.sum(keep.astype(jnp.int32))
        # compact kept postings (stable)
        pkeep = jnp.where(s_vld > 0, keep[jnp.minimum(did, M - 1)],
                          False)
        prank = jnp.cumsum(pkeep.astype(jnp.int32)) - 1
        pslot = jnp.where(pkeep, prank, M)
        pr = jnp.zeros(M, jnp.uint32).at[pslot].set(
            (s_rid << 1) | (s_rev & 1), mode="drop")
        pp = jnp.zeros(M, jnp.uint32).at[pslot].set(
            (s_span << 24) | s_pos, mode="drop")
        # valid postings dropped by the fixed-capacity lanes (skewed
        # bucket): counted across shards so the host can retry with a
        # larger cap instead of building a silently-wrong table
        ovf = lax.psum(jnp.sum(((d_srt < S) & ~ok).astype(jnp.int32)),
                       "data")
        one = lambda a: a[None]
        return (one(hh), one(hl), one(cn), one(st), one(pr), one(pp),
                one(h_len.astype(jnp.int32)), hist, ovf)

    def _attempt():
        # body reads ``cap`` at trace time, so a fresh shard_map+jit per
        # attempt picks up the doubled capacity
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P("data", None),) * 7,
            out_specs=((P("data", None),) * 6 + (P("data"), P(), P())))
        return jax.jit(fn)(hi_p, lo_p, rid_p, pos_p, rev_p, span_p,
                           vld_p)

    for _ in range(4):
        hh, hl, cn, st, pr, pp, h_len, hist, ovf = _attempt()
        if int(ovf) == 0:
            break
        cap *= 2
    else:
        raise RuntimeError(
            f"sharded table build: {int(ovf)} postings still overflow "
            f"the routing lanes at cap={cap}")

    def query_factory(k_post: int, q_cap: Optional[int] = None):
        M = int(hh.shape[1])
        return _make_postings_query(
            mesh, hh, hl, cn, st, pr, pp, M, M,
            q_cap if q_cap is not None else max(M // S, 256), k_post)

    return query_factory, np.asarray(hist), np.asarray(h_len)
