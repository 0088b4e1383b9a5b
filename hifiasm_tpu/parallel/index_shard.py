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
        return out.at[order].set(got)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P("data"), P("data")),
        out_specs=P("data"))

    @jax.jit
    def query(q_hi, q_lo):
        return fn(hh_d, hl_d, cn_d, q_hi, q_lo)

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
        return out_n, out_rid, out_pos

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P("data", None), P("data", None), P("data", None),
                  P("data"), P("data")),
        out_specs=(P("data"), P("data", None), P("data", None)))

    @jax.jit
    def query(q_hi, q_lo):
        return fn(hh_d, hl_d, cn_d, st_d, pr_d, pp_d, q_hi, q_lo)

    return query
