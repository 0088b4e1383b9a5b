"""Mesh-sharded anchor gather for the EC pipeline.

The reference reads postings out of a shared-memory hash table from every
worker thread (``ha_pt_get``, htab.cpp:518).  On a device mesh the table
is bucket-sharded (htab.cpp:118's 4096-way low-bit bucketing maps onto
shards) and queries route to their owner over ICI with ``all_to_all``
(parallel/index_shard.py).  This module turns that primitive into the
pipeline's anchor-collection step, byte-identical to the host path
(overlap/anchors.py collect_anchors_many):

- posting lanes are size-classed: one launch per K class, every launch
  carrying the full fixed-size query block (static shapes, one compile
  per class); a query's answer is taken from the smallest class that
  fits its posting count,
- hashes whose count exceeds the largest class fall back to the host
  table (they are the high-occurrence tail the quota weights already
  down-rank), keeping results exact.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hifiasm_tpu.index.pos_table import PositionTable
from hifiasm_tpu.overlap.anchors import (
    HA_KMER_GOOD_RATIO, Anchors, finish_anchor_chunk,
)


class MeshAnchorGather:
    """Sharded postings + count tables living on a device mesh."""

    def __init__(self, pt: PositionTable, mesh, q_chunk: int = 1 << 14,
                 classes=(8, 64)):
        import jax
        from hifiasm_tpu.parallel.index_shard import (
            ShardedPostings, make_sharded_cnt, make_sharded_postings,
        )

        self.pt = pt
        self.mesh = mesh
        S = len(mesh.devices)
        self.S = S
        self.q_chunk = max(q_chunk // S, 1) * S
        per_dev = self.q_chunk // S
        self.sp = ShardedPostings.build(pt, S)
        # cap = per-device query count: a shard lane can never overflow
        self.cnt_fn = make_sharded_cnt(mesh, self.sp.idx, per_dev)
        self.classes = tuple(sorted(classes))
        self.post_fns = {
            K: make_sharded_postings(mesh, self.sp, per_dev, K)
            for K in self.classes
        }
        self.n_fallback = 0

    def gather(self, hashes: np.ndarray):
        """hashes [N] uint64 -> (counts [N] int64, tid, tpos, trev, tspan
        flat posting columns concatenated in query order, CSR within each
        query) — exactly what the host table expansion produces."""
        import jax.numpy as jnp
        from hifiasm_tpu.parallel.index_shard import _split64

        N = len(hashes)
        counts = np.zeros(N, np.int64)
        cols = {k: [] for k in ("tid", "tpos", "trev", "tspan")}
        kmax = self.classes[-1]
        for c0 in range(0, N, self.q_chunk):
            q = hashes[c0:c0 + self.q_chunk]
            pad = self.q_chunk - len(q)
            qp = np.concatenate([q, np.zeros(pad, np.uint64)]) if pad else q
            hi, lo = _split64(qp)
            hi_d, lo_d = jnp.asarray(hi), jnp.asarray(lo)
            cnt = np.asarray(self.cnt_fn(hi_d, lo_d))[:len(q)].astype(
                np.int64)
            counts[c0:c0 + len(q)] = cnt

            n_res = np.zeros(len(q), np.int64)
            rid_res = [None] * len(q)
            pos_res = [None] * len(q)
            prev_k = 0
            for K in self.classes:
                member = np.flatnonzero((cnt > prev_k) & (cnt <= K))
                if len(member):
                    n, rid, pos = (np.asarray(a) for a in
                                   self.post_fns[K](hi_d, lo_d))
                    for m in member:
                        c = int(cnt[m])
                        rid_res[m] = rid[m, :c]
                        pos_res[m] = pos[m, :c]
                        n_res[m] = c
                prev_k = K
            # host fallback: the high-occ tail beyond the largest class
            for m in np.flatnonzero(cnt > kmax):
                hit = self.pt.get(int(qp[m]))
                self.n_fallback += 1
                rr, pp, vv, ss = hit
                rid_res[m] = (rr.astype(np.uint32) << 1) | vv
                pos_res[m] = (ss.astype(np.uint32) << 24) | \
                    pp.astype(np.uint32)
                n_res[m] = len(rr)

            for m in np.flatnonzero(n_res):
                r, p = rid_res[m], pos_res[m]
                cols["tid"].append((r >> 1).astype(np.uint32))
                cols["trev"].append((r & 1).astype(np.uint8))
                cols["tpos"].append((p & np.uint32(0xFFFFFF)).astype(
                    np.int64))
                cols["tspan"].append((p >> np.uint32(24)).astype(np.int64))
        cat = {k: (np.concatenate(v) if v else
                   np.zeros(0, (np.uint32 if k == "tid" else
                                np.uint8 if k == "trev" else np.int64)))
               for k, v in cols.items()}
        return counts, cat["tid"], cat["tpos"], cat["trev"], cat["tspan"]


def collect_anchors_mesh(mzs, gather: MeshAnchorGather, rids,
                         tlens: np.ndarray, hom_cov: int,
                         chunk_mz: int = 200_000):
    """Mesh twin of collect_anchors_many: identical Anchors, with the
    posting lookups routed through the sharded index."""
    max_cnt = max(int(hom_cov * (2.0 - HA_KMER_GOOD_RATIO)), 2)
    min_cnt = max(int(hom_cov * HA_KMER_GOOD_RATIO), 2)
    out = [None] * len(rids)

    def empty():
        return Anchors(*(np.zeros(0, t) for t in (
            np.uint32, np.uint8, np.int64, np.int64, np.int64, np.int64)))

    c0 = 0
    while c0 < len(rids):
        c1, nm = c0, 0
        while c1 < len(rids) and nm < chunk_mz:
            nm += len(mzs[rids[c1]])
            c1 += 1
        h_l, q_l, qp_l, qr_l, qs_l = [], [], [], [], []
        for x in range(c0, c1):
            rid = rids[x]
            mz = mzs[rid]
            n = len(mz)
            h_l.append(mz.hash)
            q_l.append(np.full(n, rid, np.int64))
            qp_l.append(mz.pos.astype(np.int64))
            qr_l.append(mz.rev)
            qs_l.append(mz.span.astype(np.int64))
        allh = np.concatenate(h_l) if h_l else np.zeros(0, np.uint64)
        if len(allh) == 0:
            for x in range(c0, c1):
                out[x] = empty()
            c0 = c1
            continue
        qread = np.concatenate(q_l)
        qpos_all = np.concatenate(qp_l)
        qrev_all = np.concatenate(qr_l)
        qspan_all = np.concatenate(qs_l)
        counts, tid, tpos, trev, tspan = gather.gather(allh)
        if int(counts.sum()) == 0:
            for x in range(c0, c1):
                out[x] = empty()
            c0 = c1
            continue
        qidx = np.repeat(np.arange(len(allh)), counts)
        qread_a = qread[qidx]
        keep = tid.astype(np.int64) != qread_a
        tid, tpos, trev, tspan, qread_a, qidx = (
            tid[keep], tpos[keep], trev[keep], tspan[keep], qread_a[keep],
            qidx[keep])
        occ = np.repeat(counts, counts)[keep]
        by_rid = finish_anchor_chunk(
            qread_a, qpos_all[qidx], qrev_all[qidx], qspan_all[qidx],
            tid, tpos, trev, tspan, occ, tlens, min_cnt, max_cnt)
        for x in range(c0, c1):
            out[x] = by_rid.get(rids[x], None) or empty()
        c0 = c1
    return out
