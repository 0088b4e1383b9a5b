"""Mesh anchor gather == host anchor gather, byte-identical
(parallel/ec_shard.py vs overlap/anchors.py collect_anchors_many)."""

import numpy as np
import jax

from hifiasm_tpu.index.pos_table import build_position_table
from hifiasm_tpu.overlap.anchors import collect_anchors_many
from hifiasm_tpu.parallel.ec_shard import (
    MeshAnchorGather, collect_anchors_mesh,
)
from hifiasm_tpu.parallel.mesh import make_mesh
from tests.synth import make_genome, sample_reads


def _anchors_equal(a, b):
    for f in ("tid", "rev", "self_off", "t_off", "span", "weight"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)


def test_mesh_anchor_gather_matches_host(rng):
    g = make_genome(rng, 30000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=3000,
                               err_rate=0.002)
    lens = np.array([len(r) for r in reads])
    pt, hom, het, mzs = build_position_table(reads, 51, 51)
    hom_cov = hom if hom > 0 else 10
    rids = list(range(len(reads)))

    host = collect_anchors_many(mzs, pt, rids, lens, hom_cov)

    mesh = make_mesh(len(jax.devices()))
    gather = MeshAnchorGather(pt, mesh, q_chunk=1 << 10, classes=(4, 32))
    got = collect_anchors_mesh(mzs, gather, rids, lens, hom_cov)

    assert len(got) == len(host)
    n_nonempty = 0
    for a, b in zip(got, host):
        _anchors_equal(a, b)
        n_nonempty += len(a.tid) > 0
    assert n_nonempty > len(reads) // 2


def test_mesh_gather_high_occ_fallback(rng):
    """Hashes whose count exceeds the largest lane class take the host
    fallback and still yield exact results."""
    g = make_genome(rng, 8000)
    # high depth -> some k-mers occur in >4 reads, exceeding classes=(2, 4)
    reads, _, _ = sample_reads(rng, g, depth=14, read_len=1500,
                               err_rate=0.0)
    lens = np.array([len(r) for r in reads])
    pt, hom, het, mzs = build_position_table(reads, 51, 51)
    hom_cov = hom if hom > 0 else 10
    rids = list(range(len(reads)))

    host = collect_anchors_many(mzs, pt, rids, lens, hom_cov)
    mesh = make_mesh(len(jax.devices()))
    gather = MeshAnchorGather(pt, mesh, q_chunk=1 << 9, classes=(2, 4))
    got = collect_anchors_mesh(mzs, gather, rids, lens, hom_cov)
    for a, b in zip(got, host):
        _anchors_equal(a, b)
    assert gather.n_fallback > 0


def test_mesh_gather_bucket_skew_and_highocc():
    """Worst-case routing: every query hashes to ONE shard (bucket
    skew) and a hot k-mer exceeds the largest posting class (host
    fallback) — the all-to-all lanes must carry the full skewed load
    with no silent drops (VERDICT r2 item 7's overflow concern)."""
    from hifiasm_tpu.index.pos_table import PositionTable

    S = 8
    rng = np.random.default_rng(7)
    H = 256
    # hashes all congruent to 3 mod 8: one shard owns EVERYTHING
    hashes = np.sort((rng.integers(1, 1 << 58, H).astype(np.uint64)
                      << np.uint64(3)) | np.uint64(3))
    hashes = np.unique(hashes)
    H = len(hashes)
    counts = np.full(H, 2, np.int32)
    counts[0] = 100                       # beyond the largest class (64)
    start = np.zeros(H, np.int64)
    start[1:] = np.cumsum(counts[:-1])
    P = int(counts.sum())
    pt = PositionTable(
        hashes=hashes, start=start, count=counts,
        rid=rng.integers(0, 1000, P).astype(np.uint32),
        pos=rng.integers(0, 1 << 20, P).astype(np.uint32),
        rev=rng.integers(0, 2, P).astype(np.uint8),
        span=np.full(P, 51, np.uint16))
    mesh = make_mesh(S)
    g = MeshAnchorGather(pt, mesh, q_chunk=1 << 8)
    q = np.concatenate([hashes, hashes[::2]])   # duplicates too
    cnt, tid, tpos, trev, tspan = g.gather(q)
    # every query answered with its true count: nothing dropped
    exp = counts[np.searchsorted(hashes, q)]
    np.testing.assert_array_equal(cnt, exp.astype(np.int64))
    assert g.n_fallback >= 1                    # hot k-mer went host-side
    # posting payloads intact for a skewed sample
    off = 0
    for i, h in enumerate(q[:16]):
        j = int(np.searchsorted(hashes, h))
        a, b = int(start[j]), int(start[j] + counts[j])
        n = b - a
        np.testing.assert_array_equal(tid[off:off + n], pt.rid[a:b])
        off += n
