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
