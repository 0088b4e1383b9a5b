"""Bucket-sharded index: all-to-all count lookup == host lookup."""

import numpy as np
import jax

from hifiasm_tpu.index.pos_table import build_position_table
from hifiasm_tpu.parallel.index_shard import ShardedIndex, make_sharded_cnt
from hifiasm_tpu.parallel.mesh import make_mesh
from tests.synth import make_genome, sample_reads


def test_sharded_cnt_matches_host(rng):
    g = make_genome(rng, 12000)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=2000,
                               err_rate=0.0)
    pt, _, _, mzs = build_position_table(reads, 51, 51)
    S = len(jax.devices())
    idx = ShardedIndex.build(pt, S)
    mesh = make_mesh(S)

    # queries: real hashes + misses, padded to a multiple of S
    qs = np.concatenate([pt.hashes[::3],
                         rng.integers(1, 1 << 60, 64).astype(np.uint64)])
    per_dev = -(-len(qs) // S)
    Q = per_dev * S
    qs_p = np.concatenate([qs, np.zeros(Q - len(qs), np.uint64)])
    cap = 2 * per_dev + 8
    query = make_sharded_cnt(mesh, idx, cap)
    from hifiasm_tpu.parallel.index_shard import sharded_cnt_np
    got = sharded_cnt_np(query, qs_p, S)[:len(qs)]
    want = pt.cnt(qs)
    np.testing.assert_array_equal(got, want)
