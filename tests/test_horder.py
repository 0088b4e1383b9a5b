"""Hi-C scaffolding: order/orient contigs from PE end evidence."""

import numpy as np

from hifiasm_tpu.phasing.hic import UnitigIndex
from hifiasm_tpu.phasing.horder import (
    end_weights, greedy_scaffold, scaffold_seqs,
)
from tests.synth import make_genome


def test_order_three_contigs(rng):
    # genome split into 3 contigs; PE hits bridge tail(i) <-> head(i+1)
    g = make_genome(rng, 30000)
    ctgs = [g[:10000], g[10000:20000], g[20000:]]
    lens = np.array([len(c) for c in ctgs])
    idx = UnitigIndex.build(ctgs)
    hits = []
    for _ in range(60):
        # contacts near the junctions
        for a, b in ((0, 1), (1, 2)):
            p1 = int(rng.integers(9000, 9800))
            p2 = int(rng.integers(100, 1000))
            r1 = ctgs[a][p1:p1 + 120]
            r2 = ctgs[b][p2:p2 + 120]
            u1, q1 = idx.map_read_pos(r1)
            u2, q2 = idx.map_read_pos(r2)
            if u1 >= 0 and u2 >= 0:
                hits.append((u1, q1, u2, q2))
    w = end_weights(3, lens, hits)
    scafs = greedy_scaffold(3, w)
    assert len(scafs) == 1
    order = [m[0] for m in scafs[0].members]
    assert order in ([0, 1, 2], [2, 1, 0])
    seqs = scaffold_seqs(scafs, ctgs)
    assert len(seqs[0]) == 30000 + 2 * 100


def test_no_spurious_joins(rng):
    ctgs = [make_genome(rng, 5000) for _ in range(4)]
    lens = np.array([5000] * 4)
    w = end_weights(4, lens, [])
    scafs = greedy_scaffold(4, w)
    assert len(scafs) == 4
