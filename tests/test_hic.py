"""Hi-C mapping + phasing weights."""

import numpy as np

from hifiasm_tpu.phasing.hic import (
    UnitigIndex, combine_phase_weights, hic_link_matrix, map_hic_pairs,
)
from hifiasm_tpu.phasing.mc_solve import mc_solve
from tests.synth import make_genome


def test_unique_mapping(rng):
    utgs = [make_genome(rng, 3000) for _ in range(4)]
    idx = UnitigIndex.build(utgs)
    for uid, u in enumerate(utgs):
        s = int(rng.integers(0, len(u) - 150))
        assert idx.map_read(u[s:s + 150]) == uid
    # read from nowhere
    assert idx.map_read(make_genome(rng, 150)) in (-1, 0, 1, 2, 3)


def test_hic_phasing_separates_haplotypes(rng):
    # 4 unitigs: (0, 1) = hap A chr arms, (2, 3) = hap B; Hi-C contacts
    # only within a haplotype; trans evidence marks 0-2 and 1-3 pairs
    pe = []
    for _ in range(30):
        pe.append((0, 1))
        pe.append((2, 3))
    hic = hic_link_matrix(4, np.array(pe))
    trans = np.zeros((4, 4), np.int64)
    trans[0, 2] = trans[2, 0] = 20
    trans[1, 3] = trans[3, 1] = 20
    ex, ey, ew = combine_phase_weights(trans, hic)
    s = mc_solve(4, ex, ey, ew, n_perturb=100)
    assert s[0] == s[1] and s[2] == s[3]
    assert s[0] == -s[2]


def test_map_pairs(rng):
    utgs = [make_genome(rng, 4000) for _ in range(2)]
    idx = UnitigIndex.build(utgs)
    pairs = []
    for _ in range(20):
        u = int(rng.integers(0, 2))
        s1 = int(rng.integers(0, 3800))
        s2 = int(rng.integers(0, 3800))
        pairs.append((utgs[u][s1:s1 + 120], utgs[u][s2:s2 + 120]))
    hits = map_hic_pairs(idx, pairs)
    assert len(hits) >= 15
    assert (hits[:, 0] == hits[:, 1]).all()
