"""Unitig-vs-unitig hap alignment (~hap_alignment_advance_worker /
pt_cal_sim; Purge_Dups.cpp:5610, tovlp.cpp:1743)."""

import numpy as np

from hifiasm_tpu.graph.tovlp import (
    confirm_purge_pairs, hap_align_pair, unitig_similarity,
)
from tests.synth import make_genome


def test_hap_align_pair_haplotypes(rng):
    h1, h2 = make_genome(rng, 30000, het_rate=0.004)
    frac, ident, span = hap_align_pair(h1, h2)
    assert frac > 0.9, frac
    assert ident > 0.97, ident
    a_s, a_e, b_s, b_e, rev = span
    assert rev == 0
    assert a_e - a_s > 0.8 * len(h1)


def test_hap_align_pair_revcomp(rng):
    from hifiasm_tpu.io.readstore import revcomp_codes

    h1, h2 = make_genome(rng, 20000, het_rate=0.004)
    frac, ident, span = hap_align_pair(h1, revcomp_codes(h2))
    assert frac > 0.9 and ident > 0.97
    assert span[4] == 1


def test_hap_align_pair_unrelated(rng):
    a = make_genome(rng, 15000)
    b = make_genome(np.random.default_rng(999), 15000)
    frac, _, _ = hap_align_pair(a, b)
    assert frac < 0.1, frac


def test_hap_align_partial_overlap(rng):
    g = make_genome(rng, 40000)
    a = g[:20000]          # a is fully contained in g
    frac, ident, span = hap_align_pair(a, g)
    assert frac > 0.9 and ident > 0.98
    # but g only half-covered by a
    frac_g, _, _ = hap_align_pair(g, a)
    assert 0.35 < frac_g < 0.65, frac_g


def test_confirm_purge_pairs_filters(rng):
    h1, h2 = make_genome(rng, 20000, het_rate=0.004)
    other = make_genome(np.random.default_rng(7), 20000)
    seqs = [h1, h2, other]
    pairs = [(0, 1, 0.9), (2, 1, 0.9)]   # second pair is bogus
    out = confirm_purge_pairs(seqs, pairs, simi_rate=0.55)
    kept = {(a, b) for a, b, _, _, _ in out}
    assert (0, 1) in kept
    assert (2, 1) not in kept
