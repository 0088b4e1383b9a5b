"""Purge decision parity: coverage thresholds from the read-cov
histogram, phased (mc_solve) assignment, purge-gap chain linking
(~Purge_Dups.cpp:394, :5591, :5632, :5679)."""

import numpy as np

from hifiasm_tpu.graph.purge import (
    HET_PEAK_RATE, HOM_PEAK_RATE, link_purged_chains,
    purge_coverage_threshold, purge_dups,
)
from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph
from hifiasm_tpu.overlap.paf import PafRecords, PafStore


def test_threshold_hom_agreeing_peaks():
    # coverage peak 30 agrees with k-mer peak 30 -> hom * 1.25
    cov = np.full(200, 30)
    lens = np.full(200, 10000)
    thr = purge_coverage_threshold(cov, lens, hom_cov_kmer=30,
                                   ploid_frac=0.1)
    assert thr == int(30 * HOM_PEAK_RATE)


def test_threshold_het_dominant_sample():
    # coverage peak 15 (het) disagrees with k-mer peak 30; ploid sample
    # -> coverage peak * 2.5
    cov = np.full(200, 15)
    lens = np.full(200, 10000)
    thr = purge_coverage_threshold(cov, lens, hom_cov_kmer=30,
                                   ploid_frac=0.6)
    assert thr == int(15 * HET_PEAK_RATE)


def test_threshold_hom_sample_kmer_wins():
    cov = np.full(200, 15)
    lens = np.full(200, 10000)
    thr = purge_coverage_threshold(cov, lens, hom_cov_kmer=30,
                                   ploid_frac=0.1)
    assert thr == int(30 * HOM_PEAK_RATE)


def _ug_with_reads(read_counts, lens):
    """Unitigs with disjoint read id blocks."""
    utgs = []
    rid = 0
    for nr, ln in zip(read_counts, lens):
        vs = (np.arange(rid, rid + nr, dtype=np.uint32)) << 1
        utgs.append(Unitig(vs=vs, node_len=np.full(nr, ln // nr),
                           len=ln, circ=False, start=int(vs[0]),
                           end=int(vs[-1]) ^ 1))
        rid += nr
    return UnitigGraph(utgs=utgs), rid


def _trans_paf(n_reads, links):
    """links: [(read_a, read_b)] trans overlaps (both directions)."""
    paf = PafStore(n_reads)
    by_q = {}
    for a, b in links:
        by_q.setdefault(a, []).append(b)
        by_q.setdefault(b, []).append(a)
    for q, tns in by_q.items():
        paf[q] = PafRecords.from_columns(
            qs=np.zeros(len(tns), np.int64),
            qe=np.full(len(tns), 1000, np.int64),
            tn=np.array(tns, np.uint32),
            ts=np.zeros(len(tns), np.int64),
            te=np.full(len(tns), 1000, np.int64),
            rev=np.zeros(len(tns), np.uint8),
            ml=np.full(len(tns), 900, np.int64),
            bl=np.full(len(tns), 1000, np.int64),
            el=np.ones(len(tns), np.uint8),
            no_l_indel=np.ones(len(tns), np.uint8))
    return paf


def test_phased_purge_keeps_chain_side():
    """A(10k) - B(12k) - C(10k) chained trans links, truth {A, C} | {B}:
    greedy shortest-first would purge A first (wrong side); the phased
    assignment purges B only."""
    ug, n_reads = _ug_with_reads([4, 4, 4], [10000, 12000, 10000])
    # A reads 0-3, B 4-7, C 8-11; every A read links a B read, every B
    # read links a C read
    links = [(i, 4 + i) for i in range(4)] + \
            [(4 + i, 8 + i) for i in range(4)]
    paf = _trans_paf(n_reads, links)
    res = purge_dups(ug, paf, n_reads, purge_level=3, simi_rate=0.55)
    assert res.alternate == [1], res.alternate
    assert set(res.primary) == {0, 2}


def test_cov_threshold_exempts_collapsed_hom():
    ug, n_reads = _ug_with_reads([4, 4], [10000, 12000])
    links = [(i, 4 + i) for i in range(4)]
    paf = _trans_paf(n_reads, links)
    # unitig 0 has coverage above the threshold: collapsed repeat, kept
    res = purge_dups(ug, paf, n_reads, purge_level=3, simi_rate=0.55,
                     utg_cov=np.array([80, 30]), max_cov=50)
    assert 0 in res.primary


def test_link_purged_chains_bridges_primaries():
    ug, _ = _ug_with_reads([2, 2, 2], [10000, 10000, 20000])
    # purged unitig 2: partner 0 covers its left, partner 1 its right
    spans = [(2, 0, 0, 9000, 0), (2, 1, 10000, 19000, 0)]
    n = link_purged_chains(ug, spans, purged=[2])
    assert n == 1
    pairs = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    assert (0 << 1, 1 << 1) in pairs
    assert ((1 << 1) ^ 1, (0 << 1) ^ 1) in pairs
