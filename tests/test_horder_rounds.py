"""Iterative Hi-C scaffolding: break+join rounds (~horder.cpp:3871).

Locks the behavior VERDICT round 1 called out: a bad greedy join must be
revisited — junctions whose spanning Hi-C support is far below the local
average are broken (break_scaffold/detect_lowNs horder.cpp:2275, :2163),
and the freed ends can re-join correctly in the next round.
"""

import numpy as np

from hifiasm_tpu.phasing.horder import (
    Scaffold, break_weak_junctions, end_weights, greedy_scaffold,
    iterative_scaffold, scaffold_priors,
)


def _chain_hits(a, pa, b, pb, n):
    return [(a, pa, b, pb)] * n


def _intra(ctg, lo, hi, n, rng):
    p1 = rng.integers(lo, hi, n)
    p2 = np.minimum(p1 + rng.integers(100, 5000, n), hi - 1)
    return [(ctg, int(x), ctg, int(y)) for x, y in zip(p1, p2)]


def test_break_weak_junction():
    # two 50 kb contigs joined, dense intra hits on both, but nothing
    # spans the junction -> the junction must be cut
    lens = np.array([50_000, 50_000], np.int64)
    rng = np.random.default_rng(11)
    hits = np.array(_intra(0, 0, 50_000, 200, rng) +
                    _intra(1, 0, 50_000, 200, rng), np.int64)
    scaf = [Scaffold([(0, 0), (1, 0)])]
    out, n_cut = break_weak_junctions(scaf, lens, hits,
                                      local_bound=100_000)
    assert n_cut == 1
    assert [s.members for s in out] == [[(0, 0)], [(1, 0)]]


def test_supported_junction_survives():
    lens = np.array([50_000, 50_000], np.int64)
    rng = np.random.default_rng(11)
    # hits that straddle the join (ctg0 tail <-> ctg1 head), plus intra
    cross = [(0, int(p), 1, int(q)) for p, q in zip(
        rng.integers(45_000, 50_000, 60), rng.integers(0, 5_000, 60))]
    hits = np.array(_intra(0, 0, 50_000, 100, rng) +
                    _intra(1, 0, 50_000, 100, rng) + cross, np.int64)
    scaf = [Scaffold([(0, 0), (1, 0)])]
    out, n_cut = break_weak_junctions(scaf, lens, hits,
                                      local_bound=100_000)
    assert n_cut == 0
    assert len(out) == 1


def test_iterative_fixes_greedy_misjoin():
    """3 contigs: A(tail)-B(head) is the true adjacency (many spanning
    cross hits). A(head)-C(head) is a spurious weak link — a handful of
    noise hits at the tips, above greedy's min_weight, so single-pass
    greedy joins C-A-B into one chain and never revisits it. The break
    pass must cut the weak junction (spanning support << local average
    coverage, detect_lowNs horder.cpp:2163) while keeping A-B."""
    lens = np.array([60_000, 60_000, 60_000], np.int64)
    rng = np.random.default_rng(11)
    ab = [(0, int(p), 1, int(q)) for p, q in zip(
        rng.integers(40_000, 60_000, 80), rng.integers(0, 20_000, 80))]
    # spurious A(head)-C(head): only 3 hits, pinned to the tips
    ac = [(0, int(i * 37 % 300), 2, int(i * 53 % 300)) for i in range(3)]
    intra = (_intra(0, 0, 60_000, 400, rng) +
             _intra(1, 0, 60_000, 400, rng) +
             _intra(2, 0, 60_000, 400, rng))
    hits = ab + ac + intra

    # single-pass greedy keeps the bad C-A join forever
    g = greedy_scaffold(3, end_weights(3, lens, hits))
    chains = [len(s.members) for s in g]
    assert max(chains) == 3, "precondition: greedy chains all three"

    scafs = iterative_scaffold(3, lens, hits, rounds=3,
                               local_bound=20_000, cutoff=3)
    pairs = [sorted(c for c, _ in s.members) for s in scafs
             if len(s.members) > 1]
    assert pairs == [[0, 1]], f"expected only A-B joined: {pairs}"


def test_scaffold_priors_lift():
    """An adjacency accepted in hap1 votes for the homologous hap2
    pair (~ha_aware_order)."""
    acc = [Scaffold([(0, 0), (1, 0)])]
    prior = scaffold_priors(acc, {0: 5, 1: 7}, bonus=4.0)
    # outgoing end of 0's homolog (5, tail=1) <-> incoming end of 1's
    # homolog (7, head=0)
    key = (min(5 << 1 | 1, 7 << 1), max(5 << 1 | 1, 7 << 1))
    assert prior == {key: 4.0}


def test_iterative_deterministic():
    lens = np.array([40_000, 40_000, 40_000, 40_000], np.int64)
    rng = np.random.default_rng(3)
    hits = (_intra(0, 0, 40_000, 50, rng) +
            _intra(2, 0, 40_000, 50, rng) +
            [(0, 39_000 + i % 900, 1, i % 1000) for i in range(40)] +
            [(2, 39_500 + i % 400, 3, i % 800) for i in range(30)])
    a = iterative_scaffold(4, lens, hits, rounds=3)
    b = iterative_scaffold(4, lens, hits, rounds=3)
    assert [s.members for s in a] == [s.members for s in b]
