"""Order-graph scaffolding (~osg_t, horder.cpp:2763/:3738): the
normalized-weight margin and the avoid list — scenarios raw greedy
matching gets wrong."""

import numpy as np

from hifiasm_tpu.phasing.horder import (
    Scaffold, contact_density, end_weights, greedy_scaffold,
    iterative_scaffold, layout_order_graph, order_graph_arcs,
)


def _intra(ctg, lo, hi, n, rng):
    p1 = rng.integers(lo, hi, n)
    p2 = np.minimum(p1 + rng.integers(100, 5000, n), hi - 1)
    return [(ctg, int(x), ctg, int(y)) for x, y in zip(p1, p2)]


def test_ambiguous_end_joins_neither():
    """B's head is courted EQUALLY by A's tail and C's tail (a repeat
    junction/tangle): greedy raw-weight matching commits one arbitrarily
    — a coin-flip misjoin — while the order-graph's nw margin
    (update_scg horder.cpp:2880: nw = w / best-competing-arc) sees
    nw ~ 1 for both suitors and joins neither."""
    lens = np.array([50_000, 50_000, 50_000], np.int64)
    rng = np.random.default_rng(11)
    # identical contact patterns from both suitors (the two repeat
    # copies look the same to Hi-C): an exact tie, nw == 1.0
    ps = rng.integers(45_000, 50_000, 40)
    qs = rng.integers(0, 5_000, 40)
    ab = [(0, int(p), 1, int(q)) for p, q in zip(ps, qs)]
    cb = [(2, int(p), 1, int(q)) for p, q in zip(ps, qs)]
    hits = ab + cb

    # precondition: greedy joins one of the two (the misjoin risk)
    g = greedy_scaffold(3, end_weights(3, lens, hits))
    assert max(len(s.members) for s in g) >= 2

    arcs = order_graph_arcs(3, lens, np.asarray(hits, np.int64))
    scafs = layout_order_graph(3, arcs, occ_thres=2)
    assert all(len(s.members) == 1 for s in scafs), \
        "ambiguous end must stay unjoined under the nw margin"


def test_clear_winner_still_joins():
    """With one dominant suitor the nw margin does not block joins."""
    lens = np.array([50_000, 50_000, 50_000], np.int64)
    rng = np.random.default_rng(7)
    ab = [(0, int(p), 1, int(q)) for p, q in zip(
        rng.integers(45_000, 50_000, 60), rng.integers(0, 5_000, 60))]
    cb = [(2, int(p), 1, int(q)) for p, q in zip(
        rng.integers(45_000, 50_000, 5), rng.integers(0, 5_000, 5))]
    arcs = order_graph_arcs(3, lens, np.asarray(ab + cb, np.int64))
    scafs = layout_order_graph(3, arcs, occ_thres=2)
    joined = [sorted(c for c, _ in s.members) for s in scafs
              if len(s.members) > 1]
    assert joined == [[0, 1]]


def test_density_normalization_downweights_repeats():
    """Contacts landing in a repeat-enriched (contact-dense) region
    count less (~build_interval_idx/update_h_w): an arc with MORE raw
    hits, all in a dense bin, must score below an arc with fewer hits in
    quiet regions."""
    lens = np.array([60_000, 60_000, 60_000], np.int64)
    rng = np.random.default_rng(3)
    # contig 0's tail bin is contact-dense (repeat): pile intra hits
    intra = _intra(0, 50_000, 60_000, 400, rng)
    # arc 0t-1h: 30 hits from the dense tail bin
    a01 = [(0, int(p), 1, int(q)) for p, q in zip(
        rng.integers(50_000, 60_000, 30), rng.integers(0, 5_000, 30))]
    # arc 2t-1t: 12 hits from quiet regions
    a21 = [(2, int(p), 1, int(q)) for p, q in zip(
        rng.integers(55_000, 60_000, 12),
        rng.integers(55_000, 60_000, 12))]
    hits = np.asarray(intra + a01 + a21, np.int64)
    dens = contact_density(3, lens, hits)
    assert dens[0][5] > 50, "tail bin must be dense"
    arcs = order_graph_arcs(3, lens, hits, dens)
    w01 = arcs[(0 << 1 | 1, 1 << 1 | 0)][0]
    w21 = arcs[(1 << 1 | 1, 2 << 1 | 1)][0]
    assert arcs[(0 << 1 | 1, 1 << 1 | 0)][1] > \
        arcs[(1 << 1 | 1, 2 << 1 | 1)][1], "raw occ: a01 has more hits"
    assert w01 < w21, \
        "density normalization must down-weight the repeat-bin arc"


def test_avoid_list_blocks_rejoin():
    """A junction broken by renew_scaffold lands on the avoid list
    (horder_t.avoid) and is never re-committed, even though its arc
    would win the next round's layout again."""
    lens = np.array([60_000, 60_000], np.int64)
    rng = np.random.default_rng(11)
    # strong 0-tail <-> 1-head arc whose hits sit at the extreme tips:
    # they make a heavy arc, but after joining, the junction's spanning
    # support is tiny vs the dense local intra coverage -> broken
    cross = [(0, int(p), 1, int(q)) for p, q in zip(
        rng.integers(59_000, 60_000, 8), rng.integers(0, 1_000, 8))]
    intra = (_intra(0, 0, 60_000, 800, rng) +
             _intra(1, 0, 60_000, 800, rng))
    hits = cross + intra
    scafs = iterative_scaffold(2, lens, hits, rounds=3,
                               local_bound=20_000, cutoff=3)
    assert all(len(s.members) == 1 for s in scafs), \
        "broken junction must stay broken via the avoid list"


def test_order_graph_deterministic():
    lens = np.array([40_000] * 4, np.int64)
    rng = np.random.default_rng(5)
    hits = (_intra(0, 0, 40_000, 50, rng) +
            _intra(2, 0, 40_000, 50, rng) +
            [(0, 39_000 + i % 900, 1, i % 1000) for i in range(40)] +
            [(2, 39_500 + i % 400, 3, i % 800) for i in range(30)])
    a = iterative_scaffold(4, lens, hits, rounds=3)
    b = iterative_scaffold(4, lens, hits, rounds=3)
    assert [s.members for s in a] == [s.members for s in b]
