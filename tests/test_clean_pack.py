"""Round-2 cleaning parity pack: arc-level chimeric cut, bubble-link
cuts, large-indel cut, semi-circles, dead-end tip extension, trio-aware
bubble popping (~gfa_ut.cpp:917, :2355, :2453, :2533, :2636, :3216;
Overlaps.h:1064)."""

import numpy as np

import hifiasm_tpu.graph.sg as sgmod
from hifiasm_tpu.graph.clean import (
    asg_arc_cut_chimeric, asg_arc_cut_complex_bub_links,
    asg_cut_large_indel, asg_cut_semi_circ, asg_pop_bubble,
    bubble_protect, if_sup_chimeric,
)
from hifiasm_tpu.overlap.paf import PafRecords, PafStore


def _mk(n, arcs, lens=None):
    """arcs: list of (src_vtx, dst_vtx, ol, el[, no_l_indel]).
    Complements added."""
    g = sgmod.StringGraph(n, np.full(n, 1000) if lens is None
                          else np.asarray(lens))
    uls, vs, ols, els, nlis = [], [], [], [], []
    for arc in arcs:
        s, d, ol, el = arc[:4]
        nli = arc[4] if len(arc) > 4 else 1
        for a, b in ((s, d), (d ^ 1, s ^ 1)):
            uls.append((np.uint64(a) << np.uint64(32)) |
                       np.uint64(max(int(g.seq_len[a >> 1]) - ol, 0)))
            vs.append(b)
            ols.append(ol)
            els.append(el)
            nlis.append(nli)
    z = np.zeros(len(vs), np.uint8)
    g.set_arcs(np.array(uls, np.uint64), np.array(vs, np.uint32),
               np.array(ols), z.copy(),
               np.array(els, np.uint8), np.array(nlis, np.uint8))
    return g


def _pairs(g):
    return {(int(s), int(d))
            for i, (s, d) in enumerate(zip(g.arc_u(), g.v))
            if not g.del_[i]}


def _paf_for(n, recs):
    paf = PafStore(n)
    by_q = {}
    for r in recs:
        by_q.setdefault(r[0], []).append(r)
    for q, rows in by_q.items():
        paf[q] = PafRecords.from_columns(
            qs=np.array([r[1] for r in rows], np.int64),
            qe=np.array([r[2] for r in rows], np.int64),
            tn=np.array([r[3] for r in rows], np.uint32),
            ts=np.zeros(len(rows), np.int64),
            te=np.zeros(len(rows), np.int64),
            rev=np.zeros(len(rows), np.uint8),
            ml=np.array([r[2] - r[1] for r in rows], np.int64),
            bl=np.array([r[2] - r[1] for r in rows], np.int64),
            el=np.array([r[4] for r in rows], np.uint8),
            no_l_indel=np.ones(len(rows), np.uint8))
    return paf


def test_if_sup_chimeric_detects_gap():
    # exact overlaps cover [0,400] and [600,1000]: unsupported middle
    paf = _paf_for(2, [(0, 0, 400, 1, 1), (0, 600, 1000, 1, 1)])
    assert if_sup_chimeric(paf[0], 1000)
    # spanning exact overlap bridges the middle
    paf2 = _paf_for(2, [(0, 0, 400, 1, 1), (0, 600, 1000, 1, 1),
                        (0, 300, 700, 1, 1)])
    assert not if_sup_chimeric(paf2[0], 1000)


def test_arc_cut_chimeric_removes_bridge_read():
    # read 2 sits 1-in/1-out between two junctions (0 and 3 have
    # alternatives), its forward arc is inexact, neighbors hold exact
    # competitors, and its own exact coverage has a hole -> deleted
    g = _mk(6, [(0 << 1, 2 << 1, 500, 0),      # into the chimera, inexact
                (2 << 1, 3 << 1, 500, 0),      # out of the chimera, inexact
                (1 << 1, 3 << 1, 800, 1),      # exact competitor at 3's side
                (4 << 1, (0 << 1) | 1, 700, 1),  # gives 0^1 a second arc
                (0 << 1, 5 << 1, 900, 1)])     # 0 has an alternative
    from hifiasm_tpu.graph.sg import CoverageCut
    cov = CoverageCut.full(g.seq_len)
    paf = _paf_for(6, [(2, 0, 400, 0, 1), (2, 600, 1000, 3, 1)])
    n = asg_arc_cut_chimeric(g, paf, cov)
    assert n == 1
    assert g.seq_del[2] == 1


def test_complex_bub_links_cut():
    # v=0+ has two weak cross-links into junctions that each have a much
    # stronger alternative -> both links cut
    g = _mk(7, [(0 << 1, 1 << 1, 100, 1),
                (0 << 1, 2 << 1, 110, 1),
                (3 << 1, 1 << 1, 900, 1),
                (4 << 1, 2 << 1, 880, 1),
                (5 << 1, 0 << 1, 500, 1)])     # keep 0 alive upstream
    n = asg_arc_cut_complex_bub_links(g, len_rat=0.6)
    assert n >= 1
    p = _pairs(g)
    assert (0 << 1, 1 << 1) not in p and (0 << 1, 2 << 1) not in p
    assert (3 << 1, 1 << 1) in p and (4 << 1, 2 << 1) in p


def test_large_indel_arc_cut():
    # 0+ branches: strong clean arc to 1+, weaker large-indel arc to 2+
    # (2+ also reachable from 3+): the indel arc loses at both ends
    g = _mk(5, [(0 << 1, 1 << 1, 900, 1, 1),
                (0 << 1, 2 << 1, 700, 1, 0),   # no_l_indel == 0
                (3 << 1, 2 << 1, 850, 1, 1)])
    n = asg_cut_large_indel(g, max_ext=3, min_diff=50)
    assert n == 1
    p = _pairs(g)
    assert (0 << 1, 2 << 1) not in p
    assert (0 << 1, 1 << 1) in p


def test_semi_circ_cut():
    # chain 0+ -> 1+ -> 2+ where 2+ loops back into 0's in-side: the
    # back-arc (0^1 side) is a semi-circle
    g = _mk(4, [(0 << 1, 1 << 1, 500, 1),
                (1 << 1, 2 << 1, 500, 1),
                (3 << 1, 0 << 1, 500, 1),
                (2 << 1, 0 << 1, 400, 1)])
    before = _pairs(g)
    assert (2 << 1, 0 << 1) in before
    n = asg_cut_semi_circ(g, lim_len=100)
    assert n >= 1
    assert (2 << 1, 0 << 1) not in _pairs(g)


def test_trio_aware_pop_keeps_right_hap():
    # bubble 0 -> {1 (flagged wrong-hap), 2} -> 3; coverage favors 1, but
    # the avoid mask must force the kept path through 2
    g = _mk(4, [(0 << 1, 1 << 1, 500, 1),
                (0 << 1, 2 << 1, 500, 1),
                (1 << 1, 3 << 1, 500, 1),
                (2 << 1, 3 << 1, 500, 1)])
    cov = np.array([30, 40, 20, 30])
    avoid = np.array([False, True, False, False])
    n = asg_pop_bubble(g, 100000, cov, avoid)
    assert n == 1
    assert g.seq_del[1] == 1 and g.seq_del[2] == 0
    # control: without avoid, coverage picks read 1
    g2 = _mk(4, [(0 << 1, 1 << 1, 500, 1),
                 (0 << 1, 2 << 1, 500, 1),
                 (1 << 1, 3 << 1, 500, 1),
                 (2 << 1, 3 << 1, 500, 1)])
    asg_pop_bubble(g2, 100000, cov)
    assert g2.seq_del[2] == 1 and g2.seq_del[1] == 0


def test_bubble_protect_masks_interior():
    g = _mk(4, [(0 << 1, 1 << 1, 500, 1),
                (0 << 1, 2 << 1, 500, 1),
                (1 << 1, 3 << 1, 500, 1),
                (2 << 1, 3 << 1, 500, 1)])
    vis = bubble_protect(g, 100000)
    assert vis[1 << 1] and vis[2 << 1]


def test_ug_ext_gfa_revives_dead_end():
    from hifiasm_tpu.graph.clean import ug_ext_gfa
    from hifiasm_tpu.graph.sg import CoverageCut

    # read 0 ends dead; read 1 was deleted by cleaning but overlaps 0's
    # end by 3000 (mutual best) -> revived and re-arced
    g = _mk(2, [], lens=[10000, 10000])
    g.seq_del[1] = 1
    cov = CoverageCut.full(g.seq_len)
    paf = _paf_for(2, [(0, 7000, 10000, 1, 1), (1, 0, 3000, 0, 1)])
    # reciprocal coordinates: read1[0:3000] == read0[7000:10000]
    paf[1] = PafRecords.from_columns(
        qs=np.array([0]), qe=np.array([3000]),
        tn=np.array([0], np.uint32),
        ts=np.array([7000]), te=np.array([10000]),
        rev=np.zeros(1, np.uint8), ml=np.array([3000]),
        bl=np.array([3000]), el=np.ones(1, np.uint8),
        no_l_indel=np.ones(1, np.uint8))
    paf[0] = PafRecords.from_columns(
        qs=np.array([7000]), qe=np.array([10000]),
        tn=np.array([1], np.uint32),
        ts=np.array([0]), te=np.array([3000]),
        rev=np.zeros(1, np.uint8), ml=np.array([3000]),
        bl=np.array([3000]), el=np.ones(1, np.uint8),
        no_l_indel=np.ones(1, np.uint8))
    r_to_u = np.full(2, -1, np.int64)
    n = ug_ext_gfa(g, paf, cov, r_to_u, max_len=75000, tip_reads=3,
                   max_hang=1000, int_frac=0.8, min_ovlp=2000)
    assert n == 1
    assert g.seq_del[1] == 0
    assert (0 << 1, 1 << 1) in _pairs(g)


def _mk_ug_with_nested_bubble():
    """Outer bubble S -> {A(8 reads), B(8)} -> T, where A's interior
    end opens a nested tiny bubble A -> {x(1), y(1)} -> C -> T."""
    import numpy as np

    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph

    def mk(n_reads, ln=5000):
        return Unitig(np.arange(n_reads, dtype=np.uint32) << 1,
                      np.full(n_reads, ln // n_reads, np.int64), ln,
                      False, 0, 1)

    # ids: 0=S 1=A 2=B 3=T 4=x 5=y 6=C
    ug = UnitigGraph(utgs=[mk(4), mk(8), mk(8), mk(4), mk(1), mk(1),
                           mk(3)])
    arcs = [(0, 1), (0, 2), (2, 3),          # outer bubble via B
            (1, 4), (1, 5), (4, 6), (5, 6),  # nested tiny bubble in A
            (6, 3)]
    src = [a << 1 for a, _ in arcs] + [(b << 1) ^ 1 for _, b in arcs]
    dst = [b << 1 for _, b in arcs] + [(a << 1) ^ 1 for a, _ in arcs]
    ug.a_src = np.array(src, np.uint32)
    ug.a_dst = np.array(dst, np.uint32)
    ug.a_ol = np.full(len(src), 100, np.int64)
    return ug


def test_hic_clean_flattens_nested_bubble():
    from hifiasm_tpu.graph.clean import hic_clean_ug

    ug = _mk_ug_with_nested_bubble()
    n = hic_clean_ug(ug)
    assert n == 1
    # one of x/y (1 read each) dropped; main structure intact
    assert len(ug.utgs) == 6
    assert all(len(u.vs) >= 1 for u in ug.utgs)


def test_hic_clean_keeps_plain_bubble():
    import numpy as np

    from hifiasm_tpu.graph.clean import hic_clean_ug
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph

    def mk(n_reads):
        return Unitig(np.arange(n_reads, dtype=np.uint32) << 1,
                      np.full(n_reads, 100, np.int64), 100 * n_reads,
                      False, 0, 1)

    ug = UnitigGraph(utgs=[mk(4), mk(6), mk(6), mk(4)])
    arcs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    src = [a << 1 for a, _ in arcs] + [(b << 1) ^ 1 for _, b in arcs]
    dst = [b << 1 for _, b in arcs] + [(a << 1) ^ 1 for a, _ in arcs]
    ug.a_src = np.array(src, np.uint32)
    ug.a_dst = np.array(dst, np.uint32)
    ug.a_ol = np.full(len(src), 100, np.int64)
    assert hic_clean_ug(ug) == 0
    assert len(ug.utgs) == 4
