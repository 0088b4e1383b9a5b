"""Bubble-chain identification/classification (hic.cpp:2354, hic.h:33-54)."""

import numpy as np

from hifiasm_tpu.graph.bubble import (
    BubbleChains, bubble_phase_edges, identify_bubbles,
)
from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph


def _ug(n, arcs):
    """arcs: [(src_vtx, dst_vtx, ol)]; symmetric mirrors auto-added."""
    ug = UnitigGraph([Unitig(vs=np.array([i << 1], np.uint32),
                             node_len=np.array([1000]), len=1000,
                             circ=False, start=i << 1, end=(i << 1) | 1)
                      for i in range(n)])
    full = []
    for s, d, ol in arcs:
        full.append((s, d, ol))
        full.append((d ^ 1, s ^ 1, ol))
    ug.a_src = np.array([s for s, _, _ in full], np.uint32)
    ug.a_dst = np.array([d for _, d, _ in full], np.uint32)
    ug.a_ol = np.array([o for _, _, o in full], np.int64)
    return ug


def V(u, e=0):
    return (u << 1) | e


def test_simple_bubble_and_chain():
    # 0 -> {1, 2} -> 3 -> {4, 5} -> 6 : two simple bubbles in one chain
    ug = _ug(7, [
        (V(0), V(1), 50), (V(0), V(2), 50),
        (V(1), V(3), 50), (V(2), V(3), 50),
        (V(3), V(4), 50), (V(3), V(5), 50),
        (V(4), V(6), 50), (V(5), V(6), 50),
    ])
    bc = identify_bubbles(ug)
    simple = [b for b in bc.bubbles if b.cls == "simple"]
    assert len(simple) == 2
    pairs = set(map(tuple, bc.het_pairs()))
    assert (1, 2) in pairs and (4, 5) in pairs
    # both bubbles thread into ONE chain
    assert any(len(c) == 2 for c in bc.chains)


def test_full_and_broken_bubbles():
    # full: 0 -> {1, 2, 3} -> 4; broken: 5 -> {6, 7} with dead ends
    ug = _ug(8, [
        (V(0), V(1), 50), (V(0), V(2), 50), (V(0), V(3), 50),
        (V(1), V(4), 50), (V(2), V(4), 50), (V(3), V(4), 50),
        (V(5), V(6), 50), (V(5), V(7), 50),
    ])
    bc = identify_bubbles(ug)
    cls = {b.cls for b in bc.bubbles}
    assert "full" in cls
    assert "broken" in cls
    brk = [b for b in bc.bubbles if b.cls == "broken"]
    assert any(set(b.interior) == {6, 7} for b in brk)


def test_bubble_pairs_phase_without_trans_links():
    """Bubble branches phase onto opposite haplotypes even with ZERO
    trans overlaps — the topology prior doing the work."""
    from hifiasm_tpu.graph.hap_output import phase_unitigs
    from hifiasm_tpu.overlap.paf import PafStore

    ug = _ug(4, [
        (V(0), V(1), 50), (V(0), V(2), 50),
        (V(1), V(3), 50), (V(2), V(3), 50),
    ])
    # reads: one per unitig so trans links can exist but are empty
    for i, u in enumerate(ug.utgs):
        u.vs = np.array([i << 1], np.uint32)
    paf = PafStore(4)
    hap1, hap2 = phase_unitigs(ug, paf, 4, n_perturb=100)
    in1 = {1, 2} & set(hap1)
    in2 = {1, 2} & set(hap2)
    assert len(in1) == 1 and len(in2) == 1 and in1 != in2


def test_bubble_phase_edges():
    ug = _ug(4, [
        (V(0), V(1), 50), (V(0), V(2), 50),
        (V(1), V(3), 50), (V(2), V(3), 50),
    ])
    bc = identify_bubbles(ug)
    ex, ey, ew = bubble_phase_edges(bc)
    assert len(ex) == 1 and (ex[0], ey[0]) == (1, 2) and ew[0] > 0
