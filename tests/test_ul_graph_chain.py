"""UL graph-chaining DP (~gl_chain_refine_advance, inter.cpp:4334):
a UL read spanning >=3 unitigs across a bubble must come out as ONE
path that picks the true allele, and anchor-less junction unitigs the
path traverses are inserted from the graph walk."""

import numpy as np

from hifiasm_tpu.graph.unitig import UnitigGraph, Unitig
from hifiasm_tpu.ul import ul_align, ul_renew_graph
from tests.synth import make_genome, inject_errors


def _mk_ug(utgs, arcs):
    """arcs: [(src_vtx, dst_vtx, ol)]; complements added."""
    full = []
    for s, d, ol in arcs:
        full.append((s, d, ol))
        full.append((d ^ 1, s ^ 1, ol))
    ug = UnitigGraph(
        utgs=[Unitig(vs=np.zeros(0, np.uint32),
                     node_len=np.zeros(0, np.int64), len=len(s),
                     circ=False, start=0, end=0) for s in utgs],
        a_src=np.array([a[0] for a in full], np.uint32),
        a_dst=np.array([a[1] for a in full], np.uint32),
        a_ol=np.array([a[2] for a in full], np.int64))
    return ug


def test_ul_path_picks_true_allele_through_bubble(rng):
    u0 = make_genome(rng, 6000)
    a = make_genome(rng, 3000)
    b = a.copy()
    # the false allele differs by ~0.5% SNPs: shares most minimizers
    snp = rng.choice(len(b), max(len(b) // 200, 8), replace=False)
    b[snp] = (b[snp] + 1 + rng.integers(0, 3, len(snp))) % 4
    u2 = make_genome(rng, 6000)
    utgs = [u0, a, b, u2]
    # bubble: u0 -> {a, b} -> u2
    ug = _mk_ug(utgs, [(0 << 1, 1 << 1, 0), (1 << 1, 3 << 1, 0),
                       (0 << 1, 2 << 1, 0), (2 << 1, 3 << 1, 0)])
    ul = inject_errors(
        rng, np.concatenate([u0[2000:], a, u2[:2500]]).copy(), 0.05)
    paths = ul_align(utgs, [ul], ug=ug)
    uids = [blk[0] for blk in paths[0].blocks]
    assert uids == [0, 1, 3], uids          # ONE path, true allele only
    assert [blk[1] for blk in paths[0].blocks] == [0, 0, 0]
    # q ranges advance monotonically
    qss = [blk[2] for blk in paths[0].blocks]
    assert qss == sorted(qss)


def test_ul_junction_unitig_inserted_without_anchors(rng):
    u0 = make_genome(rng, 6000)
    mid = make_genome(rng, 90)     # too short for chains (k=19/w=19)
    u2 = make_genome(rng, 6000)
    utgs = [u0, mid, u2]
    ug = _mk_ug(utgs, [(0 << 1, 1 << 1, 0), (1 << 1, 2 << 1, 0)])
    ul = inject_errors(
        rng, np.concatenate([u0[1500:], mid, u2[:3000]]).copy(), 0.04)
    paths = ul_align(utgs, [ul], ug=ug)
    uids = [blk[0] for blk in paths[0].blocks]
    assert uids == [0, 1, 2], uids          # mid inserted from the walk
    m = paths[0].blocks[1]
    assert m[2] == m[3]                     # anchor-less: point interval


def test_ul_renew_drops_false_allele_arc(rng):
    u0 = make_genome(rng, 6000)
    a = make_genome(rng, 3000)
    b = a.copy()
    snp = rng.choice(len(b), max(len(b) // 200, 8), replace=False)
    b[snp] = (b[snp] + 1 + rng.integers(0, 3, len(snp))) % 4
    u2 = make_genome(rng, 6000)
    utgs = [u0, a, b, u2]
    ug = _mk_ug(utgs, [(0 << 1, 1 << 1, 0), (1 << 1, 3 << 1, 0),
                       (0 << 1, 2 << 1, 0), (2 << 1, 3 << 1, 0)])
    uls = [inject_errors(
        rng, np.concatenate([u0[2000:], a, u2[:2500]]).copy(), 0.05)
        for _ in range(4)]
    paths = ul_align(utgs, uls, ug=ug)
    for p in paths:
        assert [blk[0] for blk in p.blocks] == [0, 1, 3]
    ul_renew_graph(ug, paths, min_support=2, drop_contradicted=3)
    pairs = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    assert (0 << 1, 1 << 1) in pairs        # true allele kept
    assert (0 << 1, 2 << 1) not in pairs    # false allele arc dropped


def test_ul_realign_after_renewal_confirms_bridged_junction(rng):
    """The re-alignment cycle (~inter.cpp:20527,20559 after
    gradually_renew_g): UL reads evidence a u0-u2 adjacency the HiFi
    graph lacks; renewal bridges the arc; RE-MAPPING against the renewed
    graph threads the junction as a verified transition (not a penalized
    bridge), and the second renewal keeps the arc while dropping an
    unsupported decoy."""
    from hifiasm_tpu.ul import ul_realign_renewed

    u0 = make_genome(rng, 6000)
    u2 = make_genome(rng, 6000)
    decoy = make_genome(rng, 3000)
    utgs = [u0, u2, decoy]
    # no u0 -> u2 arc (the HiFi gap); a decoy arc u0 -> decoy exists
    ug = _mk_ug(utgs, [(0 << 1, 2 << 1, 0)])
    uls = [inject_errors(
        rng, np.concatenate([u0[1500:], u2[:3000]]).copy(), 0.04)
        for _ in range(4)]
    paths = ul_align(utgs, uls, ug=ug)
    for p in paths:
        assert [blk[0] for blk in p.blocks] == [0, 1]

    def cov(p):
        return sum(qe - qs for _, _, qs, qe in p.blocks)

    cov0 = [cov(p) for p in paths]
    ul_renew_graph(ug, paths, min_support=2, drop_contradicted=3)
    pairs = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    assert (0 << 1, 1 << 1) in pairs        # renewal bridged u0 -> u2

    # re-map against the renewed graph: the junction now verifies at
    # base level; coverage never regresses (monotone keep rule)
    ul_realign_renewed(ug, utgs, paths, uls, hpc=False)
    for p, c0 in zip(paths, cov0):
        assert [blk[0] for blk in p.blocks] == [0, 1]
        assert cov(p) >= c0
    ul_renew_graph(ug, paths, min_support=2, drop_contradicted=3)
    pairs = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    assert (0 << 1, 1 << 1) in pairs        # confirmed by re-mapped paths
    assert (0 << 1, 2 << 1) not in pairs    # decoy arc UL-contradicted
