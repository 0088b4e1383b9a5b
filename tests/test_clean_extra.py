"""Inexact-arc cuts and post_rescue (~asg_arc_cut_inexact / post_rescue,
gfa_ut.cpp:3057-3186)."""

import numpy as np

import hifiasm_tpu.graph.sg as sgmod
from hifiasm_tpu.graph.clean import (
    asg_arc_cut_inexact, asg_arc_del_short, post_rescue, snapshot_arcs,
)


def _mk(n, arcs):
    """arcs: list of (src_vtx, dst_vtx, ol, el). Adds complements."""
    g = sgmod.StringGraph(n, np.full(n, 1000))
    uls, vs, ols, els = [], [], [], []
    for s, d, ol, el in arcs:
        for a, b in ((s, d), (d ^ 1, s ^ 1)):
            uls.append((np.uint64(a) << np.uint64(32)) |
                       np.uint64(1000 - ol))
            vs.append(b)
            ols.append(ol)
            els.append(el)
    z = np.zeros(len(vs), np.uint8)
    g.set_arcs(np.array(uls, np.uint64), np.array(vs, np.uint32),
               np.array(ols), z.copy(),
               np.array(els, np.uint8), z.copy())
    return g


def _pairs(g):
    return {(int(s), int(d)) for s, d in zip(g.arc_u(), g.v)}


def test_cut_inexact_prefers_exact_arc():
    # vertex 0+ branches to 1+ (exact, strong) and 2+ (inexact, weaker);
    # 1+ and 2+ rejoin at 3+, so 2+ keeps an incoming alternative? No —
    # give 2 another parent 4+ so deleting 0->2 leaves 2 reachable.
    g = _mk(5, [(0 << 1, 1 << 1, 900, 1),
                (0 << 1, 2 << 1, 700, 0),
                (4 << 1, 2 << 1, 800, 1),
                (1 << 1, 3 << 1, 850, 1),
                (2 << 1, 3 << 1, 840, 1)])
    n = asg_arc_cut_inexact(g)
    assert n >= 1
    assert (0 << 1, 2 << 1) not in _pairs(g)
    assert (0 << 1, 1 << 1) in _pairs(g)
    assert (4 << 1, 2 << 1) in _pairs(g)


def test_cut_inexact_keeps_longer_inexact():
    # the inexact arc is the STRONGEST: kept
    g = _mk(4, [(0 << 1, 1 << 1, 700, 1),
                (0 << 1, 2 << 1, 950, 0),
                (3 << 1, 1 << 1, 800, 1)])
    asg_arc_cut_inexact(g)
    assert (0 << 1, 2 << 1) in _pairs(g)


def test_post_rescue_reconnects_dead_end():
    # 0+ -> 1+ weak and 0+ -> 2+ strong; del_short drops 0->1 when 1 has
    # another parent; then remove that parent's arc so 1- side dead-ends…
    # simpler: snapshot, drop 0->2 manually, rescue restores it.
    g = _mk(3, [(0 << 1, 2 << 1, 900, 1)])
    snap = snapshot_arcs(g)
    g.del_[:] = 1
    g.cleanup()
    assert len(_pairs(g)) == 0
    n = post_rescue(g, snap)
    assert n == 2
    assert (0 << 1, 2 << 1) in _pairs(g)
    assert (2 << 1 | 1, 0 << 1 | 1) in _pairs(g)


def test_post_rescue_skips_dead_targets():
    g = _mk(3, [(0 << 1, 2 << 1, 900, 1)])
    snap = snapshot_arcs(g)
    g.del_[:] = 1
    g.seq_del[2] = 1
    g.cleanup()
    n = post_rescue(g, snap)
    assert n == 0


def test_ug_cut_tips():
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph, ug_cut_tips

    def mk_utg(n_reads):
        vs = np.arange(n_reads, dtype=np.uint32) * 2
        return Unitig(vs=vs, node_len=np.full(n_reads, 100, np.int64),
                      len=100 * n_reads, circ=False,
                      start=int(vs[0]), end=int(vs[-1]) ^ 1)

    # 0 --- 1 (main path), 2 = 2-read tip hanging off 0's end
    ug = UnitigGraph([mk_utg(10), mk_utg(10), mk_utg(2)])
    ug.a_src = np.array([0 << 1, 1 << 1 | 1, 0 << 1, 2 << 1 | 1],
                        np.uint32)
    ug.a_dst = np.array([1 << 1, 0 << 1 | 1, 2 << 1, 0 << 1 | 1],
                        np.uint32)
    ug.a_ol = np.zeros(4, np.int64)
    n = ug_cut_tips(ug, max_reads=3)
    assert n == 1
    assert len(ug) == 2
    assert len(ug.a_src) == 2          # only the 0<->1 pair remains


def test_break_by_coverage(rng):
    """A unitig whose middle drops to single coverage breaks there."""
    from hifiasm_tpu.graph.sg import CoverageCut
    from hifiasm_tpu.graph.unitig import (
        Unitig, UnitigGraph, break_by_coverage, unitig_depth_profile,
    )
    from tests.synth import make_genome, sample_reads

    # layout: 20 reads of 3000 bases stepping 500 (dense, depth ~6),
    # then a 3000-base single-read bridge, then dense again
    n1 = 20
    # the read before the bridge contributes 2900, so the 3000-base
    # bridge read is single-coverage for ~2900 of its span
    node_len = [500] * (n1 - 2) + [2900] + [3000] + [500] * (n1 - 1) + \
        [3000]
    vs = np.arange(len(node_len), dtype=np.uint32) * 2
    L = int(np.sum(node_len))
    u = Unitig(vs=vs, node_len=np.array(node_len, np.int64), len=L,
               circ=False, start=0, end=int(vs[-1]) ^ 1)
    n_reads = len(vs)
    cov = CoverageCut(np.zeros(n_reads, np.int64),
                      np.full(n_reads, 3000, np.int64),
                      np.zeros(n_reads, np.uint8))
    ug = UnitigGraph([u])
    prof = unitig_depth_profile(u, cov)
    assert prof[:5000].max() >= 4          # dense region
    n = break_by_coverage(ug, cov, b_low=2, min_run=1500)
    assert n >= 1
    assert len(ug) >= 2
    assert sum(x.len for x in ug.utgs) == L
    # disabled by default
    ug2 = UnitigGraph([Unitig(vs=vs.copy(),
                              node_len=np.array(node_len, np.int64),
                              len=L, circ=False, start=0,
                              end=int(vs[-1]) ^ 1)])
    assert break_by_coverage(ug2, cov) == 0


def test_chimeric_low_support_junction():
    """chem_cov=1: a junction crossed by only ONE read is chimeric when
    both flanks are well covered (~gen_chemical_arc_rf)."""
    from hifiasm_tpu.graph.sg import CoverageCut, detect_chimeric_reads
    from hifiasm_tpu.overlap.paf import PafRecords, PafStore

    L = 10_000
    paf = PafStore(1)
    # dense cover [0,4500) and [5500,10000); ONE read spans the joint
    qs = [0, 500, 1000, 1500, 5500, 6000, 6500, 4000]
    qe = [4500, 4500, 4500, 4500, 10_000, 10_000, 10_000, 6500]
    paf[0] = PafRecords.from_columns(
        qs=qs, qe=qe, tn=np.arange(1, 9), ts=np.zeros(8),
        te=np.array(qe) - np.array(qs), rev=np.zeros(8),
        ml=np.ones(8), bl=np.ones(8))
    lens = np.array([L], np.int64)

    cov = CoverageCut(np.zeros(1, np.int64), lens.copy(),
                      np.zeros(1, np.uint8))
    # strict rule: the spanning read means no zero gap -> kept
    assert detect_chimeric_reads(paf, lens, cov) == 0
    # chem rule: junction support 1 <= chem_cov -> dropped
    assert detect_chimeric_reads(paf, lens, cov, chem_cov=1,
                                 chem_flank=256) == 1
    assert cov.del_[0] == 1


def test_flip_unitig_seq_is_revcomp(rng):
    """flip_unitig must be an exact reverse-complement in sequence space
    (checked on REAL assembled unitigs, incl. coverage-cut reads)."""
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.graph.unitig import flip_unitig, unitig_seq
    from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes
    from tests.synth import make_genome, sample_reads

    # error-free reads: the overlap bases are identical whichever read
    # supplies them, so the flip must be an EXACT revcomp (with errors,
    # direction picks different reads for overlap regions — same as the
    # reference's ma_ug_seq)
    g = make_genome(rng, 12000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2000,
                               err_rate=0.0)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix="/tmp/flip", n_rounds_ec=1,
                        ignore_bin=True)
    res = assemble(store, cfg, write_outputs=False)
    checked = 0
    for u in res.raw_ug.utgs:
        if u.circ or len(u.vs) < 2:
            continue
        fwd = unitig_seq(u, res.store, res.cov)
        rev = unitig_seq(flip_unitig(u, res.cov), res.store, res.cov)
        assert np.array_equal(rev, revcomp_codes(fwd)), len(u.vs)
        # double flip = identity
        u2 = flip_unitig(flip_unitig(u, res.cov), res.cov)
        assert np.array_equal(u2.vs, u.vs)
        assert np.array_equal(u2.node_len, u.node_len)
        checked += 1
    assert checked >= 1


def test_ug_post_join_merges_unique_pair():
    from hifiasm_tpu.graph.sg import CoverageCut
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph, ug_post_join

    # two 3-read unitigs joined tail(0)->head(1) with 500 bp overlap
    def mk(rids):
        vs = (np.array(rids, np.uint32) << 1)
        return Unitig(vs=vs, node_len=np.full(len(vs), 1000, np.int64),
                      len=1000 * len(vs), circ=False,
                      start=int(vs[0]), end=int(vs[-1]) ^ 1)

    ug = UnitigGraph([mk([0, 1, 2]), mk([3, 4, 5])])
    ug.a_src = np.array([0 << 1, 1 << 1 | 1], np.uint32)
    ug.a_dst = np.array([1 << 1, 0 << 1 | 1], np.uint32)
    ug.a_ol = np.array([500, 500], np.int64)
    cov = CoverageCut(np.zeros(6, np.int64), np.full(6, 1000, np.int64),
                      np.zeros(6, np.uint8))
    n = ug_post_join(ug, cov)
    assert n == 1
    assert len(ug) == 1
    u = ug.utgs[0]
    assert list(u.vs) == [0, 2, 4, 6, 8, 10]
    # junction read contributes extent - ol = 500
    assert list(u.node_len) == [1000, 1000, 500, 1000, 1000, 1000]
    assert u.len == 5500
    assert len(ug.a_src) == 0


def test_ug_post_join_respects_branches():
    from hifiasm_tpu.graph.sg import CoverageCut
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph, ug_post_join

    def mk(rids):
        vs = (np.array(rids, np.uint32) << 1)
        return Unitig(vs=vs, node_len=np.full(len(vs), 1000, np.int64),
                      len=1000 * len(vs), circ=False,
                      start=int(vs[0]), end=int(vs[-1]) ^ 1)

    # 0 branches to both 1 and 2: nothing mutually unique
    ug = UnitigGraph([mk([0]), mk([1]), mk([2])])
    ug.a_src = np.array([0 << 1, 0 << 1, 1 << 1 | 1, 2 << 1 | 1],
                        np.uint32)
    ug.a_dst = np.array([1 << 1, 2 << 1, 0 << 1 | 1, 0 << 1 | 1],
                        np.uint32)
    ug.a_ol = np.full(4, 500, np.int64)
    cov = CoverageCut(np.zeros(3, np.int64), np.full(3, 1000, np.int64),
                      np.zeros(3, np.uint8))
    assert ug_post_join(ug, cov) == 0
    assert len(ug) == 3


def test_orthology_cut_preserves_hap_forks():
    """Weak arcs drop at branches UNLESS the branch is the haplotype
    twin of the strongest sibling (~asg_arc_del_orthology_multiple_way,
    Overlaps.cpp:27072)."""
    import numpy as np

    from hifiasm_tpu.graph.clean import asg_arc_del_orthology
    from hifiasm_tpu.graph.sg import StringGraph
    from hifiasm_tpu.overlap.paf import PafRecords, PafStore

    # reads: 0 -> {1 (strong), 2 (weak het twin), 3 (weak junk)}
    g = StringGraph(8, np.full(8, 10000, np.int64))
    ul, vv, ol = [], [], []
    for dst, o in ((1, 5000), (2, 1500), (3, 1400)):
        ul.append(((0 << 1) << 32) | (10000 - o))
        vv.append(dst << 1)
        ol.append(o)
        ul.append(((dst << 1 | 1) << 32) | (10000 - o))
        vv.append(0 << 1 | 1)
        ol.append(o)
    n = len(ol)
    g.set_arcs(np.array(ul, np.uint64), np.array(vv, np.uint32),
               np.array(ol, np.int64), np.ones(n, np.uint8),
               np.ones(n, np.uint8), np.ones(n, np.uint8))
    rev = PafStore(8)
    rev[1] = PafRecords.from_columns(tn=np.array([2]))  # het twins
    # read 3's trans overlaps all land OUTSIDE the strong path:
    # positive evidence of non-orthology (~check_if_diploid == 0)
    rev[3] = PafRecords.from_columns(tn=np.array([6, 7]))
    n = asg_arc_del_orthology(g, rev, drop_ratio=0.4, max_ext=0)
    assert n == 1
    dsts = {int(v) >> 1 for v in g.v[g.arcs_of(0)]}
    assert dsts == {1, 2}, dsts        # het twin kept, junk cut
    # and NO-EVIDENCE branches are never cut (the reference returns -1)
    g2 = StringGraph(8, np.full(8, 10000, np.int64))
    g2.set_arcs(np.array(ul, np.uint64), np.array(vv, np.uint32),
                np.array(ol, np.int64), np.ones(len(ol), np.uint8),
                np.ones(len(ol), np.uint8), np.ones(len(ol), np.uint8))
    rev2 = PafStore(8)          # no trans data anywhere -> -1 -> keep
    assert asg_arc_del_orthology(g2, rev2, drop_ratio=0.4,
                                 max_ext=0) == 0
