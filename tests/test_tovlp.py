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


def test_drop_graph_close_pairs():
    """Arc-connected (adjacent) unitig pairs are dropped; parallel
    bubble branches (true homologs) survive (~clean_mz_ovlp)."""
    import numpy as np

    from hifiasm_tpu.graph.tovlp import drop_graph_close_pairs
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph

    def mk(n):
        return Unitig(np.array([0], np.uint32),
                      np.array([n], np.int64), n, False, 0, 1)

    # bubble: S(0) -> A(1), S -> B(2), A -> T(3), B -> T
    ug = UnitigGraph(utgs=[mk(5000) for _ in range(4)])
    src = [0 << 1, 0 << 1, 1 << 1, 2 << 1]
    dst = [1 << 1, 2 << 1, 3 << 1, 3 << 1]
    # + mirrors
    a_s = src + [d ^ 1 for d in dst]
    a_d = dst + [s ^ 1 for s in src]
    ug.a_src = np.array(a_s, np.uint32)
    ug.a_dst = np.array(a_d, np.uint32)
    ug.a_ol = np.full(len(a_s), 100, np.int64)

    cand = {(0, 1): (5, 0.9),    # S vs A: graph-adjacent -> drop
            (1, 2): (7, 0.9),    # A vs B: parallel branches -> keep
            (0, 3): (4, 0.8)}    # S vs T: reachable through A -> drop
    out = drop_graph_close_pairs(ug, cand)
    assert (1, 2) in out
    assert (0, 1) not in out and (0, 3) not in out


def test_batched_pair_alignment_matches_per_pair(rng):
    """hap_align_pairs_batch must reproduce hap_align_pair's verdicts:
    the shared-table form only changes WHERE the partner index lives."""
    from hifiasm_tpu.graph.tovlp import (
        hap_align_pair, hap_align_pairs_batch,
    )
    from hifiasm_tpu.io.readstore import revcomp_codes
    from tests.synth import make_genome, inject_errors

    base = make_genome(rng, 30_000)
    seqs = []
    # 0/1: homolog pair (1% divergence); 2/3: another pair, one end
    # reversed; 4: unrelated
    hom = base.copy()
    snp = rng.choice(len(hom), 300, replace=False)
    hom[snp] = (hom[snp] + 1 + rng.integers(0, 3, len(snp))) % 4
    seqs.append(base[:20_000].copy())
    seqs.append(hom[:22_000].copy())
    other = make_genome(rng, 25_000)
    oth2 = inject_errors(rng, other.copy(), 0.01)
    seqs.append(other[:18_000].copy())
    seqs.append(revcomp_codes(oth2))
    seqs.append(make_genome(rng, 15_000))
    pairs = [(0, 1, 0.9), (2, 3, 0.9), (4, 1, 0.1)]
    got = hap_align_pairs_batch(seqs, pairs)
    for a, b, _f in pairs:
        ef, ei, es = hap_align_pair(seqs[a], seqs[b])
        gf, gi, gs = got[(a, b)]
        # verdict-level agreement: aligned fraction and identity within
        # tight tolerance (occurrence-class weights can differ at
        # repeated minimizers between the shared and single tables)
        assert abs(gf - ef) < 0.02, (a, b, gf, ef)
        assert abs(gi - ei) < 0.02, (a, b, gi, ei)
        assert (gs is None) == (es is None), (a, b, gs, es)
