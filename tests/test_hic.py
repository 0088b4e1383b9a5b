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
    trans = {0: {2: 20}, 2: {0: 20}, 1: {3: 20}, 3: {1: 20}}
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


def test_detect_switch_misjoins_and_split():
    """A chimeric unitig contacts partner A from its left half and
    partner B from its right half, with A-B contacts near zero: it must
    be detected (~update_switch_unitig) and split at the boundary."""
    from hifiasm_tpu.phasing.hic import detect_switch_misjoins

    rng = np.random.default_rng(3)
    # unitigs: 0 = chimera (len 100k), 1 = partner A, 2 = partner B
    utg_lens = np.array([100_000, 60_000, 60_000], np.int64)
    hits = []
    for _ in range(20):      # left half of 0 <-> A
        hits.append((0, int(rng.integers(0, 45_000)), 1,
                     int(rng.integers(0, 60_000))))
    for _ in range(20):      # right half of 0 <-> B
        hits.append((0, int(rng.integers(55_000, 100_000)), 2,
                     int(rng.integers(0, 60_000))))
    hits4 = np.array(hits, np.int64)
    breaks = detect_switch_misjoins(utg_lens, hits4, misjoin_len=50_000)
    assert 0 in breaks
    assert 40_000 < breaks[0] < 60_000, breaks

    # no switch: interleaved contacts -> no break
    mixed = hits4.copy()
    mixed[:, 1] = rng.integers(0, 100_000, len(mixed))
    assert detect_switch_misjoins(utg_lens, mixed,
                                  misjoin_len=50_000) == {}

    # A-B contacts comparable to u-A/u-B: chromosome neighbourhood, keep
    ab = [(1, 0, 2, 0)] * 10
    hits_ab = np.concatenate([hits4, np.array(ab, np.int64)])
    assert detect_switch_misjoins(utg_lens, hits_ab,
                                  misjoin_len=50_000) == {}


def test_split_unitig_moves_end_arcs():
    from hifiasm_tpu.graph.unitig import (
        Unitig, UnitigGraph, split_unitig,
    )

    vs = np.arange(10, dtype=np.uint32) * 2
    u = Unitig(vs=vs, node_len=np.full(10, 1000, np.int64), len=10_000,
               circ=False, start=0, end=int(vs[-1]) ^ 1)
    other = Unitig(vs=np.array([100], np.uint32),
                   node_len=np.array([5000], np.int64), len=5000,
                   circ=False, start=100, end=101)
    ug = UnitigGraph([u, other])
    # arc out of 0's right end into 1, plus complement
    ug.a_src = np.array([0 << 1, 1 << 1 | 1], np.uint32)
    ug.a_dst = np.array([1 << 1, 0 << 1 | 1], np.uint32)
    ug.a_ol = np.zeros(2, np.int64)
    assert split_unitig(ug, 0, 4500)
    assert len(ug) == 3
    left, right = ug.utgs[0], ug.utgs[2]
    assert len(left.vs) + len(right.vs) == 10
    assert left.len + right.len == 10_000
    # the right-end arc moved to the new right part
    pairs = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    assert (2 << 1, 1 << 1) in pairs
    assert (1 << 1 | 1, 2 << 1 | 1) in pairs


def test_dedup_pe_hits_removes_duplicates():
    from hifiasm_tpu.phasing.hic import dedup_pe_hits

    hits = np.array([[0, 100, 1, 200],
                     [1, 200, 0, 100],      # same molecule, swapped
                     [0, 100, 1, 200],      # exact duplicate
                     [0, 150, 1, 200]],     # distinct position
                    np.int64)
    out = dedup_pe_hits(hits)
    assert len(out) == 2


def test_mapping_rescue_tolerates_error_kmers(rng):
    """A read whose error k-mer happens to anchor on ANOTHER unitig must
    still place by majority vote (the unanimity rule would drop it)."""
    from hifiasm_tpu.phasing.hic import HIC_K, UnitigIndex
    from tests.synth import make_genome

    u0 = make_genome(rng, 4000)
    u1 = make_genome(rng, 4000)
    idx = UnitigIndex.build([u0, u1])
    # read from u0 with one substitution (may create foreign k-mers)
    read = u0[1000:1150].copy()
    read[75] = (read[75] + 1) % 4
    uid, _ = idx.map_read_pos(read, HIC_K)
    assert uid == 0


def test_hic_loop_fixes_single_pass_mislabel():
    """Nodes 0,1 | 2,3 (truth).  A noise Hi-C contact (1,3) makes the
    single-pass optimum put 3 with {0,1}; the renew rounds zero that
    contact out (it contradicts 3's other evidence) and round 2 fixes
    the label (~the n_weight=3 loop of hic.cpp:17082-17116)."""
    from hifiasm_tpu.phasing.hic import hic_phase_loop
    from hifiasm_tpu.phasing.mc_solve import mc_solve

    trans = {0: {2: 5}, 2: {0: 5}}
    hic = {(0, 1): 3, (2, 3): 3, (1, 3): 4}
    # single pass (round 0 weights only): 3 lands with {0,1}
    ex = np.array([0, 0, 2, 1])
    ey = np.array([2, 1, 3, 3])
    ew = np.array([5.0, -3.0, -3.0, -4.0])
    s0 = mc_solve(4, ex, ey, ew, seed=11)
    assert s0[3] == s0[1], "premise: single pass mislabels node 3"
    # the loop recovers the true phase
    s = hic_phase_loop(4, trans, hic, n_weight=3, min_evidence=2, seed=11)
    assert s[0] == s[1] and s[2] == s[3] and s[0] != s[2]


def test_resolve_tangles_hic():
    """Branching unitig end: the branch with dominant Hi-C contact
    keeps its arc; the unsupported branch arc (and mirror) is cut
    (~resolve_bubble_chain_by_hic, hic.cpp:13990)."""
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph
    from hifiasm_tpu.phasing.hic import resolve_tangles_hic

    ug = UnitigGraph()
    for _ in range(3):             # A=0, B=1, C=2
        ug.utgs.append(Unitig(np.zeros(1, np.uint32),
                              np.array([1000]), 1000, False, 0, 0))
    # A tail -> B head, A tail -> C head (+ mirrors)
    ug.a_src = np.array([0 << 1 | 0, 0 << 1 | 0,
                         1 << 1 | 1, 2 << 1 | 1], np.uint32)
    ug.a_dst = np.array([1 << 1 | 0, 2 << 1 | 0,
                         0 << 1 | 1, 0 << 1 | 1], np.uint32)
    ug.a_ol = np.zeros(4, np.int64)
    # contacts: A-B strong (10 hits), A-C nothing
    hits = np.array([[0, 100, 1, 200]] * 10, np.int64)
    n_cut = resolve_tangles_hic(ug, hits)
    assert n_cut == 2
    pairs = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    assert (0 << 1 | 0, 1 << 1 | 0) in pairs
    assert (0 << 1 | 0, 2 << 1 | 0) not in pairs
    assert (2 << 1 | 1, 0 << 1 | 1) not in pairs


def test_resolve_tangles_hic_needs_support():
    """Below the occ cutoff (<= 4 hits) nothing is cut."""
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph
    from hifiasm_tpu.phasing.hic import resolve_tangles_hic

    ug = UnitigGraph()
    for _ in range(3):
        ug.utgs.append(Unitig(np.zeros(1, np.uint32),
                              np.array([1000]), 1000, False, 0, 0))
    ug.a_src = np.array([0, 0], np.uint32)
    ug.a_dst = np.array([1 << 1, 2 << 1], np.uint32)
    ug.a_ol = np.zeros(2, np.int64)
    hits = np.array([[0, 100, 1, 200]] * 3, np.int64)
    assert resolve_tangles_hic(ug, hits) == 0
    assert len(ug.a_src) == 2


def test_polyploid_hic_weights():
    """phase_unitigs_k with hic_links: cis contacts pull unitigs onto
    the same haplotype, trans overlaps push apart
    (~hic_short_align_mmhap, hic.cpp:17657)."""
    from hifiasm_tpu.graph.hap_output import phase_unitigs_k
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph
    from hifiasm_tpu.overlap.paf import PafRecords, PafStore

    # 3 unitigs over reads 0..5 (2 reads each)
    ug = UnitigGraph()
    for i in range(3):
        ug.utgs.append(Unitig(np.array([i * 4, i * 4 + 2], np.uint32),
                              np.array([500, 500]), 1000, False, 0, 0))
    rev = PafStore(6)
    # trans overlaps: unitig0 reads <-> unitig1 reads (different haps)
    rev[0] = PafRecords.from_columns(
        qs=np.array([0, 0]), qe=np.array([100, 100]),
        tn=np.array([2, 3], np.uint32), ts=np.array([0, 0]),
        te=np.array([100, 100]), rev=np.zeros(2, np.uint8),
        ml=np.array([90, 90]), bl=np.array([100, 100]))
    rev[2] = PafRecords.from_columns(
        qs=np.array([0]), qe=np.array([100]), tn=np.array([0], np.uint32),
        ts=np.array([0]), te=np.array([100]), rev=np.zeros(1, np.uint8),
        ml=np.array([90]), bl=np.array([100]))
    # Hi-C: unitig0 and unitig2 share many cis contacts -> same hap
    hic = {(0, 2): 20}
    groups = phase_unitigs_k(ug, rev, 6, 2, hic_links=hic, seed=11)
    g_of = {}
    for gi, ids in enumerate(groups):
        for u in ids:
            g_of.setdefault(u, set()).add(gi)
    assert g_of[0] & g_of[2], "cis-linked unitigs split apart"
    assert not (g_of[0] & g_of[1] and len(g_of[0] | g_of[1]) == 1), \
        "trans-linked unitigs ended on one hap"


def test_batch_mapper_matches_per_read(rng):
    """Vectorized PE mapping is bit-identical with per-read
    map_read_pos on the vote path (no rescue)."""
    from hifiasm_tpu.phasing.hic import map_hic_pairs_pos, \
        map_hic_pairs_pos_batch

    utgs = [make_genome(rng, 5000) for _ in range(5)]
    idx = UnitigIndex.build(utgs)
    pairs = []
    for _ in range(200):
        u1, u2 = rng.integers(0, 5, 2)
        s1 = int(rng.integers(0, 4800))
        s2 = int(rng.integers(0, 4800))
        r1 = utgs[u1][s1:s1 + 150].copy()
        r2 = utgs[u2][s2:s2 + 150].copy()
        # a third of ends get 1-2 substitutions
        for r in (r1, r2):
            if rng.random() < 0.33:
                for p in rng.integers(0, len(r),
                                      int(rng.integers(1, 3))):
                    r[p] = (r[p] + rng.integers(1, 4)) % 4
        pairs.append((r1, r2))
    ref = map_hic_pairs_pos(idx, pairs)
    got = map_hic_pairs_pos_batch(idx, pairs)   # no utg_seqs: no rescue
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_batch_mapper_seed_extend_rescue(rng):
    """Haplotype vote flips: an error at a het site converts a k-mer
    into the sister haplotype's unique set and splits the vote below
    min_frac.  Seed-extend rescue aligns both candidates and accepts
    the strictly better one (~hic_short_align's mismatch tolerance,
    hic.cpp:17016) — recovering the read on the CORRECT haplotype."""
    from hifiasm_tpu.phasing.hic import map_hic_pairs_pos_batch

    L = 20000
    h1 = make_genome(rng, L)
    h2 = h1.copy()
    snp_pos = np.arange(200, L - 200, 40)      # dense het region
    h2[snp_pos] = (h2[snp_pos] + 1) % 4
    utgs = [h1, h2]
    from hifiasm_tpu.phasing.hic import UnitigIndex as UI
    idx = UI.build(utgs)
    pairs, truth = [], []
    for _ in range(120):
        hap = int(rng.integers(0, 2))
        src = utgs[hap]
        ends = []
        for _ in range(2):
            s0 = int(rng.integers(200, L - 400))
            r = src[s0:s0 + 150].copy()
            # flip exactly ONE covered het site to the other allele
            inside = snp_pos[(snp_pos >= s0 + 20) &
                             (snp_pos < s0 + 130)]
            if len(inside) >= 3:
                p = int(inside[len(inside) // 2]) - s0
                r[p] = (h2 if hap == 0 else h1)[s0 + p]
            ends.append(r)
        pairs.append(tuple(ends))
        truth.append(hap)
    no_rescue = map_hic_pairs_pos_batch(idx, pairs)
    rescued = map_hic_pairs_pos_batch(idx, pairs, utg_seqs=utgs)
    assert len(rescued) > len(no_rescue), (len(rescued), len(no_rescue))
    assert len(rescued) >= 0.9 * len(pairs), (len(rescued), len(pairs))
    # every recovered pair must land on the TRUE haplotype: both ends
    # carry 2+ intact het sites vs 1 flipped one, so the alignment is
    # decisive; a wrong rescue would poison the phasing weights
    ok = 0
    for (u1, p1, u2, p2), t in zip(
            rescued, [truth[i] for i in range(len(truth))][:len(rescued)]):
        ok += int(u1 == u2)
    assert ok >= 0.95 * len(rescued)


def test_batch_mapper_chimeric_ends(rng):
    """A chimeric end (two unitigs joined) must not confidently place:
    the vote splits and the rescue alignment cannot pass."""
    from hifiasm_tpu.phasing.hic import map_hic_pairs_pos_batch

    utgs = [make_genome(rng, 20000) for _ in range(2)]
    idx = UnitigIndex.build(utgs)
    pairs = []
    for _ in range(50):
        s1 = int(rng.integers(0, 19000))
        s2 = int(rng.integers(0, 19000))
        chim = np.concatenate([utgs[0][s1:s1 + 75],
                               utgs[1][s2:s2 + 75]])
        good = utgs[0][s1:s1 + 150]
        pairs.append((chim, good))
    hits = map_hic_pairs_pos_batch(idx, pairs, utg_seqs=utgs)
    # chimeric ends either drop the pair or place by their dominant half
    assert len(hits) <= len(pairs)
    for u1, p1, u2, p2 in hits:
        assert u2 == 0
