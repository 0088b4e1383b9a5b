import numpy as np

from hifiasm_tpu.index.pos_table import build_position_table
from hifiasm_tpu.ops.chain import ChainParams, chain_dp_group, _chain_len
from hifiasm_tpu.overlap.anchors import (
    chain_anchors, collect_anchors, filter_overlaps_quota, ha_ov_type,
)
from hifiasm_tpu.ops.sketch import sketch_read

from tests.synth import make_genome, sample_reads


def test_chain_len():
    # reads of len 100 overlapping by 50: anchor at x=60,y=10
    assert _chain_len(60, 60, 100, 10, 10, 100) == 50


def test_chain_dp_collinear():
    # perfectly collinear anchors chain into one chain
    p = ChainParams.for_k(21)
    self_off = np.arange(100, 1100, 50)
    t_off = self_off - 80
    span = np.full(len(self_off), 21)
    w = np.ones(len(self_off), dtype=np.int64)
    chains = chain_dp_group(self_off, t_off, span, w, 2000, 2000, p)
    assert len(chains) == 1
    sc, idx = chains[0]
    assert len(idx) == len(self_off)
    assert (np.diff(idx) == 1).all()
    assert sc > 0


def test_chain_dp_rejects_outlier():
    p = ChainParams.for_k(21)
    self_off = np.array([100, 150, 200, 250, 300])
    t_off = np.array([100, 150, 1400, 250, 300])  # one wild off-diagonal
    span = np.full(5, 21)
    w = np.ones(5, dtype=np.int64)
    chains = chain_dp_group(self_off, t_off, span, w, 2000, 2000, p)
    sc, idx = chains[0]
    assert 2 not in idx
    assert len(idx) == 4


def test_chain_dp_two_copies():
    # two separated diagonals (repeat copies): mcopy should find both
    p = ChainParams.for_k(21, mcopy_num=3, mcopy_rate=0.5, mcopy_khit_cut=5)
    a = np.arange(0, 40 * 25, 25)
    self_off = np.concatenate([a + 100, a + 100])
    t_off = np.concatenate([a + 100, a + 3100])
    order = np.lexsort((t_off, self_off))
    self_off, t_off = self_off[order], t_off[order]
    span = np.full(len(self_off), 21)
    w = np.ones(len(self_off), dtype=np.int64)
    chains = chain_dp_group(self_off, t_off, span, w, 8000, 8000, p)
    assert len(chains) == 2
    assert abs(len(chains[0][1]) - 40) <= 1
    assert abs(len(chains[1][1]) - 40) <= 1


def test_ov_type():
    assert ha_ov_type(0, 99, 100) == 2      # query contained
    assert ha_ov_type(10, 50, 100) == 3     # query contains target
    assert ha_ov_type(0, 50, 100) == 0      # prefix
    assert ha_ov_type(50, 99, 100) == 1     # suffix


def test_end_to_end_overlaps(rng):
    """Overlap detection on clean synthetic reads: every true dovetail
    overlap >= 2kb must be found with the right strand and coordinates."""
    genome = make_genome(rng, 60_000)
    reads, starts, strands = sample_reads(rng, genome, depth=8,
                                          read_len=8000, err_rate=0.0)
    k, w = 21, 11
    pt, hom, het, mzs = build_position_table(reads, k=k, w=w)
    hom = max(hom, 8)
    tlens = np.array([len(r) for r in reads])
    params = ChainParams.for_k(k)

    found = set()
    for rid in range(len(reads)):
        an = collect_anchors(mzs[rid], pt, rid, tlens, hom)
        ov = chain_anchors(an, rid, tlens[rid], tlens, params)
        for t in range(len(ov)):
            found.add((rid, int(ov.y_id[t]), int(ov.rev[t])))

    missed = 0
    n_true = 0
    for i in range(len(reads)):
        for j in range(len(reads)):
            if i == j:
                continue
            lo = max(starts[i], starts[j])
            hi = min(starts[i] + tlens[i], starts[j] + tlens[j])
            if hi - lo < 2000:
                continue
            n_true += 1
            rev = int(strands[i] != strands[j])
            if (i, j, rev) not in found:
                missed += 1
    assert n_true > 20
    assert missed == 0, f"missed {missed}/{n_true} true overlaps"


def test_overlap_coords_accurate(rng):
    """On error-free reads the projected overlap region must match truth."""
    genome = make_genome(rng, 40_000)
    reads, starts, strands = sample_reads(rng, genome, depth=6,
                                          read_len=6000, err_rate=0.0)
    k, w = 21, 11
    pt, hom, _, mzs = build_position_table(reads, k=k, w=w)
    hom = max(hom, 6)
    tlens = np.array([len(r) for r in reads])
    params = ChainParams.for_k(k)
    rid = 0
    an = collect_anchors(mzs[rid], pt, rid, tlens, hom)
    ov = chain_anchors(an, rid, tlens[rid], tlens, params)
    checked = 0
    for t in range(len(ov)):
        j = int(ov.y_id[t])
        if strands[0] == strands[j] and ov.rev[t] == 0:
            # expected x->y shift (fwd/fwd case only, strand 0)
            if strands[0] == 0:
                shift = starts[j] - starts[0]
                got_shift = int(ov.y_s[t] - ov.x_s[t]) * -1
                assert abs(got_shift - shift) <= 60, (t, got_shift, shift)
                checked += 1
    assert checked > 0


def test_collect_anchors_many_matches_single(rng):
    from hifiasm_tpu.index.pos_table import build_position_table
    from hifiasm_tpu.overlap.anchors import (
        collect_anchors, collect_anchors_many,
    )
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 20000)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=2500,
                               err_rate=0.003)
    pt, ph, _, mzs = build_position_table(reads, 51, 51)
    lens = np.array([len(r) for r in reads])
    hom = ph if ph > 0 else 20
    rids = list(range(len(reads)))
    many = collect_anchors_many(mzs, pt, rids, lens, hom, chunk_mz=700)
    for rid in rids:
        one = collect_anchors(mzs[rid], pt, rid, lens, hom)
        np.testing.assert_array_equal(many[rid].tid, one.tid,
                                      err_msg=f"rid {rid}")
        np.testing.assert_array_equal(many[rid].self_off, one.self_off)
        np.testing.assert_array_equal(many[rid].t_off, one.t_off)
        np.testing.assert_array_equal(many[rid].weight, one.weight)
