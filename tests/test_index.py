import numpy as np

from hifiasm_tpu.index.count import analyze_count, histogram_counts
from hifiasm_tpu.index.pos_table import build_filter_table, build_position_table
from hifiasm_tpu.ops.sketch import all_kmers_read, sketch_read

from tests.synth import make_genome, sample_reads


def test_histogram_counts():
    counts = np.array([1, 1, 2, 3, 3, 3, 5000])
    h = histogram_counts(counts)
    assert h[1] == 2 and h[2] == 1 and h[3] == 3
    assert h[4095] == 1  # capped


def test_analyze_count_simple_peak():
    # unimodal histogram peaking at 20
    cnt = np.zeros(4096, dtype=np.int64)
    x = np.arange(4096)
    cnt[1:100] = (1000 * np.exp(-((x[1:100] - 20) ** 2) / 50)).astype(np.int64)
    cnt[1] = 5000  # error k-mers
    cnt[2] = 2000
    hom, het = analyze_count(cnt, start_cnt=5, verbose=False)
    assert hom == 20
    assert het == -1


def test_analyze_count_diploid_peaks():
    cnt = np.zeros(4096, dtype=np.int64)
    x = np.arange(4096)
    cnt[1:200] = (800 * np.exp(-((x[1:200] - 15) ** 2) / 20)
                  + 1000 * np.exp(-((x[1:200] - 30) ** 2) / 40)).astype(np.int64)
    cnt[1] = 6000
    hom, het = analyze_count(cnt, start_cnt=5, verbose=False)
    assert hom == 30
    assert het == 15


def test_all_kmers_vs_sketch_w1(rng):
    codes = rng.integers(0, 4, 2000).astype(np.uint8)
    allk = all_kmers_read(codes, 17)
    # every minimizer hash (any w) must be among all k-mers
    mz = sketch_read(codes, 17, 11)
    assert set(mz.hash.tolist()) <= set(allk.tolist())
    # k-mer count ~ #HPC positions - k + 1 (minus symmetric, rare)
    from hifiasm_tpu.io.readstore import hpc_compress
    comp, _, _ = hpc_compress(codes)
    assert len(allk) >= len(comp) - 17 + 1 - 5


def test_filter_table_marks_repeats(rng):
    genome = make_genome(rng, 20000, repeat_frac=0.2)
    reads, _, _ = sample_reads(rng, genome, depth=12, read_len=2000)
    ft, hom, het = build_filter_table([r for r in reads], k=21,
                                      min_hist_cnt=5, high_factor=3.0)
    assert hom > 0
    assert 8 <= hom <= 16  # ~depth, HPC shrinks effective depth a bit
    # repeat k-mers (4 copies x depth ~ 48) should exceed cutoff=3*hom
    assert len(ft) > 0
    looked = ft.lookup(ft.hashes[:5])
    assert (looked >= ft.cutoff).all()


def test_position_table_roundtrip(rng):
    genome = make_genome(rng, 30000)
    reads, starts, strands = sample_reads(rng, genome, depth=10, read_len=3000)
    pt, hom, het, mzs = build_position_table(
        [r for r in reads], k=21, w=11, ft=None)
    assert pt.tot_pos > 0 and pt.n_distinct > 0
    # CSR integrity
    assert pt.start[-1] + pt.count[-1] == pt.tot_pos
    assert (np.diff(pt.start) == pt.count[:-1]).all()
    # each indexed posting round-trips through get()
    for hi in [0, pt.n_distinct // 2, pt.n_distinct - 1]:
        h = pt.hashes[hi]
        got = pt.get(int(h))
        assert got is not None
        rids, poss, revs, spans = got
        assert len(rids) == pt.count[hi]
        # posting must correspond to an actual minimizer of that read
        mz = mzs[rids[0]]
        match = (mz.hash == h) & (mz.pos == poss[0])
        assert match.any()
    # querying a read's own minimizers finds the read
    mz0 = mzs[0]
    kept = pt.cnt(mz0.hash) > 0
    assert kept.sum() > len(mz0) * 0.5  # singletons dropped, most kept
    # overlap discovery sanity: two overlapping reads share indexed hashes
    ov = np.flatnonzero((np.abs(starts[:, None] - starts[None]) < 1500)
                        & ~np.eye(len(starts), dtype=bool))
    if len(ov):
        i, j = ov[0] // len(starts), ov[0] % len(starts)
        hi_ = set(mzs[i].hash.tolist()) & set(mzs[j].hash.tolist())
        assert len(hi_) > 0


def test_position_table_drops_singletons(rng):
    reads = [rng.integers(0, 4, 1000).astype(np.uint8)]  # single read: all
    pt, _, _, _ = build_position_table(reads, k=21, w=11)
    assert pt.tot_pos == 0  # every minimizer occurs once -> dropped


def test_bloom_prefilter_matches_exact(rng):
    """Bloom-gated counting (-f) drops singletons but must agree with the
    exact path on everything seen >= 2 times (counts within bloom noise),
    and yield the same high-occ filter table."""
    from hifiasm_tpu.native import count_kmers_bloom_native, count_kmers_native

    g = make_genome(rng, 20000)
    reads, _, _ = sample_reads(rng, g, depth=18, read_len=1800,
                               err_rate=0.003)
    k = 31
    exact = count_kmers_native(reads, k)
    bloom = count_kmers_bloom_native(reads, k, bf_bits=24, chunk_bases=50000)
    assert exact is not None and bloom is not None
    eh, ec = exact
    bh, bc = bloom
    # every k-mer with exact count >= 2 must be present
    multi = ec >= 2
    missing = np.setdiff1d(eh[multi], bh)
    assert len(missing) == 0, f"{len(missing)} multi-occ k-mers dropped"
    # no k-mer absent from the exact table may appear
    assert len(np.setdiff1d(bh, eh)) == 0
    # counts agree within bloom false-positive/race noise (+-2)
    pos = np.searchsorted(eh, bh)
    assert np.all(np.abs(bc.astype(np.int64) - ec[pos].astype(np.int64))
                  <= 2)
    # singletons (mostly error k-mers) are mostly gone
    n_single = int((ec == 1).sum())
    leaked = int(np.isin(bh, eh[ec == 1]).sum())
    assert leaked < 0.05 * max(n_single, 1), (leaked, n_single)
    # identical filter table + peaks through the public entry point
    ft_e, hom_e, _ = build_filter_table(reads, k, high_factor=0.8,
                                        bf_shift=0)
    ft_b, hom_b, _ = build_filter_table(reads, k, high_factor=0.8,
                                        bf_shift=24)
    assert hom_e == hom_b
    assert len(ft_e) > 0
    # identical up to k-mers sitting exactly on the cutoff (bloom noise)
    sym = np.setxor1d(ft_e.hashes, ft_b.hashes)
    assert len(sym) <= 0.01 * len(ft_e), (len(sym), len(ft_e))
