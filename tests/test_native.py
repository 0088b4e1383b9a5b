"""Native C++ kernels vs the python fallbacks."""

import numpy as np
import pytest

from hifiasm_tpu.native import get_lib, trans_reduce


def test_native_builds():
    assert get_lib() is not None, "native kernel build failed"


def test_trans_reduce_matches_python(rng):
    # random layered DAG with transitive arcs
    import hifiasm_tpu.graph.sg as sgmod
    n_reads = 40
    g1 = sgmod.StringGraph(n_reads, np.full(n_reads, 1000))
    uls, vs, ols = [], [], []
    # chain v0 -> v1 -> ... with skip arcs
    for i in range(n_reads - 1):
        uls.append((np.uint64(i << 1) << np.uint64(32)) | np.uint64(100))
        vs.append((i + 1) << 1)
        ols.append(900)
        if i + 2 < n_reads:
            uls.append((np.uint64(i << 1) << np.uint64(32)) | np.uint64(200))
            vs.append((i + 2) << 1)
            ols.append(800)
    z = np.zeros(len(vs), np.uint8)
    g1.set_arcs(np.array(uls, np.uint64), np.array(vs, np.uint32),
                np.array(ols), z.copy(), z.copy(), z.copy())
    g2 = sgmod.StringGraph(n_reads, np.full(n_reads, 1000))
    g2.set_arcs(np.array(uls, np.uint64), np.array(vs, np.uint32),
                np.array(ols), z.copy(), z.copy(), z.copy())

    # native path
    n1 = trans_reduce(g1.idx_s, g1.idx_n, g1.v, g1.arc_len(),
                      g1.seq_del, g1.del_, 50)
    assert n1 is not None
    # python fallback: call the loop by monkeypatching native away
    import hifiasm_tpu.native as nat
    orig = nat.trans_reduce
    nat.trans_reduce = lambda *a, **k: None
    try:
        n2 = sgmod.asg_arc_del_trans(g2, 50)
    finally:
        nat.trans_reduce = orig
    assert n1 == (np.array(g1.del_) == 1).sum()
    assert n1 == n2


def test_native_banded_matches_numpy(rng):
    from hifiasm_tpu.native import banded_batch_native
    from hifiasm_tpu.ops.banded_batch import banded_batch_np
    from tests.test_banded_batch import _mk_problems

    for e in (7, 31):
        xs, ys = _mk_problems(rng, 30, e)
        B = len(xs)
        XL = max(len(x) for x in xs)
        YL = XL + 2 * e
        xb = np.full((B, XL), 4, np.uint8)
        yb = np.full((B, YL), 4, np.uint8)
        xlen = np.array([len(x) for x in xs])
        ylen = np.array([min(len(y), YL) for y in ys])
        for i in range(B):
            xb[i, :xlen[i]] = xs[i]
            yb[i, :ylen[i]] = ys[i][:ylen[i]]
        ref = banded_batch_np(xb, xlen, yb, ylen, e)
        out = banded_batch_native(xb, xlen, yb, ylen, e)
        assert out is not None
        np.testing.assert_array_equal(out.err, ref.err)
        okm = ref.err >= 0
        np.testing.assert_array_equal(out.y_end[okm], ref.y_end[okm])
        np.testing.assert_array_equal(out.y_start[okm], ref.y_start[okm])
        np.testing.assert_array_equal(out.tb_base[okm], ref.tb_base[okm])
        np.testing.assert_array_equal(out.ins_cnt[okm], ref.ins_cnt[okm])
        np.testing.assert_array_equal(out.ins_base[okm], ref.ins_base[okm])


def test_native_banded_speed(rng):
    """Sanity: native engine should be much faster than numpy."""
    import time
    from hifiasm_tpu.native import banded_batch_native
    from hifiasm_tpu.ops.banded_batch import banded_batch_np

    e, XL, B = 31, 775, 512
    YL = XL + 2 * e
    y = rng.integers(0, 4, (B, YL)).astype(np.uint8)
    x = y[:, e:e + XL].copy()
    xlen = np.full(B, XL, np.int64)
    ylen = np.full(B, YL, np.int64)
    t0 = time.time()
    banded_batch_native(x, xlen, y, ylen, e)
    t_nat = time.time() - t0
    t0 = time.time()
    banded_batch_np(x, xlen, y, ylen, e)
    t_np = time.time() - t0
    assert t_nat < t_np, (t_nat, t_np)


def test_native_chain_matches_numpy(rng):
    """Native chain DP == the scalar reference-semantics oracle, both on
    quick-resolved (collinear) and full-DP (noisy/repeat) groups."""
    from hifiasm_tpu.native import chain_dp_native
    from hifiasm_tpu.ops.chain import ChainParams, chain_dp_ref

    p = ChainParams.for_k(51)
    n_quick = 0
    for it in range(14):
        n = int(rng.integers(5, 200))
        so = np.sort(rng.choice(np.arange(50, 5000), n, replace=False))
        if it % 3 == 0:   # clean collinear group -> quick path
            to = so + 40
        elif it % 3 == 1:  # small jitter
            to = so + 40 + np.cumsum(rng.integers(-1, 2, n))
        else:              # two diagonals (repeat copy) -> full DP
            to = so + np.where(np.arange(n) % 2 == 0, 40, 2300)
            order = np.lexsort((to, so))
            so, to = so[order], to[order]
        sp = np.full(n, 51)
        w = rng.integers(1, 3, n).astype(np.int64)
        xl = yl = 8000
        f_py, pre_py, q_py = chain_dp_ref(
            so.astype(np.int64), to.astype(np.int64), sp, w, xl, yl, p)
        out = chain_dp_native(so, to, sp, w, xl, yl, p)
        assert out is not None
        f_nat, pre_nat, q_nat = out
        assert q_nat == q_py
        n_quick += int(q_nat)
        np.testing.assert_array_equal(f_nat, f_py)
        np.testing.assert_array_equal(pre_nat, pre_py)
    assert n_quick >= 4          # quick pre-pass actually exercised


def test_native_chain_groups_matches_python(rng):
    from hifiasm_tpu.native import chain_groups_native
    from hifiasm_tpu.ops.chain import ChainParams, chain_dp_group

    p = ChainParams.for_k(51)
    groups = []
    for _ in range(12):
        n = int(rng.integers(5, 120))
        so = np.sort(rng.choice(np.arange(50, 5000), n, replace=False))
        to = so + 40 + np.cumsum(rng.integers(-1, 2, n))
        sp = np.full(n, 51)
        w = rng.integers(1, 3, n).astype(np.int64)
        groups.append((so.astype(np.int64), to.astype(np.int64), sp, w))
    off = np.concatenate([[0], np.cumsum([len(g[0]) for g in groups])])
    so = np.concatenate([g[0] for g in groups])
    to = np.concatenate([g[1] for g in groups])
    sp = np.concatenate([g[2] for g in groups])
    w = np.concatenate([g[3] for g in groups])
    xl = np.full(len(groups), 5100, np.int64)
    yl = np.full(len(groups), 5100, np.int64)
    cnt, score, start, hits, hit_idx = chain_groups_native(
        off, so, to, sp, w, xl, yl, p)
    for g, (gso, gto, gsp, gw) in enumerate(groups):
        want = chain_dp_group(gso, gto, gsp, gw, 5100, 5100, p)
        assert int(cnt[g]) == len(want)
        for c, (wsc, widx) in enumerate(want):
            assert int(score[g, c]) == wsc
            got = hit_idx[start[g, c]:start[g, c] + hits[g, c]]
            np.testing.assert_array_equal(got, widx)


def test_native_jobs_path_matches_engine_path(rng):
    """WindowBatcher zero-copy native path == legacy numpy engine path."""
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.ec.pipeline import run_ec
    from hifiasm_tpu.io.readstore import ReadStore
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 7000)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=1700,
                               err_rate=0.004)
    s1 = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    s2 = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    ec1 = run_ec(s1, HifiasmConfig(align_engine="numpy", n_rounds_ec=1),
                 None)
    ec2 = run_ec(s2, HifiasmConfig(align_engine="native", n_rounds_ec=1),
                 None)
    assert ec1.paf.total == ec2.paf.total
    assert ec1.reverse_paf.total == ec2.reverse_paf.total
    for rid in range(s1.n_reads):
        np.testing.assert_array_equal(s1.get_codes(rid), s2.get_codes(rid))
        a, b = ec1.paf[rid], ec2.paf[rid]
        np.testing.assert_array_equal(a.tn, b.tn)
        np.testing.assert_array_equal(a.ts, b.ts)
        np.testing.assert_array_equal(a.te, b.te)
        np.testing.assert_array_equal(a.ml, b.ml)


def test_native_ec_read_matches_python(rng):
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.ec.pipeline import _TargetCache, _chain_all_reads
    from hifiasm_tpu.ec.window_align import align_overlaps
    from hifiasm_tpu.ec.phase import phase_overlaps
    from hifiasm_tpu.ec.consensus import windowed_consensus
    from hifiasm_tpu.index.pos_table import build_position_table
    from hifiasm_tpu.io.readstore import ReadStore
    from hifiasm_tpu.native import ec_read_native
    from tests.synth import make_genome, sample_reads

    h1, h2 = make_genome(rng, 9000, het_rate=0.006)
    r1, _, _ = sample_reads(rng, h1, depth=9, read_len=1800, err_rate=0.004)
    r2, _, _ = sample_reads(rng, h2, depth=9, read_len=1800, err_rate=0.004)
    reads = r1 + r2
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig()
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    pt, ph_, _, mzs = build_position_table(codes, cfg.k, cfg.w)
    hom = ph_ if ph_ > 0 else cfg.hom_cov
    gt = _TargetCache(store)
    read_ovs = _chain_all_reads(store, codes, mzs, pt, cfg, hom)
    checked = 0
    for rid, ov in read_ovs[:20]:
        q = codes[rid]
        tbs = align_overlaps(q, ov, gt, cfg.max_ov_diff_ec)
        phr = phase_overlaps(q, ov, tbs)
        cns = windowed_consensus(q, ov, tbs, phr)
        nat = ec_read_native(tbs, q)
        assert nat is not None
        is_match, n_het, seq, n_edits = nat[:4]
        np.testing.assert_array_equal(is_match, phr.is_match,
                                      err_msg=f"rid {rid} is_match")
        assert n_het == len(phr.het_sites), rid
        assert n_edits == cns.n_corrected, rid
        np.testing.assert_array_equal(seq, cns.seq, err_msg=f"rid {rid}")
        checked += 1
    assert checked == 20


def test_native_sketch_matches_python(rng):
    from hifiasm_tpu.native import sketch_many_native
    from hifiasm_tpu.ops.sketch import sketch_read
    from hifiasm_tpu.index.pos_table import build_filter_table
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 30000, repeat_frac=0.2)
    reads, _, _ = sample_reads(rng, g, depth=6, read_len=3000,
                               err_rate=0.003)
    r_n = reads[0].copy()
    r_n[100:130] = 4
    reads = reads + [r_n, reads[1][:70]]
    ft, _, _ = build_filter_table((r for r in reads), 51, high_factor=1.0)
    for ft_used in (None, ft if len(ft) else None):
        fl = ft_used.lookup if ft_used is not None else None
        many = sketch_many_native(reads, 51, 51, ft_used)
        assert many is not None
        for i, r in enumerate(reads):
            one = sketch_read(r, 51, 51, fl)
            np.testing.assert_array_equal(many[i].hash, one.hash,
                                          err_msg=f"ft={ft_used is not None} read {i}")
            np.testing.assert_array_equal(many[i].pos, one.pos)
            np.testing.assert_array_equal(many[i].rev, one.rev)
            np.testing.assert_array_equal(many[i].span, one.span)
            np.testing.assert_array_equal(many[i].cnt, one.cnt)


def test_native_count_kmers_matches_python(rng):
    from hifiasm_tpu.native import count_kmers_native
    from hifiasm_tpu.ops.sketch import all_kmers_read
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 30000, repeat_frac=0.2)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=3000,
                               err_rate=0.003)
    r_n = reads[0].copy()
    r_n[100:130] = 4                       # N stretch splits k-mer runs
    reads = reads + [r_n, reads[1][:70], np.zeros(10, np.uint8)]
    uc = count_kmers_native(reads, 51)
    assert uc is not None
    uniq_n, cnt_n = uc
    allh = np.concatenate([all_kmers_read(r, 51) for r in reads])
    uniq_p, cnt_p = np.unique(allh, return_counts=True)
    np.testing.assert_array_equal(uniq_n, uniq_p)
    np.testing.assert_array_equal(cnt_n.astype(np.int64), cnt_p)
    assert cnt_p.max() > 1                 # exercised multi-count path
    # empty input
    u0, c0 = count_kmers_native([], 51)
    assert u0.size == 0 and c0.size == 0


def test_native_ec_reads_batch_matches_per_read(rng):
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.ec.pipeline import _TargetCache, _iter_overlap_batches
    from hifiasm_tpu.index.pos_table import (
        build_filter_table, build_position_table,
    )
    from hifiasm_tpu.io.readstore import ReadStore
    from hifiasm_tpu.native import ec_read_native, ec_reads_native
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 60000, repeat_frac=0.1)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=6000,
                               err_rate=0.003)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix="/tmp/becv_t", n_rounds_ec=1,
                        ignore_bin=True)
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    ft, _, _ = build_filter_table(codes, cfg.k)
    pt, ph, _, mzs = build_position_table(
        codes, cfg.k, cfg.w, ft=ft, keep_max=min(cfg.max_kmer_cnt, 4095))
    hom = ph if ph > 0 else cfg.hom_cov
    gt = _TargetCache(store)
    checked = 0
    for dc in (True, False):
        for batch in _iter_overlap_batches(store, codes, mzs, pt, cfg,
                                           hom, cfg.max_ov_diff_ec, gt):
            res = ec_reads_native([(q, tbs) for _, q, _, tbs in batch],
                                  do_consensus=dc)
            assert res is not None
            for j, (rid, q, ov, tbs) in enumerate(batch):
                ref = ec_read_native(tbs, q, do_consensus=dc)
                got = res[j]
                assert (got is None) == (ref is None), rid
                if ref is None:
                    continue
                np.testing.assert_array_equal(got[0], ref[0],
                                              err_msg=f"{rid} is_match")
                assert got[1] == ref[1] and got[3] == ref[3], rid
                if dc:
                    np.testing.assert_array_equal(got[2], ref[2],
                                                  err_msg=f"{rid} seq")
                checked += 1
    assert checked > 50


def test_chain_many_native_assembly_matches_python(rng, monkeypatch):
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.index.pos_table import (
        build_filter_table, build_position_table,
    )
    from hifiasm_tpu.io.readstore import ReadStore
    from hifiasm_tpu.ops.chain import ChainParams
    from hifiasm_tpu.overlap.anchors import chain_many, collect_anchors_many
    from tests.synth import make_genome, sample_reads
    import hifiasm_tpu.native as nat

    g = make_genome(rng, 80000, repeat_frac=0.25)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=6000,
                               err_rate=0.003)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix="/tmp/cmn_t", ignore_bin=True)
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    ft, _, _ = build_filter_table(codes, cfg.k)
    pt, ph, _, mzs = build_position_table(
        codes, cfg.k, cfg.w, ft=ft, keep_max=min(cfg.max_kmer_cnt, 4095))
    hom = ph if ph > 0 else cfg.hom_cov
    rids = list(range(store.n_reads))
    ans = collect_anchors_many(mzs, pt, rids, store.lens, hom)
    rd = [(rid, an, len(codes[rid])) for rid, an in zip(rids, ans)]
    cp = ChainParams.for_k(cfg.k)
    new = chain_many(rd, store.lens, cp, max_n_chain=cfg.max_n_chain)
    monkeypatch.setattr(nat, "get_lib", lambda: None)
    old = chain_many(rd, store.lens, cp, max_n_chain=cfg.max_n_chain)
    n_ov = 0
    for a, b in zip(new, old):
        assert len(a) == len(b), a.x_id
        for f in ("y_id", "rev", "x_s", "x_e", "y_s", "y_e", "score",
                  "n_hits", "hit_start", "hit_self", "hit_t", "hit_span"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f"{a.x_id} {f}")
        n_ov += len(a)
    assert n_ov > 100


def test_hic_map_native_matches_numpy(rng):
    """ht_hic_map mirrors _vote_place_batch bit-for-bit (uid, pos, and
    both rescue candidates) on erroring haplotype reads."""
    from hifiasm_tpu.native import hic_map_native
    from hifiasm_tpu.phasing.hic import (
        HIC_K, UnitigIndex, _seq_kmers_batch, _vote_place_batch,
    )
    from tests.synth import make_genome

    if hic_map_native(np.zeros((1, 40), np.uint8), HIC_K,
                      np.zeros(1, np.uint64), np.zeros(1, np.int32),
                      np.zeros(1, np.int64), np.zeros(65537, np.int64)
                      ) is None:
        import pytest
        pytest.skip("native lib unavailable")
    L = 15000
    h1 = make_genome(rng, L)
    h2 = h1.copy()
    snps = np.arange(100, L - 100, 35)
    h2[snps] = (h2[snps] + 1) % 4
    utgs = [h1, h2, make_genome(rng, 8000)]
    idx = UnitigIndex.build(utgs)
    N = 500
    mat = np.full((N, 150), 4, np.uint8)
    for i in range(N):
        u = int(rng.integers(0, 3))
        s = int(rng.integers(0, len(utgs[u]) - 150))
        r = utgs[u][s:s + 150].copy()
        for p in rng.integers(0, 150, int(rng.integers(0, 4))):
            r[p] = (r[p] + rng.integers(1, 4)) % 4
        ln = int(rng.integers(60, 151))      # ragged lengths
        mat[i, :ln] = r[:ln]
    # numpy reference (force the fallback by calling with pos then
    # comparing against the native wrapper directly)
    n_uid, n_pos, n_c = hic_map_native(
        mat, HIC_K, idx.hashes, idx.uid, idx.pos, idx.pref16())
    import hifiasm_tpu.native as nat
    saved = nat.hic_map_native
    nat.hic_map_native = lambda *a, **k: None      # force numpy path
    try:
        p_uid, p_pos, p_c = _vote_place_batch(idx, mat, HIC_K)
    finally:
        nat.hic_map_native = saved
    assert (n_uid == p_uid).all()
    assert (n_pos == p_pos).all()
    assert (n_c == p_c).all()
