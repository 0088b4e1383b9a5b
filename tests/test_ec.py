"""Error-correction pipeline: correction quality, het preservation,
and final overlap-record coordinate conventions."""

import numpy as np

from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.ec.pipeline import ec_round, final_overlap_pass
from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes
from tests.synth import make_genome, sample_reads


def _kmer_set(codes, k=31):
    s = set()
    for i in range(len(codes) - k + 1):
        s.add(codes[i:i + k].tobytes())
    return s


def _consistency(store, truth_kmers, k=31):
    """Fraction of read k-mers present in the truth genome."""
    hit = tot = 0
    for rid in range(store.n_reads):
        c = store.get_codes(rid)
        for i in range(0, len(c) - k + 1, 7):
            tot += 1
            km = c[i:i + k]
            rc = revcomp_codes(km)
            if km.tobytes() in truth_kmers or rc.tobytes() in truth_kmers:
                hit += 1
    return hit / max(tot, 1)


def test_ec_corrects_errors(rng):
    g = make_genome(rng, 9000)
    reads, _, _ = sample_reads(rng, g, depth=16, read_len=2200,
                               err_rate=0.004)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    truth = _kmer_set(g)
    before = _consistency(store, truth)
    cfg = HifiasmConfig()
    _, _, n_corr = ec_round(store, cfg, None, 0)
    after = _consistency(store, truth)
    assert n_corr > 0
    assert after > before
    assert after > 0.985, f"consistency after EC only {after:.4f}"


def test_ec_preserves_het(rng):
    h1, h2 = make_genome(rng, 9000, het_rate=0.006)
    r1, _, _ = sample_reads(rng, h1, depth=14, read_len=2200, err_rate=0.003)
    r2, _, _ = sample_reads(rng, h2, depth=14, read_len=2200, err_rate=0.003)
    reads = r1 + r2
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    cfg = HifiasmConfig()
    ec_round(store, cfg, None, 0)
    t1 = _kmer_set(h1)
    s1 = ReadStore.from_arrays([f"a{i}" for i in range(len(r1))],
                               [store.get_codes(i) for i in range(len(r1))])
    c1 = _consistency(s1, t1)
    # if phasing failed, hap1 reads get rewritten toward the hap2 allele at
    # het sites and consistency vs hap1 collapses
    assert c1 > 0.97, f"hap1 reads were corrected across haplotypes: {c1:.4f}"


def test_final_overlap_coordinates(rng):
    g = make_genome(rng, 7000)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=1800, err_rate=0.0)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    cfg = HifiasmConfig()
    res = final_overlap_pass(store, cfg, None)
    assert res.paf.total > 0
    checked = 0
    for rid in range(store.n_reads):
        q = store.get_codes(rid)
        rec = res.paf[rid]
        for j in range(len(rec)):
            t = store.get_codes(int(rec.tn[j]))
            qseg = q[rec.qs[j]:rec.qe[j]]
            tseg = t[rec.ts[j]:rec.te[j]]
            if rec.rev[j]:
                tseg = revcomp_codes(tseg)
            # error-free reads: segments must be identical where lengths match
            assert abs(len(qseg) - len(tseg)) <= 2
            m = min(len(qseg), len(tseg))
            assert (qseg[:m] == tseg[:m]).mean() > 0.99
            assert rec.bl[j] == len(qseg)
            assert rec.ml[j] >= rec.bl[j] - 2
            checked += 1
    assert checked > 10


def _mk_tracebacks(qlen, tb_rows, ic_rows=None, ib_rows=None):
    """Hand-built OverlapTracebacks: every overlap covers [0, qlen-1]."""
    from hifiasm_tpu.ec.window_align import OverlapTracebacks

    n = len(tb_rows)
    off = np.arange(n + 1, dtype=np.int64) * qlen
    tb = np.concatenate([np.asarray(r, np.uint8) for r in tb_rows])
    ic = np.concatenate([np.asarray(r, np.uint8) for r in ic_rows]) \
        if ic_rows else np.zeros(n * qlen, np.uint8)
    ib = np.concatenate([np.asarray(r, np.uint8) for r in ib_rows]) \
        if ib_rows else np.zeros(n * qlen, np.uint8)
    one = np.ones(n, np.int32)
    z = np.zeros(n, np.int64)
    return OverlapTracebacks(off, tb, ic, ib, one, one.copy(), z,
                             z.copy(), z.copy(), x_s=np.zeros(n, np.int64))


def test_dag_consensus_resolves_smeared_deletion():
    """One real deletion in an AA homopolymer aligns to either column:
    half the voters delete q[10], half q[11]. Column voting keeps both
    (each column sees a 'keep' majority); the string plurality deletes
    exactly one base (~Merge_DAGCon, Correct.cpp:5031)."""
    from hifiasm_tpu.ec.consensus import windowed_consensus
    from hifiasm_tpu.ec.phase import PhaseResult
    from hifiasm_tpu.overlap.anchors import OverlapRegions

    qlen = 30
    q = np.array([1, 2] * (qlen // 2), np.uint8)
    q[10] = q[11] = 0                        # the AA homopolymer
    n_ov = 8
    rows = []
    for i in range(n_ov):
        row = q.copy()                        # match everywhere...
        row[10 if i < n_ov // 2 else 11] = 4  # ...except ONE A deleted
        rows.append(row)
    tbs = _mk_tracebacks(qlen, rows)
    ov = OverlapRegions(
        x_id=0, y_id=np.arange(n_ov, dtype=np.uint32),
        rev=np.zeros(n_ov, np.uint8),
        x_s=np.zeros(n_ov, np.int64),
        x_e=np.full(n_ov, qlen - 1, np.int64),
        y_s=np.zeros(n_ov, np.int64), y_e=np.full(n_ov, qlen - 1, np.int64),
        score=np.ones(n_ov, np.int64), n_hits=np.ones(n_ov, np.int64))
    ph = PhaseResult(np.ones(n_ov, np.uint8), np.zeros(0, np.int64),
                     np.zeros(0, np.int64))
    cns = windowed_consensus(q, ov, tbs, ph)
    expect = np.concatenate([q[:10], q[11:]])    # one A removed
    assert np.array_equal(cns.seq, expect), (cns.seq[8:14], cns.n_corrected)
    assert cns.n_corrected == 1


def test_dag_consensus_split_cluster_left_alone():
    """50/50 split strings (a het indel): no plurality, no rewrite."""
    from hifiasm_tpu.ec.consensus import windowed_consensus
    from hifiasm_tpu.ec.phase import PhaseResult
    from hifiasm_tpu.overlap.anchors import OverlapRegions

    qlen = 30
    q = np.array([1, 2] * (qlen // 2), np.uint8)
    q[10] = q[11] = 0
    n_ov = 8
    rows = []
    for i in range(n_ov):
        row = q.copy()
        if i % 2 == 0:                        # half delete BOTH bases
            row[10] = row[11] = 4
        rows.append(row)
    tbs = _mk_tracebacks(qlen, rows)
    ov = OverlapRegions(
        x_id=0, y_id=np.arange(n_ov, dtype=np.uint32),
        rev=np.zeros(n_ov, np.uint8),
        x_s=np.zeros(n_ov, np.int64),
        x_e=np.full(n_ov, qlen - 1, np.int64),
        y_s=np.zeros(n_ov, np.int64), y_e=np.full(n_ov, qlen - 1, np.int64),
        score=np.ones(n_ov, np.int64), n_hits=np.ones(n_ov, np.int64))
    ph = PhaseResult(np.ones(n_ov, np.uint8), np.zeros(0, np.int64),
                     np.zeros(0, np.int64))
    cns = windowed_consensus(q, ov, tbs, ph)
    assert np.array_equal(cns.seq, q), cns.seq[8:14]


def test_native_dag_consensus_matches_python():
    """The native consensus implements the same DAG cluster plurality as
    ec/consensus.py and must produce the identical corrected sequence."""
    from hifiasm_tpu.native import ec_read_native

    qlen = 30
    q = np.array([1, 2] * (qlen // 2), np.uint8)
    q[10] = q[11] = 0
    n_ov = 8
    rows = []
    for i in range(n_ov):
        row = q.copy()
        row[10 if i < n_ov // 2 else 11] = 4
        rows.append(row)
    tbs = _mk_tracebacks(qlen, rows)
    out = ec_read_native(tbs, q)
    assert out is not None
    is_match, n_het, seq, n_edits = out[:4]
    expect = np.concatenate([q[:10], q[11:]])
    assert np.array_equal(seq, expect), seq[8:14]
    assert n_edits == 1


def _smeared_private_error_rows(q, n_ov=8):
    """A real deletion in the AA homopolymer, but most voters also carry
    one PRIVATE substitution inside the cluster: no exact string reaches
    plurality, yet column-wise realignment sees the deletion clearly."""
    rows = []
    for i in range(n_ov):
        row = q.copy()
        if i < 6:
            row[10 if i % 2 == 0 else 11] = 4      # the true deletion
        if i in (1, 2, 3, 4):
            # private errors AFTER the homopolymer (distinct strings,
            # no alternative minimal alignment through the run)
            pos = (13, 13, 12, 12)[i - 1]
            row[pos] = (q[pos] + 1 + (i & 1)) & 3
        rows.append(row)
    return rows


def test_star_msa_fallback_resolves_noisy_cluster():
    from hifiasm_tpu.ec.consensus import windowed_consensus
    from hifiasm_tpu.ec.phase import PhaseResult
    from hifiasm_tpu.overlap.anchors import OverlapRegions

    qlen = 30
    q = np.array([1, 2] * (qlen // 2), np.uint8)
    q[10] = q[11] = 0
    rows = _smeared_private_error_rows(q)
    n_ov = len(rows)
    tbs = _mk_tracebacks(qlen, rows)
    ov = OverlapRegions(
        x_id=0, y_id=np.arange(n_ov, dtype=np.uint32),
        rev=np.zeros(n_ov, np.uint8),
        x_s=np.zeros(n_ov, np.int64),
        x_e=np.full(n_ov, qlen - 1, np.int64),
        y_s=np.zeros(n_ov, np.int64),
        y_e=np.full(n_ov, qlen - 1, np.int64),
        score=np.ones(n_ov, np.int64), n_hits=np.ones(n_ov, np.int64))
    ph = PhaseResult(np.ones(n_ov, np.uint8), np.zeros(0, np.int64),
                     np.zeros(0, np.int64))
    cns = windowed_consensus(q, ov, tbs, ph)
    expect = np.concatenate([q[:10], q[11:]])      # one A removed
    assert np.array_equal(cns.seq, expect), (cns.seq[6:16],)


def test_star_msa_fallback_native_matches_python():
    from hifiasm_tpu.native import ec_read_native

    qlen = 30
    q = np.array([1, 2] * (qlen // 2), np.uint8)
    q[10] = q[11] = 0
    rows = _smeared_private_error_rows(q)
    tbs = _mk_tracebacks(qlen, rows)
    out = ec_read_native(tbs, q)
    assert out is not None
    seq = out[2]
    expect = np.concatenate([q[:10], q[11:]])
    assert np.array_equal(seq, expect), seq[6:16]


def test_ins_bundle_walk_merges_nested_insertions():
    """Nested homopolymer insertion bundles split the exact-string vote
    but agree on the shared prefix path (~Merge_DAGCon bundle merge,
    Correct.cpp:5031)."""
    from hifiasm_tpu.ec.consensus import _ins_bundle_walk

    ins = {b"\x00": 3, b"\x00\x00": 3, b"\x00\x00\x00": 2}
    # n=9 voters: first A carries 8 > 4.5, second 5 > 4.5, third 2 < 4.5
    assert _ins_bundle_walk(ins, 9, 0.500001) == b"\x00\x00"
    # a dominant exact string behaves as before
    assert _ins_bundle_walk({b"\x01\x02": 5}, 8, 0.500001) == b"\x01\x02"
    assert _ins_bundle_walk({b"\x01": 2, b"\x02": 2}, 8, 0.500001) == b""


def test_star_msa_nested_insertion_bundles():
    """Voters carrying 1/2/3 extra homopolymer bases: no exact string
    reaches plurality, the column-wise star vote misses the second
    symbol, the bundle walk recovers the true 2-base insertion."""
    from hifiasm_tpu.ec.consensus import _star_msa_consensus

    base = bytes([1, 2, 1, 2, 0, 3, 1, 3])
    v1 = base[:5] + b"\x00" + base[5:]            # one extra A
    v2 = base[:5] + b"\x00\x00" + base[5:]        # two extra (truth)
    v3 = base[:5] + b"\x00\x00\x00" + base[5:]    # three extra
    strs = sorted([v1] * 3 + [v2] * 3 + [v3] * 2)
    # plurality backbone would be v1 (count ties pick the smaller key)
    cons = _star_msa_consensus(strs, v1, 0.500001)
    assert cons == v2, (cons, v2)


def test_window_seam_insertion_repair(rng):
    """An insertion error exactly at a 775-bp window boundary is
    invisible to both windows' alignments (window k's path ends before
    the extra target base; window k+1 starts past it).  The seam pass
    (WindowBatcher._inject_seams, ~the reference's round-2 repair)
    recovers it from the gap between the windows' target ranges."""
    from hifiasm_tpu.config import WINDOW_HC, HifiasmConfig
    from hifiasm_tpu.ec.pipeline import _TargetCache, _chain_all_reads
    from hifiasm_tpu.ec.window_align import align_overlaps
    from hifiasm_tpu.ec.phase import phase_overlaps
    from hifiasm_tpu.ec.consensus import windowed_consensus
    from hifiasm_tpu.index.pos_table import build_position_table
    from hifiasm_tpu.io.readstore import ReadStore
    from tests.synth import make_genome

    truth = make_genome(rng, 2400)
    # homopolymer straddling the window boundary; the read LOST one base
    b = WINDOW_HC
    truth[b - 2:b + 2] = truth[b]
    q = np.concatenate([truth[:b], truth[b + 1:]])
    reads = [q] + [truth.copy() for _ in range(6)]
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  [r.copy() for r in reads])
    cfg = HifiasmConfig()
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    pt, ph_, _, mzs = build_position_table(codes, cfg.k, cfg.w)
    hom = ph_ if ph_ > 0 else cfg.hom_cov
    read_ovs = dict(_chain_all_reads(store, codes, mzs, pt, cfg, hom))
    gt = _TargetCache(store)
    tbs = align_overlaps(q, read_ovs[0], gt, cfg.max_ov_diff_ec,
                         wl=cfg.ec_window)
    phr = phase_overlaps(q, read_ovs[0], tbs)
    cns = windowed_consensus(q, read_ovs[0], tbs, phr)
    assert np.array_equal(cns.seq, truth), (len(cns.seq), len(truth))

    # the fused native kernel applies the identical seam rule
    from hifiasm_tpu.native import ec_read_native
    nat = ec_read_native(tbs, q)
    assert nat is not None
    assert np.array_equal(nat[2], truth)
