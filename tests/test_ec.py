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
