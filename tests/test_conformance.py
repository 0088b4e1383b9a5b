"""Conformance vs the reference hifiasm binary (skipped if not built).

Build once: cp -r /root/reference /tmp/hifiasm_ref_build && make -j
(bench.py builds it automatically).
"""

import os
import subprocess

import numpy as np
import pytest

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import (
    ReadStore, revcomp_codes, seq_to_codes,
)
from tests.synth import make_genome, sample_reads, sample_reads_hifi

REF = "/tmp/hifiasm_ref_build/hifiasm"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference binary not built")


def _gfa_contigs(path):
    out = []
    for line in open(path):
        if line.startswith("S\t"):
            out.append(seq_to_codes(line.split("\t")[2].encode()))
    return out


def _identity(c, gk, k=63, step=13):
    hits = tot = 0
    for i in range(0, len(c) - k + 1, step):
        tot += 1
        km = c[i:i + k]
        if km.tobytes() in gk or revcomp_codes(km).tobytes() in gk:
            hits += 1
    return hits / max(tot, 1)


def test_matches_reference_contigs(rng, tmp_path):
    L = 30000
    g = make_genome(rng, L)
    reads, _, _ = sample_reads(rng, g, depth=13, read_len=3500,
                               err_rate=0.003)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")

    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "ours"), n_rounds_ec=2)
    assemble(store, cfg)
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r2",
                    str(fa)], capture_output=True, check=True, timeout=600)

    ours = _gfa_contigs(str(tmp_path / "ours.bp.p_ctg.gfa"))
    ref = _gfa_contigs(str(tmp_path / "ref.bp.p_ctg.gfa"))
    gk = {g[i:i + 63].tobytes() for i in range(L - 62)}
    ours_tot = sum(map(len, ours))
    ref_tot = sum(map(len, ref))
    # same contig count, comparable total length, both true to the genome
    assert len(ours) == len(ref), (len(ours), len(ref))
    assert abs(ours_tot - ref_tot) < 0.05 * max(ref_tot, 1), \
        (ours_tot, ref_tot)
    for c in ours:
        assert _identity(c, gk) > 0.98


def test_overlap_set_matches_reference_paf(rng, tmp_path):
    """Compare final overlap PAIRS against the reference's --write-paf dump
    (the golden-file strategy of SURVEY §4)."""
    L = 24000
    g = make_genome(rng, L)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=3000,
                               err_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    "--write-paf", str(fa)], capture_output=True,
                   check=True, timeout=600)
    import glob
    paf_files = glob.glob(str(tmp_path / "ref*.paf"))
    assert paf_files, "reference produced no PAF dump"
    ref_pairs = set()
    for pf in paf_files:
        if "1.paf" in pf:          # trans overlaps: skip
            continue
        for ln in open(pf):
            c = ln.split("\t")
            if len(c) > 6:
                ref_pairs.add((c[0], c[5]))

    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.ec.pipeline import run_ec
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(n_rounds_ec=1)
    ec = run_ec(store, cfg, None)
    our_pairs = set()
    for rid in range(store.n_reads):
        for t in ec.paf[rid].tn:
            our_pairs.add((f"r{rid}", f"r{int(t)}"))
    inter = len(our_pairs & ref_pairs)
    union = len(our_pairs | ref_pairs)
    jac = inter / max(union, 1)
    rec = inter / max(len(ref_pairs), 1)
    assert rec > 0.9, f"missing reference overlaps: recall={rec:.3f}"
    assert jac > 0.75, f"overlap sets diverge: jaccard={jac:.3f}"


def test_diploid_hap_sizes_match_reference(rng, tmp_path):
    """Diploid sample: primary+alternate partitioning should recover about
    one haplotype each, like the reference's bp outputs."""
    L = 20000
    h1, h2 = make_genome(rng, L, het_rate=0.004)
    r1, _, _ = sample_reads(rng, h1, depth=12, read_len=2600,
                            err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=12, read_len=2600,
                            err_rate=0.002)
    reads = r1 + r2
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    str(fa)], capture_output=True, check=True, timeout=900)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                        n_rounds_ec=1)
    from hifiasm_tpu.assemble import assemble
    assemble(store, cfg)

    def total_s(path):
        return sum(len(ln.split("\t")[2]) for ln in open(path)
                   if ln.startswith("S\t"))

    ref_h1 = total_s(str(tmp_path / "ref.bp.hap1.p_ctg.gfa"))
    ref_h2 = total_s(str(tmp_path / "ref.bp.hap2.p_ctg.gfa"))
    our_h1 = total_s(str(tmp_path / "ours.bp.hap1.p_ctg.gfa"))
    our_h2 = total_s(str(tmp_path / "ours.bp.hap2.p_ctg.gfa"))
    # each haplotype output should be ~one genome copy for both tools
    for v in (ref_h1, ref_h2, our_h1, our_h2):
        assert 0.6 * L < v < 1.6 * L, \
            (ref_h1, ref_h2, our_h1, our_h2)


@pytest.mark.parametrize("seed,het,rep", [
    (3, 0.0, 0.0),
    (5, 0.004, 0.0),
    (7, 0.0, 0.15),
    (13, 0.002, 0.1),
])
def test_conformance_matrix(seed, het, rep, tmp_path):
    """Ours vs reference across ploidy/repeat regimes: comparable contig
    structure and genome-true sequence."""
    rng = np.random.default_rng(seed)
    L = 60000
    if het > 0:
        h1, h2 = make_genome(rng, L, repeat_frac=rep, het_rate=het)
        r1, _, _ = sample_reads_hifi(rng, h1, depth=11, mean_len=6000,
                                     err_rate=0.003)
        r2, _, _ = sample_reads_hifi(rng, h2, depth=11, mean_len=6000,
                                     err_rate=0.003)
        reads = r1 + r2
        gk_src = np.concatenate([h1, np.full(70, 4, np.uint8), h2])
    else:
        g = make_genome(rng, L, repeat_frac=rep)
        reads, _, _ = sample_reads_hifi(rng, g, depth=12, mean_len=6000,
                                        err_rate=0.003)
        gk_src = g
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")

    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                        n_rounds_ec=1)
    from hifiasm_tpu.assemble import assemble
    assemble(store, cfg)
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    str(fa)], capture_output=True, check=True, timeout=900)

    def stats(path):
        cs = _gfa_contigs(path)
        return len(cs), sum(map(len, cs)), cs

    n_o, tot_o, cs_o = stats(str(tmp_path / "ours.bp.p_ctg.gfa"))
    n_r, tot_r, cs_r = stats(str(tmp_path / "ref.bp.p_ctg.gfa"))
    # sequence truthfulness of our contigs
    gk = {gk_src[i:i + 63].tobytes() for i in range(len(gk_src) - 62)}
    for c in cs_o:
        if len(c) > 1000:
            assert _identity(c, gk) > 0.97, \
                f"seed={seed} het={het} rep={rep}"
    # comparable structure: totals within 10%, counts within 1.5x
    assert tot_o > 0 and tot_r > 0
    assert abs(tot_o - tot_r) < 0.10 * max(tot_o, tot_r), \
        (seed, het, rep, n_o, tot_o, n_r, tot_r)
    assert n_o <= int(1.5 * max(n_r, 1)) + 1, (seed, het, rep, n_o, n_r)


def test_overlap_coords_match_reference_paf(rng, tmp_path):
    """Coordinate-level PAF comparison (beyond pair-set recall): for
    overlap pairs both tools find, the query interval must agree to
    within one EC window of slack (~ma_hit_t qs/qe; Overlaps.cpp
    coordinate conventions, PAF columns 3-4/8-9)."""
    L = 24000
    g = make_genome(rng, L)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=3000,
                               err_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    "--write-paf", str(fa)], capture_output=True,
                   check=True, timeout=600)
    import glob
    ref_rec = {}
    for pf in glob.glob(str(tmp_path / "ref*.paf")):
        if "1.paf" in pf:          # trans overlaps: skip
            continue
        for ln in open(pf):
            c = ln.split("\t")
            if len(c) > 9:
                ref_rec[(c[0], c[5], c[4])] = (
                    int(c[2]), int(c[3]), int(c[7]), int(c[8]))
    assert ref_rec

    from hifiasm_tpu.ec.pipeline import run_ec
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    ec = run_ec(store, HifiasmConfig(n_rounds_ec=1), None)
    matched = close_q = close_t = 0
    for rid in range(store.n_reads):
        rec = ec.paf[rid]
        for j in range(len(rec.qs)):
            key = (f"r{rid}", f"r{int(rec.tn[j])}",
                   "-" if rec.rev[j] else "+")
            if key not in ref_rec:
                continue
            rqs, rqe, rts, rte = ref_rec[key]
            matched += 1
            if abs(int(rec.qs[j]) - rqs) <= 100 and \
               abs(int(rec.qe[j]) - rqe) <= 100:
                close_q += 1
            if abs(int(rec.ts[j]) - rts) <= 100 and \
               abs(int(rec.te[j]) - rte) <= 100:
                close_t += 1
    assert matched > 50, matched
    assert close_q / matched > 0.9, \
        f"query coords diverge: {close_q}/{matched}"
    assert close_t / matched > 0.9, \
        f"target coords diverge: {close_t}/{matched}"


def test_trio_matches_reference(rng, tmp_path):
    """Same reads + same YAK dumps through both assemblers: each must
    produce one near-complete genome copy per haplotype, dominated by the
    correct parental reads (dip.hap* in both namings)."""
    from hifiasm_tpu.trio import _read_kmers
    from tests.test_trio import write_yak_dump

    L = 25000
    h1, h2 = make_genome(rng, L, het_rate=0.006)
    k = 31
    k1 = np.unique(_read_kmers(h1, k)[1])
    k2 = np.unique(_read_kmers(h2, k)[1])
    pat, mat = str(tmp_path / "p.yak"), str(tmp_path / "m.yak")
    write_yak_dump(pat, k, k1, np.full(len(k1), 20))
    write_yak_dump(mat, k, k2, np.full(len(k2), 20))

    r1, _, _ = sample_reads(rng, h1, depth=13, read_len=3000,
                            err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=13, read_len=3000,
                            err_rate=0.002)
    reads = r1 + r2
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")

    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                        n_rounds_ec=1, fn_bin_yak_pat=pat,
                        fn_bin_yak_mat=mat)
    assemble(store, cfg)
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    "-1", pat, "-2", mat, str(fa)],
                   capture_output=True, check=True, timeout=600)

    def total_s(path):
        return sum(len(ln.split("\t")[2]) for ln in open(path)
                   if ln.startswith("S\t"))

    for h in ("hap1", "hap2"):
        ours = total_s(str(tmp_path / f"ours.dip.{h}.p_ctg.gfa"))
        ref = total_s(str(tmp_path / f"ref.dip.{h}.p_ctg.gfa"))
        assert 0.7 * L < ours < 1.4 * L, (h, ours)
        assert abs(ours - ref) < 0.25 * max(ref, 1), (h, ours, ref)


def test_write_ec_matches_reference(rng, tmp_path):
    """--write-ec: both assemblers correct the same reads to (near)
    identical sequences; measure residual error vs the true genome."""
    L = 25000
    g = make_genome(rng, L)
    reads, starts, strands = sample_reads(rng, g, depth=12, read_len=3000,
                                          err_rate=0.004)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")

    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  [r.copy() for r in reads])
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                        n_rounds_ec=1, write_ec=True)
    assemble(store, cfg)
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    "--write-ec", str(fa)],
                   capture_output=True, check=True, timeout=600)

    def read_fa(path):
        seqs = {}
        name = None
        for ln in open(path):
            if ln.startswith(">"):
                name = ln[1:].split()[0]
                seqs[name] = ""
            else:
                seqs[name] += ln.strip()
        return seqs

    ours = read_fa(str(tmp_path / "ours.ec.fa"))
    ref = read_fa(str(tmp_path / "ref.ec.fa"))
    assert set(ours) == set(ref)

    def residual(seqs):
        """Mean per-read residual edit rate vs the true genome segment
        (banded Myers over the native engine; e=31 covers the budget)."""
        from hifiasm_tpu.native import banded_batch_native

        e = 31
        xs, ys = [], []
        for i in range(0, len(reads), 3):
            name = f"r{i}"
            seq = seq_to_codes(seqs[name].encode())
            src = g[starts[i]:starts[i] + len(reads[i])]
            if strands[i]:
                src = revcomp_codes(src)
            if abs(len(seq) - len(src)) > 50:
                continue
            xs.append(seq)
            ys.append(src)
        XL = max(len(x) for x in xs)
        YL = XL + 2 * e
        xb = np.full((len(xs), XL), 4, np.uint8)
        yb = np.full((len(xs), YL), 4, np.uint8)
        xl = np.zeros(len(xs), np.int64)
        yl = np.zeros(len(xs), np.int64)
        for j, (x, y) in enumerate(zip(xs, ys)):
            xb[j, :len(x)] = x
            yb[j, :min(len(y), YL)] = y[:YL]
            xl[j] = len(x)
            yl[j] = min(len(y), YL)
        out = banded_batch_native(xb, xl, yb, yl, e, traceback=False)
        ok = out.err >= 0
        return float(out.err[ok].sum()) / max(int(xl[ok].sum()), 1)

    r_ours = residual(ours)
    r_ref = residual(ref)
    # both must beat the raw 0.4% error rate substantially, and ours
    # must match the reference (1.2x band, VERDICT r1 acceptance;
    # measured band across seeds after the het balance test: 0.68-1.15)
    assert r_ours < 0.002, r_ours
    assert r_ours < max(1.2 * r_ref, 0.0005), (r_ours, r_ref)


def test_write_ec_parity_high_error(tmp_path):
    """EC residual parity at err 0.01 — the regime where one-shot
    windows diverge without the het balance test + boundary retry
    (VERDICT r1 item 9: band 1.2x)."""
    rng = np.random.default_rng(3)
    L = 25000
    g = make_genome(rng, L)
    reads, starts, strands = sample_reads(rng, g, depth=12, read_len=3000,
                                          err_rate=0.01)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  [r.copy() for r in reads])
    assemble(store, HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                                  n_rounds_ec=1, write_ec=True,
                                  ignore_bin=True))
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    "--write-ec", str(fa)],
                   capture_output=True, check=True, timeout=600)

    from hifiasm_tpu.native import banded_batch_native

    def read_fa(path):
        seqs = {}
        name = None
        for ln in open(path):
            if ln.startswith(">"):
                name = ln[1:].split()[0]
                seqs[name] = ""
            else:
                seqs[name] += ln.strip()
        return seqs

    def residual(seqs):
        e = 31
        xs, ys = [], []
        for i in range(0, len(reads), 3):
            seq = seq_to_codes(seqs[f"r{i}"].encode())
            src = g[starts[i]:starts[i] + len(reads[i])]
            if strands[i]:
                src = revcomp_codes(src)
            if abs(len(seq) - len(src)) > 50:
                continue
            xs.append(seq)
            ys.append(src)
        XL = max(len(x) for x in xs)
        YL = XL + 2 * e
        xb = np.full((len(xs), XL), 4, np.uint8)
        yb = np.full((len(xs), YL), 4, np.uint8)
        xl = np.zeros(len(xs), np.int64)
        yl = np.zeros(len(xs), np.int64)
        for j, (x, y) in enumerate(zip(xs, ys)):
            xb[j, :len(x)] = x
            yb[j, :min(len(y), YL)] = y[:YL]
            xl[j] = len(x)
            yl[j] = min(len(y), YL)
        out = banded_batch_native(xb, xl, yb, yl, e, traceback=False)
        ok = out.err >= 0
        return float(out.err[ok].sum()) / max(int(xl[ok].sum()), 1)

    r_ours = residual(read_fa(str(tmp_path / "ours.ec.fa")))
    r_ref = residual(read_fa(str(tmp_path / "ref.ec.fa")))
    assert r_ours < max(1.2 * r_ref, 0.0006), (r_ours, r_ref)


def test_chr_scale_contig_identity(tmp_path):
    """The quick-start-class acceptance config (chr11-2M scale; real
    chr11 reads are network-blocked in this environment, so the bench's
    2 Mb synthetic workload at real read length/error profile stands
    in): both assemblers must close the genome to ONE contig of the
    same length, and the contigs must agree at the 63-mer level
    (VERDICT r1 item 8 — sequence identity, not 25% bands)."""
    rng = np.random.default_rng(11)
    L = 2_000_000
    g = make_genome(rng, L)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=15_000,
                               err_rate=0.003)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    assemble(store, HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                                  n_rounds_ec=1, ignore_bin=True,
                                  bf_shift=0))
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    str(fa)], capture_output=True, check=True,
                   timeout=1200)

    def gfa_codes(path):
        return [seq_to_codes(ln.split("\t")[2].strip().encode())
                for ln in open(path) if ln.startswith("S\t")]

    ours = gfa_codes(str(tmp_path / "ours.bp.p_ctg.gfa"))
    ref = gfa_codes(str(tmp_path / "ref.bp.p_ctg.gfa"))
    assert len(ours) == len(ref) == 1, (len(ours), len(ref))
    assert abs(len(ours[0]) - len(ref[0])) < 0.001 * L, \
        (len(ours[0]), len(ref[0]))

    K = 63

    def km_hashes(c):
        x = c.astype(np.uint64)
        h = np.zeros(len(x) - K + 1, np.uint64)
        mult = np.uint64(1)
        for j in range(K):
            h += x[j:len(x) - K + 1 + j] * mult
            mult = mult * np.uint64(1099511628211)
        return h

    rset = set(km_hashes(ref[0]).tolist())
    rset.update(km_hashes(revcomp_codes(ref[0])).tolist())
    hs = km_hashes(ours[0])[::21]
    ident = sum(1 for h in hs.tolist() if h in rset) / max(len(hs), 1)
    assert ident > 0.98, f"contig 63-mer identity vs reference: {ident}"


def test_hic_mapping_and_phasing_matches_reference(rng, tmp_path):
    """Hi-C conformance on ONE shared realistic library (1% error,
    long inserts): mapped-hit yield in the reference's regime and
    haplotype outputs size-matching the reference's
    (~hic_short_align + the n_weight loop, hic.cpp:17016/17082)."""
    import re

    L = 120_000
    h1, h2 = make_genome(rng, L, het_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)

    def wfa(path, seqs):
        with open(path, "w") as f:
            for i, r in enumerate(seqs):
                f.write(f">s{i}\n{nt[r].tobytes().decode()}\n")

    reads = []
    for g in (h1, h2):
        for _ in range(int(11 * L / 12000)):
            s = int(rng.integers(0, L - 12000))
            r = g[s:s + 12000].copy()
            m = rng.random(12000) < 0.003
            r[m] = (r[m] + rng.integers(1, 4, int(m.sum()))) % 4
            reads.append(r)
    r1l, r2l = [], []
    for _ in range(12000):
        g = (h1, h2)[int(rng.integers(0, 2))]
        a = int(rng.integers(0, L - 45000))
        b = a + int(rng.integers(300, 40000))
        for lst, s in ((r1l, a), (r2l, b)):
            seg = g[s:s + 150].copy()
            m = rng.random(150) < 0.01
            seg[m] = (seg[m] + rng.integers(1, 4, int(m.sum()))) % 4
            lst.append(seg)
    wfa(tmp_path / "reads.fa", reads)
    wfa(tmp_path / "h1.fa", r1l)
    wfa(tmp_path / "h2.fa", r2l)

    subprocess.run(
        [REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
         "--h1", str(tmp_path / "h1.fa"), "--h2", str(tmp_path / "h2.fa"),
         str(tmp_path / "reads.fa")],
        capture_output=True, check=True, timeout=900)
    # the reference's kept PE-hit count from its hic.lk.bin dump
    # (write_hc_hits, hic.cpp:5236: u64 n + n * pe_hit)
    lk = open(tmp_path / "ref.hic.lk.bin", "rb").read()
    ref_hits = int(np.frombuffer(lk[:8], np.uint64)[0])

    import io
    from contextlib import redirect_stderr

    from hifiasm_tpu.cli import main as cli_main
    buf = io.StringIO()
    with redirect_stderr(buf):
        cli_main(["-o", str(tmp_path / "ours"), "-t4", "-i",
                  "--h1", str(tmp_path / "h1.fa"),
                  "--h2", str(tmp_path / "h2.fa"),
                  str(tmp_path / "reads.fa")])
    m = re.search(r"(\d+) -> (\d+) PE hits after dedup", buf.getvalue())
    assert m, "our PE dedup log missing"
    our_hits = int(m.group(2))
    # same order of magnitude of informative hits (both tools can only
    # place the het-informative fraction of the library)
    assert our_hits >= ref_hits * 0.5, (our_hits, ref_hits)

    def hap_sizes(pfx):
        out = []
        for h in (1, 2):
            tot = sum(len(ln.split("\t")[2]) for ln in
                      open(f"{pfx}.hic.hap{h}.p_ctg.gfa")
                      if ln.startswith("S\t"))
            out.append(tot)
        return sorted(out)

    ours_h = hap_sizes(str(tmp_path / "ours"))
    ref_h = hap_sizes(str(tmp_path / "ref"))
    # each of OUR haps is ~one genome copy (the reference occasionally
    # overshoots one hap with duplicated het content at this scale —
    # observed 141.7 kb on a 120 kb genome — so truth anchors the band,
    # and the tools' matching haps agree within 2%)
    for a in ours_h:
        assert 0.9 * L < a < 1.25 * L, (ours_h, ref_h)
    assert abs(ours_h[0] - ref_h[0]) < 0.02 * max(ref_h[0], 1), \
        (ours_h, ref_h)


@pytest.mark.parametrize("seed,max_ratio", [(3, 1.0), (7, 1.0),
                                             (11, 1.0)])
def test_write_ec_parity_homopolymer_indel(tmp_path, seed, max_ratio):
    """EC residual parity on the HiFi homopolymer-indel profile (~90%
    indels at runs — the regime the reference's POA bundle machinery
    absorbs).  Measured SYMMETRICALLY: residuals compare over the reads
    BOTH tools correct well enough to band-align at e=31 — the one-sided
    form silently dropped a tool's failed reads from its own
    denominator, so correcting MORE reads (we align 7-10 more than the
    reference on these seeds) raised the apparent residual.  r5: the
    thin-coverage single-voter rescue + run canonicalization + the
    phased window grids + the deletion-majority het veto put all three
    seeds below the reference (measured 0.28x / 0.83x / 0.78x)."""
    from hifiasm_tpu.io.readstore import revcomp_codes
    from tests.synth import inject_errors_hifi

    rng = np.random.default_rng(seed)
    L = 25000
    g = make_genome(rng, L)
    n_reads, rl = 100, 3000
    reads, starts, strands = [], [], []
    for i in range(n_reads):
        s = int(rng.integers(0, L - rl))
        st = int(rng.integers(0, 2))
        seg = g[s:s + rl].copy()
        if st:
            seg = revcomp_codes(seg)
        reads.append(inject_errors_hifi(rng, seg, 0.01))
        starts.append(s)
        strands.append(st)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  [r.copy() for r in reads])
    assemble(store, HifiasmConfig(output_prefix=str(tmp_path / "ours"),
                                  n_rounds_ec=1, write_ec=True,
                                  ignore_bin=True))
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0", "-r1",
                    "--write-ec", str(fa)],
                   capture_output=True, check=True, timeout=600)

    from hifiasm_tpu.native import banded_batch_native

    def read_fa(path):
        seqs, name = {}, None
        for ln in open(path):
            if ln.startswith(">"):
                name = ln[1:].split()[0]
                seqs[name] = ""
            else:
                seqs[name] += ln.strip()
        return seqs

    def per_read_err(seqs):
        e = 31
        errs = {}
        for i in range(n_reads):
            seq = seq_to_codes(seqs[f"r{i}"].encode())
            src = g[starts[i]:starts[i] + rl]
            if strands[i]:
                src = revcomp_codes(src)
            if abs(len(seq) - len(src)) > 100:
                errs[i] = None
                continue
            XL = len(seq)
            YL = XL + 2 * e
            yb = np.full((1, YL), 4, np.uint8)
            m = min(len(src), YL)
            yb[0, :m] = src[:m]
            out = banded_batch_native(
                seq[None, :].copy(), np.array([XL]), yb, np.array([m]),
                e, traceback=False)
            errs[i] = int(out.err[0]) if out.err[0] >= 0 else None
        return errs

    e_ours = per_read_err(read_fa(str(tmp_path / "ours.ec.fa")))
    e_ref = per_read_err(read_fa(str(tmp_path / "ref.ec.fa")))
    both = [i for i in range(n_reads)
            if e_ours[i] is not None and e_ref[i] is not None]
    assert len(both) >= 60, len(both)
    s_ours = sum(e_ours[i] for i in both)
    s_ref = sum(e_ref[i] for i in both)
    # we must never correct FEWER reads to alignability than the
    # reference minus slack (aligning more reads is the other half of
    # correction quality the residual alone cannot see)
    n_ours = sum(1 for i in range(n_reads) if e_ours[i] is not None)
    n_ref = sum(1 for i in range(n_reads) if e_ref[i] is not None)
    assert n_ours >= n_ref - 5, (n_ours, n_ref)
    assert s_ours <= max_ratio * max(s_ref, 5), (s_ours, s_ref)
