"""Conformance on a HUMAN-REPEAT-STRUCTURE proxy genome (VERDICT r3
item 7): the chr11-2M quick-start data (/root/reference/README.md:8-11)
is network-blocked here, so both assemblers run on the closest proxy —
a genome carrying alpha-satellite HOR arrays, segmental duplications,
truncated LINEs and STR expansions (tests/synth_human.py), with the
empirical HiFi error spectrum (~90% homopolymer indels,
synth.inject_errors_hifi).

Acceptance per VERDICT: contig-level 63-mer identity >= 0.99 against
the reference assembler's contigs, on data NOT generated from a
uniform-random genome."""

import os
import subprocess

import numpy as np
import pytest

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes, seq_to_codes
from tests.synth import sample_reads_hifi
from tests.synth_human import make_human_proxy_genome, repeat_census

REF = "/tmp/hifiasm_ref_build/hifiasm"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference binary not built")

K = 63


def _km_hashes(c):
    x = c.astype(np.uint64)
    h = np.zeros(len(x) - K + 1, np.uint64)
    mult = np.uint64(1)
    for j in range(K):
        h += x[j:len(x) - K + 1 + j] * mult
        mult = mult * np.uint64(1099511628211)
    return h


def _gfa_codes(path):
    return [seq_to_codes(ln.split("\t")[2].strip().encode())
            for ln in open(path) if ln.startswith("S\t")]


def _identity_vs(ours, refs, step=21):
    """Sampled 63-mer identity of `ours` contigs against the ref set."""
    rset = set()
    for r in refs:
        if len(r) >= K:
            rset.update(_km_hashes(r).tolist())
            rset.update(_km_hashes(revcomp_codes(r)).tolist())
    hit = tot = 0
    for c in ours:
        if len(c) < K:
            continue
        hs = _km_hashes(c)[::step]
        tot += len(hs)
        hit += sum(1 for h in hs.tolist() if h in rset)
    return hit / max(tot, 1)


def test_human_proxy_genome_is_repeat_rich():
    rng = np.random.default_rng(11)
    g = make_human_proxy_genome(rng, 400_000)
    frac = repeat_census(g)
    assert frac > 0.03, f"proxy must be repeat-rich, census={frac}"


def test_human_proxy_contig_identity(tmp_path):
    """Both assemblers on the 2 Mb human-repeat proxy at x14 HiFi
    coverage; our primary contigs must match the reference's at >= 0.99
    sampled 63-mer identity, with total assembled span within 2%."""
    rng = np.random.default_rng(11)
    L = 2_000_000
    g = make_human_proxy_genome(rng, L)
    reads, _, _ = sample_reads_hifi(rng, g, depth=14, mean_len=15_000,
                                    err_rate=0.0025)
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
    subprocess.run([REF, "-o", str(tmp_path / "ref"), "-t4", "-f0",
                    "-r1", str(fa)], capture_output=True, check=True,
                   timeout=2400)
    ours = _gfa_codes(str(tmp_path / "ours.bp.p_ctg.gfa"))
    ref = _gfa_codes(str(tmp_path / "ref.bp.p_ctg.gfa"))
    assert ours and ref
    span_o = sum(len(c) for c in ours)
    span_r = sum(len(c) for c in ref)
    assert abs(span_o - span_r) < 0.02 * span_r, (span_o, span_r)
    ident = _identity_vs(ours, ref)
    assert ident >= 0.99, f"contig identity vs reference: {ident:.4f}"
    # and both ways: the reference's contigs must be covered by ours
    ident_r = _identity_vs(ref, ours)
    assert ident_r >= 0.99, f"reverse identity: {ident_r:.4f}"
