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
from tests.synth import make_genome, sample_reads

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

    ours = _gfa_contigs(str(tmp_path / "ours.p_ctg.gfa"))
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
