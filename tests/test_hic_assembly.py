"""End-to-end Hi-C mode: --h1/--h2 drives hic.* outputs and phasing
(~output_hic_graph, Overlaps.cpp:16244)."""

import numpy as np

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import ReadStore
from tests.synth import make_genome, sample_reads

NT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _write_fastq(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            txt = NT[np.clip(s, 0, 3)].tobytes().decode()
            f.write(f"@p{i}\n{txt}\n+\n{'I' * len(txt)}\n")


def test_hic_mode_end_to_end(rng, tmp_path):
    L = 16000
    h1, h2 = make_genome(rng, L, het_rate=0.004)
    r1, _, _ = sample_reads(rng, h1, depth=13, read_len=2000,
                            err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=13, read_len=2000,
                            err_rate=0.002)
    reads = r1 + r2

    # Hi-C pairs: both mates from the SAME haplotype (cis contacts)
    p1, p2 = [], []
    for hap in (h1, h2):
        for _ in range(120):
            a = int(rng.integers(0, L - 150))
            b = int(rng.integers(0, L - 150))
            p1.append(hap[a:a + 150].copy())
            p2.append(hap[b:b + 150].copy())
    f1 = tmp_path / "hic_1.fq"
    f2 = tmp_path / "hic_2.fq"
    _write_fastq(f1, p1)
    _write_fastq(f2, p2)

    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, hic_reads_1=[str(f1)],
                        hic_reads_2=[str(f2)])
    assemble(store, cfg)
    assert (tmp_path / "asm.hic.p_ctg.gfa").exists()
    assert (tmp_path / "asm.hic.hap1.p_ctg.gfa").exists()
    assert (tmp_path / "asm.hic.hap2.p_ctg.gfa").exists()

    def total_s(path):
        return sum(len(ln.split("\t")[2]) for ln in open(path)
                   if ln.startswith("S\t"))

    t1 = total_s(str(tmp_path / "asm.hic.hap1.p_ctg.gfa"))
    t2 = total_s(str(tmp_path / "asm.hic.hap2.p_ctg.gfa"))
    # each haplotype output ~ one genome copy, not the whole diploid
    assert 0.5 * L < t1 < 1.6 * L, t1
    assert 0.5 * L < t2 < 1.6 * L, t2
    # Hi-C scaffolds emitted per haplotype (~ha_aware_order)
    assert (tmp_path / "asm.hic.hap1.scaf.fa").exists()
    assert (tmp_path / "asm.hic.hap2.scaf.fa").exists()
