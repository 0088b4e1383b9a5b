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


def test_trio_plus_hic_benchmark_mode(rng, tmp_path):
    """Trio + Hi-C inputs together trigger the Hi-C benchmark dump
    (~hic_benchmark, hic.cpp:18383; gate Overlaps.cpp:39621): trio
    labels ground-truth each PE hit as cis/trans with distances."""
    L = 16000
    h1, h2 = make_genome(rng, L, het_rate=0.004)
    r1, _, _ = sample_reads(rng, h1, depth=13, read_len=2000,
                            err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=13, read_len=2000,
                            err_rate=0.002)
    reads = r1 + r2
    names = [f"r{i}" for i in range(len(reads))]
    p1, p2 = [], []
    for hap in (h1, h2):
        for _ in range(100):
            a = int(rng.integers(0, L - 150))
            b = int(rng.integers(0, L - 150))
            p1.append(hap[a:a + 150].copy())
            p2.append(hap[b:b + 150].copy())
    f1 = tmp_path / "hic_1.fq"
    f2 = tmp_path / "hic_2.fq"
    _write_fastq(f1, p1)
    _write_fastq(f2, p2)
    # trio ground truth via -3/-4 name lists
    lp = tmp_path / "pat.txt"
    lm = tmp_path / "mat.txt"
    lp.write_text("".join(f"{n}\n" for n in names[:len(r1)]))
    lm.write_text("".join(f"{n}\n" for n in names[len(r1):]))

    store = ReadStore.from_arrays(names, reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, hic_reads_1=[str(f1)],
                        hic_reads_2=[str(f2)],
                        fn_bin_list_pat=str(lp),
                        fn_bin_list_mat=str(lm))
    assemble(store, cfg)
    bench = tmp_path / "asm.bench.tsv"
    assert bench.exists()
    lines = [ln.split("\t") for ln in bench.read_text().splitlines()
             if ln]
    assert lines, "labeled intra-unitig hits must produce bench records"
    dists = [int(a) for a, _ in lines]
    flags = {b for _, b in lines}
    assert dists == sorted(dists)          # radix-sorted dump
    assert flags <= {"0", "1"}
    # same-hap PE libraries on a trio-labeled assembly: cis dominates
    n_trans = sum(1 for _, b in lines if b == "1")
    assert n_trans <= len(lines) // 2
