"""End-to-end UL (--ul) and dual-scaf modes through assemble()."""

import numpy as np

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import ReadStore
from tests.synth import inject_errors, make_genome, sample_reads

NT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">u{i}\n{NT[np.clip(s, 0, 3)].tobytes().decode()}\n")


def test_ul_mode_end_to_end(rng, tmp_path):
    L = 20000
    g = make_genome(rng, L)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=2000,
                               err_rate=0.002)
    # three UL reads spanning most of the genome at 5% error
    uls = [inject_errors(rng, g[1000:19000].copy(), 0.05)
           for _ in range(3)]
    ulf = tmp_path / "ul.fa"
    _write_fasta(ulf, uls)

    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, ul_reads=[str(ulf)],
                        ul_min_base=1000)
    res = assemble(store, cfg)
    assert (tmp_path / "asm.bp.p_ctg.gfa").exists()
    lens = [u.len for u in res.ug.utgs]
    assert max(lens) > 0.7 * L, lens


def test_dual_scaf_end_to_end(rng, tmp_path):
    L = 16000
    h1, h2 = make_genome(rng, L, het_rate=0.004)
    r1, _, _ = sample_reads(rng, h1, depth=13, read_len=2000,
                            err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=13, read_len=2000,
                            err_rate=0.002)
    reads = r1 + r2
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, dual_scaf=True)
    assemble(store, cfg)
    assert (tmp_path / "asm.bp.hap1.scaf.fa").exists()
    assert (tmp_path / "asm.bp.hap2.scaf.fa").exists()
