"""Trio-binned assembly: hap outputs follow parental k-mer classification."""

import numpy as np

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.graph.unitig import unitig_seq
from hifiasm_tpu.io.readstore import ReadStore
from hifiasm_tpu.trio import FATHER, MOTHER, _read_kmers
from tests.synth import make_genome, sample_reads
from tests.test_trio import write_yak_dump


def test_trio_assembly_partitions_haps(rng, tmp_path):
    L = 14000
    h1, h2 = make_genome(rng, L, het_rate=0.008)
    k = 31
    k1 = np.unique(_read_kmers(h1, k)[1])
    k2 = np.unique(_read_kmers(h2, k)[1])
    pat, mat = str(tmp_path / "p.yak"), str(tmp_path / "m.yak")
    write_yak_dump(pat, k, k1, np.full(len(k1), 20))
    write_yak_dump(mat, k, k2, np.full(len(k2), 20))

    r1, _, _ = sample_reads(rng, h1, depth=13, read_len=2200, err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=13, read_len=2200, err_rate=0.002)
    reads = r1 + r2
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"), n_rounds_ec=1,
                        fn_bin_yak_pat=pat, fn_bin_yak_mat=mat)
    res = assemble(store, cfg)
    # trio flags must be set and roughly correct
    f1 = res.store.trio_flags[:len(r1)]
    f2 = res.store.trio_flags[len(r1):]
    assert (f1 == FATHER).mean() > 0.6
    assert (f2 == MOTHER).mean() > 0.6
    assert (tmp_path / "asm.dip.hap1.p_ctg.gfa").exists()
    # hap1 output should be dominated by FATHER-flagged reads
    hap1 = (tmp_path / "asm.dip.hap1.p_ctg.gfa").read_text()
    a_reads = [ln.split("\t")[4] for ln in hap1.splitlines()
               if ln.startswith("A\t")]
    rid_of = {n: i for i, n in enumerate(store.names)}
    flags = [res.store.trio_flags[rid_of[n]] for n in a_reads]
    n_f = sum(1 for x in flags if x == FATHER)
    n_m = sum(1 for x in flags if x == MOTHER)
    assert n_f > n_m, f"hap1 has {n_f} pat vs {n_m} mat reads"
