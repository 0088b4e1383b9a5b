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


def test_trio_dual_flips_misbinned_unitig(rng, tmp_path):
    """--trio-dual: two homologous (trans-linked) unitigs classified to
    the SAME parent get the weaker one flipped."""
    from hifiasm_tpu.graph.hap_output import phase_unitigs
    from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph
    from hifiasm_tpu.overlap.paf import PafStore
    from hifiasm_tpu.trio import FATHER

    # unitig 0: reads 0-9 all FATHER; unitig 1: reads 10-19, misbinned
    # FATHER for 3 reads (weaker); they are trans-linked (homologous)
    def mk(rids):
        vs = (np.array(rids, np.uint32) << 1)
        return Unitig(vs=vs, node_len=np.full(len(vs), 1000, np.int64),
                      len=1000 * len(vs), circ=False,
                      start=int(vs[0]), end=int(vs[-1]) ^ 1)

    ug = UnitigGraph([mk(range(10)), mk(range(10, 20))])
    flags = np.zeros(20, np.uint8)
    flags[:10] = FATHER
    flags[10:13] = FATHER                   # weak FATHER majority
    from hifiasm_tpu.overlap.paf import PafRecords
    rev = PafStore(20)
    for r in range(10):                     # dense trans links 0 <-> 1
        rev[r] = PafRecords.from_columns(
            qs=[0], qe=[500], tn=[r + 10], ts=[0], te=[500],
            rev=[0], ml=[500], bl=[500])
    h1, h2 = phase_unitigs(ug, rev, 20, trio_flags=flags, trio_dual=True)
    assert 0 in h1 and 0 not in h2
    assert 1 in h2 and 1 not in h1
    # without --trio-dual both land in hap1
    h1b, h2b = phase_unitigs(ug, rev, 20, trio_flags=flags)
    assert 0 in h1b and 1 in h1b
