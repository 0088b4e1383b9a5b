"""Telomere-aware cleaning (--telo-m): telomeric tips survive the tip
cuts (~telo_end_t threading through asg_arc_cut_tips, gfa_ut.cpp:3059)."""

import numpy as np

from hifiasm_tpu.graph.telo import find_telo_reads
from hifiasm_tpu.io.readstore import ReadStore, seq_to_codes
from tests.synth import make_genome, sample_reads


def test_find_telo_reads(rng):
    g = make_genome(rng, 9000)
    motif = seq_to_codes(b"CCCTAA")
    telo_block = np.tile(motif, 60)             # 360 bp of telomere
    r_telo = np.concatenate([telo_block, g[:2000]])
    reads = [r_telo, g[1000:3500], g[3000:6000]]
    store = ReadStore.from_arrays(["t0", "r1", "r2"], reads)
    mask = find_telo_reads(store, "CCCTAA")
    assert mask[0] and not mask[1] and not mask[2]
    # revcomp end counts too
    from hifiasm_tpu.io.readstore import revcomp_codes
    store2 = ReadStore.from_arrays(["t0"], [revcomp_codes(r_telo)])
    assert find_telo_reads(store2, "CCCTAA")[0]
    # --telo-s raises the bar
    assert not find_telo_reads(store, "CCCTAA", min_hits=100)[0]


def test_telomeric_tip_survives_cleaning(rng, tmp_path):
    """A telomeric dead-end read chain must NOT be trimmed as a tip."""
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig

    g = make_genome(rng, 14000)
    motif = seq_to_codes(b"CCCTAA")
    g[:360] = np.tile(motif, 60)                # telomeric 5' end
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=2000,
                               err_rate=0.002)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, telo_motif="CCCTAA")
    res = assemble(store, cfg, write_outputs=False)
    total = sum(u.len for u in res.ug.utgs)
    assert total > 0.9 * len(g), total          # telomere end retained
