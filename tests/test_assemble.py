"""End-to-end slice: synthetic reads -> contigs reconstructing the genome."""

import numpy as np

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.graph.unitig import unitig_seq
from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes
from tests.synth import make_genome, sample_reads


def _kmer_set(codes, k):
    return {codes[i:i + k].tobytes() for i in range(len(codes) - k + 1)}


def _genome_identity(contig, genome_kmers, k=63):
    """Fraction of contig k-mers present in the genome (either strand)."""
    if len(contig) < k:
        return 0.0
    hits = 0
    tot = 0
    for i in range(0, len(contig) - k + 1, 11):
        tot += 1
        km = contig[i:i + k]
        if km.tobytes() in genome_kmers or \
                revcomp_codes(km).tobytes() in genome_kmers:
            hits += 1
    return hits / max(tot, 1)


def test_assemble_linear_genome(rng, tmp_path):
    L = 20000
    g = make_genome(rng, L)
    reads, _, _ = sample_reads(rng, g, depth=18, read_len=2200,
                               err_rate=0.003)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"), n_rounds_ec=2)
    res = assemble(store, cfg)
    assert len(res.ug) >= 1
    gk = _kmer_set(g, 63)
    lens = []
    for u in res.ug.utgs:
        seq = unitig_seq(u, res.store, res.cov)
        lens.append(len(seq))
        ident = _genome_identity(seq, gk)
        assert ident > 0.98, f"contig identity {ident:.3f}"
    total = sum(lens)
    # reconstruction should cover most of the genome without much duplication
    assert total > 0.85 * L, f"assembled only {total} of {L}"
    assert total < 1.3 * L, f"assembled {total}, too much duplication"
    assert max(lens) > 0.6 * L, "genome fragmented into small contigs"
    assert (tmp_path / "asm.bp.p_ctg.gfa").exists()


def test_assemble_diploid_pops_bubbles(rng, tmp_path):
    L = 16000
    h1, h2 = make_genome(rng, L, het_rate=0.002)
    r1, _, _ = sample_reads(rng, h1, depth=14, read_len=2000, err_rate=0.002)
    r2, _, _ = sample_reads(rng, h2, depth=14, read_len=2000, err_rate=0.002)
    reads = r1 + r2
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"), n_rounds_ec=2)
    res = assemble(store, cfg, write_outputs=False)
    lens = [len(unitig_seq(u, res.store, res.cov)) for u in res.ug.utgs]
    prim_lens = [lens[i] for i in res.purge.primary]
    alt_lens = [lens[i] for i in res.purge.alternate]
    # haplotype-resolved diploid: primary should be roughly ONE haplotype,
    # the purged duplicates (other haplotype) end up alternate
    assert sum(prim_lens) < 1.5 * L, \
        f"haplotigs not purged: primary {sum(prim_lens)} vs genome {L}"
    assert sum(prim_lens) > 0.7 * L
    assert sum(alt_lens) > 0.4 * L, "alternate haplotype missing"
    assert max(prim_lens) > 0.5 * L
