"""Edge cases: tiny inputs, N bases, empty stores, single reads."""

import numpy as np

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import ReadStore, seq_to_codes
from hifiasm_tpu.ops.sketch import sketch_read
from tests.synth import make_genome, sample_reads


def test_read_with_n_bases(rng):
    codes = rng.integers(0, 4, 500).astype(np.uint8)
    codes[100:110] = 4
    store = ReadStore.from_arrays(["n"], [codes])
    back = store.get_codes(0)
    np.testing.assert_array_equal(back, codes)
    mz = sketch_read(back, 51, 51, None)
    # k-mers crossing the N run must be absent
    assert len(mz) >= 0


def test_single_read_assembly(rng, tmp_path):
    reads = [rng.integers(0, 4, 1500).astype(np.uint8)]
    store = ReadStore.from_arrays(["only"], reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "a"), n_rounds_ec=1)
    res = assemble(store, cfg, write_outputs=False)
    # one isolated read -> at most one unitig, never a crash
    assert len(res.ug) <= 1


def test_empty_overlap_read(rng, tmp_path):
    # two unrelated reads: no overlaps, two singleton unitigs
    reads = [make_genome(rng, 1200), make_genome(rng, 1300)]
    store = ReadStore.from_arrays(["a", "b"], reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "a"), n_rounds_ec=1)
    res = assemble(store, cfg, write_outputs=False)
    assert res.ec.paf.total == 0
    assert len(res.ug) <= 2


def test_fastq_gz_roundtrip(rng, tmp_path):
    import gzip
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fq = tmp_path / "r.fq.gz"
    seqs = [rng.integers(0, 4, 300).astype(np.uint8) for _ in range(3)]
    with gzip.open(fq, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@q{i} extra comment\n{nt[s].tobytes().decode()}\n"
                    f"+\n{'I' * len(s)}\n")
    store = ReadStore.from_files([str(fq)])
    assert store.n_reads == 3
    assert store.names == ["q0", "q1", "q2"]
    np.testing.assert_array_equal(store.get_codes(1), seqs[1])


def test_adapter_trim(rng):
    from io import BytesIO
    seqs = [rng.integers(0, 4, 200).astype(np.uint8)]
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".fa",
                                     delete=False) as f:
        f.write(f">x\n{nt[seqs[0]].tobytes().decode()}\n")
        path = f.name
    try:
        store = ReadStore.from_files([path], adapter_len=25)
        assert store.lens[0] == 150
        np.testing.assert_array_equal(store.get_codes(0), seqs[0][25:-25])
    finally:
        os.unlink(path)


def test_ont_mode_smoke(rng, tmp_path):
    """--ont: smaller EC windows; pipeline must still assemble."""
    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=1800,
                               err_rate=0.01)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "a"), n_rounds_ec=1,
                        is_ont=True, max_ov_diff_ec=0.08,
                        max_ov_diff_final=0.06)
    res = assemble(store, cfg, write_outputs=False)
    assert res.ec.paf.total > 0
    assert len(res.ug) >= 1


def test_assembly_is_deterministic(rng, tmp_path):
    """Fixed seed + deterministic kernels: identical reruns produce
    byte-identical outputs (the reference's determinism oracle,
    SURVEY 4; seed=11, CommandLines.cpp:325)."""
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.io.readstore import ReadStore
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 12000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2000,
                               err_rate=0.003)
    outs = []
    for run in range(2):
        store = ReadStore.from_arrays(
            [f"r{i}" for i in range(len(reads))],
            [r.copy() for r in reads])
        cfg = HifiasmConfig(output_prefix=str(tmp_path / f"run{run}"),
                            n_rounds_ec=1, ignore_bin=True)
        assemble(store, cfg)
        outs.append((tmp_path / f"run{run}.bp.p_ctg.gfa").read_bytes())
    assert outs[0] == outs[1]


def test_ont_mode_end_to_end(rng, tmp_path):
    """--ont: smaller EC windows + chemistry-aware chimera detection
    still assemble higher-error reads into one contig."""
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.io.readstore import ReadStore
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 14000)
    reads, _, _ = sample_reads(rng, g, depth=14, read_len=2500,
                               err_rate=0.01)        # ONT-ish errors
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=2, is_ont=True)
    res = assemble(store, cfg, write_outputs=False)
    lens = sorted((u.len for u in res.ug.utgs), reverse=True)
    assert lens and lens[0] > 0.75 * len(g), lens[:5]
