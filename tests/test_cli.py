"""CLI end-to-end: reads file -> contig outputs via main()."""

import os
import numpy as np

from hifiasm_tpu.cli import main, parse_config
from tests.synth import make_genome, sample_reads


def test_parse_defaults():
    cfg = parse_config(["-o", "out", "-t4", "-f0", "-r2", "reads.fa"])
    assert cfg.output_prefix == "out"
    assert cfg.threads == 4
    assert cfg.bf_shift == 0
    assert cfg.n_rounds_ec == 2
    assert cfg.read_files == ["reads.fa"]
    assert cfg.k == 51 and cfg.purge_level == 3


def test_parse_subsystems():
    cfg = parse_config(["--h1", "h1.fq", "--h2", "h2.fq", "--ul", "ul.fq",
                        "-1", "p.yak", "-2", "m.yak", "--telo-m", "CCCTAA",
                        "--dual-scaf", "--ont", "reads.fa"])
    assert cfg.hic_reads_1 == ["h1.fq"]
    assert cfg.ul_reads == ["ul.fq"]
    assert cfg.fn_bin_yak_pat == "p.yak"
    assert cfg.telo_motif == "CCCTAA"
    assert cfg.dual_scaf and cfg.is_ont
    assert cfg.ec_window == 375


def test_cli_end_to_end(rng, tmp_path):
    g = make_genome(rng, 9000)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=2000,
                               err_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    prefix = str(tmp_path / "asm")
    rc = main(["-o", prefix, "-r1", "-f0", str(fa)])
    assert rc == 0
    assert (tmp_path / "asm.bp.p_ctg.gfa").exists()
    assert (tmp_path / "asm.bp.hap1.p_ctg.gfa").exists()
    assert (tmp_path / "asm.bp.r_utg.gfa").exists()
    assert (tmp_path / "asm.bp.p_utg.gfa").exists()
    gfa = (tmp_path / "asm.bp.p_ctg.gfa").read_text()
    assert gfa.startswith("S\t")


def test_cli_polyploid_outputs(rng, tmp_path):
    from tests.synth import make_genome, sample_reads
    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2000,
                               err_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    rc = main(["-o", str(tmp_path / "asm"), "-r1", "-f0", "--n-hap", "3",
               str(fa)])
    assert rc == 0
    for h in (1, 2, 3):
        assert (tmp_path / f"asm.bp.hap{h}.p_ctg.gfa").exists()


def test_cli_lowq_disable(rng, tmp_path):
    from tests.synth import make_genome, sample_reads
    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2000,
                               err_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    rc = main(["-o", str(tmp_path / "asm"), "-r1", "-f0", "--lowQ", "0",
               str(fa)])
    assert rc == 0
    assert not (tmp_path / "asm.bp.p_utg.lowQ.bed").exists()


def test_dbg_ovec_stops_before_graph(tmp_path, rng):
    """--dbg-ovec dumps prefix.ovlp.paf and stops (~ha_ec_dbg)."""
    import subprocess
    import sys

    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 15000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2500,
                               err_rate=0.002)
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    r = subprocess.run(
        [sys.executable, "-m", "hifiasm_tpu", str(fa), "-o",
         str(tmp_path / "x"), "-i", "--dbg-ovec", "-r1"],
        capture_output=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-500:]
    assert (tmp_path / "x.ovlp.paf").exists()
    assert not (tmp_path / "x.bp.p_ctg.gfa").exists()
    n_lines = sum(1 for _ in open(tmp_path / "x.ovlp.paf"))
    assert n_lines > 10


def test_expert_options_parse_and_wire():
    from hifiasm_tpu.cli import parse_config

    cfg = parse_config([
        "reads.fa", "-o", "/tmp/x", "--ul-tip", "4", "--path-max", "0.7",
        "--path-min", "0.3", "--telo-p", "2", "--telo-d", "1500",
        "--rl-cut", "2000", "--sc-cut", "12", "--pri-range", "5,40",
        "--enzyme", "GATC", "--low-het", "--sec-in", "extra.fa"])
    assert cfg.ul_tip == 4
    assert cfg.path_max == 0.7 and cfg.path_min == 0.3
    assert cfg.telo_pen == 2 and cfg.telo_drop == 1500
    assert cfg.rl_cut == 2000 and cfg.sc_cut == 12
    assert cfg.recover_atg_cov_min == 5
    assert cfg.recover_atg_cov_max == 40
    assert cfg.hic_enzymes == ["GATC"] and cfg.low_het
    assert cfg.sec_in == ["extra.fa"]


def test_ont_read_filters(tmp_path):
    from hifiasm_tpu.io.readstore import ReadStore

    fq = tmp_path / "r.fq"
    good_q = chr(33 + 30) * 1500
    bad_q = chr(33 + 3) * 1500
    with open(fq, "w") as f:
        f.write(f"@long_good\n{'ACGT' * 375}\n+\n{good_q}\n")
        f.write(f"@long_lowq\n{'ACGT' * 375}\n+\n{bad_q}\n")
        f.write(f"@short\n{'ACGT' * 100}\n+\n{chr(63) * 400}\n")
    rs = ReadStore.from_files([str(fq)], min_len=1000, min_mean_q=10)
    assert rs.names == ["long_good"]
