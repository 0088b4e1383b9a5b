"""Hidden longopts (absent from --help in the reference too;
CommandLines.cpp:18-88): parse + behavioral wiring."""

import numpy as np

from hifiasm_tpu.cli import main, parse_config
from tests.synth import make_genome, sample_reads


def _write_fa(path, reads):
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")


def test_hidden_opts_parse():
    cfg = parse_config([
        "x.fa", "--skip-triobin", "--bin-only", "--somatic-cov", "33",
        "--kpt-rate", "0.6", "--unskew", "--integer-correct", "5",
        "--ex-iter", "2", "--dp-er", "0.003", "--prt-raw",
        "--dbg-het-cnt"])
    assert cfg.skip_triobin and cfg.bin_only
    assert cfg.somatic_cov == 33
    assert cfg.kpt_rate == 0.6 and cfg.unskew
    assert cfg.integer_correct_round == 5 and cfg.extract_iter == 2
    assert abs(cfg.dp_e - 0.003) < 1e-9
    assert cfg.prt_raw and cfg.dbg_het_cnt


def test_hidden_opts_not_in_help(capsys):
    import pytest

    with pytest.raises(SystemExit):
        parse_config(["-h"])
    txt = capsys.readouterr().out
    for opt in ("--skip-triobin", "--bin-only", "--kpt-rate",
                "--dbg-het-cnt", "--prt-raw"):
        assert opt not in txt


def test_bin_only_stops_before_graph(rng, tmp_path):
    g = make_genome(rng, 9000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2000,
                               err_rate=0.002)
    fa = tmp_path / "reads.fa"
    _write_fa(fa, reads)
    prefix = str(tmp_path / "asm")
    rc = main(["-o", prefix, "-r1", "-f0", "--bin-only", str(fa)])
    assert rc == 0
    # the EC checkpoint bins exist but no graph outputs were written
    # (~exit(0) after the dump, Overlaps.cpp:23585)
    assert (tmp_path / "asm.ec.bin.npz").exists()
    assert not (tmp_path / "asm.bp.p_ctg.gfa").exists()


def test_prt_raw_and_ex_iter_outputs(rng, tmp_path):
    g = make_genome(rng, 9000)
    reads, _, _ = sample_reads(rng, g, depth=10, read_len=2000,
                               err_rate=0.002)
    fa = tmp_path / "reads.fa"
    _write_fa(fa, reads)
    ex = tmp_path / "ex.txt"
    ex.write_text("r0\n")
    prefix = str(tmp_path / "asm")
    rc = main(["-o", prefix, "-r1", "-f0", "-i", "--prt-raw",
               "-e", str(ex), "--ex-iter", "2", str(fa)])
    assert rc == 0
    assert (tmp_path / "asm.raw.gfa").exists()
    pafp = tmp_path / "asm.extract.paf"
    assert pafp.exists()
    lines = [ln for ln in pafp.read_text().splitlines() if ln]
    assert lines, "r0 has overlaps at depth 10; the dump cannot be empty"
    cols = lines[0].split("\t")
    assert len(cols) == 12 and cols[4] in "+-"
    # every line touches the BFS-expanded set: r0's direct partners are
    # in after round 0, so at least one line names r0 itself
    assert any(c[0].startswith("r0") or c[5] == "r0"
               for c in (ln.split("\t") for ln in lines))


def test_dbg_het_cnt_log(rng, tmp_path):
    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=2000,
                               err_rate=0.002)
    fa = tmp_path / "reads.fa"
    _write_fa(fa, reads)
    prefix = str(tmp_path / "asm")
    rc = main(["-o", prefix, "-r1", "-f0", "-i", "--dbg-het-cnt",
               str(fa)])
    assert rc == 0
    logp = tmp_path / "asm.het_cnt.log"
    assert logp.exists()
    lines = [ln for ln in logp.read_text().splitlines() if ln]
    assert len(lines) == len(reads)
    # format: ">{name}\t{count}" (~print_het_cnt_log, Assembly.cpp:978)
    name, cnt = lines[0].split("\t")
    assert name.startswith(">r") and int(cnt) >= 0


def test_skip_triobin_leaves_flags_unset(rng, tmp_path):
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.io.readstore import ReadStore

    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=2000,
                               err_rate=0.002)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    lst = tmp_path / "pat.txt"
    lst.write_text("".join(f"r{i}\n" for i in range(0, len(reads), 2)))
    lst2 = tmp_path / "mat.txt"
    lst2.write_text("".join(f"r{i}\n" for i in range(1, len(reads), 2)))
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, ignore_bin=True,
                        fn_bin_list_pat=str(lst),
                        fn_bin_list_mat=str(lst2), skip_triobin=True)
    assemble(store, cfg)
    # binning skipped: every read keeps the default (ambiguous) flag
    assert (np.asarray(store.trio_flags) ==
            store.trio_flags[0]).all()


def test_somatic_cov_overrides_purge_threshold(rng, tmp_path, capsys):
    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=8, read_len=2000,
                               err_rate=0.002)
    fa = tmp_path / "reads.fa"
    _write_fa(fa, reads)
    rc = main(["-o", str(tmp_path / "asm"), "-r1", "-f0", "-i",
               "--somatic-cov", "7", str(fa)])
    assert rc == 0
    # the derived-threshold log line must NOT appear: the fixed override
    # replaces purge_coverage_threshold (~flat_soma_v Overlaps.cpp:39127)
    err = capsys.readouterr().err
    assert "purge_coverage_threshold" not in err


def test_hic_link_matrix_sc_weight_classes():
    from hifiasm_tpu.phasing.hic import hic_link_matrix

    lens = np.array([100, 100], np.int64)
    # 3 hits in one half-half class, 1 in another: sc weight = 2*max
    hits = np.array([
        [0, 10, 1, 10],
        [0, 12, 1, 11],
        [0, 11, 1, 13],
        [0, 90, 1, 95],
    ], np.int64)
    m = hic_link_matrix(2, hits, utg_lens=lens, sc_weight=True)
    assert m[(0, 1)] == 2 * 3
    m2 = hic_link_matrix(2, hits, utg_lens=lens, sc_weight=False)
    assert m2[(0, 1)] == 4
    # 2-column hit arrays (no positions) keep the plain-count path
    m3 = hic_link_matrix(2, hits[:, [0, 2]])
    assert m3[(0, 1)] == 4
    # class symmetry: (a, b) and the swapped (b, a) hit land in the
    # same canonical class
    hits_sw = hits[:, [2, 3, 0, 1]]
    assert hic_link_matrix(2, hits_sw, utg_lens=lens) == m
