"""Auxiliary checkpoint caches: pt index, Hi-C PE hits, UL paths,
trans pairs (~htab.cpp:1367, hic.cpp:5239, inter.cpp:20120,
Overlaps.cpp:16379). Each cache must round-trip exactly and reject a
stale fingerprint."""

import numpy as np

from hifiasm_tpu.io.binfiles import (
    load_hic_hits, load_pt_index, load_trans_links, load_ul_paths,
    save_hic_hits, save_pt_index, save_trans_links, save_ul_paths,
)


def test_pt_index_roundtrip(rng, tmp_path):
    from hifiasm_tpu.index.pos_table import build_position_table
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 20_000)
    reads, _, _ = sample_reads(rng, g, 8, 3000, 0.002)
    codes = [np.asarray(r, np.uint8) for r in reads]
    pt, ph, pe, mzs = build_position_table(codes, 51, 51)
    pfx = str(tmp_path / "x")
    save_pt_index(pfx, None, pt, mzs, "fp1", ph, pe)
    out = load_pt_index(pfx, "fp1")
    assert out is not None
    ft2, pt2, mzs2, ph2, pe2 = out
    assert ft2 is None and ph2 == ph and pe2 == pe
    np.testing.assert_array_equal(pt2.hashes, pt.hashes)
    np.testing.assert_array_equal(pt2.rid, pt.rid)
    np.testing.assert_array_equal(pt2.pos, pt.pos)
    assert len(mzs2) == len(mzs)
    for a, b in zip(mzs, mzs2):
        np.testing.assert_array_equal(a.hash, b.hash)
        np.testing.assert_array_equal(a.pos, b.pos)
    assert load_pt_index(pfx, "fp-other") is None


def test_hic_hits_roundtrip(tmp_path):
    pfx = str(tmp_path / "x")
    hits = np.array([[0, 10, 1, 20], [2, 5, 0, 7]], np.int64)
    save_hic_hits(pfx, hits, "h1")
    out = load_hic_hits(pfx, "h1")
    np.testing.assert_array_equal(out, hits)
    assert load_hic_hits(pfx, "h2") is None


def test_ul_paths_roundtrip(tmp_path):
    from hifiasm_tpu.ul import ULPath

    pfx = str(tmp_path / "x")
    paths = [ULPath([(0, 0, 0, 100), (1, 1, 100, 220)]),
             ULPath([]),
             ULPath([(3, 0, 5, 50)])]
    save_ul_paths(pfx, paths, "u1")
    out = load_ul_paths(pfx, "u1")
    assert [p.blocks for p in out] == [p.blocks for p in paths]
    assert load_ul_paths(pfx, "u2") is None


def test_trans_links_roundtrip(tmp_path):
    pfx = str(tmp_path / "x")
    conf = [(1, 2, 0.9, 0.99, (10, 20, 30, 40, 50)),
            (3, 4, 0.8, 0.95, None)]
    save_trans_links(pfx, conf, "t1")
    out = load_trans_links(pfx, "t1")
    assert out == conf
    assert load_trans_links(pfx, "t2") is None


def test_dbg_gfa_pt_resume(rng, tmp_path):
    """--dbg-gfa writes prefix.pt.bin on the first run; a rerun loads it
    and produces byte-identical outputs."""
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.io.readstore import ReadStore
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 20_000)
    reads, _, _ = sample_reads(rng, g, 10, 3000, 0.002)

    def run(pfx, ignore):
        store = ReadStore.from_arrays(
            [f"r{i}" for i in range(len(reads))],
            [r.copy() for r in reads])
        cfg = HifiasmConfig(output_prefix=pfx, n_rounds_ec=1,
                            ignore_bin=ignore, dbg_gfa=True)
        assemble(store, cfg)
        return open(f"{pfx}.bp.p_ctg.gfa", "rb").read()

    a = run(str(tmp_path / "a"), True)
    assert (tmp_path / "a.pt.bin").exists()
    b = run(str(tmp_path / "a"), False)      # resumes ec state + index
    assert a == b
