"""Cross-validation: device position table + anchor gather == host.

build_position_table_jax must reproduce the host CSR layout (hashes,
starts, counts, posting order) byte-identically, and
collect_anchors_device must reproduce collect_anchors_many's Anchors
(including occurrence-class weights and the sort order)."""

import numpy as np

from hifiasm_tpu.index.pos_table import build_position_table
from hifiasm_tpu.index.pos_table_jax import (
    build_position_table_jax, collect_anchors_device,
)
from hifiasm_tpu.overlap.anchors import collect_anchors_many
from hifiasm_tpu.ops.sketch import sketch_many


def _reads_with_overlaps(rng, n_src=6, depth=4, glen=4000, rlen=700,
                         err=0.002):
    g = rng.integers(0, 4, glen).astype(np.uint8)
    reads = []
    n = int(glen * depth / rlen)
    for _ in range(n):
        s = int(rng.integers(0, glen - rlen))
        r = g[s:s + rlen].copy()
        m = rng.random(rlen) < err
        r[m] = (r[m] + rng.integers(1, 4, int(m.sum()))) % 4
        if rng.random() < 0.5:
            r = (3 - r)[::-1].copy()
        reads.append(r)
    return reads


def test_device_table_matches_host():
    rng = np.random.default_rng(11)
    reads = _reads_with_overlaps(rng)
    k, w = 17, 11
    host_pt, ph_h, pht_h, mzs = build_position_table(reads, k, w)
    dev_tbl, ph_d, pht_d = build_position_table_jax(mzs)
    assert (ph_h, pht_h) == (ph_d, pht_d)
    dev_pt = dev_tbl.to_host()
    np.testing.assert_array_equal(dev_pt.hashes, host_pt.hashes)
    np.testing.assert_array_equal(dev_pt.start, host_pt.start)
    np.testing.assert_array_equal(dev_pt.count, host_pt.count)
    np.testing.assert_array_equal(dev_pt.rid, host_pt.rid)
    np.testing.assert_array_equal(dev_pt.pos, host_pt.pos)
    np.testing.assert_array_equal(dev_pt.rev, host_pt.rev)
    np.testing.assert_array_equal(dev_pt.span, host_pt.span)


def test_device_anchors_match_host():
    rng = np.random.default_rng(7)
    reads = _reads_with_overlaps(rng, glen=6000, rlen=800, depth=5)
    k, w = 17, 11
    host_pt, _, _, mzs = build_position_table(reads, k, w)
    dev_tbl, _, _ = build_position_table_jax(mzs)
    lens = np.array([len(r) for r in reads], np.int64)
    rids = list(range(len(reads)))
    hom_cov = 5
    host_an = collect_anchors_many(mzs, host_pt, rids, lens, hom_cov)
    dev_an = collect_anchors_device(mzs, dev_tbl, rids, lens, hom_cov,
                                    chunk_mz=500)   # force many chunks
    for i in rids:
        h, d = host_an[i], dev_an[i]
        assert len(h) == len(d), f"read {i}: {len(h)} vs {len(d)}"
        np.testing.assert_array_equal(d.tid, h.tid, err_msg=f"read {i}")
        np.testing.assert_array_equal(d.rev, h.rev, err_msg=f"read {i}")
        np.testing.assert_array_equal(d.self_off, h.self_off,
                                      err_msg=f"read {i}")
        np.testing.assert_array_equal(d.t_off, h.t_off,
                                      err_msg=f"read {i}")
        np.testing.assert_array_equal(d.span, h.span, err_msg=f"read {i}")
        np.testing.assert_array_equal(d.weight, h.weight,
                                      err_msg=f"read {i}")


def test_device_anchors_high_occ_weights():
    """Repeat-heavy genome drives occurrences into the weight LUT's
    high-occ branch (floor(pow(wh, 1.1)))."""
    rng = np.random.default_rng(3)
    unit = rng.integers(0, 4, 150).astype(np.uint8)
    g = np.tile(unit, 40)                     # 40-copy tandem repeat
    reads = [g[s:s + 450].copy()
             for s in rng.integers(0, len(g) - 450, 30)]
    k, w = 17, 11
    host_pt, _, _, mzs = build_position_table(reads, k, w)
    dev_tbl, _, _ = build_position_table_jax(mzs)
    lens = np.array([len(r) for r in reads], np.int64)
    rids = list(range(len(reads)))
    host_an = collect_anchors_many(mzs, host_pt, rids, lens, 3)
    dev_an = collect_anchors_device(mzs, dev_tbl, rids, lens, 3)
    saw_high = False
    for i in rids:
        np.testing.assert_array_equal(dev_an[i].weight, host_an[i].weight)
        saw_high |= bool((host_an[i].weight > 2).any())
    assert saw_high, "test should exercise the high-occ weight branch"


def test_device_anchors_wide_sort_path():
    """>= 2^20 target reads must route through the 4-key wide sort (the
    packed 20-bit tid lane would silently corrupt global tids, ADVICE
    r3); outputs stay byte-identical with the host anchors."""
    rng = np.random.default_rng(5)
    reads = _reads_with_overlaps(rng, glen=5000, rlen=700, depth=4)
    k, w = 17, 11
    host_pt, _, _, mzs = build_position_table(reads, k, w)
    dev_tbl, _, _ = build_position_table_jax(mzs)
    lens = np.array([len(r) for r in reads], np.int64)
    rids = list(range(len(reads)))
    host_an = collect_anchors_many(mzs, host_pt, rids, lens, 5)
    # pad the length table past 2^20 reads: real tids are unaffected,
    # but the device path must switch to the wide sort
    lens_wide = np.concatenate(
        [lens, np.zeros((1 << 20) - len(lens) + 7, np.int64)])
    dev_an = collect_anchors_device(mzs, dev_tbl, rids, lens_wide, 5,
                                    chunk_mz=700)
    for i in rids:
        h, d = host_an[i], dev_an[i]
        assert len(h) == len(d), f"read {i}: {len(h)} vs {len(d)}"
        np.testing.assert_array_equal(d.tid, h.tid, err_msg=f"read {i}")
        np.testing.assert_array_equal(d.rev, h.rev, err_msg=f"read {i}")
        np.testing.assert_array_equal(d.self_off, h.self_off,
                                      err_msg=f"read {i}")
        np.testing.assert_array_equal(d.t_off, h.t_off,
                                      err_msg=f"read {i}")
        np.testing.assert_array_equal(d.weight, h.weight,
                                      err_msg=f"read {i}")


def test_device_table_empty_and_tiny():
    from hifiasm_tpu.ops.sketch import Minimizers
    z = lambda t: np.zeros(0, t)
    empty = Minimizers(z(np.uint64), z(np.int64), z(np.uint8),
                       z(np.int64), z(np.uint32))
    tbl, ph, pht = build_position_table_jax([empty, empty])
    assert tbl.n_distinct == 0 and tbl.tot_pos == 0
    lens = np.array([100, 100], np.int64)
    an = collect_anchors_device([empty, empty], tbl, [0, 1], lens, 3)
    assert len(an) == 2 and len(an[0]) == 0 and len(an[1]) == 0
