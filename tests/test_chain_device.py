"""Device-resident chaining == host chain_many, region for region.

The device path (collect_anchor_groups_device -> DeviceChunkChains ->
regions_from_device_chains) must produce the same OverlapRegions as the
host path (collect_anchors_many -> chain_many) on every field except
the hit arrays (which stay on device), and its t_ws window service must
match plan_read_windows' searchsorted."""

import numpy as np

from hifiasm_tpu.ops.chain import ChainParams
from tests.synth import make_genome, sample_reads


def _mk_reads(rng, glen=40000, repeat_frac=0.25):
    g = make_genome(rng, glen, repeat_frac=repeat_frac)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=5000,
                               err_rate=0.004)
    return reads


def test_device_chains_match_host(rng):
    k, w = 51, 51
    reads = _mk_reads(rng)
    lens = np.array([len(r) for r in reads], np.int64)
    rids = list(range(len(reads)))
    cp = ChainParams.for_k(k)

    # host path
    from hifiasm_tpu.index.pos_table import build_position_table
    from hifiasm_tpu.overlap.anchors import (
        chain_many, collect_anchors_many,
    )
    pt, ph, _, mzs = build_position_table(reads, k, w)
    hom = ph if ph > 0 else 12
    ans = collect_anchors_many(mzs, pt, rids, lens, hom)
    host_regs = chain_many([(r, ans[r], len(reads[r])) for r in rids],
                           lens, cp)

    # device path
    from hifiasm_tpu.index.pos_table_jax import (
        build_position_table_device, collect_anchor_groups_device,
    )
    from hifiasm_tpu.overlap.chain_device import (
        DeviceChunkChains, regions_from_device_chains,
    )
    tbl, ph2, _, mzs2 = build_position_table_device(reads, k, w)
    assert ph2 == ph
    dev_regs = {}
    chunks = []
    for cols, meta in collect_anchor_groups_device(
            mzs2, tbl, rids, lens, hom, chunk_mz=40_000):
        dcc = DeviceChunkChains(cols, meta, lens, lens, cp)
        chunks.append(dcc)
        for rr, ov in regions_from_device_chains(dcc, lens, lens):
            dev_regs[rr] = (ov, dcc)

    from hifiasm_tpu.ec.window_align import plan_read_windows
    n_regions = 0
    n_windows = 0
    for r in rids:
        ho = host_regs[r]
        do, dcc = dev_regs[r]
        assert len(ho) == len(do), f"read {r}: region count"
        for fld in ("y_id", "rev", "x_s", "x_e", "y_s", "y_e", "score",
                    "n_hits"):
            assert (getattr(ho, fld) == getattr(do, fld)).all(), \
                f"read {r}: {fld}"
        n_regions += len(ho)
        # t_ws service vs the host hit-based planner
        pl = plan_read_windows(ho, 775, 0.04)
        if len(pl["ws"]) == 0:
            continue
        chain_idx = do.hit_ref[pl["ov_idx"]]
        t_dev = dcc.tws_for_windows(chain_idx, pl["ws"])
        assert (t_dev == pl["t_ws"]).all(), f"read {r}: t_ws"
        n_windows += len(pl["ws"])
    assert n_regions > len(rids)       # multiple overlaps per read
    assert n_windows > 100
