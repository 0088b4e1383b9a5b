#!/usr/bin/env python
"""Device vs host throughput on the EC front end (index -> windows).

Measures bases/s for sketch + position table + anchoring + chain DP +
window planning:
- device: ops/sketch_jax + index/pos_table_jax (HBM-resident index) +
  overlap/chain_device (device chain DP/traceback; anchors never leave
  HBM, only region metadata + t_ws transfer);
- host: the native sketch + numpy table + native anchor collection +
  native chain kernel (the 4-core production host path).

Run WITHOUT JAX_PLATFORMS=cpu to hit the real chip.  Prints a JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import numpy as np

WL, ERATE = 775, 0.04


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    k, w = 51, 51

    from tests.synth import make_genome, sample_reads

    rng = np.random.default_rng(11)
    g = make_genome(rng, max(n_reads * 15000 // 12, 100000))
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=15000,
                               err_rate=0.003)
    reads = reads[:n_reads]
    lens = np.array([len(r) for r in reads], np.int64)
    total_bases = int(lens.sum())
    rids = list(range(len(reads)))
    print(f"[bench-fe] {len(reads)} reads, {total_bases} bases",
          file=sys.stderr)

    import jax
    backend = jax.default_backend()
    print(f"[bench-fe] jax backend: {backend}", file=sys.stderr)

    from hifiasm_tpu.ec.window_align import plan_read_windows
    from hifiasm_tpu.index.pos_table import build_position_table
    from hifiasm_tpu.index.pos_table_jax import (
        collect_anchor_groups_device, device_table_from_host,
    )
    from hifiasm_tpu.ops.chain import ChainParams
    from hifiasm_tpu.overlap.chain_device import (
        DeviceChunkChains, regions_from_device_chains,
    )

    cp = ChainParams.for_k(k)

    def dev_once():
        # production device frontend: host-built table uploaded to HBM
        pt, ph, _, mzs = build_position_table(reads, k, w)
        tbl = device_table_from_host(pt)
        hom = ph if ph > 0 else 12
        n_win = 0
        for cols, meta in collect_anchor_groups_device(
                mzs, tbl, rids, lens, hom):
            dcc = DeviceChunkChains(cols, meta, lens, lens, cp)
            regs = regions_from_device_chains(dcc, lens, lens)
            ws_cat, ci_cat = [], []
            for rr, ov in regs:
                pl = plan_read_windows(ov, WL, ERATE, with_tws=False)
                if len(pl["ws"]):
                    ws_cat.append(pl["ws"])
                    ci_cat.append(ov.hit_ref[pl["ov_idx"]])
            if ws_cat:
                t = dcc.tws_for_windows(np.concatenate(ci_cat),
                                        np.concatenate(ws_cat))
                n_win += len(t)
        return n_win

    t0 = time.time()
    n_win = dev_once()               # warmup + compile
    print(f"[bench-fe] first device pass (compile) "
          f"{time.time() - t0:.1f}s, {n_win} windows", file=sys.stderr)
    walls = []
    for _ in range(3):
        t0 = time.time()
        dev_once()
        walls.append(time.time() - t0)
    dev_wall = sorted(walls)[1]
    dev_bps = total_bases / dev_wall
    print(f"[bench-fe] device: {dev_wall:.2f}s = {dev_bps:,.0f} bases/s",
          file=sys.stderr)

    # ---- host production path on the same reads ----
    from hifiasm_tpu.index.pos_table import build_position_table
    from hifiasm_tpu.overlap.anchors import chain_many, collect_anchors_many

    def host_once():
        pt, ph, _, mzs = build_position_table(reads, k, w)
        hom = ph if ph > 0 else 12
        ans = collect_anchors_many(mzs, pt, rids, lens, hom)
        ovs = chain_many([(r, ans[r], len(reads[r])) for r in rids],
                         lens, cp)
        for ov in ovs:
            plan_read_windows(ov, WL, ERATE)

    walls = []
    for _ in range(3):
        t0 = time.time()
        host_once()
        walls.append(time.time() - t0)
    host_wall = sorted(walls)[1]
    host_bps = total_bases / host_wall
    print(f"[bench-fe] host ({os.cpu_count()} cores): {host_wall:.2f}s = "
          f"{host_bps:,.0f} bases/s", file=sys.stderr)

    print(json.dumps({
        "metric": "frontend_bases_per_s",
        "backend": backend,
        "value": round(dev_bps, 1),
        "host_bases_per_s": round(host_bps, 1),
        "device_vs_host": round(dev_bps / host_bps, 3)
        if host_bps else 0.0,
    }))


if __name__ == "__main__":
    main()
