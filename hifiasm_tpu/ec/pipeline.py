"""Error-correction driver: overlap -> phase -> consensus rounds.

Re-expresses ``cal_ec_r`` / ``worker_hap_ec`` / ``sl_ec_r``
(ecovlp.cpp:6268, :3234, :6410) and the final no-correction overlap pass
``cal_ov_r`` / ``worker_hap_dc_ec`` (:6385): each round rebuilds the
minimizer position index over the current (corrected) reads, finds overlap
candidates per read, aligns them window-wise, phases het sites, and applies
the windowed consensus.  Corrections are written back only after ALL reads
finish (the reference's process barrier between ``kt_for`` and ``sl_ec_r``).
The final pass recomputes precise overlap records (``ma_hit_t``) without
touching the sequences: cis -> paf, trans -> reverse_paf.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.ec.consensus import windowed_consensus
from hifiasm_tpu.ec.phase import phase_overlaps
from hifiasm_tpu.ec.window_align import OverlapTracebacks, WindowBatcher
from hifiasm_tpu.index.pos_table import FilterTable, build_position_table
from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes
from hifiasm_tpu.ops.chain import ChainParams
from hifiasm_tpu.overlap.anchors import OverlapRegions, collect_anchors
from hifiasm_tpu.overlap.paf import PafRecords, PafStore
from hifiasm_tpu.utils.logging import log

LONG_INDEL_WIN_DIFF = 16


@dataclass
class ECResult:
    paf: PafStore
    reverse_paf: PafStore
    hom_cov: int
    het_cov: int
    n_corrected: int = 0


class _TargetCache:
    def __init__(self, store: ReadStore):
        self.store = store
        self._fwd = {}
        self._rc = {}

    def __call__(self, tid: int, rev: int) -> np.ndarray:
        cache = self._rc if rev else self._fwd
        if tid not in cache:
            codes = self.store.get_codes(tid)
            cache[tid] = revcomp_codes(codes) if rev else codes
        return cache[tid]

    def reset(self):
        self._fwd.clear()
        self._rc.clear()


def _host_engine(cfg: HifiasmConfig):
    """Host-side engine for the batched window flow.

    Returns None to select the zero-copy native job path inside
    WindowBatcher (auto/native when the library is available); otherwise
    an explicit engine callable."""
    from hifiasm_tpu.ec.window_align import resolve_engine

    if cfg.align_engine in ("numpy", "jax"):
        return resolve_engine(cfg.align_engine)
    try:
        from hifiasm_tpu.native import get_lib
        if get_lib() is not None:
            return None                   # zero-copy native job path
    except Exception:
        pass
    from hifiasm_tpu.ops.banded_batch import banded_batch_np
    return banded_batch_np


def _iter_overlap_batches(store: ReadStore, codes, mzs, pt, cfg, hom_cov,
                          e_rate: float, get_target):
    """Yield batches of (rid, q, ov, tbs) with windows aligned per batch.

    Pass 1 of each batch chains anchors and plans window jobs; one flush
    runs ALL windows of the batch through the alignment engine in large
    fixed-shape launches (the TPU execution shape); pass 2 yields the
    whole batch so phase/consensus can also run cross-read batched.
    """
    from hifiasm_tpu.overlap.anchors import chain_many, collect_anchors_many

    cp = ChainParams.for_k(cfg.k)
    engine = _host_engine(cfg)
    bs = max(1, cfg.read_batch)
    for b0 in range(0, store.n_reads, bs):
        rids = list(range(b0, min(b0 + bs, store.n_reads)))
        wb = WindowBatcher(get_target, e_rate, wl=cfg.ec_window, engine=engine)
        ans = collect_anchors_many(mzs, pt, rids, store.lens, hom_cov)
        anchors = [(rid, an, len(codes[rid]))
                   for rid, an in zip(rids, ans)]
        ovs = chain_many(anchors, store.lens, cp,
                         max_n_chain=cfg.max_n_chain)
        planned = [(rid, codes[rid], ov, wb.add_read(codes[rid], ov))
                   for (rid, _, _), ov in zip(anchors, ovs)]
        wb.flush()
        yield planned


def _use_fused(cfg: HifiasmConfig) -> bool:
    """The fused native per-batch EC stage (ht_ec_batch) serves the
    auto/native host path; explicit numpy/jax engines keep the
    batched-window flow (tests cross-validate the two)."""
    if cfg.align_engine not in ("auto", "native"):
        return False
    try:
        from hifiasm_tpu.native import get_lib
        return get_lib() is not None
    except Exception:
        return False


def _ec_pass_fused(store: ReadStore, codes, mzs, pt, cfg: HifiasmConfig,
                   hom_cov: int, e_rate: float, do_consensus: bool):
    """Fused host EC pass: per batch, anchors -> chain DP -> one native
    call that plans windows, aligns, phases and (optionally) builds the
    consensus (~worker_hap_ec, ecovlp.cpp:3234).  Yields
    (rids, ovs, result-dict) per batch; result None if unavailable."""
    from hifiasm_tpu.config import THRESHOLD_MAX_SIZE
    from hifiasm_tpu.native import ec_batch_native
    from hifiasm_tpu.overlap.anchors import chain_many, collect_anchors_many

    cp = ChainParams.for_k(cfg.k)
    bank_off = np.zeros(store.n_reads + 1, np.int64)
    for i, c in enumerate(codes):
        bank_off[i + 1] = bank_off[i] + len(c)
    bank = np.concatenate(codes) if codes else np.zeros(0, np.uint8)
    cfg_tuple = (cfg.ec_window, THRESHOLD_MAX_SIZE, e_rate,
                 THRESHOLD_MAX_SIZE, 2, 3, 0.500001)
    # double-buffered: the fused kernel (ctypes call releases the GIL)
    # runs in a worker thread while the main thread prepares the next
    # batch's anchors + chains — the host analog of kt_pipeline
    from concurrent.futures import ThreadPoolExecutor

    bs = max(1, cfg.read_batch)

    def _prep(b0):
        rids = list(range(b0, min(b0 + bs, store.n_reads)))
        ans = collect_anchors_many(mzs, pt, rids, store.lens, hom_cov)
        reads = [(rid, an, len(codes[rid]))
                 for rid, an in zip(rids, ans)]
        ov_cols = chain_many(reads, store.lens, cp,
                             max_n_chain=cfg.max_n_chain, flat=True)
        return rids, ov_cols

    # 3-stage pipeline (~kt_pipeline): prep(i+1) and ec(i) run in worker
    # threads (both native, GIL-released, OMP-passive) while the caller
    # consumes batch i-1 on the main thread — anchors+chain were the
    # critical path when they ran serially between EC submissions
    with ThreadPoolExecutor(2) as ex:
        prep_fut = ex.submit(_prep, 0)
        fut = prev = None
        for b0 in range(0, store.n_reads, bs):
            rids, ov_cols = prep_fut.result()
            if b0 + bs < store.n_reads:
                prep_fut = ex.submit(_prep, b0 + bs)
            if fut is not None:
                yield prev[0], prev[1], fut.result()
            fut = ex.submit(ec_batch_native, [codes[r] for r in rids],
                            bank_off, bank, ov_cols, cfg_tuple,
                            do_consensus)
            prev = (rids, ov_cols)
        if fut is not None:
            yield prev[0], prev[1], fut.result()


def _use_device(cfg: HifiasmConfig, total_bases: int = 0) -> bool:
    # auto: small inputs can't amortize device launches; decide from the
    # size gate BEFORE touching jax — merely asking for the default
    # backend initializes the TPU client (~10 s through the dev tunnel)
    if cfg.align_engine != "jax" and total_bases < cfg.device_min_bases:
        return False
    from hifiasm_tpu.ec.window_align import resolve_engine
    eng = resolve_engine(cfg.align_engine)
    if not getattr(eng, "__module__", "").endswith("banded_align_jax"):
        return False
    return True


def _active_mesh(cfg: HifiasmConfig):
    """Mesh for the device path when >1 chip is visible (or
    cfg.mesh_devices forces a size).  None = single-device."""
    n = getattr(cfg, "mesh_devices", 0)
    try:
        import jax
        avail = len(jax.devices())
    except Exception:
        return None
    n = avail if n == 0 else min(n, avail)
    if n <= 1:
        return None
    from hifiasm_tpu.parallel.mesh import make_mesh
    return make_mesh(n)


def _chain_all_reads(store, codes, mzs, pt, cfg, hom_cov, mesh=None,
                     dev_table=None):
    """Anchor collection + batched chain DP for every read.

    With a mesh, the posting lookups route through the bucket-sharded
    device index (parallel/ec_shard.py) — byte-identical anchors, the
    multi-chip ha_pt_get (htab.cpp:518).  With ``dev_table`` (single
    device), anchors gather from the HBM-resident index
    (index/pos_table_jax.collect_anchors_device) — also byte-identical."""
    from hifiasm_tpu.overlap.anchors import chain_many, collect_anchors_many

    cp = ChainParams.for_k(cfg.k)
    rids = list(range(store.n_reads))
    if mesh is not None:
        from hifiasm_tpu.parallel.ec_shard import (
            MeshAnchorGather, collect_anchors_mesh,
        )
        gather = MeshAnchorGather(pt, mesh)
        ans = collect_anchors_mesh(mzs, gather, rids, store.lens, hom_cov)
    elif dev_table is not None:
        from hifiasm_tpu.index.pos_table_jax import collect_anchors_device
        ans = collect_anchors_device(mzs, dev_table, rids, store.lens,
                                     hom_cov)
    else:
        ans = collect_anchors_many(mzs, pt, rids, store.lens, hom_cov)
    reads = [(rid, an, len(codes[rid])) for rid, an in zip(rids, ans)]
    ovs = chain_many(reads, store.lens, cp, max_n_chain=cfg.max_n_chain)
    return [(rid, ov) for (rid, _, _), ov in zip(reads, ovs)]


def _chain_all_reads_device(store, mzs, dev_table, cfg, hom_cov):
    """Fully device-resident anchoring + chaining (single device): the
    anchors never leave HBM — the chain DP, traceback, mcopy, and the
    window planner's per-hit searchsorted all run on device
    (index/pos_table_jax.collect_anchor_groups_device +
    overlap/chain_device.py).  Returns (read_ovs, plans): regions are
    field-identical with the host chain_many (hits stay on device),
    and plans are ready-made plan_read_windows dicts per read."""
    from hifiasm_tpu.index.pos_table_jax import (
        collect_anchor_groups_device,
    )
    from hifiasm_tpu.overlap.chain_device import (
        DeviceChunkChains, regions_from_device_chains,
    )

    import time as _t
    cp = ChainParams.for_k(cfg.k)
    rids = list(range(store.n_reads))
    read_ovs = []
    plans = {}
    _t0 = _t.time()
    for cols, meta in collect_anchor_groups_device(
            mzs, dev_table, rids, store.lens, hom_cov):
        _t1 = _t.time()
        dcc = DeviceChunkChains(cols, meta, store.lens, store.lens, cp)
        _t2 = _t.time()
        regs = regions_from_device_chains(dcc, store.lens, store.lens,
                                          cfg.max_n_chain)
        # window planning: ONE vectorized host pass over the whole
        # chunk (plan_windows_many), then ONE batched device
        # searchsorted for t_ws
        from hifiasm_tpu.ec.window_align import plan_windows_many
        chunk_plans = plan_windows_many(regs, cfg.ec_window,
                                        cfg.max_ov_diff_ec)
        pls, ws_cat, ci_cat = [], [], []
        for rr, ov in regs:
            pl = chunk_plans[rr]
            pls.append((rr, ov, pl))
            if len(pl["ws"]):
                ws_cat.append(pl["ws"])
                ci_cat.append(ov.hit_ref[pl["ov_idx"]])
        if ws_cat:
            t_all = dcc.tws_for_windows(
                np.concatenate(ci_cat), np.concatenate(ws_cat))
        o = 0
        for rr, ov, pl in pls:
            nw = len(pl["ws"])
            pl["t_ws"] = t_all[o:o + nw] if nw else np.zeros(0, np.int64)
            o += nw
            plans[rr] = pl
            read_ovs.append((rr, ov))
        log("chain_device",
            f"chunk: anchors {_t1 - _t0:.1f}s chain {_t2 - _t1:.1f}s "
            f"plan {_t.time() - _t2:.1f}s ({len(meta['reads'])} reads)")
        _t0 = _t.time()
    return read_ovs, plans


def ec_round(store: ReadStore, cfg: HifiasmConfig, ft: Optional[FilterTable],
             round_idx: int, collect=None) -> Tuple[int, int, int]:
    """One correction round; returns (hom_cov, het_cov, n_corrected).

    ``collect``: optional (paf, rev_paf) PafStore pair.  When given, the
    round's per-overlap results are ALSO pushed as final overlap records
    — the reference's architecture, where ``cal_ec_r`` stores the
    round's overlaps in ``R_INF.paf``/``reverse_paf`` and the "final
    overlap round" (``cal_ov_r``, ecovlp.cpp:6385) does no realignment
    at all (its worker is disabled; it only refreshes stats).  Record
    coordinates are therefore in the round's start-of-round frame; the
    caller clamps them to the corrected lengths afterwards
    (~``flip_paf_rc`` clamping, ecovlp.cpp:3846)."""
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    # index dump/resume (~write_pt_index/load_pt_index, htab.cpp:1367,
    # saved under --dbg-gfa like the reference's HA_F_VERBOSE_GFA load)
    pt_fp = (f"pt:{store.n_reads}:{store.total_bases}:{cfg.k}:{cfg.w}:"
             f"r{round_idx}")
    loaded = None
    if cfg.dbg_gfa and not cfg.ignore_bin and cfg.output_prefix:
        from hifiasm_tpu.io.binfiles import load_pt_index
        loaded = load_pt_index(cfg.output_prefix, pt_fp)
    use_dev = _use_device(cfg, store.total_bases)
    mesh = _active_mesh(cfg) if use_dev else None
    dev_tbl = None
    if loaded is not None:
        _ft, pt, mzs, peak_hom, peak_het = loaded
    else:
        if use_dev and mesh is None and cfg.device_frontend:
            # HBM-resident front end: build the table on HOST (native
            # sketch + numpy lexsort: ~10x faster than the device sort
            # build through this environment) and UPLOAD it; anchors
            # are gathered on device from the HBM copy (byte-identical,
            # tests/test_pos_table_jax.py)
            from hifiasm_tpu.index.pos_table_jax import (
                device_table_from_host,
            )
            pt, peak_hom, peak_het, mzs = build_position_table(
                codes, cfg.k, cfg.w, ft=ft,
                min_hist_cnt=cfg.min_hist_kmer_cnt,
                keep_max=min(cfg.max_kmer_cnt, 4095))
            try:
                dev_tbl = device_table_from_host(pt)
            except Exception as ex:      # device OOM etc: host fallback
                log("ec_round", f"device frontend unavailable ({ex!r}); "
                    "falling back to the host index")
                dev_tbl = None
        if dev_tbl is None:
            pt, peak_hom, peak_het, mzs = build_position_table(
                codes, cfg.k, cfg.w, ft=ft,
                min_hist_cnt=cfg.min_hist_kmer_cnt,
                keep_max=min(cfg.max_kmer_cnt, 4095))
        if cfg.dbg_gfa and cfg.output_prefix:
            from hifiasm_tpu.io.binfiles import save_pt_index
            save_pt_index(cfg.output_prefix, ft, pt, mzs, pt_fp,
                          peak_hom, peak_het)
    hom_cov = peak_hom if peak_hom > 0 else cfg.hom_cov
    new_seqs = {}
    n_corr = 0
    if use_dev:
        import contextlib

        from hifiasm_tpu.ec.consensus import consensus_apply
        from hifiasm_tpu.ec.device_ec import DeviceEC

        prof = contextlib.nullcontext()
        if cfg.profile_dir:
            # device-phase trace (--profile; open with xprof): the
            # JAX-profiler integration of SURVEY §5's tracing subsystem
            import jax
            prof = jax.profiler.trace(cfg.profile_dir)
        from hifiasm_tpu.ec.consensus import _ambiguity_clusters
        from hifiasm_tpu.ec.window_align import align_overlaps

        dev = DeviceEC(store, wl=cfg.ec_window, e_rate=cfg.max_ov_diff_ec,
                       mesh=mesh)
        plans = None
        if dev_tbl is not None and mesh is None:
            read_ovs, plans = _chain_all_reads_device(
                store, mzs, dev_tbl, cfg, hom_cov)
        else:
            read_ovs = _chain_all_reads(store, codes, mzs, pt, cfg,
                                        hom_cov, mesh=mesh,
                                        dev_table=dev_tbl)
        ov_of = dict(read_ovs)
        get_target = _TargetCache(store)
        n_routed = 0
        with prof:
            outs, cns_in = dev.process(read_ovs, plans=plans)
        for rid, eco in outs.items():
            if collect is not None:
                _push_records_stats(
                    collect[0], collect[1], rid, store.lens, eco.ov,
                    (eco.win_tot > 0) & (eco.win_ok == eco.win_tot),
                    eco.err, eco.ts, eco.te, eco.is_match,
                    cfg.max_ov_diff_final)
            if rid not in cns_in:
                continue
            # per-column decisions were made ON DEVICE (packed planes;
            # device_ec._decide_planes == consensus_decide bit for bit)
            subw, ins_p, ib_, il, amb = cns_in[rid]
            q = store.get_codes(rid)
            # votes can't carry the cluster strings: reads whose vote
            # matrix shows an ambiguity cluster re-run on the host path
            # (traceback strings -> DAG plurality, ec/consensus.py)
            if _ambiguity_clusters(amb):
                ov_full = ov_of[rid]
                if len(ov_full) and len(ov_full.hit_self) == 0 and \
                        ov_full.n_hits.max(initial=0) > 0:
                    # device-resident hits: re-derive this read's
                    # overlaps on the host (bit-identical chain DP)
                    from hifiasm_tpu.overlap.anchors import (
                        chain_many, collect_anchors_many,
                    )
                    an1 = collect_anchors_many(mzs, pt, [rid],
                                               store.lens, hom_cov)[0]
                    ov_full = chain_many(
                        [(rid, an1, len(q))], store.lens,
                        ChainParams.for_k(cfg.k),
                        max_n_chain=cfg.max_n_chain)[0]
                tbs = align_overlaps(q, ov_full, get_target,
                                     wl=cfg.ec_window,
                                     e_rate=cfg.max_ov_diff_ec)
                ph = phase_overlaps(q, ov_full, tbs)
                cns = windowed_consensus(q, ov_full, tbs, ph)
                n_routed += 1
            else:
                cns = consensus_apply(q, subw != 15, ins_p,
                                      subw.astype(np.int64), ib_,
                                      il.astype(np.int64) + 1)
            if cns.n_corrected:
                new_seqs[rid] = cns.seq
                n_corr += cns.n_corrected
                if collect is not None:
                    collect[2][rid] = cns.edits
        if n_routed:
            log("ec_round",
                f"routed {n_routed} ambiguous reads to the host DAG path")
    elif _use_fused(cfg):
        from hifiasm_tpu.ec.window_align import align_overlaps
        from hifiasm_tpu.overlap.anchors import regions_from_flat

        get_target = _TargetCache(store)
        for rids, cols, res in _ec_pass_fused(
                store, codes, mzs, pt, cfg, hom_cov, cfg.max_ov_diff_ec,
                do_consensus=True):
            if collect is not None:
                wt, wo = res["win_tot"], res["win_ok"]
                _push_records_flat(
                    collect[0], collect[1], rids, store.lens, cols,
                    (wt > 0) & (wo == wt), res["err"], res["ts"],
                    res["te"], res["is_match"], cfg.max_ov_diff_final)
            for j, rid in enumerate(rids):
                seq = res["seqs"][j]
                if seq is False:
                    # rare consensus-buffer overflow: per-read fallback
                    q = codes[rid]
                    ov = regions_from_flat(cols, j, rid)
                    tbs = align_overlaps(q, ov, get_target,
                                         wl=cfg.ec_window,
                                         e_rate=cfg.max_ov_diff_ec)
                    ph = phase_overlaps(q, ov, tbs)
                    cns = windowed_consensus(q, ov, tbs, ph)
                    if cns.n_corrected:
                        new_seqs[rid] = cns.seq
                        n_corr += cns.n_corrected
                        if collect is not None:
                            collect[2][rid] = cns.edits
                elif seq is not None:
                    new_seqs[rid] = seq
                    n_corr += int(res["n_edits"][j])
                    if collect is not None:
                        collect[2][rid] = res["edits"][j]
    else:
        from hifiasm_tpu.native import ec_reads_native

        get_target = _TargetCache(store)
        for batch in _iter_overlap_batches(
                store, codes, mzs, pt, cfg, hom_cov, cfg.max_ov_diff_ec,
                get_target):
            res = ec_reads_native([(q, tbs) for _, q, _, tbs in batch]) \
                if cfg.align_engine != "numpy" else None
            for j, (rid, q, ov, tbs) in enumerate(batch):
                nat = res[j] if res is not None else None
                if nat is not None:
                    is_match, _, seq, n_edits = nat[:4]
                    if n_edits:
                        new_seqs[rid] = seq
                        n_corr += n_edits
                        if collect is not None:
                            collect[2][rid] = nat[4]
                else:
                    ph = phase_overlaps(q, ov, tbs)
                    is_match = ph.is_match
                    cns = windowed_consensus(q, ov, tbs, ph)
                    if cns.n_corrected:
                        new_seqs[rid] = cns.seq
                        n_corr += cns.n_corrected
                        if collect is not None:
                            collect[2][rid] = cns.edits
                if collect is not None:
                    _push_records(collect[0], collect[1], rid, len(q),
                                  store.lens, ov, tbs, is_match,
                                  cfg.max_ov_diff_final)
    # barrier: write corrections back only after every read is processed
    for rid, seq in new_seqs.items():
        store.set_codes(rid, seq)
    log("ec_round", f"round {round_idx}: corrected {n_corr} bases in "
        f"{len(new_seqs)} reads")
    return hom_cov, peak_het, n_corr


def _push_records(paf: PafStore, rev_paf: PafStore, rid: int, qlen: int,
                  tlens: np.ndarray, ov: OverlapRegions,
                  tbs: OverlapTracebacks, is_match: np.ndarray,
                  e_rate: float) -> None:
    """Store cis/trans ma_hit records (~push_ne_ovlp, ecovlp.cpp:2585)."""
    _push_records_stats(paf, rev_paf, rid, tlens, ov, tbs.fully_aligned(),
                        tbs.err, tbs.ts, tbs.te, is_match, e_rate)


def _push_records_stats(paf: PafStore, rev_paf: PafStore, rid: int,
                        tlens: np.ndarray, ov: OverlapRegions,
                        full: np.ndarray, err: np.ndarray, ts_q: np.ndarray,
                        te_q: np.ndarray, is_match: np.ndarray,
                        e_rate: float) -> None:
    for flag, dst in ((1, paf), (2, rev_paf)):
        sel = np.flatnonzero(full & (is_match == flag))
        if len(sel) == 0:
            continue
        qs = ov.x_s[sel]
        qe = ov.x_e[sel] + 1
        tn = ov.y_id[sel]
        rev = ov.rev[sel]
        tl = tlens[tn].astype(np.int64)
        ys = ts_q[sel]
        ye = te_q[sel]                       # inclusive, query frame
        ts = np.where(rev == 0, ys, tl - 1 - ye)
        te = np.where(rev == 0, ye + 1, tl - ys)
        bl = qe - qs
        ml = np.maximum(bl - err[sel], 0)
        el = (err[sel] <= bl * (e_rate * 0.5)).astype(np.uint8)
        # long-indel flag: target extent differs a lot from query extent
        dlt = np.abs((ye - ys + 1) - bl)
        no_l_indel = (dlt < LONG_INDEL_WIN_DIFF).astype(np.uint8)
        dst[rid] = PafRecords.from_columns(
            qs=qs, qe=qe, tn=tn, ts=ts, te=te, rev=rev, ml=ml, bl=bl,
            el=el, no_l_indel=no_l_indel)


def _push_records_flat(paf: PafStore, rev_paf: PafStore, rids,
                       tlens: np.ndarray, cols: dict, full: np.ndarray,
                       err: np.ndarray, ts_q: np.ndarray,
                       te_q: np.ndarray, is_match: np.ndarray,
                       e_rate: float) -> None:
    """Batch-vectorized ~push_ne_ovlp over flat overlap columns (same
    record math as _push_records_stats, computed once for every overlap
    of the batch)."""
    r_ov_off = cols["r_ov_off"]
    qs_a = cols["x_s"]
    qe_a = cols["x_e"] + 1
    tn_a = cols["y_id"]
    rev_a = cols["rev"]
    tl = tlens[tn_a].astype(np.int64)
    ts_a = np.where(rev_a == 0, ts_q, tl - 1 - te_q)
    te_a = np.where(rev_a == 0, te_q + 1, tl - ts_q)
    bl = qe_a - qs_a
    ml = np.maximum(bl - err, 0)
    el = (err <= bl * (e_rate * 0.5)).astype(np.uint8)
    dlt = np.abs((te_q - ts_q + 1) - bl)
    no_l = (dlt < LONG_INDEL_WIN_DIFF).astype(np.uint8)
    for flag, dst in ((1, paf), (2, rev_paf)):
        selm = full & (is_match == flag)
        for j, rid in enumerate(rids):
            o0, o1 = int(r_ov_off[j]), int(r_ov_off[j + 1])
            idx = o0 + np.flatnonzero(selm[o0:o1])
            if len(idx) == 0:
                continue
            dst[rid] = PafRecords.from_columns(
                qs=qs_a[idx], qe=qe_a[idx], tn=tn_a[idx], ts=ts_a[idx],
                te=te_a[idx], rev=rev_a[idx], ml=ml[idx], bl=bl[idx],
                el=el[idx], no_l_indel=no_l[idx])


def final_overlap_pass(store: ReadStore, cfg: HifiasmConfig,
                       ft: Optional[FilterTable]) -> ECResult:
    """~cal_ov_r (ecovlp.cpp:6385): precise overlap records, no correction."""
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    pt, peak_hom, peak_het, mzs = build_position_table(
        codes, cfg.k, cfg.w, ft=ft, min_hist_cnt=cfg.min_hist_kmer_cnt,
        keep_max=min(cfg.max_kmer_cnt, 4095))
    hom_cov = peak_hom if peak_hom > 0 else cfg.hom_cov
    paf = PafStore(store.n_reads)
    rev_paf = PafStore(store.n_reads)
    if _use_device(cfg, store.total_bases):
        from hifiasm_tpu.ec.device_ec import DeviceEC
        mesh = _active_mesh(cfg)
        dev = DeviceEC(store, wl=cfg.ec_window,
                       e_rate=cfg.max_ov_diff_final, mesh=mesh)
        read_ovs = _chain_all_reads(store, codes, mzs, pt, cfg, hom_cov,
                                    mesh=mesh)
        outs, _ = dev.process(read_ovs)
        for rid, eco in outs.items():
            _push_records_stats(
                paf, rev_paf, rid, store.lens, eco.ov,
                (eco.win_tot > 0) & (eco.win_ok == eco.win_tot),
                eco.err, eco.ts, eco.te, eco.is_match,
                cfg.max_ov_diff_final)
    elif _use_fused(cfg):
        for rids, cols, res in _ec_pass_fused(
                store, codes, mzs, pt, cfg, hom_cov,
                cfg.max_ov_diff_final, do_consensus=False):
            wt, wo = res["win_tot"], res["win_ok"]
            _push_records_flat(
                paf, rev_paf, rids, store.lens, cols,
                (wt > 0) & (wo == wt), res["err"], res["ts"], res["te"],
                res["is_match"], cfg.max_ov_diff_final)
    else:
        from hifiasm_tpu.native import ec_reads_native

        get_target = _TargetCache(store)
        for batch in _iter_overlap_batches(
                store, codes, mzs, pt, cfg, hom_cov, cfg.max_ov_diff_final,
                get_target):
            res = ec_reads_native([(q, tbs) for _, q, _, tbs in batch],
                                  do_consensus=False) \
                if cfg.align_engine != "numpy" else None
            for j, (rid, q, ov, tbs) in enumerate(batch):
                nat = res[j] if res is not None else None
                if nat is not None:
                    is_match = nat[0]
                else:
                    is_match = phase_overlaps(q, ov, tbs).is_match
                _push_records(paf, rev_paf, rid, len(q), store.lens, ov,
                              tbs, is_match, cfg.max_ov_diff_final)
    log("final_overlap_pass",
        f"{paf.total} cis + {rev_paf.total} trans overlaps")
    return ECResult(paf, rev_paf, hom_cov, peak_het)


def het_cnt_pass(store: ReadStore, cfg: HifiasmConfig) -> np.ndarray:
    """--dbg-het-cnt: per-read confirmed het-SNP counts over the
    corrected reads (~get_het_cnt on the last EC round,
    Assembly.cpp:584,1014; dumped by print_het_cnt_log :968).  Runs the
    host phase path regardless of engine — it is a debug surface, and
    the engines are record-identical."""
    from hifiasm_tpu.ec.window_align import align_overlaps

    codes = [store.get_codes(i) for i in range(store.n_reads)]
    pt, peak_hom, _, mzs = build_position_table(
        codes, cfg.k, cfg.w, min_hist_cnt=cfg.min_hist_kmer_cnt,
        keep_max=min(cfg.max_kmer_cnt, 4095))
    hom_cov = peak_hom if peak_hom > 0 else cfg.hom_cov
    out = np.zeros(store.n_reads, np.int64)
    get_target = _TargetCache(store)
    for batch in _iter_overlap_batches(
            store, codes, mzs, pt, cfg, hom_cov, cfg.max_ov_diff_ec,
            get_target):
        for rid, q, ov, tbs in batch:
            out[rid] = len(phase_overlaps(q, ov, tbs).het_sites)
    log("het_cnt_pass", f"het counts for {store.n_reads} reads")
    return out


def _edit_cum_table(edits_map: dict, n_reads: int):
    """Concatenate per-read (pos, delta) edit traces into one global
    key-sorted table: key = rid << 34 | pos, value = CUMULATIVE delta at
    original coordinates >= pos.  A (rid, 0, 0) sentinel per read makes
    every lookup land inside its own read's slice."""
    keys = [np.asarray([], np.int64)]
    cums = [np.asarray([], np.int64)]
    for rid in range(n_reads):
        ed = edits_map.get(rid)
        pos = ed[0] if ed is not None else np.zeros(0, np.int64)
        delta = ed[1] if ed is not None else np.zeros(0, np.int64)
        base = np.int64(rid) << 34
        keys.append(base + np.concatenate([[0], pos]))
        cums.append(np.concatenate([[0], np.cumsum(delta)]))
    return np.concatenate(keys), np.concatenate(cums)


def _remap_and_clamp(paf: PafStore, lens: np.ndarray,
                     ed_keys: np.ndarray, ed_cums: np.ndarray) -> None:
    """Shift record coordinates through the correction edit traces (the
    reference's scc traces, consumed by ``adjust_exact_match``
    ecovlp.cpp:3521) and clamp into the corrected read lengths
    (~``flip_paf_rc`` bounding, ecovlp.cpp:3846).  Query coordinates
    remap through the query read's trace, target coordinates (stored in
    the target's forward frame) through the target read's trace."""
    for rid, r in enumerate(paf.recs):
        if not len(r):
            continue
        qbase = np.int64(rid) << 34
        tn = r.tn.astype(np.int64)
        tbase = tn << 34

        def shift(coord, base):
            idx = np.searchsorted(ed_keys, base + coord, side="right") - 1
            return coord + ed_cums[idx]

        ql = int(lens[rid])
        tl = lens[tn]
        qs = np.clip(shift(r.qs, qbase), 0, ql)
        qe = np.clip(shift(r.qe, qbase), 0, ql)
        ts = np.clip(shift(r.ts, tbase), 0, tl)
        te = np.clip(shift(r.te, tbase), 0, tl)
        keep = (qe > qs) & (te > ts)
        r.qs, r.qe, r.ts, r.te = qs, qe, ts, te
        r.bl = qe - qs
        r.ml = np.minimum(r.ml, r.bl)
        if not keep.all():
            paf.recs[rid] = r.take(np.flatnonzero(keep))


def run_ec(store: ReadStore, cfg: HifiasmConfig,
           ft: Optional[FilterTable] = None) -> ECResult:
    """Full EC: n_rounds of correction, with final overlap records taken
    from the LAST round (the reference's flow: ``cal_ec_r`` stores each
    round's overlaps and ``cal_ov_r`` never realigns — ecovlp.cpp:6268,
    :6385).  ``cfg.final_realign`` forces the legacy full realign pass
    against the corrected reads instead."""
    total_corr = 0
    collected = None
    for r in range(cfg.n_rounds_ec):
        collect = None
        if not cfg.final_realign:
            # fresh stores every round: the reference overwrites
            # R_INF.paf per round, keeping only the last round's records
            collect = (PafStore(store.n_reads), PafStore(store.n_reads),
                       {})
        hom_cov, het_cov, n_corr = ec_round(store, cfg, ft, r,
                                            collect=collect)
        cfg.update_cov(hom_cov, het_cov)
        total_corr += n_corr
        if collect is not None:
            collected = (collect, hom_cov, het_cov)
        if n_corr == 0:
            break
    if collected is None:
        res = final_overlap_pass(store, cfg, ft)
    else:
        (paf, rev_paf, edits_map), hom_cov, het_cov = collected
        ed_keys, ed_cums = _edit_cum_table(edits_map, store.n_reads)
        _remap_and_clamp(paf, store.lens, ed_keys, ed_cums)
        _remap_and_clamp(rev_paf, store.lens, ed_keys, ed_cums)
        log("final_overlap_pass",
            f"{paf.total} cis + {rev_paf.total} trans overlaps "
            f"(from the last EC round)")
        res = ECResult(paf, rev_paf, hom_cov, het_cov)
    res.n_corrected = total_corr
    return res
