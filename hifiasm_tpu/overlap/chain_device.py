"""Device-resident anchor chaining for the EC frontend.

The host pipeline moves every anchor to the CPU for chain DP — ~20 B per
anchor through a ~20 MB/s link at 100 Mb+ scale.  Here anchors stay in
HBM (index/pos_table_jax.collect_anchor_groups_device), the chain DP and
traceback run on device with the scalar engine's exact semantics
(ops/chain_jax.chain_exact_batch + extract_chains_batch), and only
per-GROUP and per-CHAIN metadata (starts, keys, scores, endpoint
coordinates — a few bytes per overlap candidate) ever reach the host,
where the existing region assembly / quota / dedup code runs unchanged.
Window planning's one per-hit need — the nearest chain hit at-or-after
each window start (t_ws) — is answered by a device binary search over
chain-compacted anchor columns (``tws_for_windows``).

Chain results are bit-identical with overlap/anchors.chain_many on the
native host kernel (tests/test_chain_device.py); regions carry empty
hit arrays plus a ``hit_ref`` handle into the device chains.

Reference scope: the per-read chaining of ha_get_candidates
(anchor.cpp:2551) + lchain_qdp_mcopy_fast (Hash_Table.cpp:2097), the
multi-chip/tpu re-design of SURVEY §5.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from hifiasm_tpu.ops.chain import ChainParams
from hifiasm_tpu.ops.chain_jax import NEG_INF32, chain_quick_batch
from hifiasm_tpu.utils.devsync import prefetch

_BUCKETS = (32, 128, 512, 2048)


@functools.partial(jax.jit, static_argnums=(0,))
def _slice_rows(Gp: int, *arrs):
    """Flatten [C, slab(, m)] device stacks and keep the first Gp rows —
    the d2h fetch then moves only real groups, not the pow2 padding."""
    return tuple(a.reshape((-1,) + a.shape[2:])[:Gp] for a in arrs)


def _bucket_n(size: int) -> int:
    for b in _BUCKETS:
        if size <= b:
            return b
    return _BUCKETS[-1]


@functools.partial(jax.jit, static_argnames=("Nb",))
def _gather_groups(so, to, span, w, g_start_d, gids, sizes, Nb: int):
    """[P] anchor columns -> [Gb, Nb] padded group buckets."""
    base = jnp.take(g_start_d, gids)                     # [Gb]
    idx = base[:, None] + jnp.arange(Nb, dtype=jnp.int32)[None, :]
    idxc = jnp.clip(idx, 0, so.shape[0] - 1)
    m = jnp.arange(Nb, dtype=jnp.int32)[None, :] < sizes[:, None]
    z = jnp.int32(0)
    return (jnp.where(m, jnp.take(so, idxc), z),
            jnp.where(m, jnp.take(to, idxc), z),
            jnp.where(m, jnp.take(span, idxc), z),
            jnp.where(m, jnp.take(w, idxc), z))


@functools.partial(jax.jit, static_argnames=(
    "Nb", "m", "quick_check", "pg_q16", "pskip_q16", "bw_q16",
    "invbw_q4", "mcopy_khit_cut", "mcopy_q16"))
def _quick_slab_scan(so, to, span, w, g_start_d, gids, sizes, xlb, ylb,
                     Nb: int, m: int, quick_check: bool, pg_q16: int,
                     pskip_q16: int, bw_q16: int, invbw_q4: int,
                     mcopy_khit_cut: int, mcopy_q16: int):
    """ONE launch per bucket: lax.scan over [C, Gb] slab stacks running
    gather -> QUICK chain pass -> closed-form extraction.

    Structural lessons baked in (measured on the chip):
    - dispatching the kernels separately per slab paid ~1 s of link RPC
      per launch (50 launches = ~50 s of the 2 Mb chain stage); the
      scan keeps the slab loop on device;
    - the exact full DP costs O(N^2) work per group plus a [B, N+1]
      scatter per anchor step, while ~99.9% of HiFi EC groups complete
      in the O(N) quick pre-pass.  The device runs ONLY the quick pass
      and the caller routes non-quick groups to the bit-identical host
      scalar DP, exactly the reference's own shortcut structure
      (quick_ck_lchain, Hash_Table.cpp:2007);
    - for a QUICK group the optimum is by definition the consecutive
      chain over ALL its anchors (quick_complete + last-index max), so
      traceback, mcopy peeling, and chain compaction all have
      closed forms: label = in-group, cnt = 1, score = fq[n-1],
      endpoints = anchors 0 and n-1, compacted hits = the gathered
      rows themselves.  The general extract_chains_batch machinery
      (pointer-chase while_loop + peel loop + 6-key sort) only ever
      produced these same values here — non-quick outputs are
      discarded — and cost the bulk of the 120 Mb chain stage wall.
    Returns per slab: (quick, so_b, to_b, cnt, sc, nh, xs, xe, ts, te)."""
    NEG = jnp.int32(NEG_INF32)

    def body(c, xs):
        gi, sz, xl, yl = xs
        so_b, to_b, sp_b, w_b = _gather_groups(so, to, span, w,
                                               g_start_d, gi, sz, Nb)
        fq, pre_q, quick = chain_quick_batch(
            so_b, to_b, sp_b, w_b, sz, xl, yl, quick_check=quick_check,
            pg_q16=pg_q16, pskip_q16=pskip_q16, bw_q16=bw_q16,
            invbw_q4=invbw_q4)
        B = so_b.shape[0]
        rows = jnp.arange(B)
        lastc = jnp.clip(sz - 1, 0, Nb - 1)
        z32 = jnp.zeros((B, m), jnp.int32)
        cnt = jnp.where(quick, 1, 0).astype(jnp.int32)
        sc = jnp.full((B, m), NEG, jnp.int32).at[:, 0].set(
            jnp.where(quick, fq[rows, lastc], NEG))
        nh = z32.at[:, 0].set(jnp.where(quick, sz, 0))
        exs = z32.at[:, 0].set(so_b[:, 0])
        exe = z32.at[:, 0].set(so_b[rows, lastc])
        ets = z32.at[:, 0].set(to_b[:, 0])
        ete = z32.at[:, 0].set(to_b[rows, lastc])
        return c, (quick, so_b, to_b, cnt, sc, nh, exs, exe, ets, ete)

    _, outs = lax.scan(body, 0, (gids, sizes, xlb, ylb))
    return outs


@functools.partial(jax.jit, static_argnames=())
def _tws_kernel(so_c, to_c, lo, hi, ws):
    """Per-window nearest chain hit at-or-after ws within [lo, hi):
    j = min(first so_c[j] >= ws, hi-1); t_ws = to_c[j] + ws - so_c[j].
    Mirrors ec/window_align.plan_read_windows' searchsorted."""
    n_steps = int(np.ceil(np.log2(so_c.shape[0] + 1))) + 1
    l = lo
    h = hi
    for _ in range(n_steps):
        active = l < h
        mid = (l + h) >> 1
        midc = jnp.clip(mid, 0, so_c.shape[0] - 1)
        less = so_c[midc] < ws
        l = jnp.where(active & less, mid + 1, l)
        h = jnp.where(active & ~less, mid, h)
    j = jnp.clip(jnp.minimum(l, hi - 1), 0, so_c.shape[0] - 1)
    return to_c[j] + (ws - so_c[j])


class DeviceChunkChains:
    """Chained anchors of one collect chunk, resident on device."""

    def __init__(self, cols, meta, rlens: np.ndarray, tlens: np.ndarray,
                 params: ChainParams):
        self.meta = meta
        self.params = params
        # per-chain host metadata, in (group, copy) order
        self.g_of: np.ndarray = np.zeros(0, np.int64)
        self.score: np.ndarray = np.zeros(0, np.int64)
        self.n_hits: np.ndarray = np.zeros(0, np.int64)
        self.xs = self.xe = self.ts = self.te = np.zeros(0, np.int64)
        # device chain-compacted anchors + host offsets per chain
        self._parts: List[Tuple] = []      # (so_c, to_c) per bucket
        self.chain_lo = np.zeros(0, np.int64)   # into virtual concat
        self._part_of: np.ndarray = np.zeros(0, np.int64)
        self._part_base: List[int] = []
        if cols is None or meta["n_keep"] == 0 or not len(meta["g_start"]):
            return
        sizes_all = meta["g_end"] - meta["g_start"]
        ng = len(sizes_all)
        m = params.mcopy_num
        # pow2-padded gather source: a raw per-chunk group count keys a
        # fresh compile of every slab scan PER CHUNK (pad entries are
        # never indexed — gids only reference real groups)
        ngp = 1024
        while ngp < ng:
            ngp *= 2
        gs_pad = np.zeros(ngp, np.int32)
        gs_pad[:ng] = meta["g_start"].astype(np.int32)
        g_start_d = jnp.asarray(gs_pad)
        # assign groups to pow2 size buckets; groups longer than the top
        # bucket (rare, heavy repeats) route through the host scalar
        # kernel — bit-identical, so the split is invisible downstream
        per_bucket: Dict[int, List[int]] = {}
        self._host_groups: List[int] = []
        for g in range(ng):
            if sizes_all[g] > _BUCKETS[-1]:
                self._host_groups.append(g)
            else:
                per_bucket.setdefault(_bucket_n(int(sizes_all[g])),
                                      []).append(g)
        import time as _time
        _t0 = _time.time()
        chain_rows = []          # (g, score, nh, xs, xe, ts, te, part, lo)
        # one FIXED slab shape per bucket size: every compiled program is
        # reused forever (each new shape costs minutes of TPU compile);
        # all slabs of a bucket stack into [C, slab] and run as ONE
        # _chain_slab_scan launch (C pow2-bucketed)
        slab_of = {32: 8192, 128: 4096, 512: 1024, 2048: 256}
        pend = []
        for Nb, glist in sorted(per_bucket.items()):
            slab = slab_of[Nb]
            gids = np.asarray(glist, np.int64)
            n_slabs = max(-(-len(gids) // slab), 1)
            C = 1
            while C < n_slabs:
                C *= 2
            gpad = np.zeros(C * slab, np.int64)
            gpad[:len(gids)] = gids
            sz = np.zeros(C * slab, np.int32)
            sz[:len(gids)] = sizes_all[gids]
            xlb = np.zeros(C * slab, np.int32)
            ylb = np.ones(C * slab, np.int32)
            xlb[:len(gids)] = rlens[meta["g_read"][gids]]
            ylb[:len(gids)] = tlens[meta["g_tid"][gids]]
            quick, so_c, to_c, cnt, sc, nh, exs, exe, ets, ete = \
                _quick_slab_scan(
                    cols["qpos"], cols["toff"], cols["span"], cols["w"],
                    g_start_d,
                    jnp.asarray(gpad.astype(np.int32).reshape(C, slab)),
                    jnp.asarray(sz.reshape(C, slab)),
                    jnp.asarray(xlb.reshape(C, slab)),
                    jnp.asarray(ylb.reshape(C, slab)),
                    Nb, m, params.quick_check, params.pg_q16,
                    params.pskip_q16, params.bw_q16, params.invbw_q4,
                    params.mcopy_khit_cut, params.mcopy_q16)
            part = len(self._parts)
            self._parts.append((so_c.reshape(-1), to_c.reshape(-1)))
            # slice the per-group outputs to the REAL row count on
            # device before fetching: the [C, slab] stacks carry up to
            # 2x pow2 padding, and the d2h fetch is the chain stage's
            # wall through the tunnel (Gp pow2-padded so the slicer's
            # compile set stays bounded)
            G = len(gids)
            Gp = min(1 << max(G - 1, 0).bit_length(), C * slab)
            pend.append((Nb, C, slab, gids, part, Gp,
                         _slice_rows(Gp, quick, cnt, sc, nh, exs, exe,
                                     ets, ete)))
        _t_dispatch = _time.time() - _t0
        prefetch(x for _, _, _, _, _, _, devs in pend for x in devs)
        _t_pref = _time.time() - _t0 - _t_dispatch
        for Nb, C, slab, gids, part, Gp, devs in pend:
            G = len(gids)
            quick_h = np.asarray(devs[0])[:G]
            cnt_h = np.asarray(devs[1])[:G]
            sc_h, nh_h, xs_h, xe_h, ts_h, te_h = \
                (np.asarray(x)[:G] for x in devs[2:])
            # non-quick groups (measured ~0.1%): host scalar DP,
            # bit-identical with the device full-DP engine
            self._host_groups.extend(int(g) for g in gids[~quick_h])
            # chain-compacted offsets: row-major (row, k) prefix of nh
            nh_pad = np.zeros((C * slab, m), np.int64)
            nh_pad[:G] = nh_h
            row_off = np.arange(C * slab, dtype=np.int64) * Nb
            k_off = np.concatenate(
                [np.zeros((C * slab, 1), np.int64),
                 np.cumsum(nh_pad, axis=1)[:, :-1]], axis=1)
            lo_all = (row_off[:, None] + k_off)[:G]
            kmask = (np.arange(m)[None, :] < cnt_h[:, None]) & \
                quick_h[:, None]
            chain_rows.append((
                np.repeat(gids, np.where(quick_h, cnt_h, 0)),
                sc_h[kmask], nh_h[kmask],
                xs_h[kmask], xe_h[kmask], ts_h[kmask], te_h[kmask],
                np.full(int(kmask.sum()), part, np.int64),
                lo_all[kmask]))
        # host fallback for oversize groups (rare; > top bucket)
        if self._host_groups:
            from hifiasm_tpu.ops.chain import chain_dp_group
            qpos_h = to_h = sp_h = w_h = None
            for g in self._host_groups:
                if qpos_h is None:
                    qpos_h = np.asarray(cols["qpos"])
                    to_h = np.asarray(cols["toff"])
                    sp_h = np.asarray(cols["span"])
                    w_h = np.asarray(cols["w"])
                s, e = int(meta["g_start"][g]), int(meta["g_end"][g])
                chains = chain_dp_group(
                    qpos_h[s:e].astype(np.int64),
                    to_h[s:e].astype(np.int64),
                    sp_h[s:e].astype(np.int64),
                    w_h[s:e].astype(np.int64),
                    int(rlens[meta["g_read"][g]]),
                    int(tlens[meta["g_tid"][g]]), params)
                self._host_hits = getattr(self, "_host_hits", {})
                self._host_keys = getattr(self, "_host_keys", [])
                for k, (sck, idx) in enumerate(chains):
                    self._host_hits[(g, k)] = (
                        qpos_h[s:e][idx].astype(np.int64),
                        to_h[s:e][idx].astype(np.int64))
                    ref = len(self._host_keys)
                    self._host_keys.append((g, k))
                    chain_rows.append((
                        np.array([g], np.int64),
                        np.array([int(sck)], np.int64),
                        np.array([len(idx)], np.int64),
                        np.array([int(qpos_h[s + idx[0]])], np.int64),
                        np.array([int(qpos_h[s + idx[-1]])], np.int64),
                        np.array([int(to_h[s + idx[0]])], np.int64),
                        np.array([int(to_h[s + idx[-1]])], np.int64),
                        np.array([-1], np.int64),
                        np.array([ref], np.int64)))
        from hifiasm_tpu.utils.logging import log as _log
        _log("chain_slabs",
             f"dispatch {_t_dispatch:.1f}s prefetch {_t_pref:.1f}s "
             f"fetch+host {_time.time() - _t0 - _t_dispatch - _t_pref:.1f}s "
             f"({ng} groups, {len(self._host_groups)} host-fallback)")
        # groups in ascending order, chains in copy order — the host
        # chain_many emits regions in exactly this order (stable sort
        # keeps the per-group copy order from each slab block)
        if chain_rows:
            cols9 = [np.concatenate([r[i] for r in chain_rows])
                     for i in range(9)]
            order = np.argsort(cols9[0], kind="stable")
            (self.g_of, self.score, self.n_hits, self.xs, self.xe,
             self.ts, self.te, self._part_of, self._lo) = \
                (c[order] for c in cols9)

    def tws_for_windows(self, chain_idx: np.ndarray, ws: np.ndarray
                        ) -> np.ndarray:
        """t_ws per window; chain_idx indexes this chunk's chain rows.
        All per-part searches dispatch async (pow2-padded query lengths
        bound the compile set) and sync in a second pass."""
        out = np.zeros(len(ws), np.int64)
        if len(ws) == 0:
            return out
        parts = self._part_of[chain_idx]
        pend = []
        for part in np.unique(parts):
            sel = np.flatnonzero(parts == part)
            ci = chain_idx[sel]
            if part < 0:                      # host-fallback groups
                for i, c in zip(sel, ci):
                    key = self._host_keys[int(self._lo[c])]
                    hs, ht = self._host_hits[key]
                    hi = min(int(np.searchsorted(hs, ws[i])), len(hs) - 1)
                    out[i] = ht[hi] + (ws[i] - hs[hi])
                continue
            so_c, to_c = self._parts[int(part)]
            n = len(sel)
            npad = 1024
            while npad < n:
                npad *= 2
            lo = np.zeros(npad, np.int32)
            hi = np.ones(npad, np.int32)
            wsq = np.zeros(npad, np.int32)
            lo[:n] = self._lo[ci]
            hi[:n] = lo[:n] + self.n_hits[ci].astype(np.int32)
            wsq[:n] = ws[sel]
            t = _tws_kernel(so_c, to_c, jnp.asarray(lo),
                            jnp.asarray(hi), jnp.asarray(wsq))
            pend.append((sel, n, t))
        prefetch(t for _, _, t in pend)
        for sel, n, t in pend:
            out[sel] = np.asarray(t)[:n].astype(np.int64)
        return out


def regions_from_device_chains(dcc: DeviceChunkChains, rlens: np.ndarray,
                               tlens: np.ndarray, max_n_chain: int = 100
                               ) -> List[Tuple[int, "OverlapRegions"]]:
    """Per-read OverlapRegions from device chain metadata — the same
    boundary extension + quota + dedup + order as the host chain_many
    (overlap/anchors._assemble_regions / _finish_regions), with hits
    left on device (regions carry hit_ref handles instead)."""
    from hifiasm_tpu.overlap.anchors import OverlapRegions, _finish_regions

    meta = dcc.meta
    out = []
    nch = len(dcc.g_of)
    if nch:
        gr = meta["g_read"][dcc.g_of]
        gt = meta["g_tid"][dcc.g_of]
        gv = meta["g_rev"][dcc.g_of]
        xs, xe = dcc.xs.copy(), dcc.xe.copy()
        ts, te = dcc.ts.copy(), dcc.te.copy()
        # extend to boundaries (push_ovlp_chain_qgen, Hash_Table.cpp:1752)
        shift = np.minimum(xs, ts)
        xs -= shift
        ts -= shift
        ext = np.minimum(rlens[gr] - xe - 1, tlens[gt] - te - 1)
        xe += ext
        te += ext
        bnd = np.flatnonzero(np.diff(gr)) + 1
        seg_s = np.concatenate([[0], bnd])
        seg_e = np.concatenate([bnd, [nch]])
        seg_of = {int(gr[s]): (s, e) for s, e in zip(seg_s, seg_e)}
    else:
        seg_of = {}
    for rr in meta["reads"]:
        ov = OverlapRegions(rr)
        if rr in seg_of:
            s, e = seg_of[rr]
            sel = np.arange(s, e)
            ov.y_id = gt[sel].astype(np.uint32)
            ov.rev = gv[sel].astype(np.uint8)
            ov.x_s, ov.x_e = xs[sel], xe[sel]
            ov.y_s, ov.y_e = ts[sel], te[sel]
            ov.score = dcc.score[sel]
            ov.n_hits = dcc.n_hits[sel]
            ov.hit_start = np.zeros(len(sel), np.int64)
            ov.hit_ref = sel
            ov = _finish_regions(ov, int(rlens[rr]), max_n_chain)
        out.append((rr, ov))
    return out
