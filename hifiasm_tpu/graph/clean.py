"""String-graph cleaning passes.

Re-expresses the cleaning loop of ``clean_graph``/``ul_clean_gfa``
(Overlaps.cpp:39332, gfa_ut.cpp:3027-3127) for the HiFi path: per round
(default 4) with an overlap drop-ratio schedule 0.2 -> 0.8: cut short tips
(<= max_ext reads, ~asg_arc_cut_tips gfa_ut.cpp:3057), drop relatively-weak
overlaps at branch vertices (~asg_arc_cut_length), and pop small bubbles
(~asg_bub_pop1_primary_trio, Overlaps.h:1064 — the trio/coverage-aware path
selection arrives with the purge/trio subsystems; here the kept path is the
highest-coverage one).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hifiasm_tpu.graph.sg import StringGraph
from hifiasm_tpu.utils.logging import log


def asg_cut_tips(g: StringGraph, max_ext: int,
                 protect: Optional[np.ndarray] = None) -> int:
    """Delete dead-end chains of <= max_ext reads. Returns #reads removed.

    ``protect``: boolean per-read mask (telomeric reads) that keeps the
    whole tip alive (~the uopt->te threading of gfa_ut.cpp:3059)."""
    n_removed = 0
    # vectorized tip-start detection: live vertices with no predecessors
    # (in-degree of v = live out-degree of v^1)
    u = g.arc_u().astype(np.int64)
    out_live = np.bincount(u[g.del_ == 0], minlength=2 * g.n_seq)
    live_v = np.repeat(g.seq_del == 0, 2)
    starts = np.flatnonzero(live_v &
                            (out_live[np.arange(2 * g.n_seq) ^ 1] == 0))
    for v0 in starts:
        v0 = int(v0)
        if g.seq_del[v0 >> 1]:
            continue              # removed earlier in this pass
        if len(g.arcs_of(v0 ^ 1)) != 0:
            continue
        # walk forward from the tip
        chain = [v0]
        v = v0
        ok_tip = False
        while len(chain) <= max_ext:
            ai = g.arcs_of(v)
            if len(ai) == 0:
                # isolated chain end; only cut if it merges nowhere (real tip
                # shorter than max_ext): treat as tip only when the chain
                # started mid-graph, keep isolated contigs alive
                ok_tip = False
                break
            if len(ai) > 1:
                ok_tip = True
                break
            w = int(g.v[ai[0]])
            if len(g.arcs_of(w ^ 1)) > 1:
                ok_tip = True  # merges into a through-path
                break
            chain.append(w)
            v = w
        if ok_tip and len(chain) <= max_ext:
            if protect is not None and any(protect[c >> 1] for c in chain):
                continue          # telomeric tip: never trim
            for c in chain:
                if not g.seq_del[c >> 1]:
                    g.seq_del[c >> 1] = 1
                    n_removed += 1
    if n_removed:
        g.cleanup()
    log("asg_cut_tips", f"removed {n_removed} tip reads")
    return n_removed


def asg_arc_del_short(g: StringGraph, drop_ratio: float) -> int:
    """Drop arcs whose overlap is much weaker than the best at the vertex
    (~asg_arc_del_short / asg_arc_cut_length). Keeps >= 1 arc per vertex.
    Vectorized: per-vertex max overlap via segment reduction."""
    n = 0
    if g.n_arcs:
        u = g.arc_u().astype(np.int64)
        w = g.v.astype(np.int64)
        live = g.del_ == 0
        out_live = np.bincount(u[live], minlength=2 * g.n_seq)
        best = np.zeros(2 * g.n_seq, np.int64)
        np.maximum.at(best, u[live], g.ol[live])
        thres = (best * drop_ratio).astype(np.int64)
        cand = live & (out_live[u] >= 2) & (g.ol < thres[u]) & \
            (out_live[w ^ 1] >= 2)
        n = int(cand.sum())
        if n:
            g.del_[cand] = 1
            g.symm_del()
            g.cleanup()
    log("asg_arc_del_short", f"dropped {n} weak arcs "
        f"(ratio {drop_ratio:.2f})")
    return n


def asg_pop_bubble(g: StringGraph, max_dist: int,
                   read_cov: Optional[np.ndarray] = None) -> int:
    """Pop simple bubbles/superbubbles within max_dist (miniasm-style
    asg_bub_pop1). Keeps the highest-coverage path; deletes the rest."""
    n_pop = 0
    alen = g.arc_len()
    u = g.arc_u().astype(np.int64)
    out_live = np.bincount(u[g.del_ == 0], minlength=2 * g.n_seq)
    starts = np.flatnonzero(np.repeat(g.seq_del == 0, 2) & (out_live >= 2))
    for v0 in starts:
        v0 = int(v0)
        if g.seq_del[v0 >> 1]:
            continue              # popped earlier in this pass
        if len(g.arcs_of(v0)) < 2:
            continue
        result = _bub_finder(g, v0, max_dist, alen, read_cov)
        if result is None:
            continue
        inside, path = result
        keep_rids = {w >> 1 for w in path} | {v0 >> 1}
        changed = False
        for w in inside:
            rid = w >> 1
            if rid not in keep_rids and not g.seq_del[rid]:
                g.seq_del[rid] = 1
                changed = True
        if changed:
            n_pop += 1
            g.cleanup()
            alen = g.arc_len()     # cleanup() compacted the arc arrays
    log("asg_pop_bubble", f"popped {n_pop} bubbles")
    return n_pop


def _bub_finder(g: StringGraph, v0: int, max_dist: int, alen, read_cov):
    """Kahn-style superbubble detection from v0 (the asg_bub_pop1 scheme);
    returns (inside_vertices, best_path_vertices incl. sink) or None."""
    dist = {v0: 0}
    score = {v0: 0}
    parent = {}
    remaining = {}
    stack = [v0]
    inside = []
    n_pending = 0
    sink = None
    while stack:
        v = stack.pop()
        ai = g.arcs_of(v)
        if len(ai) == 0:
            return None  # tip inside the candidate bubble
        for a in ai:
            w = int(g.v[a])
            if (w >> 1) == (v0 >> 1):
                return None  # loops back through the source read
            d = dist[v] + int(alen[a])
            if d > max_dist:
                return None
            cov_w = int(read_cov[w >> 1]) if read_cov is not None else \
                int(g.ol[a])
            sc = score[v] + cov_w
            if w not in dist:
                dist[w] = d
                score[w] = sc
                parent[w] = v
                remaining[w] = len(g.arcs_of(w ^ 1))
                inside.append(w)
                n_pending += 1
                if len(inside) > 512:
                    return None
            else:
                if d > dist[w]:
                    dist[w] = d
                if sc > score[w]:
                    score[w] = sc
                    parent[w] = v
            remaining[w] -= 1
            if remaining[w] == 0:
                stack.append(w)
                n_pending -= 1
        if len(stack) == 1 and n_pending == 0:
            sink = stack[0]
            break
    if sink is None or sink == v0 or len(inside) < 2:
        return None
    path = []
    w = sink
    while w != v0:
        path.append(w)
        w = parent[w]
    return inside, path


def asg_arc_cut_inexact(g: StringGraph) -> int:
    """Drop inexact arcs at branch vertices that compete with an exact
    alternative (~asg_arc_cut_inexact, gfa_ut.cpp:3057-3127): an arc whose
    overlap alignment had errors (el == 0) loses to a coexisting exact
    (el == 1) arc unless it is the stronger overlap."""
    if g.n_arcs == 0:
        log("asg_arc_cut_inexact", "dropped 0 inexact arcs")
        return 0
    u = g.arc_u().astype(np.int64)
    w = g.v.astype(np.int64)
    live = g.del_ == 0
    out_live = np.bincount(u[live], minlength=2 * g.n_seq)
    best_ex = np.full(2 * g.n_seq, -1, np.int64)
    sel = live & (g.el == 1)
    np.maximum.at(best_ex, u[sel], g.ol[sel])
    cand = live & (g.el == 0) & (g.ol < best_ex[u]) & \
        (out_live[u] >= 2) & (out_live[w ^ 1] >= 2)
    n = int(cand.sum())
    if n:
        g.del_[cand] = 1
        g.symm_del()
        g.cleanup()
    log("asg_arc_cut_inexact", f"dropped {n} inexact arcs")
    return n


def snapshot_arcs(g: StringGraph):
    """Copy the arc table before cleaning (for post_rescue)."""
    return {f: getattr(g, f).copy()
            for f in ("ul", "v", "ol", "strong", "el", "no_l_indel")}


def post_rescue(g: StringGraph, snap) -> int:
    """Re-add the strongest pre-cleaning arc at dead ends the cleaning
    rounds created (~post_rescue, gfa_ut.cpp:3186): a live read end with
    no successors gets its best original arc back when the target read is
    still alive — over-aggressive drops must not break contigs."""
    su = (snap["ul"] >> np.uint64(32)).astype(np.int64)
    skey = (su.astype(np.uint64) << np.uint64(32)) | \
        snap["v"].astype(np.uint64)
    sorder = np.argsort(skey)
    skey_s = skey[sorder]
    su_s = su[sorder]
    u_now = g.arc_u().astype(np.int64)
    have = set(zip(u_now.tolist(), g.v.astype(np.int64).tolist()))
    out_live = np.bincount(u_now[g.del_ == 0], minlength=2 * g.n_seq)
    dead_ends = np.flatnonzero(np.repeat(g.seq_del == 0, 2) &
                               (out_live == 0))
    add_idx = []
    for v in dead_ends:
        v = int(v)
        lo = int(np.searchsorted(su_s, v))
        hi = int(np.searchsorted(su_s, v + 1))
        cand = sorder[lo:hi]
        cand = [c for c in cand
                if not g.seq_del[int(snap["v"][c]) >> 1]
                and (v, int(snap["v"][c])) not in have]
        if not cand:
            continue
        best = max(cand, key=lambda c: int(snap["ol"][c]))
        # complement arc from the snapshot
        w = int(snap["v"][best])
        ckey = np.uint64(((w ^ 1) << 32) | (v ^ 1))
        p = int(np.searchsorted(skey_s, ckey))
        if p >= len(skey_s) or skey_s[p] != ckey:
            continue
        add_idx.extend([int(best), int(sorder[p])])
        have.add((v, w))
        have.add((w ^ 1, v ^ 1))
    if not add_idx:
        log("post_rescue", "rescued 0 arcs")
        return 0
    idx = np.array(sorted(set(add_idx)), np.int64)
    g.set_arcs(np.concatenate([g.ul, snap["ul"][idx]]),
               np.concatenate([g.v, snap["v"][idx]]),
               np.concatenate([g.ol, snap["ol"][idx]]),
               np.concatenate([g.strong, snap["strong"][idx]]),
               np.concatenate([g.el, snap["el"][idx]]),
               np.concatenate([g.no_l_indel, snap["no_l_indel"][idx]]))
    log("post_rescue", f"rescued {len(idx)} arcs at dead ends")
    return len(idx)
