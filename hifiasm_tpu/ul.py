"""Ultralong ONT integration — the "double graph" (inter.cpp).

Re-expresses the core of ``ul_load``/``scall_ul_pipeline``
(inter.cpp:21693, :19992): ultralong reads are mapped to the HiFi unitig
graph with a k=19/w=19 HPC minimizer index (``ul_map_lchain``
anchor.cpp:2287), linear chains per unitig are stitched into a PATH of
unitigs through the graph (``gl_chain_refine_advance`` graph-DP), and each
UL read becomes a vector of oriented unitig intervals (``uc_block_t``,
Process_Read.h:169-175).  The paths then (a) deposit ``ou`` coverage on
arcs, protecting them in cleaning (Overlaps.h:195), and (b) bridge unitig
pairs that UL reads traverse but the HiFi graph does not connect
(``rescue_src_ul``/``gradually_renew_g``, Overlaps.cpp:39190,39297).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from hifiasm_tpu.graph.unitig import UnitigGraph
from hifiasm_tpu.index.pos_table import build_position_table
from hifiasm_tpu.ops.chain import ChainParams
from hifiasm_tpu.overlap.anchors import chain_many, collect_anchors
from hifiasm_tpu.ops.sketch import sketch_read
from hifiasm_tpu.utils.logging import log

UL_K = 19
UL_W = 19
WINDOW_UL = 75          # Hash_Table.h:26
UL_ERR_RATE = 0.2


def _verify_block(ul: np.ndarray, tgt: np.ndarray, hit_self, hit_t,
                  max_windows: int = 8, min_pass: float = 0.6) -> bool:
    """Base-level spot check of a UL block (~the WINDOW_UL=75 verification
    of scall_ul_pipeline, inter.cpp:19992): align short windows anchored
    at chain hits with a 0.2 error budget."""
    from hifiasm_tpu.ops.banded_batch import banded_batch_np

    n = len(hit_self)
    if n == 0:
        return False
    sel = np.linspace(0, n - 1, min(max_windows, n)).astype(np.int64)
    e = max(2, int(WINDOW_UL * UL_ERR_RATE))
    xs, ys, xlens, ylens = [], [], [], []
    for h in sel:
        q0 = int(hit_self[h])
        t0 = int(hit_t[h])
        xw = ul[q0:q0 + WINDOW_UL]
        if len(xw) < 20:
            continue
        y0 = t0 - e
        seg = np.full(len(xw) + 2 * e, 4, np.uint8)
        s_lo, s_hi = max(0, y0), min(len(tgt), y0 + len(xw) + 2 * e)
        if s_hi <= s_lo:
            continue
        seg[s_lo - y0:s_hi - y0] = tgt[s_lo:s_hi]
        xs.append(xw)
        ys.append(seg)
        xlens.append(len(xw))
        ylens.append(s_hi - y0)
    if not xs:
        return False
    XL = max(map(len, xs))
    YL = XL + 2 * e
    xb = np.full((len(xs), XL), 4, np.uint8)
    yb = np.full((len(xs), YL), 4, np.uint8)
    for i, (xw, yw) in enumerate(zip(xs, ys)):
        xb[i, :len(xw)] = xw
        yb[i, :len(yw)] = yw
    out = banded_batch_np(xb, np.array(xlens), yb, np.array(ylens), e,
                          traceback=False)
    return float((out.err >= 0).mean()) >= min_pass


@dataclass
class ULPath:
    """One UL read's traversal: oriented unitigs in read order."""

    blocks: List[Tuple[int, int, int, int]]  # (uid, rev, q_start, q_end)


def ul_align(utg_seqs: List[np.ndarray], ul_reads: List[np.ndarray],
             k: int = UL_K, w: int = UL_W, min_chain_score: int = 8,
             hom_cov: int = 20) -> List[ULPath]:
    """Map each UL read to a path of oriented unitigs.

    Linear chains per unitig come from the shared anchor/chain machinery;
    the path is the q-sorted sequence of non-overlapping best chains (the
    graph-DP refinement collapses to this when chains are unambiguous).
    """
    pt, _, _, mzs = build_position_table(
        utg_seqs, k, w, ft=None, keep_min=1)
    utg_lens = np.array([len(s) for s in utg_seqs], np.int64)
    cp = ChainParams.for_k(k, is_accurate=False, bw_rate=0.1)
    paths = []
    n_utg = len(utg_seqs)
    reads = []
    for i, ul in enumerate(ul_reads):
        mz = sketch_read(ul, k, w, None)
        an = collect_anchors(mz, pt, n_utg + i, utg_lens, hom_cov)
        reads.append((n_utg + i, an, len(ul)))
    ovs = chain_many(reads, utg_lens, cp, max_n_chain=50)
    from hifiasm_tpu.io.readstore import revcomp_codes

    for (rid, an, rlen), ov in zip(reads, ovs):
        ul = ul_reads[rid - n_utg]
        blocks = []
        order = np.argsort(ov.x_s, kind="stable")
        last_end = -1
        for o in order:
            if ov.score[o] < min_chain_score:
                continue
            if int(ov.x_s[o]) < last_end - 200:   # heavy overlap: ambiguous
                continue
            tgt = utg_seqs[int(ov.y_id[o])]
            if ov.rev[o]:
                tgt = revcomp_codes(tgt)
            hs = ov.hit_self[ov.hit_start[o]:ov.hit_start[o] + ov.n_hits[o]]
            ht = ov.hit_t[ov.hit_start[o]:ov.hit_start[o] + ov.n_hits[o]]
            if not _verify_block(ul, tgt, hs, ht):
                continue
            blocks.append((int(ov.y_id[o]), int(ov.rev[o]),
                           int(ov.x_s[o]), int(ov.x_e[o])))
            last_end = int(ov.x_e[o])
        paths.append(ULPath(blocks))
    n_mapped = sum(1 for p in paths if p.blocks)
    log("ul_align", f"mapped {n_mapped}/{len(ul_reads)} UL reads, "
        f"{sum(len(p.blocks) for p in paths)} unitig blocks")
    return paths


def ul_arc_support(ug: UnitigGraph, paths: List[ULPath]
                   ) -> Dict[Tuple[int, int], int]:
    """Count UL traversals per ordered unitig-end pair (the ``ou`` field)."""
    sup: Dict[Tuple[int, int], int] = {}
    for p in paths:
        for (ua, ra, _, _), (ub, rb, _, _) in zip(p.blocks, p.blocks[1:]):
            src = ua << 1 | ra
            dst = ub << 1 | rb
            sup[(src, dst)] = sup.get((src, dst), 0) + 1
            # complement direction
            csrc = dst ^ 1
            cdst = src ^ 1
            sup[(csrc, cdst)] = sup.get((csrc, cdst), 0) + 1
    return sup


def ul_bridge_arcs(ug: UnitigGraph, paths: List[ULPath],
                   min_support: int = 2) -> int:
    """Add arcs for UL-supported adjacencies missing from the HiFi graph
    (~rescue_src_ul / gradually_renew_g). Returns #arcs added."""
    sup = ul_arc_support(ug, paths)
    have = {(int(s), int(d)) for s, d in zip(ug.a_src, ug.a_dst)}
    add_s, add_d = [], []
    for (s, d), c in sup.items():
        if c >= min_support and (s, d) not in have:
            add_s.append(s)
            add_d.append(d)
    if add_s:
        ug.a_src = np.concatenate([ug.a_src,
                                   np.array(add_s, np.uint32)])
        ug.a_dst = np.concatenate([ug.a_dst,
                                   np.array(add_d, np.uint32)])
        ug.a_ol = np.concatenate([ug.a_ol, np.zeros(len(add_s), np.int64)])
    log("ul_bridge_arcs", f"added {len(add_s)} UL-supported bridge arcs")
    return len(add_s)


def integer_correction(paths: List[ULPath], min_occ: int = 3,
                       rounds: int = 3) -> int:
    """UL-vs-UL correction in unitig-ID ("integer") space
    (~integer_correction, gfa_ut.cpp:7622): a path block contradicted by
    every other UL read traversing the same flanks is a chimeric/misplaced
    mapping; replace it with the majority block.

    Votes are oriented triples (prev, cur, next) over all paths in both
    orientations; a block is rewritten when its own triple is unique and
    >= min_occ other reads agree on an alternative. Runs up to ``rounds``
    passes (the reference's 3 integer-correction rounds); returns the
    number of corrected blocks.
    """
    def tri_votes():
        cnt: Dict[Tuple[int, int, int], int] = {}
        for p in paths:
            vs = [u << 1 | r for (u, r, _, _) in p.blocks]
            for a, b, c in zip(vs, vs[1:], vs[2:]):
                cnt[(a, b, c)] = cnt.get((a, b, c), 0) + 1
                cnt[(c ^ 1, b ^ 1, a ^ 1)] = \
                    cnt.get((c ^ 1, b ^ 1, a ^ 1), 0) + 1
        return cnt

    n_fix = 0
    for _ in range(rounds):
        cnt = tri_votes()
        changed = 0
        for p in paths:
            if len(p.blocks) < 3:
                continue
            vs = [u << 1 | r for (u, r, _, _) in p.blocks]
            for i in range(1, len(vs) - 1):
                a, x, c = vs[i - 1], vs[i], vs[i + 1]
                if cnt.get((a, x, c), 0) != 1:
                    continue              # own vote only -> suspicious
                best_b, best_c = -1, 0
                for (aa, b, cc), k in cnt.items():
                    if aa == a and cc == c and b != x and k > best_c:
                        best_b, best_c = b, k
                if best_c >= min_occ:
                    _, _, qs, qe = p.blocks[i]
                    p.blocks[i] = (best_b >> 1, best_b & 1, qs, qe)
                    vs[i] = best_b
                    changed += 1
        n_fix += changed
        if changed == 0:
            break
    log("integer_correction", f"rewrote {n_fix} UL path blocks")
    return n_fix


def ul_renew_graph(ug: UnitigGraph, paths: List[ULPath],
                   rounds: int = 3, min_support: int = 2,
                   drop_contradicted: int = 3) -> None:
    """Iterative UL-guided graph renewal (~gradually_renew_g,
    Overlaps.cpp:39297 + the ``ou`` gate in cleaning): per round, bridge
    UL-supported missing adjacencies, then drop arcs with zero UL support
    whose source end has a >= drop_contradicted-supported alternative
    (UL coverage contradicts the HiFi arc)."""
    for _ in range(rounds):
        added = ul_bridge_arcs(ug, paths, min_support)
        sup = ul_arc_support(ug, paths)
        src = ug.a_src.astype(np.int64)
        dst = ug.a_dst.astype(np.int64)
        arc_sup = np.array([sup.get((int(s), int(d)), 0)
                            for s, d in zip(src, dst)], np.int64)
        # strongest UL support per source end
        best = {}
        for s, c in zip(src, arc_sup):
            best[int(s)] = max(best.get(int(s), 0), int(c))
        drop = np.array([c == 0 and best.get(int(s), 0) >= drop_contradicted
                         for s, c in zip(src, arc_sup)], bool)
        # keep symmetry: a contradicted arc takes its complement with it
        # (the complement's source end may never be traversed by UL)
        comp = {(int(d) ^ 1, int(s) ^ 1) for s, d
                in zip(src[drop], dst[drop])}
        drop |= np.array([(int(s), int(d)) in comp
                          for s, d in zip(src, dst)], bool)
        if drop.any():
            keep = ~drop
            ug.a_src = ug.a_src[keep]
            ug.a_dst = ug.a_dst[keep]
            ug.a_ol = ug.a_ol[keep]
            log("ul_renew_graph",
                f"dropped {int(drop.sum())} UL-contradicted arcs")
        if added == 0 and not drop.any():
            break
