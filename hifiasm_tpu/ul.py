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
    for (rid, an, rlen), ov in zip(reads, ovs):
        blocks = []
        order = np.argsort(ov.x_s, kind="stable")
        last_end = -1
        for o in order:
            if ov.score[o] < min_chain_score:
                continue
            if int(ov.x_s[o]) < last_end - 200:   # heavy overlap: ambiguous
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
