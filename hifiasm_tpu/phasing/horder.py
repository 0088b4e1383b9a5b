"""Hi-C scaffolding: contig ordering and orientation (~horder.cpp).

Re-expresses ``ha_aware_order`` / ``init_horder_t`` (horder.cpp:4540,
:3926): PE hits are lifted to contig coordinates, each hit's end votes for
the contig END it lies nearer (the order-graph ``osg_t`` of horder.h:28),
and scaffolds are assembled by greedy highest-weight end matching over
break+join rounds (the reference runs round = 3 of misjoin-break then
rejoin; here joins below ``min_weight`` are simply never made, which is
the same fixed point for clean inputs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from hifiasm_tpu.utils.logging import log


@dataclass
class Scaffold:
    members: List[Tuple[int, int]]     # (contig id, orientation 0 fwd)


def end_weights(n_ctg: int, ctg_lens: np.ndarray,
                pe_hits: List[Tuple[int, int, int, int]]
                ) -> Dict[Tuple[int, int], float]:
    """(end_a, end_b) -> weight; end = ctg << 1 | (0 head, 1 tail).

    A hit (u1, p1, u2, p2) votes for the ends nearest to p1/p2, weighted
    by proximity (near-end contacts are the informative ones)."""
    w: Dict[Tuple[int, int], float] = {}
    for u1, p1, u2, p2 in pe_hits:
        if u1 == u2 or u1 < 0 or u2 < 0:
            continue
        l1, l2 = int(ctg_lens[u1]), int(ctg_lens[u2])
        e1 = u1 << 1 | (0 if p1 < l1 - p1 else 1)
        e2 = u2 << 1 | (0 if p2 < l2 - p2 else 1)
        d1 = min(p1, l1 - p1) / max(l1, 1)
        d2 = min(p2, l2 - p2) / max(l2, 1)
        wt = (1.0 - d1) * (1.0 - d2)
        key = (min(e1, e2), max(e1, e2))
        w[key] = w.get(key, 0.0) + wt
    return w


def greedy_scaffold(n_ctg: int, weights: Dict[Tuple[int, int], float],
                    min_weight: float = 2.0) -> List[Scaffold]:
    """Greedy maximum matching over contig ends -> scaffold chains."""
    used_end = set()
    join: Dict[int, int] = {}
    for (ea, eb), wt in sorted(weights.items(), key=lambda kv: -kv[1]):
        if wt < min_weight:
            break
        if ea in used_end or eb in used_end or (ea >> 1) == (eb >> 1):
            continue
        # cycle check: same scaffold already
        if _same_chain(join, ea, eb):
            continue
        join[ea] = eb
        join[eb] = ea
        used_end.add(ea)
        used_end.add(eb)

    seen = np.zeros(n_ctg, bool)
    scaffolds = []
    for c in range(n_ctg):
        if seen[c]:
            continue
        # find a chain terminus starting from c
        ctg, end_in = c, 0
        # walk left from head end until a free end
        guard = 0
        while (ctg << 1 | end_in) in join and guard <= n_ctg:
            nxt = join[ctg << 1 | end_in]
            ctg, end_in = nxt >> 1, (nxt & 1) ^ 1
            guard += 1
        members = []
        cur, enter = ctg, end_in
        while True:
            seen[cur] = True
            members.append((cur, enter))       # enter==0: fwd orientation
            out_end = cur << 1 | (enter ^ 1)
            if out_end not in join:
                break
            nxt = join[out_end]
            cur, enter = nxt >> 1, nxt & 1
            if seen[cur]:
                break
        scaffolds.append(Scaffold(members))
    log("greedy_scaffold",
        f"{n_ctg} contigs -> {len(scaffolds)} scaffolds")
    return scaffolds


def _same_chain(join: Dict[int, int], ea: int, eb: int) -> bool:
    """Would joining ea-eb close a cycle within an existing chain?"""
    # walk from ea's contig's other end along the chain looking for eb's ctg
    target = eb >> 1
    cur = (ea >> 1) << 1 | ((ea & 1) ^ 1)
    guard = 0
    while cur in join and guard < 100000:
        nxt = join[cur]
        if nxt >> 1 == target:
            return True
        cur = (nxt >> 1) << 1 | ((nxt & 1) ^ 1)
        guard += 1
    return False


def scaffold_seqs(scaffolds: List[Scaffold], ctg_seqs: List[np.ndarray],
                  gap_len: int = 100) -> List[np.ndarray]:
    """Concatenate member sequences with N gaps (scaffold FASTA)."""
    from hifiasm_tpu.io.readstore import revcomp_codes

    out = []
    gap = np.full(gap_len, 4, np.uint8)
    for sc in scaffolds:
        parts = []
        for i, (cid, enter) in enumerate(sc.members):
            seq = ctg_seqs[cid]
            parts.append(seq if enter == 0 else revcomp_codes(seq))
            if i + 1 < len(sc.members):
                parts.append(gap)
        out.append(np.concatenate(parts) if parts else
                   np.zeros(0, np.uint8))
    return out
