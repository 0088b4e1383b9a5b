"""Haplotig purging: move inter-haplotype duplicates to the alternate set.

Re-expresses the core of the built-in purge_dups (Purge_Dups.cpp:5527):
inter-haplotype homology is detected from the *trans* overlaps collected
during EC phasing (``reverse_paf`` — reads flipped at het SNP sites,
Purge_Dups.cpp lifts them to unitig coordinates in
``hap_alignment_advance_worker`` :5610).  A unitig whose reads are largely
trans-linked to a longer unitig is a haplotig duplicate: dropped from the
primary and emitted as alternate.  Coverage double-checks: a purged unitig
should carry roughly haploid coverage (het peak), not the hom peak.

Purge levels follow the CLI contract (-l0 off, -l1 contained-only,
-l2/-l3 similarity 0.75 / 0.55, CommandLines.cpp:299-310).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from hifiasm_tpu.graph.unitig import UnitigGraph
from hifiasm_tpu.overlap.paf import PafStore
from hifiasm_tpu.utils.logging import log


@dataclass
class PurgeResult:
    primary: List[int]        # unitig ids kept in primary
    alternate: List[int]      # unitig ids moved to alternate
    hap_pairs: List[Tuple[int, int, float]]  # (purged, kept, link_frac)


def unitig_trans_links(ug: UnitigGraph, rev_paf: PafStore,
                       n_reads: int):
    """Sparse trans (inter-hap) read-link counts between unitigs
    (~the unitig-coordinate lift of hap_alignment_advance_worker).

    Returns ``{ua: {ub: count}}``; a dense [n, n] matrix is quadratic in
    unitig count and breaks at genome scale."""
    read_utg = np.full(n_reads, -1, np.int64)
    for uid, u in enumerate(ug.utgs):
        read_utg[(u.vs >> 1).astype(np.int64)] = uid
    qn, cols = rev_paf.flatten()
    ua = read_utg[qn.astype(np.int64)]
    ub = read_utg[cols["tn"].astype(np.int64)]
    keep = (ua >= 0) & (ub >= 0) & (ua != ub)
    # ONE distinct read of ua per ub: unique (read, target-unitig) pairs
    pair = np.unique(np.stack([qn[keep].astype(np.int64), ua[keep],
                               ub[keep]], axis=1), axis=0)
    links: dict = {}
    for a, b in zip(pair[:, 1], pair[:, 2]):
        row = links.setdefault(int(a), {})
        row[int(b)] = row.get(int(b), 0) + 1
    return links


def sym_link_edges(links: dict) -> dict:
    """{(a, b) a<b: links[a][b] + links[b][a]} from the sparse rows."""
    out: dict = {}
    for a, row in links.items():
        for b, c in row.items():
            k = (a, b) if a < b else (b, a)
            out[k] = out.get(k, 0) + c
    return out


def purge_dups(ug: UnitigGraph, rev_paf: PafStore, n_reads: int,
               purge_level: int = 3, simi_rate: float = 0.55,
               min_ovlp_reads: int = 1, utg_cov=None,
               max_cov: int = -1) -> PurgeResult:
    """Greedy duplicate purge: shorter unitig with enough trans-linked reads
    onto a longer one becomes alternate (~purge_dups, Purge_Dups.cpp:5527)."""
    n = len(ug.utgs)
    if purge_level <= 0 or n == 0:
        return PurgeResult(list(range(n)), [], [])
    links = unitig_trans_links(ug, rev_paf, n_reads)
    n_reads_utg = np.array([len(u.vs) for u in ug.utgs], np.int64)
    lens = np.array([u.len for u in ug.utgs], np.int64)
    order = np.argsort(lens)          # purge shortest first
    alive = np.ones(n, bool)
    alt, pairs = [], []
    for a in order:
        a = int(a)
        if not alive[a]:
            continue
        # --purge-max: above the coverage bound the unitig is a
        # homozygous/collapsed repeat, not a haplotig duplicate
        if max_cov >= 0 and utg_cov is not None and utg_cov[a] > max_cov:
            continue
        # strongest trans partner still alive and longer
        row = links.get(a, {})
        b, cnt_ab = -1, 0
        for ub, c in row.items():
            if ub != a and alive[ub] and lens[ub] >= lens[a] and c > cnt_ab:
                b, cnt_ab = ub, c
        if b < 0:
            continue
        frac = cnt_ab / max(n_reads_utg[a], 1)
        if cnt_ab >= min_ovlp_reads and frac >= simi_rate:
            alive[a] = False
            alt.append(int(a))
            pairs.append((int(a), int(b), float(frac)))
    primary = [i for i in range(n) if alive[i]]
    log("purge_dups", f"purged {len(alt)} of {n} unitigs to alternate")
    return PurgeResult(primary, alt, pairs)
