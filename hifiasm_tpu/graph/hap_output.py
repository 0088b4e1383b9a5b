"""Haplotype-partitioned output (the ``output_bp_graph`` /
``output_trio_graph_joint`` analog, Overlaps.cpp:17627, 23244).

Unitigs linked by inter-hap (trans) evidence are phased with the max-cut
spin solver (rcut.cpp mc_solve); spin +1 -> hap1, -1 -> hap2; unitigs with
no inter-hap partner are homozygous and join BOTH haplotypes (the "joint"
in output_trio_graph_joint).  With trio binning, read trio flags override
the solver per unitig (``set_trio_flag_by_cov``-style majority).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from hifiasm_tpu.graph.purge import unitig_trans_links
from hifiasm_tpu.graph.unitig import UnitigGraph
from hifiasm_tpu.overlap.paf import PafStore
from hifiasm_tpu.phasing.mc_solve import mc_solve
from hifiasm_tpu.trio import AMBIGU, FATHER, MOTHER
from hifiasm_tpu.utils.logging import log


def phase_unitigs(ug: UnitigGraph, rev_paf: PafStore, n_reads: int,
                  trio_flags: Optional[np.ndarray] = None,
                  n_perturb: int = 10000, f_perturb: float = 0.1,
                  seed: int = 11, min_link: int = 2,
                  hic_links: Optional[np.ndarray] = None,
                  trio_occ_thres: int = 60
                  ) -> Tuple[List[int], List[int]]:
    """Returns (hap1_ids, hap2_ids); hom unitigs appear in both.

    ``trio_occ_thres`` (--t-occ): a unitig carrying more than this many
    unexpected opposite-haplotype reads is forcedly removed from both
    haplotypes regardless of topology (CommandLines.cpp:321)."""
    n = len(ug.utgs)
    if n == 0:
        return [], []

    # trio path: majority vote of read flags per unitig
    use_trio = trio_flags is not None and \
        bool(((trio_flags == FATHER) | (trio_flags == MOTHER)).any())
    if use_trio:
        hap1, hap2 = [], []
        n_forced = 0
        for uid, u in enumerate(ug.utgs):
            fl = trio_flags[(u.vs >> 1).astype(np.int64)]
            n_p = int((fl == FATHER).sum())
            n_m = int((fl == MOTHER).sum())
            if min(n_p, n_m) > trio_occ_thres:
                n_forced += 1             # --t-occ: mixed-hap unitig
                continue
            if n_p > n_m:
                hap1.append(uid)
            elif n_m > n_p:
                hap2.append(uid)
            else:
                hap1.append(uid)
                hap2.append(uid)
        log("phase_unitigs", f"trio: {len(hap1)} hap1 / {len(hap2)} hap2"
            + (f" ({n_forced} removed by --t-occ)" if n_forced else ""))
        return hap1, hap2

    links = unitig_trans_links(ug, rev_paf, n_reads)
    if hic_links is not None:
        from hifiasm_tpu.phasing.hic import combine_phase_weights
        ex, ey, ew = combine_phase_weights(links, hic_links,
                                           min_evidence=min_link)
        ex, ey, ew = list(ex), list(ey), list(ew)
    else:
        ex, ey, ew = [], [], []
        for a in range(n):
            for b in range(a + 1, n):
                w = links[a, b] + links[b, a]
                if w >= min_link:
                    ex.append(a)
                    ey.append(b)
                    ew.append(float(w))      # >0: different haplotypes
    if not ex:
        ids = list(range(n))
        return ids, list(ids)
    s = mc_solve(n, np.array(ex), np.array(ey), np.array(ew),
                 n_perturb=n_perturb, f_perturb=f_perturb, seed=seed)
    linked = np.zeros(n, bool)
    linked[np.array(ex)] = True
    linked[np.array(ey)] = True
    hap1 = [i for i in range(n) if not linked[i] or s[i] > 0]
    hap2 = [i for i in range(n) if not linked[i] or s[i] < 0]
    log("phase_unitigs", f"{len(hap1)} hap1 / {len(hap2)} hap2 unitigs "
        f"({int(linked.sum())} het-linked)")
    return hap1, hap2


def phase_unitigs_k(ug: UnitigGraph, rev_paf: PafStore, n_reads: int,
                    k_hap: int, n_perturb: int = 1000,
                    f_perturb: float = 0.1, seed: int = 11,
                    min_link: int = 2) -> List[List[int]]:
    """Polyploid phasing: k-label max-cut over the trans-link graph
    (~output_poly_trio + mc_solve_general, Overlaps.cpp:14682 /
    rcut.cpp:4586). Unlinked (hom) unitigs appear in every haplotype."""
    from hifiasm_tpu.phasing.mc_solve import mc_solve_k

    n = len(ug.utgs)
    if n == 0:
        return [[] for _ in range(k_hap)]
    links = unitig_trans_links(ug, rev_paf, n_reads)
    ex, ey, ew = [], [], []
    for a in range(n):
        for b in range(a + 1, n):
            w = links[a, b] + links[b, a]
            if w >= min_link:
                ex.append(a)
                ey.append(b)
                ew.append(float(w))
    if not ex:
        return [list(range(n)) for _ in range(k_hap)]
    lab = mc_solve_k(n, np.array(ex), np.array(ey), np.array(ew), k_hap,
                     n_perturb=n_perturb, f_perturb=f_perturb, seed=seed)
    linked = np.zeros(n, bool)
    linked[np.array(ex)] = True
    linked[np.array(ey)] = True
    out = [[i for i in range(n) if not linked[i] or lab[i] == h]
           for h in range(k_hap)]
    log("phase_unitigs_k",
        " / ".join(f"{len(g)} hap{h + 1}" for h, g in enumerate(out)))
    return out
