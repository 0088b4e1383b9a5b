"""Unitig-vs-unitig trans-overlap similarity (~tovlp.cpp).

``pt_cal_sim`` (tovlp.cpp:1743) recomputes inter-haplotype homology
directly between unitig sequences with a minimizer similarity — used to
confirm/weight purge and phasing candidates beyond the read-level trans
links.  Here: shared-canonical-k-mer Jaccard-style containment of the
smaller unitig in the larger one.
"""

from __future__ import annotations

from typing import List

import numpy as np

from hifiasm_tpu.phasing.hic import _seq_kmers
from hifiasm_tpu.utils.logging import log

TOVLP_K = 21


def unitig_similarity(a: np.ndarray, b: np.ndarray, k: int = TOVLP_K,
                      sample: int = 1) -> float:
    """Fraction of the SMALLER unitig's k-mers present in the other."""
    ka = np.unique(_seq_kmers(a, k))
    kb = np.unique(_seq_kmers(b, k))
    if len(ka) == 0 or len(kb) == 0:
        return 0.0
    if len(ka) > len(kb):
        ka, kb = kb, ka
    idx = np.minimum(np.searchsorted(kb, ka), len(kb) - 1)
    return float((kb[idx] == ka).mean())


def confirm_purge_pairs(utg_seqs: List[np.ndarray], pairs,
                        simi_rate: float, k: int = TOVLP_K):
    """Filter (purged, kept, frac) purge pairs by sequence similarity
    (~the hap_alignment_advance_worker verification, Purge_Dups.cpp:5610).
    """
    out = []
    for a, b, frac in pairs:
        sim = unitig_similarity(utg_seqs[a], utg_seqs[b], k)
        if sim >= simi_rate * 0.5:     # generous: HPC/SNP divergence
            out.append((a, b, frac, sim))
    log("confirm_purge_pairs",
        f"{len(out)}/{len(pairs)} purge pairs sequence-confirmed")
    return out
