"""Telomere-aware tip protection (~gen_telo_end_t, Overlaps.cpp:39347).

``--telo-m CCCTAA``: read ends are scanned for the motif (both strands);
reads with a dense motif run at an end are telomeric, and cleaning must
never trim tips that contain them (``telo_end_t`` Overlaps.h:89-93,
threaded through every ``asg_arc_cut_tips`` call, gfa_ut.cpp:3059).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes, seq_to_codes
from hifiasm_tpu.utils.logging import log


def find_telo_reads(store: ReadStore, motif: str, end_len: int = 2000,
                    min_hits: int = 10) -> np.ndarray:
    """Boolean mask of reads with a telomeric motif run at either end."""
    m = seq_to_codes(motif.upper().encode())
    mr = revcomp_codes(m)
    out = np.zeros(store.n_reads, bool)
    pat = m.tobytes()
    pat_r = mr.tobytes()
    for rid in range(store.n_reads):
        c = store.get_codes(rid)
        head = c[:end_len].tobytes()
        tail = c[-end_len:].tobytes()
        hits = max(head.count(pat), head.count(pat_r),
                   tail.count(pat), tail.count(pat_r))
        if hits >= min_hits:
            out[rid] = True
    log("find_telo_reads", f"{int(out.sum())} telomeric reads "
        f"(motif {motif})")
    return out
