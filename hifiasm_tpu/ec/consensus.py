"""Windowed majority consensus -> corrected read sequence.

Re-expresses ``wcns_gen`` (ecovlp.cpp:2293, called :3309 with occ_tot = 3 and
occ_exact = 0.500001): every query position collects votes from the query
itself plus every *cis* (is_match == 1) overlap whose window aligned there;
a correction (substitution / deletion / insertion-after) is applied when
coverage >= occ_tot and the winning vote's fraction exceeds occ_exact.
Confirmed het SNP sites are never corrected (haplotype preservation — the
reference achieves this by excluding trans overlaps and via the SNP matrix;
we additionally hard-protect the site).

Votes are collected with segmented scatter-adds over the CSR traceback
arrays; sequence assembly only touches positions that actually change.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hifiasm_tpu.ec.phase import PhaseResult, _positions
from hifiasm_tpu.ec.window_align import OverlapTracebacks
from hifiasm_tpu.overlap.anchors import OverlapRegions

MAX_INS_TRACK = 8


@dataclass
class ConsensusResult:
    seq: np.ndarray          # corrected codes
    n_corrected: int         # number of edit operations applied


def consensus_from_votes(q: np.ndarray, votes: np.ndarray,
                         ins_tot: np.ndarray, ins_base: np.ndarray,
                         ins_len: np.ndarray, het_sites: np.ndarray,
                         occ_tot: int = 3, occ_exact: float = 0.500001
                         ) -> ConsensusResult:
    """Apply corrections given aggregated matrices.

    votes [qlen, 5] INCLUDES the query's own vote; ins_base/ins_len are the
    per-position majority insertion base/length; ins_tot the voter count.
    This half is shared by the host CSR path and the device-aggregated path.
    """
    qlen = len(q)
    qa = np.clip(q, 0, 3)
    cov = votes.sum(axis=1)
    winner = np.argmax(votes, axis=1).astype(np.int64)
    win_votes = votes[np.arange(qlen), winner]
    pass_sub = (cov >= occ_tot) & (win_votes > occ_exact * cov) & \
        (winner != qa)
    pass_ins = (cov >= occ_tot) & (ins_tot > occ_exact * cov)
    if len(het_sites):
        pass_sub[het_sites] = False
        pass_ins[het_sites] = False

    change = np.flatnonzero(pass_sub | pass_ins)
    if len(change) == 0:
        return ConsensusResult(q.copy(), 0)
    parts = []
    n_edits = 0
    prev = 0
    for p in change:
        parts.append(q[prev:p])
        if pass_sub[p]:
            w = int(winner[p])
            if w != 4:                       # substitution
                parts.append(np.array([w], np.uint8))
            n_edits += 1
        else:
            parts.append(q[p:p + 1])
        if pass_ins[p]:
            parts.append(np.full(int(ins_len[p]), ins_base[p], np.uint8))
            n_edits += int(ins_len[p])
        prev = p + 1
    parts.append(q[prev:])
    return ConsensusResult(np.concatenate(parts).astype(np.uint8), n_edits)


def windowed_consensus(q: np.ndarray, ov: OverlapRegions,
                       tbs: OverlapTracebacks, ph: PhaseResult,
                       occ_tot: int = 3, occ_exact: float = 0.500001
                       ) -> ConsensusResult:
    qlen = len(q)
    cis = ph.is_match == 1
    if qlen == 0 or not cis.any():
        return ConsensusResult(q.copy(), 0)

    oidx, qpos, keep = _positions(ov, tbs, cis)
    tb = tbs.tb[keep]
    icnt = tbs.ins_cnt[keep]
    ibase = tbs.ins_base[keep]
    informative = tb <= 4
    qpos_i, tb_i = qpos[informative], tb[informative]

    # votes per (position, symbol 0..4 where 4 = delete the query base);
    # bincount beats np.add.at by ~20x on these scatter-adds
    votes = np.bincount(qpos_i * 5 + tb_i.astype(np.int64),
                        minlength=qlen * 5).reshape(qlen, 5).astype(np.int32)
    votes[np.arange(qlen), np.clip(q, 0, 3)] += np.int32(1)

    # insertion votes after each position (voters = cis slots with aligned tb)
    has_ins = informative & (icnt > 0)
    qpos_h = qpos[has_ins]
    ins_tot = np.bincount(qpos_h, minlength=qlen).astype(np.int32)
    ib = np.clip(ibase[has_ins], 0, 3).astype(np.int64)
    ins_base_cnt = np.bincount(qpos_h * 4 + ib, minlength=qlen * 4
                               ).reshape(qlen, 4).astype(np.int32)
    il = np.clip(icnt[has_ins], 0, MAX_INS_TRACK).astype(np.int64)
    ins_len_cnt = np.bincount(
        qpos_h * (MAX_INS_TRACK + 1) + il,
        minlength=qlen * (MAX_INS_TRACK + 1)
    ).reshape(qlen, MAX_INS_TRACK + 1).astype(np.int32)
    ins_base = np.argmax(ins_base_cnt, axis=1).astype(np.uint8)
    ins_len = (np.argmax(ins_len_cnt[:, 1:], axis=1) + 1).astype(np.int64)

    return consensus_from_votes(q, votes, ins_tot, ins_base, ins_len,
                                ph.het_sites, occ_tot, occ_exact)
