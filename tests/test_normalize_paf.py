"""normalize_paf pair symmetry (~normalize_ma_hit_t_single_side_advance,
Overlaps.cpp:1139): one-sided drop, winner mirroring, ONT el-rescue."""

import numpy as np

from hifiasm_tpu.graph.sg import normalize_paf
from hifiasm_tpu.overlap.paf import PafRecords, PafStore


def _store(n, recs):
    """recs: list of (qn, qs, qe, tn, ts, te, rev, ml, el)."""
    paf = PafStore(n)
    by_q = {}
    for r in recs:
        by_q.setdefault(r[0], []).append(r)
    for q, rows in by_q.items():
        paf[q] = PafRecords.from_columns(
            qs=np.array([r[1] for r in rows], np.int64),
            qe=np.array([r[2] for r in rows], np.int64),
            tn=np.array([r[3] for r in rows], np.uint32),
            ts=np.array([r[4] for r in rows], np.int64),
            te=np.array([r[5] for r in rows], np.int64),
            rev=np.array([r[6] for r in rows], np.uint8),
            ml=np.array([r[7] for r in rows], np.int64),
            bl=np.array([r[2] - r[1] for r in rows], np.int64),
            el=np.array([r[8] for r in rows], np.uint8),
            no_l_indel=np.ones(len(rows), np.uint8))
    return paf


LENS = np.full(4, 1000)


def test_one_sided_pair_dropped():
    # 0->1 exists, 1->0 does not: the HiFi path must drop it entirely
    paf = _store(4, [(0, 100, 900, 1, 0, 800, 0, 800, 1)])
    out = normalize_paf(paf, LENS)
    assert len(out[0]) == 0 and len(out[1]) == 0


def test_one_sided_el_rescued_in_ont_mode():
    paf = _store(4, [(0, 100, 900, 1, 0, 800, 0, 800, 1)])
    out = normalize_paf(paf, LENS, rescue_el=True)
    assert len(out[0]) == 1 and len(out[1]) == 1
    # the synthesized reciprocal is the exact coordinate swap
    r = out[1]
    assert (int(r.qs[0]), int(r.qe[0]), int(r.ts[0]), int(r.te[0])) == \
        (0, 800, 100, 900)


def test_one_sided_inexact_not_rescued():
    paf = _store(4, [(0, 100, 900, 1, 0, 800, 0, 800, 0)])
    out = normalize_paf(paf, LENS, rescue_el=True)
    assert len(out[0]) == 0 and len(out[1]) == 0


def test_two_sided_longer_span_wins_and_mirrors():
    # 0->1 span 700; 1->0 span 800 (the winner): 0's record must be
    # overwritten by the mirror of 1's record
    paf = _store(4, [
        (0, 100, 800, 1, 0, 790, 0, 700, 1),
        (1, 0, 800, 0, 95, 805, 0, 800, 1),
    ])
    out = normalize_paf(paf, LENS)
    r0, r1 = out[0], out[1]
    assert len(r0) == 1 and len(r1) == 1
    # winner (1->0) kept verbatim
    assert (int(r1.qs[0]), int(r1.qe[0]), int(r1.ts[0]), int(r1.te[0])) == \
        (0, 800, 95, 805)
    # loser overwritten with the exact swap of the winner
    assert (int(r0.qs[0]), int(r0.qe[0]), int(r0.ts[0]), int(r0.te[0])) == \
        (95, 805, 0, 800)


def test_two_sided_tie_lower_id_wins():
    paf = _store(4, [
        (0, 100, 800, 1, 0, 790, 0, 700, 1),
        (1, 50, 750, 0, 110, 795, 0, 700, 1),
    ])
    out = normalize_paf(paf, LENS)
    r0, r1 = out[0], out[1]
    # read 0's record wins the tie; read 1 gets its mirror
    assert (int(r0.qs[0]), int(r0.qe[0])) == (100, 800)
    assert (int(r1.qs[0]), int(r1.qe[0]), int(r1.ts[0]), int(r1.te[0])) == \
        (0, 790, 100, 800)


def test_mirrors_stay_mirrored_after_dedup():
    # duplicate records per direction with differing coordinates on an
    # ml tie: both directions must still come out as exact mirrors
    paf = _store(4, [
        (0, 100, 800, 1, 0, 790, 0, 700, 1),
        (0, 90, 790, 1, 10, 780, 0, 700, 1),
        (1, 0, 790, 0, 100, 800, 0, 700, 1),
        (1, 10, 780, 0, 90, 790, 0, 700, 1),
    ])
    out = normalize_paf(paf, LENS)
    r0, r1 = out[0], out[1]
    assert len(r0) == 1 and len(r1) == 1
    assert (int(r0.qs[0]), int(r0.qe[0])) == (int(r1.ts[0]), int(r1.te[0]))
    assert (int(r0.ts[0]), int(r0.te[0])) == (int(r1.qs[0]), int(r1.qe[0]))
