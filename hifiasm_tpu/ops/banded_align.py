"""Banded bit-parallel (Myers) edit-distance alignment — the EC hot kernel.

Semantics follow the reference's banded BPM engines
(``Reserve_Banded_BPM`` Levenshtein_distance.h:3857, ``ed_band_cal_semi_*``
:3127+): text = query window x (aligned globally), pattern = target window y
with 2e slack, band of 2e+1 diagonals, free y-start within [0, 2e] and free
y-end within the band; errors <= e.

The traceback is bit-vector native: the per-step (VP, VN, D0, HP) words are
kept and moves are decided by bit tests (no DP matrix reconstruction):
  - after step i, VP/VN bit b is D[i+1][i+1+b+1] - D[i+1][i+1+b]
  - D0 bit b of step i is [D[i+1][i+b] == D[i][i+b-1]]
  - HP/HN bit b of step i is D[i+1][i+b] - D[i][i+b]
Traceback emits a per-x-position encoding designed for the windowed
consensus and SNP phasing (no variable-length cigars on device):
  tb_base[p] = y base aligned to x position p (0..3), or 4 if x[p] is
               deleted w.r.t. y;
  ins_cnt[p] = number of y bases inserted after x position p;
  ins_base[p] = first such inserted base.

This file is the host (numpy/int) implementation and correctness oracle;
ops/banded_align_jax.py is the batched device version (scan over text steps
on (hi,lo) uint32 pairs), cross-validated in tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class WindowAlign:
    err: int              # edit distance, or -1 if > threshold
    y_start: int          # first y base consumed (free-start offset in [0,2e])
    y_end: int            # one past last y base consumed
    tb_base: np.ndarray   # [len(x)] uint8
    ins_cnt: np.ndarray   # [len(x)] uint8
    ins_base: np.ndarray  # [len(x)] uint8


def banded_edit_np(x: np.ndarray, y: np.ndarray, e: int,
                   traceback: bool = True) -> Optional[WindowAlign]:
    """Align query window x against target window y (len(y) <= len(x)+2e).

    Returns None if the distance exceeds e.
    """
    tl, pl = len(x), len(y)
    if tl == 0:
        return WindowAlign(0, 0, 0, *(np.zeros(0, np.uint8),) * 3)
    W = 2 * e + 1
    mask = (1 << W) - 1
    Peq = [0, 0, 0, 0, 0]  # A C G T N(never matches)
    for b in range(min(W, pl)):
        Peq[y[b]] |= 1 << b
    VP = VN = 0
    err = 0
    store_vp = np.zeros(tl + 1, dtype=object)
    store_vn = np.zeros(tl + 1, dtype=object)
    store_d0 = np.zeros(tl + 1, dtype=object)
    store_hp = np.zeros(tl + 1, dtype=object)
    store_err = np.zeros(tl + 1, dtype=np.int64)
    for i in range(tl):
        Eq = Peq[x[i]] if x[i] < 4 else 0
        X = Eq | VN
        D0 = (((VP + (X & VP)) & mask) ^ VP) | X
        HN = VP & D0
        HP = VN | (~(VP | D0) & mask)
        X2 = D0 >> 1
        VN = X2 & HP
        VP = (HN | (~(X2 | HP) & mask)) & mask
        if not (D0 & 1):
            err += 1
        store_vp[i + 1], store_vn[i + 1] = VP, VN
        store_d0[i + 1], store_hp[i + 1] = D0, HP | (HN << W)
        store_err[i + 1] = err
        for c in range(4):
            Peq[c] >>= 1
        if i + W < pl:
            Peq[y[i + W]] |= 1 << (W - 1)

    # free-end scan over pattern positions tl .. pl
    best_err, best_n = err, tl
    e2 = err
    for b in range(0, min(2 * e, pl - tl)):
        e2 += (VP >> b) & 1
        e2 -= (VN >> b) & 1
        if e2 < best_err:
            best_err, best_n = e2, tl + b + 1
    # ungap preference (Reserve_Banded_BPM tail): if the centre-diagonal end
    # ties the best error, end there
    if pl - tl >= e:
        e3 = err
        for b in range(0, e):
            e3 += (VP >> b) & 1
            e3 -= (VN >> b) & 1
        if e3 == best_err:
            best_n = tl + e
    if best_err > e:
        return None
    if not traceback:
        z = np.zeros(0, np.uint8)
        return WindowAlign(int(best_err), -1, best_n, z, z, z)

    tb_base = np.full(tl, 5, dtype=np.uint8)
    ins_cnt = np.zeros(tl, dtype=np.uint8)
    ins_base = np.zeros(tl, dtype=np.uint8)
    i, j = tl, best_n
    while i > 0:
        b_row = j - i  # bit in row-i VP/VN indexing delta to pos j+1
        # deltas / validity
        d0 = store_d0[i]
        hpw = store_hp[i]
        hp, hn = hpw & mask, hpw >> W
        bb = j - i  # band bit for cell (i, j) in D0/HP of the step -> row i
        horiz_ok = False
        if j - 1 >= i and j - i - 1 >= 0:
            vpb = (store_vp[i] >> (j - i - 1)) & 1
            horiz_ok = bool(vpb)
        diag_ok = False
        if j >= 1 and 0 <= bb <= 2 * e:
            d0bit = (d0 >> bb) & 1
            match = x[i - 1] == y[j - 1] if (x[i - 1] < 4 and j - 1 < pl) else False
            diag_ok = bool((match and d0bit) or ((not match) and (not d0bit)))
        if j - 1 < i - 1:
            diag_ok = False
        vert_ok = False
        if 0 <= bb <= 2 * e and j <= (i - 1) + 2 * e:
            vert_ok = bool((hp >> bb) & 1)
        if diag_ok:
            tb_base[i - 1] = y[j - 1]
            i, j = i - 1, j - 1
        elif horiz_ok:
            # y[j-1] inserted after x position i-1
            if ins_cnt[i - 1] < 255:
                ins_cnt[i - 1] += 1
            ins_base[i - 1] = y[j - 1]
            j -= 1
        elif vert_ok:
            tb_base[i - 1] = 4  # x[i-1] deleted w.r.t. y
            i -= 1
        else:
            raise AssertionError("traceback stuck")
    return WindowAlign(int(best_err), j, best_n, tb_base, ins_cnt, ins_base)


def check_alignment(x, y, wa: WindowAlign) -> bool:
    """cigar_check analog: recompute the edit cost from the traceback."""
    cost = 0
    j = wa.y_start
    for p in range(len(x)):
        if wa.tb_base[p] == 4:
            cost += 1
        else:
            if int(wa.tb_base[p]) != int(y[j]):
                return False
            cost += int(x[p] != y[j])
            j += 1
        if wa.ins_cnt[p]:
            cost += int(wa.ins_cnt[p])
            j += int(wa.ins_cnt[p])
    # insertions recorded after position p consume y; account start-side
    return cost == wa.err and j == wa.y_end
