"""Scalar specification implementations used as test oracles.

These implement the *definitions* (HPC minimizer, banded edit distance,
chaining score) directly and slowly, independent of both the reference C++
and the vectorized production code, so each can be validated against them.
"""

from __future__ import annotations

import numpy as np


def yak_hash64_spec(key: int) -> int:
    M = (1 << 64) - 1
    key = ((~key & M) + ((key << 21) & M)) & M
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & M
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & M
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & M
    return key


def sketch_spec(codes, k, w, ft=None):
    """HPC (w,k)-minimizers by direct definition.

    Returns list of dicts with hash/pos/rev/span/cnt. ft maps hash->count.
    Implements: HPC compression; 1-bit-per-base fwd/rc k-mer words; skip
    symmetric; key = (count, hash); windows of w eligible k-mers (window
    valid once l >= w+k-1 within an N-free stretch); union of window argmins
    with all ties; final partial-window push (last tie wins).
    """
    M = (1 << 64) - 1
    mask = (1 << k) - 1
    shift1 = k - 1
    n = len(codes)
    entries = []  # per eligible position: dict or None(dummy)
    k0 = k1 = k2 = k3 = 0
    l = 0
    i = 0
    # tiny queue of run lengths (for span)
    runq = []
    span = 0
    stretch = 0
    while i < n:
        c = int(codes[i])
        if c < 4:
            skip = 1
            while i + skip < n and codes[i + skip] == c:
                skip += 1
            i += skip - 1
            runq.append(skip)
            span += skip
            if len(runq) > k:
                span -= runq.pop(0)
            k0 = ((k0 << 1) | (c & 1)) & mask
            k1 = ((k1 << 1) | (c >> 1)) & mask
            k2 = (k2 >> 1) | ((1 - (c & 1)) << shift1)
            k3 = (k3 >> 1) | ((1 - (c >> 1)) << shift1)
            if k1 != k3:  # not symmetric
                z = 0 if k1 < k3 else 1
                l += 1
                ent = None
                if l >= k and span < 256:
                    if z == 0:
                        y = (yak_hash64_spec(k0) + yak_hash64_spec(k1)) & M
                    else:
                        y = (yak_hash64_spec(k2) + yak_hash64_spec(k3)) & M
                    cnt = ft.get(y, 0) if ft else 0
                    ent = dict(hash=y, pos=i, rev=z, span=span, cnt=cnt,
                               l=l, stretch=stretch)
                entries.append((ent, l, stretch))
        else:
            l = 0
            runq = []
            span = 0
            stretch += 1
        i += 1

    def key(e):
        return (e["cnt"], e["hash"]) if e else (1 << 40, 1 << 70)

    emitted = {}
    ne = len(entries)
    for s in range(0, ne - w + 1):
        win = entries[s:s + w]
        e_end, l_end, st_end = win[-1]
        if entries[s][2] != st_end or l_end < w + k - 1:
            continue
        mn = min(key(e) for e, _, _ in win)
        if mn[0] >= (1 << 40):
            continue
        for e, _, _ in win:
            if e and key(e) == mn:
                emitted[e["pos"]] = e
    # final push: min over last min(w, .) entries of last stretch
    last_st = entries[-1][2] if entries else -1
    tail = [e for e, _, st in entries if st == last_st][-w:]
    best = None
    for e in tail:
        if e is None:
            continue
        if best is None or key(e) <= key(best):
            best = e
    if best is not None:
        emitted[best["pos"]] = best
    return [emitted[p] for p in sorted(emitted)]


def edit_distance_full(q, t):
    """Plain O(nm) Levenshtein (unit costs) — oracle for banded kernels."""
    n, m = len(q), len(t)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (t != q[i - 1])
        for jj in range(1, m + 1):
            cur[jj] = min(prev[jj] + 1, cur[jj - 1] + 1, sub[jj - 1])
        prev = cur
    return int(prev[m])


def edit_distance_semi(q, t):
    """Semi-global: query fully aligned, free start/end gaps on target."""
    n, m = len(q), len(t)
    prev = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (t != q[i - 1])
        for jj in range(1, m + 1):
            cur[jj] = min(prev[jj] + 1, cur[jj - 1] + 1, sub[jj - 1])
        prev = cur
    return int(prev.min()), int(np.argmin(prev))
