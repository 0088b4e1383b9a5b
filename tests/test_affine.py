"""Banded affine-gap extension (the ksw2 analog) vs the full-DP oracle."""

import numpy as np

from hifiasm_tpu.ops.affine import affine_extend, affine_extend_scalar


def test_matches_oracle_random(rng):
    for _ in range(25):
        n = int(rng.integers(5, 60))
        x = rng.integers(0, 4, n).astype(np.uint8)
        y = x.copy()
        # mutate: substitutions + a small indel
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, len(y)))
            y[p] = (y[p] + 1) & 3
        if rng.random() < 0.5 and len(y) > 10:
            p = int(rng.integers(2, len(y) - 4))
            y = np.concatenate([y[:p], y[p + int(rng.integers(1, 3)):]])
        got = affine_extend(x, y, bw=16)
        want = affine_extend_scalar(x, y, bw=16)
        assert got == want, (got, want)


def test_exact_match_full_extension():
    x = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    q, t, sc = affine_extend(x, x.copy(), bw=8)
    assert (q, t, sc) == (8, 8, 16)


def test_long_insertion_in_target():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 40).astype(np.uint8)
    b = rng.integers(0, 4, 40).astype(np.uint8)
    ins = rng.integers(0, 4, 6).astype(np.uint8)
    x = np.concatenate([a, b])
    y = np.concatenate([a, ins, b])
    q, t, sc = affine_extend(x, y, bw=16)
    assert q == len(x) and t == len(y)
    # 80 matches minus one affine gap of 6
    assert sc == 80 * 2 - (4 + 2 * 6)


def test_empty_and_no_extension():
    assert affine_extend(np.zeros(0, np.uint8),
                         np.zeros(4, np.uint8)) == (0, 0, 0)
    # all mismatches: best is the empty extension
    x = np.zeros(10, np.uint8)
    y = np.full(10, 2, np.uint8)
    assert affine_extend(x, y, bw=4)[2] == 0
