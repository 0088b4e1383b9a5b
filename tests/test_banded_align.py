import numpy as np
import pytest

from hifiasm_tpu.ops.banded_align import banded_edit_np, check_alignment

from tests.scalar_spec import edit_distance_semi


def _oracle_banded(x, y, e):
    """Band-constrained semi-global DP oracle (free y start in [0,2e],
    free y end, x global, band j-i in [0,2e])."""
    tl, pl = len(x), len(y)
    INF = 10 ** 9
    D = np.full((tl + 1, pl + 1), INF, dtype=np.int64)
    D[0, : min(2 * e, pl) + 1] = 0
    for i in range(1, tl + 1):
        for j in range(i, min(i + 2 * e, pl) + 1):
            best = D[i - 1][j - 1] + (x[i - 1] != y[j - 1])
            if j - 1 >= i:
                best = min(best, D[i][j - 1] + 1)
            if j <= (i - 1) + 2 * e:
                best = min(best, D[i - 1][j] + 1)
            D[i][j] = best
    return int(D[tl][tl: pl + 1].min())


@pytest.mark.parametrize("e", [2, 5, 15, 31])
def test_banded_matches_oracle(rng, e):
    for trial in range(30):
        tl = int(rng.integers(10, 120))
        pl = tl + 2 * e
        y = rng.integers(0, 4, pl).astype(np.uint8)
        x = y[rng.integers(0, 2 * e + 1):][:tl].copy()
        for _ in range(int(rng.integers(0, e + 2))):
            p = int(rng.integers(0, len(x)))
            x[p] = rng.integers(0, 4)
        want = _oracle_banded(x, y, e)
        got = banded_edit_np(x, y, e)
        if want > e:
            assert got is None
        else:
            assert got is not None
            assert got.err == want
            assert check_alignment(x, y, got), f"traceback invalid e={e} t={trial}"


def test_banded_exact_match():
    x = np.array([0, 1, 2, 3, 0, 1, 2, 3, 2, 1], dtype=np.uint8)
    y = np.concatenate([[3, 3], x, [0, 0]]).astype(np.uint8)
    wa = banded_edit_np(x, y, 2)
    assert wa.err == 0
    assert wa.y_start == 2 and wa.y_end == 12
    assert np.array_equal(wa.tb_base, x)
    assert wa.ins_cnt.sum() == 0


def test_banded_single_sub():
    x = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    y = x.copy()
    y[4] = 3
    y2 = np.concatenate([[1], y, [2]]).astype(np.uint8)
    wa = banded_edit_np(x, y2, 1)
    assert wa.err == 1
    assert wa.tb_base[4] == 3  # target allele at the SNP site


def test_banded_insertion_in_target(rng):
    x = rng.integers(0, 4, 50).astype(np.uint8)
    y = np.concatenate([x[:20], [2], x[20:]]).astype(np.uint8)  # y has extra base
    y = np.concatenate([y, [0, 0, 0]]).astype(np.uint8)
    wa = banded_edit_np(x, y, 2)
    assert wa.err == 1
    assert wa.ins_cnt.sum() == 1
    p = int(np.flatnonzero(wa.ins_cnt)[0])
    assert 16 <= p <= 21  # placement ambiguous when base repeats nearby
    assert wa.ins_base[p] == 2


def test_banded_deletion_in_target(rng):
    # production convention: y window starts e bases before the expected
    # diagonal so the band [0, 2e] can hold +-e drift
    x = rng.integers(0, 4, 50).astype(np.uint8)
    ydel = np.concatenate([x[:20], x[21:]]).astype(np.uint8)
    y = np.concatenate([[1, 1], ydel, [0, 0, 0]]).astype(np.uint8)
    wa = banded_edit_np(x, y, 2)
    assert wa.err == 1
    assert wa.y_start == 2
    p = int(np.flatnonzero(wa.tb_base == 4)[0])
    assert 18 <= p <= 22  # deletion placement ambiguous near repeats


def test_banded_over_threshold(rng):
    x = rng.integers(0, 4, 100).astype(np.uint8)
    y = rng.integers(0, 4, 104).astype(np.uint8)  # unrelated
    assert banded_edit_np(x, y, 2) is None


def test_banded_hifi_window(rng):
    """775bp window with e=31 (the production shape)."""
    e = 31
    y = rng.integers(0, 4, 775 + 2 * e).astype(np.uint8)
    x = y[e:e + 775].copy()
    # ~3% errors
    for _ in range(20):
        p = int(rng.integers(1, len(x) - 1))
        r = rng.random()
        if r < 0.3:
            x[p] = (x[p] + 1) % 4
        elif r < 0.6:
            x = np.concatenate([x[:p], [x[p]], x[p:]])[:775]
        else:
            x = np.concatenate([x[:p], x[p + 1:], [0]])[:775]
    wa = banded_edit_np(x, y, e)
    assert wa is not None
    assert wa.err <= 40
    assert check_alignment(x, y, wa)
