"""Batched Myers engine vs the scalar oracle (banded_edit_np)."""

import numpy as np
import pytest

from hifiasm_tpu.ops.banded_align import banded_edit_np, check_alignment
from hifiasm_tpu.ops.banded_batch import banded_batch_np
from tests.synth import inject_errors


def _mk_problems(rng, n, e, xl_range=None):
    xl_range = xl_range or (20, min(300, max(40, e * 30)))
    xs, ys = [], []
    for _ in range(n):
        xl = int(rng.integers(*xl_range))
        y0 = rng.integers(0, 4, xl + 2 * e).astype(np.uint8)
        # x is a mutated slice of y so most problems align within e
        s = int(rng.integers(0, 2 * e + 1))
        x = inject_errors(rng, y0[s:s + xl].copy(), 0.03)[:xl]
        if len(x) < xl:
            x = np.concatenate([x, rng.integers(0, 4, xl - len(x)).astype(np.uint8)])
        xs.append(x)
        ys.append(y0)
    return xs, ys


@pytest.mark.parametrize("e", [3, 15, 31])
def test_batch_matches_scalar(rng, e):
    xs, ys = _mk_problems(rng, 40, e)
    XL = max(len(x) for x in xs)
    YL = max(len(y) for y in ys)
    B = len(xs)
    xb = np.full((B, XL), 4, np.uint8)
    yb = np.full((B, YL), 4, np.uint8)
    xlen = np.zeros(B, np.int64)
    ylen = np.zeros(B, np.int64)
    for i, (x, y) in enumerate(zip(xs, ys)):
        xb[i, :len(x)] = x
        yb[i, :len(y)] = y
        xlen[i], ylen[i] = len(x), len(y)
    out = banded_batch_np(xb, xlen, yb, ylen, e)
    n_ok = 0
    for i, (x, y) in enumerate(zip(xs, ys)):
        ref = banded_edit_np(x, y, e)
        if ref is None:
            assert out.err[i] == -1
            continue
        n_ok += 1
        assert out.err[i] == ref.err
        assert out.y_end[i] == ref.y_end
        assert out.y_start[i] == ref.y_start
        np.testing.assert_array_equal(out.tb_base[i, :len(x)], ref.tb_base)
        np.testing.assert_array_equal(out.ins_cnt[i, :len(x)], ref.ins_cnt)
        np.testing.assert_array_equal(out.ins_base[i, :len(x)], ref.ins_base)
        assert check_alignment(x, y, ref)
    assert n_ok > len(xs) // 2


def test_no_traceback_mode(rng):
    e = 7
    xs, ys = _mk_problems(rng, 10, e)
    B = len(xs)
    XL = max(len(x) for x in xs)
    YL = max(len(y) for y in ys)
    xb = np.full((B, XL), 4, np.uint8)
    yb = np.full((B, YL), 4, np.uint8)
    xlen = np.array([len(x) for x in xs])
    ylen = np.array([len(y) for y in ys])
    for i in range(B):
        xb[i, :xlen[i]] = xs[i]
        yb[i, :ylen[i]] = ys[i]
    full = banded_batch_np(xb, xlen, yb, ylen, e, traceback=True)
    fast = banded_batch_np(xb, xlen, yb, ylen, e, traceback=False)
    np.testing.assert_array_equal(full.err, fast.err)
    np.testing.assert_array_equal(full.y_end, fast.y_end)
