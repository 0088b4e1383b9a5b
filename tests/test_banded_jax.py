"""JAX device engine vs the numpy host oracle."""

import numpy as np
import pytest

from hifiasm_tpu.ops.banded_batch import banded_batch_np
from hifiasm_tpu.ops.banded_align_jax import banded_batch_jax
from tests.test_banded_batch import _mk_problems


@pytest.mark.parametrize("e", [5, 24, 31])
def test_jax_matches_numpy(rng, e):
    xs, ys = _mk_problems(rng, 30, e)
    B = len(xs)
    XL = max(len(x) for x in xs)
    YL = XL + 2 * e
    xb = np.full((B, XL), 4, np.uint8)
    yb = np.full((B, YL), 4, np.uint8)
    xlen = np.array([len(x) for x in xs])
    ylen = np.array([min(len(y), YL) for y in ys])
    for i in range(B):
        xb[i, :xlen[i]] = xs[i]
        yb[i, :ylen[i]] = ys[i][:ylen[i]]
    ref = banded_batch_np(xb, xlen, yb, ylen, e)
    out = banded_batch_jax(xb, xlen, yb, ylen, e)
    np.testing.assert_array_equal(out.err, ref.err)
    okm = ref.err >= 0
    np.testing.assert_array_equal(out.y_end[okm], ref.y_end[okm])
    np.testing.assert_array_equal(out.y_start[okm], ref.y_start[okm])
    np.testing.assert_array_equal(out.tb_base[okm], ref.tb_base[okm])
    np.testing.assert_array_equal(out.ins_cnt[okm], ref.ins_cnt[okm])
    np.testing.assert_array_equal(out.ins_base[okm], ref.ins_base[okm])


def test_jax_no_traceback(rng):
    e = 15
    xs, ys = _mk_problems(rng, 12, e)
    B = len(xs)
    XL = max(len(x) for x in xs)
    YL = XL + 2 * e
    xb = np.full((B, XL), 4, np.uint8)
    yb = np.full((B, YL), 4, np.uint8)
    xlen = np.array([len(x) for x in xs])
    ylen = np.array([min(len(y), YL) for y in ys])
    for i in range(B):
        xb[i, :xlen[i]] = xs[i]
        yb[i, :ylen[i]] = ys[i][:ylen[i]]
    ref = banded_batch_np(xb, xlen, yb, ylen, e, traceback=False)
    out = banded_batch_jax(xb, xlen, yb, ylen, e, traceback=False)
    np.testing.assert_array_equal(out.err, ref.err)
    np.testing.assert_array_equal(out.y_end, ref.y_end)
