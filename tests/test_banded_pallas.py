"""Pallas forward Myers kernel vs the numpy engine (interpret mode)."""

import numpy as np
import pytest

from hifiasm_tpu.ops.banded_batch import banded_batch_np
from hifiasm_tpu.ops.banded_pallas import banded_forward_pallas
from tests.test_banded_batch import _mk_problems


@pytest.mark.parametrize("e", [7, 31])
def test_pallas_forward_matches_numpy(rng, e):
    xs, ys = _mk_problems(rng, 25, e)
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
    out = banded_forward_pallas(xb, xlen, yb, ylen, e, interpret=True)
    np.testing.assert_array_equal(out.err, ref.err)
    okm = ref.err >= 0
    np.testing.assert_array_equal(out.y_end[okm], ref.y_end[okm])
