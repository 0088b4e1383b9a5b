"""Cross-validation of the fused Pallas align+traceback kernel
(ops/pallas_tb.py) against the numpy oracle and the XLA-scan engine.

Runs in Pallas interpret mode on the CPU test backend; the kernel must
be BIT-IDENTICAL on every output (err, y_start, y_end, tb, ic, ib) —
the device EC path swaps it in for banded_core on TPU backends and the
host/device identity tests depend on it.
"""

import numpy as np
import pytest

from hifiasm_tpu.ops.banded_batch import banded_batch_np
from hifiasm_tpu.ops.pallas_tb import pallas_banded_tb


def _mutate(seq, n_err, rng):
    s = list(seq)
    for _ in range(n_err):
        k = rng.choice(3)
        p = int(rng.integers(0, len(s)))
        if k == 0:
            s[p] = int(rng.integers(0, 4))
        elif k == 1 and len(s) > 1:
            del s[p]
        else:
            s.insert(p, int(rng.integers(0, 4)))
    return np.array(s, np.uint8)


def _problems(rng, B, XL, e):
    YL = XL + 2 * e
    x = np.full((B, XL), 4, np.uint8)
    y = np.full((B, YL), 4, np.uint8)
    xlen = np.zeros(B, np.int64)
    ylen = np.zeros(B, np.int64)
    for b in range(B):
        xl = XL if b % 3 else int(rng.integers(XL // 2, XL + 1))
        base = rng.integers(0, 4, xl).astype(np.uint8)
        yb = _mutate(base, int(rng.integers(0, 40)), rng)
        off = int(rng.integers(0, 2 * e + 1))
        yfull = np.concatenate(
            [rng.integers(0, 4, off).astype(np.uint8), yb,
             rng.integers(0, 4, YL).astype(np.uint8)])[:YL]
        yl = YL if b % 4 else int(rng.integers(1, YL))
        if b % 17 == 0:
            yl = int(rng.integers(1, max(xl, 2)))   # ylen < xlen
        x[b, :xl] = base
        xlen[b] = xl
        y[b, :yl] = yfull[:yl]
        ylen[b] = yl
    # degenerate lanes
    xlen[0] = 0
    ylen[1 % B] = 0
    return x, xlen, y, ylen


@pytest.mark.parametrize("XL", [96, 160])
def test_pallas_tb_matches_oracle(XL):
    rng = np.random.default_rng(11 + XL)
    e = 31
    x, xlen, y, ylen = _problems(rng, 128, XL, e)
    ref = banded_batch_np(x, xlen, y, ylen, e, traceback=True)
    err, ys, yn, tb, ic, ib = pallas_banded_tb(
        x, xlen, y, ylen, e, bb_lanes=128, interpret=True)
    assert np.array_equal(ref.err, err)
    assert np.array_equal(ref.y_start, ys)
    assert np.array_equal(ref.y_end, yn)
    assert np.array_equal(ref.tb_base, tb)
    assert np.array_equal(ref.ins_cnt, ic)
    assert np.array_equal(ref.ins_base, ib)
    assert (np.asarray(err) >= 0).sum() > 16      # mix of pass/fail


def test_pallas_tb_pads_batch():
    rng = np.random.default_rng(5)
    e = 31
    x, xlen, y, ylen = _problems(rng, 70, 96, e)   # B not lane-aligned
    ref = banded_batch_np(x, xlen, y, ylen, e, traceback=True)
    err, ys, yn, tb, ic, ib = pallas_banded_tb(
        x, xlen, y, ylen, e, bb_lanes=128, interpret=True)
    assert np.array_equal(ref.err, err)
    assert np.array_equal(ref.tb_base, tb)
