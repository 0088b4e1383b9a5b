"""Block-gather window extraction vs the index-mask reference semantics.

The device bank stores pad-value 4 on both sides of every read row so
that the embedding-style 128-byte block gather + log-shift realign in
ec/device_ec._take_windows reproduces the old element-gather masks
((0 <= idx < len) else 4) bit for bit.  This locks the edge cases:
negative y starts (t_ws < band), windows running past the read end,
reverse-strand rows, and reads of exactly-bucketed lengths.
"""

import numpy as np
import pytest

from hifiasm_tpu.ec.device_ec import E_BAND, _gather_align, build_bank
from hifiasm_tpu.io.readstore import ReadStore, revcomp_codes


def _ref_windows(store, XL, e, q_rid, q_ws, xlen, t_rid, t_rev, t_ws,
                 last):
    """The original element-gather semantics, in plain numpy."""
    lens = store.lens
    B = len(q_rid)
    YL = XL + 2 * e
    x = np.full((B, XL), 4, np.uint8)
    y = np.full((B, YL), 4, np.uint8)
    for b in range(B):
        q = store.get_codes(int(q_rid[b]))
        for j in range(XL):
            i = q_ws[b] + j
            if i < len(q):
                x[b, j] = q[i]
        t = store.get_codes(int(t_rid[b]))
        tv = revcomp_codes(t) if t_rev[b] else t
        y0 = t_ws[b] - e
        for j in range(YL):
            i = y0 + j
            if 0 <= i < len(t):
                y[b, j] = tv[i]
    ylen = np.clip(lens[t_rid] - (t_ws - e), 0, XL + 2 * e)
    xlen_eff = np.where(last & (ylen < xlen), ylen, xlen)
    return x, xlen_eff, y, ylen


@pytest.mark.parametrize("seed", [3, 11])
def test_block_gather_matches_element_masks(seed):
    import jax.numpy as jnp

    from hifiasm_tpu.ops import banded_align_jax as baj

    rng = np.random.default_rng(seed)
    reads = [rng.integers(0, 4, n).astype(np.uint8)
             for n in (900, 2048, 1777, 950, 1201)]
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    bank = build_bank(store, l_bucket=1024)
    XL, e = 775, E_BAND
    B = 64
    q_rid = rng.integers(0, len(reads), B).astype(np.int32)
    t_rid = rng.integers(0, len(reads), B).astype(np.int32)
    t_rev = rng.integers(0, 2, B).astype(np.int32)
    lens = store.lens
    # deliberately include starts near 0 (negative y0) and near the end
    q_ws = (rng.random(B) * lens[q_rid]).astype(np.int32)
    q_ws[:8] = 0
    q_ws[8:16] = np.maximum(lens[q_rid[8:16]] - 10, 0)
    t_ws = (rng.random(B) * lens[t_rid]).astype(np.int32)
    t_ws[:8] = rng.integers(0, e, 8)          # y0 = t_ws - e < 0
    t_ws[16:24] = np.maximum(lens[t_rid[16:24]] - 5, 0)
    # deep-negative retry candidates (retry_plan's backward offset can
    # reach -(window + band)); the bank's left pad must absorb these
    t_ws[24:28] = -np.int32([500, 806, 100, 31])
    xlen = np.minimum(XL, lens[q_rid] - q_ws).astype(np.int32)
    last = rng.integers(0, 2, B).astype(bool)

    # reference: element masks
    x_r, xlen_r, y_r, ylen_r = _ref_windows(
        store, XL, e, q_rid, q_ws, xlen, t_rid, t_rev, t_ws, last)

    # device path: run _gather_align's gather by calling it with a
    # banded_core stub that captures its inputs
    cap = {}
    real = baj.banded_core

    def spy(x, xlen_eff, y, ylen, ee, tb):
        cap.update(x=np.asarray(x), xlen=np.asarray(xlen_eff),
                   y=np.asarray(y), ylen=np.asarray(ylen))
        return real(x, xlen_eff, y, ylen, ee, tb)

    import hifiasm_tpu.ec.device_ec as dev
    orig = dev.banded_core
    dev.banded_core = spy
    try:
        _gather_align(XL, e, bank.NB, "scan", bank.blocks, bank.lens,
                      jnp.asarray(q_rid), jnp.asarray(q_ws),
                      jnp.asarray(xlen), jnp.asarray(t_rid),
                      jnp.asarray(t_rev), jnp.asarray(t_ws),
                      jnp.asarray(last))
    finally:
        dev.banded_core = orig

    np.testing.assert_array_equal(cap["x"], x_r)
    np.testing.assert_array_equal(cap["y"], y_r)
    np.testing.assert_array_equal(cap["xlen"], xlen_r)
    np.testing.assert_array_equal(cap["ylen"], ylen_r)
