"""Phased window-grid invariants: exact tiling of [x_s, x_e], quantized
first-window lengths, identical plans across the three python planners."""

import numpy as np

from hifiasm_tpu.ec.window_align import (
    _grid_phase, plan_read_windows, plan_windows_many,
)
from hifiasm_tpu.overlap.anchors import OverlapRegions


def _mk_ov(rng, n, rlen):
    ov = OverlapRegions(0)
    ov.y_id = rng.integers(0, 500, n).astype(np.uint32)
    ov.rev = rng.integers(0, 2, n).astype(np.uint8)
    xs = rng.integers(0, rlen - 100, n)
    xe = xs + rng.integers(50, rlen - xs, n)
    ov.x_s = xs.astype(np.int64)
    ov.x_e = np.minimum(xe, rlen - 1).astype(np.int64)
    ov.y_s = ov.x_s.copy()
    ov.y_e = ov.x_e.copy()
    ov.score = np.full(n, 50, np.int64)
    ov.n_hits = np.ones(n, np.int64)
    ov.hit_start = np.arange(n, dtype=np.int64)
    ov.hit_self = ov.x_s.copy()
    ov.hit_t = ov.y_s.copy()
    ov.hit_span = np.full(n, 19, np.int64)
    return ov


def test_phase_quantized():
    for wl in (775, 375):
        y = np.arange(1000, dtype=np.uint32)
        r = (y & 1).astype(np.uint8)
        p = _grid_phase(y, r, wl)
        q5 = wl // 5
        assert set(np.unique(p)) <= {0, q5, 2 * q5, 3 * q5, 4 * q5}
        # all five classes occur
        assert len(np.unique(p)) == 5


def test_windows_tile_exactly(rng):
    wl = 775
    for trial in range(5):
        rlen = int(rng.integers(1000, 40000))
        ov = _mk_ov(rng, 40, rlen)
        pl = plan_read_windows(ov, wl, 0.04)
        for o in range(len(ov)):
            m = pl["ov_idx"] == o
            ws, wlen = pl["ws"][m], pl["wlen"][m]
            # exact, gapless, in-order tiling of [x_s, x_e]
            assert ws[0] == ov.x_s[o]
            assert (ws[1:] == ws[:-1] + wlen[:-1]).all()
            assert ws[-1] + wlen[-1] == ov.x_e[o] + 1
            assert (wlen >= 1).all() and (wlen <= wl).all()
            # non-first, non-last windows are FULL; the first is the
            # quantized phase (or full)
            if len(ws) > 2:
                assert (wlen[1:-1] == wl).all()
            p0 = int(_grid_phase(ov.y_id[o:o+1], ov.rev[o:o+1], wl)[0])
            if len(ws) > 1 and p0:
                assert wlen[0] == p0
            # exactly one 'last'
            assert pl["last"][m].sum() == 1 and pl["last"][m][-1]


def test_planners_agree(rng):
    wl = 775
    ov = _mk_ov(rng, 60, 30000)
    a = plan_read_windows(ov, wl, 0.04, with_tws=False)
    b = plan_windows_many([(7, ov)], wl, 0.04)[7]
    for f in ("ov_idx", "ws", "wlen", "thre", "last"):
        np.testing.assert_array_equal(np.asarray(a[f]),
                                      np.asarray(b[f]), err_msg=f)
