"""Window-boundary retry (~recalcate_window_advance, Correct.cpp:10935).

A window whose chain-hit projection misses the band (shift > e) is
rejected in pass 1 and retried once at the offset chained from a
pass-1-accepted neighbor (previous window's precise end, or next
window's precise start minus the window length).  The case here shifts
one projection by +60 (band is 31), so WITHOUT the retry the overlap can
never be fully aligned — win_ok == win_tot proves recovery.  All four
engine paths must agree bit-identically.
"""

import numpy as np

from hifiasm_tpu.config import THRESHOLD_MAX_SIZE, WINDOW_HC
from hifiasm_tpu.ec.window_align import align_overlaps, resolve_engine
from hifiasm_tpu.io.readstore import ReadStore
from hifiasm_tpu.overlap.anchors import OverlapRegions

WL = WINDOW_HC
E_RATE = 0.03


def _mk_case(rng, bad_window: int):
    """q == t[:3100]; 4 windows; one window's hit projection off by +60."""
    t = rng.integers(0, 4, 3200).astype(np.uint8)
    q = t[:3100].copy()
    ov = OverlapRegions(0)
    ov.y_id = np.array([1], np.uint32)
    ov.rev = np.array([0], np.uint8)
    ov.x_s = np.array([0], np.int64)
    ov.x_e = np.array([3099], np.int64)
    ov.y_s = np.array([0], np.int64)
    ov.y_e = np.array([3099], np.int64)
    ov.score = np.array([100], np.int64)
    if bad_window == 1:
        # forward chaining: window 1 projects from the misleading middle
        # hit; windows 0/2/3 project correctly
        hs = np.array([100, 1300, 3000], np.int64)
        ht = np.array([100, 1360, 3000], np.int64)
    else:
        # backward chaining: window 0 misprojected, window 1 fine
        hs = np.array([100, 1300, 3000], np.int64)
        ht = np.array([160, 1300, 3000], np.int64)
    ov.n_hits = np.array([len(hs)], np.int64)
    ov.hit_start = np.array([0], np.int64)
    ov.hit_self = hs
    ov.hit_t = ht
    ov.hit_span = np.full(len(hs), 19, np.int64)
    return q, t, ov


def _n_win_expected():
    # phased window grid (window_align._grid_phase): y_id=1 -> first
    # window 197 bp, then full 775 windows over the 3100 bp span
    from hifiasm_tpu.ec.window_align import _grid_phase
    p0 = int(_grid_phase(np.array([1], np.uint32),
                         np.array([0], np.uint8), WL)[0])
    P = p0 if p0 else WL
    return 1 + max(-(-(3100 - P) // WL), 0)


def _check(tbs, q):
    assert tbs.win_tot[0] == _n_win_expected()
    assert tbs.win_ok[0] == tbs.win_tot[0], \
        "retry did not recover the rejected window"
    assert tbs.err[0] == 0
    assert tbs.ts[0] == 0 and tbs.te[0] == 3099
    np.testing.assert_array_equal(tbs.tb[:3100], q)


def test_retry_engines_agree(rng):
    for bad in (1, 0):
        q, t, ov = _mk_case(rng, bad)
        gt = lambda tid, rev: t            # noqa: E731
        tbs_np = align_overlaps(q, ov, gt, E_RATE,
                                engine=resolve_engine("numpy"))
        _check(tbs_np, q)
        tbs_nj = align_overlaps(q, ov, gt, E_RATE)   # native jobs path
        _check(tbs_nj, q)
        np.testing.assert_array_equal(tbs_np.tb, tbs_nj.tb[:len(tbs_np.tb)])
        np.testing.assert_array_equal(tbs_np.ins_cnt,
                                      tbs_nj.ins_cnt[:len(tbs_np.ins_cnt)])


def test_retry_fused_matches(rng):
    from hifiasm_tpu.native import ec_batch_native, get_lib

    if get_lib() is None:
        return
    q, t, ov = _mk_case(rng, 1)
    bank_off = np.array([0, len(q), len(q) + len(t)], np.int64)
    bank = np.concatenate([q, t])
    cols = dict(r_ov_off=np.array([0, 1], np.int64), y_id=ov.y_id,
                rev=ov.rev, x_s=ov.x_s, x_e=ov.x_e, y_s=ov.y_s,
                y_e=ov.y_e, hit_off=ov.hit_start, n_hits=ov.n_hits,
                hit_self=ov.hit_self, hit_t=ov.hit_t)
    res = ec_batch_native([q], bank_off, bank, cols,
                          (WL, THRESHOLD_MAX_SIZE, E_RATE,
                           THRESHOLD_MAX_SIZE, 2, 3, 0.500001), True)
    assert res["win_tot"][0] == _n_win_expected() and res["win_ok"][0] == res["win_tot"][0]
    assert res["err"][0] == 0
    assert res["ts"][0] == 0 and res["te"][0] == 3099
    np.testing.assert_array_equal(res["arena"][0][:3100], q)


def test_retry_device_matches(rng):
    from hifiasm_tpu.ec.device_ec import DeviceEC

    q, t, ov = _mk_case(rng, 1)
    store = ReadStore.from_arrays(["q", "t"], [q, t])
    dev = DeviceEC(store, wl=WL, e_rate=E_RATE)
    outs, _ = dev.process([(0, ov)])
    eco = outs[0]
    assert eco.win_tot[0] == _n_win_expected() and eco.win_ok[0] == eco.win_tot[0]
    assert eco.err[0] == 0
    assert eco.ts[0] == 0 and eco.te[0] == 3099
