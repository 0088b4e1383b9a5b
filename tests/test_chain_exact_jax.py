"""chain_exact_batch (device) vs chain_dp_ref (scalar oracle): the
exact-control-flow device DP must match (f, pre, quick) BIT FOR BIT,
including the quick pre-pass, the max_skip break, and the max_ii
fallback (lchain_qdp_mcopy_fast, Hash_Table.cpp:2097)."""

import numpy as np
import pytest

from hifiasm_tpu.ops.chain import ChainParams, chain_dp_ref
from hifiasm_tpu.ops.chain_jax import chain_exact_batch


def _rand_group(rng, n, xl, style):
    if style == "clean":
        # collinear: quick pre-pass should resolve
        so = np.sort(rng.choice(np.arange(60, xl - 60, 2), n,
                                replace=False))
        to = so + 40 + np.cumsum(rng.integers(-1, 2, n))
    elif style == "repeat":
        # two interleaved diagonals: exercises max_skip + mcopy
        so = np.sort(rng.choice(np.arange(60, xl - 60, 2), n,
                                replace=False))
        off = np.where(rng.random(n) < 0.5, 40, 2400)
        to = so + off + rng.integers(-2, 3, n)
    else:
        # noise: many invalid predecessors, skips, ties
        so = np.sort(rng.integers(60, xl - 60, n))
        to = rng.integers(1, xl, n)
        order = np.lexsort((to, so))
        so, to = so[order], to[order]
    span = rng.integers(20, 52, n)
    w = rng.integers(1, 3, n)
    return (so.astype(np.int64), to.astype(np.int64),
            span.astype(np.int64), w.astype(np.int64))


@pytest.mark.parametrize("style", ["clean", "repeat", "noise"])
def test_chain_exact_matches_oracle(rng, style):
    B, N = 24, 64
    xl = yl = 3000
    p = ChainParams.for_k(51)
    cols = [np.zeros((B, N), np.int32) for _ in range(4)]
    n_arr = np.zeros(B, np.int32)
    groups = []
    for b in range(B):
        n = int(rng.integers(3, N + 1))
        g = _rand_group(rng, n, xl, style)
        groups.append(g)
        for c in range(4):
            cols[c][b, :n] = g[c]
        n_arr[b] = n
    f, pre, quick = chain_exact_batch(
        cols[0], cols[1], cols[2], cols[3], n_arr,
        np.full(B, xl, np.int32), np.full(B, yl, np.int32),
        max_iter=p.max_iter, max_skip=p.max_skip, max_dis=p.max_dis,
        quick_check=p.quick_check, pg_q16=p.pg_q16,
        pskip_q16=p.pskip_q16, bw_q16=p.bw_q16, invbw_q4=p.invbw_q4)
    f = np.asarray(f)
    pre = np.asarray(pre)
    quick = np.asarray(quick)
    n_quick = 0
    for b in range(B):
        so, to, sp, w = groups[b]
        n = int(n_arr[b])
        fr, prer, qr = chain_dp_ref(so, to, sp, w, xl, yl, p)
        assert bool(quick[b]) == bool(qr), f"{style} row {b}: quick flag"
        assert (f[b, :n] == fr).all(), \
            f"{style} row {b}: f diff {np.abs(f[b, :n] - fr).max()}"
        assert (pre[b, :n] == prer).all(), f"{style} row {b}: pre"
        n_quick += bool(qr)
    if style == "clean":
        assert n_quick >= B // 2       # pre-pass must actually engage
    if style == "noise":
        assert n_quick < B             # full DP must actually engage


def test_chain_exact_matches_native(rng):
    """Also agree with the native C++ kernel when available."""
    from hifiasm_tpu.native import chain_dp_native, get_lib
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    B, N = 16, 48
    xl = yl = 2500
    p = ChainParams.for_k(51)
    cols = [np.zeros((B, N), np.int32) for _ in range(4)]
    n_arr = np.zeros(B, np.int32)
    groups = []
    for b in range(B):
        n = int(rng.integers(4, N + 1))
        g = _rand_group(rng, n, xl, ("clean", "repeat", "noise")[b % 3])
        groups.append(g)
        for c in range(4):
            cols[c][b, :n] = g[c]
        n_arr[b] = n
    f, pre, quick = chain_exact_batch(
        cols[0], cols[1], cols[2], cols[3], n_arr,
        np.full(B, xl, np.int32), np.full(B, yl, np.int32))
    f = np.asarray(f)
    pre = np.asarray(pre)
    for b in range(B):
        so, to, sp, w = groups[b]
        n = int(n_arr[b])
        fn, pren, qn = chain_dp_native(so, to, sp, w, xl, yl, p)
        assert bool(np.asarray(quick)[b]) == qn
        assert (f[b, :n] == fn).all(), f"row {b}"
        assert (pre[b, :n] == pren).all(), f"row {b}"


def test_extract_chains_batch_matches_host(rng):
    """Device traceback + mcopy peeling == ops/chain.extract_chains."""
    from hifiasm_tpu.ops.chain import extract_chains
    from hifiasm_tpu.ops.chain_jax import extract_chains_batch

    B, N = 24, 96
    xl = yl = 3000
    p = ChainParams.for_k(51, mcopy_num=3, mcopy_khit_cut=6)
    cols = [np.zeros((B, N), np.int32) for _ in range(4)]
    n_arr = np.zeros(B, np.int32)
    groups = []
    for b in range(B):
        n = int(rng.integers(6, N + 1))
        g = _rand_group(rng, n, xl, ("clean", "repeat", "noise")[b % 3])
        groups.append(g)
        for c in range(4):
            cols[c][b, :n] = g[c]
        n_arr[b] = n
    f, pre, quick = chain_exact_batch(
        cols[0], cols[1], cols[2], cols[3], n_arr,
        np.full(B, xl, np.int32), np.full(B, yl, np.int32))
    label, cnt, sc, first, last, nh = extract_chains_batch(
        f, pre, quick, cols[0], cols[1], n_arr,
        np.full(B, xl, np.int32), np.full(B, yl, np.int32),
        mcopy_num=p.mcopy_num, mcopy_khit_cut=p.mcopy_khit_cut,
        mcopy_q16=p.mcopy_q16)
    label = np.asarray(label)
    cnt = np.asarray(cnt)
    sc = np.asarray(sc)
    first = np.asarray(first)
    last = np.asarray(last)
    nh = np.asarray(nh)
    n_multi = 0
    for b in range(B):
        so, to, sp, w = groups[b]
        n = int(n_arr[b])
        fh = np.asarray(f[b, :n]).astype(np.int64)
        ph = np.asarray(pre[b, :n]).astype(np.int64)
        chains = extract_chains(fh, ph, so.astype(np.int64),
                                to.astype(np.int64), xl, yl, p,
                                quick=bool(np.asarray(quick)[b]))
        assert cnt[b] == len(chains), f"row {b}: chain count"
        n_multi += len(chains) > 1
        for k, (sck, idx) in enumerate(chains):
            assert sc[b, k] == sck, f"row {b} chain {k}: score"
            mine = np.flatnonzero(label[b, :n] == k)
            assert (mine == idx).all(), f"row {b} chain {k}: hits"
            assert first[b, k] == idx[0] and last[b, k] == idx[-1]
            assert nh[b, k] == len(idx)
    assert n_multi >= 1          # the repeat style must exercise mcopy
