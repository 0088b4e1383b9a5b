"""Device chain DP vs the host chain DP, plus the sharded mesh steps."""

import numpy as np

from hifiasm_tpu.ops.chain import ChainParams, chain_dp_group
from hifiasm_tpu.ops.chain_jax import chain_scores_batch


def _mk_group(rng, n, xl=2100):
    self_off = np.sort(rng.choice(np.arange(60, xl, 3), n, replace=False))
    drift = np.cumsum(rng.integers(-1, 2, n))
    t_off = self_off + 40 + drift
    span = np.full(n, 51)
    weight = rng.integers(1, 3, n)
    return (self_off.astype(np.int64), t_off.astype(np.int64),
            span.astype(np.int64), weight.astype(np.int64))


def test_chain_jax_matches_host(rng):
    B, N = 8, 48
    xl = yl = 2100
    cols = [np.zeros((B, N), np.int32) for _ in range(4)]
    n_arr = np.zeros(B, np.int32)
    host_f = []
    p = ChainParams.for_k(51)
    p.max_iter = 5000
    groups = []
    for b in range(B):
        n = int(rng.integers(8, N + 1))
        g = _mk_group(rng, n, xl)
        groups.append(g)
        for c in range(4):
            cols[c][b, :n] = g[c]
        n_arr[b] = n
    f, pre = chain_scores_batch(
        cols[0], cols[1], cols[2], cols[3], n_arr,
        np.full(B, xl, np.int32), np.full(B, yl, np.int32))
    f = np.asarray(f)
    # host DP per group: compare best chain score
    import hifiasm_tpu.ops.chain as chain_mod
    for b in range(B):
        so, to, sp, w = groups[b]
        n = int(n_arr[b])
        fb = np.empty(n, np.int64)
        pre_b = np.full(n, -1, np.int64)
        for i in range(n):
            base = int(sp[i])
            fb[i] = base
            if i > 0:
                j = np.arange(0, i)
                sc = chain_mod._pair_scores(so[i], to[i], sp[i], w[i],
                                            so[j], to[j], xl, yl, p)
                tot = np.where(sc == chain_mod.NEG_INF, chain_mod.NEG_INF,
                               sc + fb[j])
                bj = int(np.argmax(tot))
                if tot[bj] > base:
                    fb[i] = tot[bj]
                    pre_b[i] = bj
        # integer Q16/Q4 penalty: device and host are BIT-IDENTICAL
        assert (f[b, :n] == fb).all(), \
            f"row {b}: max diff {np.abs(f[b, :n] - fb).max()}"


def test_sharded_steps_run(rng):
    from hifiasm_tpu.parallel.mesh import make_mesh
    from hifiasm_tpu.parallel.sharded_align import make_sharded_align_step
    import jax

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    e, XL = 7, 48
    YL = XL + 2 * e
    B = 4 * n_dev
    y = rng.integers(0, 4, (B, YL)).astype(np.uint8)
    x = y[:, e:e + XL].copy()
    step = make_sharded_align_step(mesh, e)
    err, *_, stats = step(x, np.full(B, XL, np.int32), y,
                          np.full(B, YL, np.int32))
    assert int(np.asarray(stats)[0]) == B
    assert (np.asarray(err) == 0).all()
