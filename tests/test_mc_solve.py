"""Spin solver: planted bipartite haplotype structure must be recovered."""

import numpy as np

from hifiasm_tpu.phasing.mc_solve import mc_solve


def test_planted_bipartition(rng):
    # two haplotype groups; positive (inter-hap) edges across, noise within
    n = 40
    truth = np.where(np.arange(n) % 2 == 0, 1, -1)
    ex, ey, ew = [], [], []
    for _ in range(300):
        a, b = rng.integers(0, n, 2)
        if a == b:
            continue
        if truth[a] != truth[b]:
            w = 5.0 + rng.random()        # inter-hap evidence
        else:
            w = -3.0 - rng.random()       # same-hap attraction
        ex.append(a)
        ey.append(b)
        ew.append(w)
    s = mc_solve(n, np.array(ex), np.array(ey), np.array(ew),
                 n_perturb=100)
    agree = (s == truth).mean()
    assert agree > 0.95 or agree < 0.05, f"agree={agree}"  # sign symmetric


def test_components_independent(rng):
    # two disjoint pairs with strong inter-hap edges
    ex = np.array([0, 2])
    ey = np.array([1, 3])
    ew = np.array([10.0, 10.0])
    s = mc_solve(4, ex, ey, ew, n_perturb=10)
    assert s[0] == -s[1]
    assert s[2] == -s[3]
    assert set(np.unique(s)) <= {-1, 1}


def test_deterministic(rng):
    ex = rng.integers(0, 20, 60)
    ey = rng.integers(0, 20, 60)
    ew = rng.random(60) * 4 - 2
    keep = ex != ey
    s1 = mc_solve(20, ex[keep], ey[keep], ew[keep], n_perturb=50, seed=11)
    s2 = mc_solve(20, ex[keep], ey[keep], ew[keep], n_perturb=50, seed=11)
    np.testing.assert_array_equal(s1, s2)


def test_polyploid_k3(rng):
    from hifiasm_tpu.phasing.mc_solve import mc_solve_k
    # 9 nodes in 3 planted groups; positive edges across groups
    n = 9
    truth = np.arange(n) % 3
    ex, ey, ew = [], [], []
    for a in range(n):
        for b in range(a + 1, n):
            if truth[a] != truth[b]:
                ex.append(a); ey.append(b); ew.append(4.0)
            else:
                ex.append(a); ey.append(b); ew.append(-4.0)
    lab = mc_solve_k(n, np.array(ex), np.array(ey), np.array(ew), 3,
                     n_perturb=50)
    # same planted group -> same label; different -> different
    for a in range(n):
        for b in range(a + 1, n):
            if truth[a] == truth[b]:
                assert lab[a] == lab[b]
            else:
                assert lab[a] != lab[b]


def test_block_solve_flips_chains_together(rng):
    """Two homolog chains (A=0..9, B=10..19) with strong intra-chain
    cohesion (negative weights) and planted cross-chain repulsion; block
    edges tie each chain so the coarse solve flips chains as units
    (~mb_optimize_local, rcut.cpp:1728)."""
    from hifiasm_tpu.phasing.mc_solve import mc_solve_blocks

    n = 20
    ex, ey, ew, bx, by = [], [], [], [], []
    for c0 in (0, 10):                  # intra-chain cohesion + blocks
        for i in range(c0, c0 + 9):
            ex.append(i); ey.append(i + 1); ew.append(-2.0)
            bx.append(i); by.append(i + 1)
    for i in range(10):                 # planted cross-chain repulsion
        ex.append(i); ey.append(10 + i); ew.append(3.0)
    s = mc_solve_blocks(n, np.array(ex), np.array(ey), np.array(ew),
                        np.array(bx), np.array(by), n_perturb=20)
    assert (s[:10] == s[0]).all()
    assert (s[10:] == -s[0]).all()


def test_block_solve_matches_node_solve_without_blocks(rng):
    from hifiasm_tpu.phasing.mc_solve import mc_solve, mc_solve_blocks

    n = 8
    ex = np.array([0, 1, 2, 3, 4, 5, 6])
    ey = np.array([1, 2, 3, 4, 5, 6, 7])
    ew = np.array([1.0, -1.0, 2.0, 1.5, -0.5, 1.0, 2.0])
    s_plain = mc_solve(n, ex, ey, ew, n_perturb=50, seed=11)
    s_blk = mc_solve_blocks(n, ex, ey, ew, np.zeros(0, np.int64),
                            np.zeros(0, np.int64), n_perturb=50, seed=11)
    # singleton blocks: same cut quality as the plain solver
    def score(s):
        return float(-(ew * s[ex] * s[ey]).sum())
    assert abs(score(s_blk) - score(s_plain)) < 1e-9
