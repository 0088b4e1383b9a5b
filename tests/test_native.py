"""Native C++ kernels vs the python fallbacks."""

import numpy as np
import pytest

from hifiasm_tpu.native import get_lib, trans_reduce


def test_native_builds():
    assert get_lib() is not None, "native kernel build failed"


def test_trans_reduce_matches_python(rng):
    # random layered DAG with transitive arcs
    import hifiasm_tpu.graph.sg as sgmod
    n_reads = 40
    g1 = sgmod.StringGraph(n_reads, np.full(n_reads, 1000))
    uls, vs, ols = [], [], []
    # chain v0 -> v1 -> ... with skip arcs
    for i in range(n_reads - 1):
        uls.append((np.uint64(i << 1) << np.uint64(32)) | np.uint64(100))
        vs.append((i + 1) << 1)
        ols.append(900)
        if i + 2 < n_reads:
            uls.append((np.uint64(i << 1) << np.uint64(32)) | np.uint64(200))
            vs.append((i + 2) << 1)
            ols.append(800)
    z = np.zeros(len(vs), np.uint8)
    g1.set_arcs(np.array(uls, np.uint64), np.array(vs, np.uint32),
                np.array(ols), z.copy(), z.copy(), z.copy())
    g2 = sgmod.StringGraph(n_reads, np.full(n_reads, 1000))
    g2.set_arcs(np.array(uls, np.uint64), np.array(vs, np.uint32),
                np.array(ols), z.copy(), z.copy(), z.copy())

    # native path
    n1 = trans_reduce(g1.idx_s, g1.idx_n, g1.v, g1.arc_len(),
                      g1.seq_del, g1.del_, 50)
    assert n1 is not None
    # python fallback: call the loop by monkeypatching native away
    import hifiasm_tpu.native as nat
    orig = nat.trans_reduce
    nat.trans_reduce = lambda *a, **k: None
    try:
        n2 = sgmod.asg_arc_del_trans(g2, 50)
    finally:
        nat.trans_reduce = orig
    assert n1 == (np.array(g1.del_) == 1).sum()
    assert n1 == n2
