"""Checkpoint round-trips for reads and overlap stores."""

import numpy as np

from hifiasm_tpu.io.binfiles import (
    load_ec_state, load_paf, load_reads, save_ec_state, write_paf,
    write_reads,
)
from hifiasm_tpu.io.readstore import ReadStore
from hifiasm_tpu.overlap.paf import PafRecords, PafStore


def _store(rng, n=5):
    reads = [rng.integers(0, 4, int(rng.integers(50, 200))).astype(np.uint8)
             for _ in range(n)]
    return ReadStore.from_arrays([f"read/{i}" for i in range(n)], reads)


def test_reads_roundtrip(rng, tmp_path):
    s = _store(rng)
    s.trio_flags[2] = 1
    p = str(tmp_path / "ec.npz")
    write_reads(p, s)
    s2 = load_reads(p)
    assert s2.names == s.names
    assert (s2.trio_flags == s.trio_flags).all()
    for i in range(s.n_reads):
        np.testing.assert_array_equal(s.get_codes(i), s2.get_codes(i))


def test_paf_roundtrip(rng, tmp_path):
    paf = PafStore(4)
    paf[1] = PafRecords.from_columns(
        qs=[0, 10], qe=[100, 90], tn=[2, 3], ts=[5, 0], te=[105, 80],
        rev=[0, 1], ml=[95, 75], bl=[100, 80], el=[1, 0],
        no_l_indel=[1, 1])
    paf[3] = PafRecords.from_columns(
        qs=[7], qe=[50], tn=[0], ts=[0], te=[43], rev=[0], ml=[40],
        bl=[43], el=[1], no_l_indel=[0])
    p = str(tmp_path / "src.npz")
    write_paf(p, paf)
    paf2 = load_paf(p)
    assert paf2.total == paf.total
    for rid in range(4):
        a, b = paf[rid], paf2[rid]
        assert len(a) == len(b)
        np.testing.assert_array_equal(a.tn, b.tn)
        np.testing.assert_array_equal(a.ts, b.ts)


def test_ec_state_roundtrip(rng, tmp_path):
    s = _store(rng)
    paf = PafStore(s.n_reads)
    rev = PafStore(s.n_reads)
    paf[0] = PafRecords.from_columns(
        qs=[0], qe=[50], tn=[1], ts=[0], te=[48], rev=[0], ml=[45],
        bl=[50], el=[1], no_l_indel=[1])
    prefix = str(tmp_path / "asm")
    save_ec_state(prefix, s, paf, rev)
    got = load_ec_state(prefix)
    assert got is not None
    s2, paf2, rev2 = got
    assert s2.n_reads == s.n_reads
    assert paf2.total == 1
    assert rev2.total == 0


def test_graph_roundtrip(rng, tmp_path):
    import hifiasm_tpu.graph.sg as sgmod
    from hifiasm_tpu.io.binfiles import load_graph, write_graph

    n = 6
    g = sgmod.StringGraph(n, np.full(n, 500))
    uls = np.array([(np.uint64(i << 1) << np.uint64(32)) | np.uint64(50)
                    for i in range(n - 1)], np.uint64)
    vs = np.array([(i + 1) << 1 for i in range(n - 1)], np.uint32)
    z = np.zeros(n - 1, np.uint8)
    g.set_arcs(uls, vs, np.full(n - 1, 450), z.copy(), z.copy(), z.copy())
    cov = sgmod.CoverageCut.full(np.full(n, 500))
    r2u = np.full(n, -1, np.int64)
    p = str(tmp_path / "g.npz")
    write_graph(p, g, cov, r2u)
    got = load_graph(p)
    assert got is not None
    g2, cov2, r2 = got
    assert g2.n_seq == n
    np.testing.assert_array_equal(g2.ul, g.ul)
    np.testing.assert_array_equal(cov2.e, cov.e)
