"""Vectorized ma_ug_gen (binary-lifted chain decomposition +
order-preserving arc linking) must equal the scalar walk exactly —
including unitig order, node lengths, arcs, and the asymmetric-deletion
fallback."""

import numpy as np

from hifiasm_tpu.graph.sg import StringGraph
from hifiasm_tpu.graph.unitig import UnitigGraph, _ma_ug_gen_scalar, \
    ma_ug_gen


def _rand_graph(rng, n, extra_frac, del_frac, sym_del=True):
    g = StringGraph(n, rng.integers(5000, 20000, n).astype(np.int64))
    g.seq_del = (rng.random(n) < 0.02).astype(np.uint8)
    src = [i << 1 for i in range(n - 1)]
    dst = [(i + 1) << 1 for i in range(n - 1)]
    m = int(n * extra_frac)
    src += rng.integers(0, 2 * n, m).tolist()
    dst += rng.integers(0, 2 * n, m).tolist()
    allsrc = np.array(src + [d ^ 1 for d in dst], np.int64)
    alldst = np.array(dst + [s ^ 1 for s in src], np.int64)
    ol = rng.integers(100, 2000, len(allsrc)).astype(np.int64)
    ul = (allsrc.astype(np.uint64) << np.uint64(32)) | \
        ol.astype(np.uint64)
    if sym_del:
        half = len(src)
        dl_h = (rng.random(half) < del_frac).astype(np.uint8)
        dl = np.concatenate([dl_h, dl_h])
    else:
        dl = (rng.random(len(allsrc)) < del_frac).astype(np.uint8)
    g.set_arcs(ul, alldst.astype(np.uint32), ol,
               np.zeros(len(ol), np.uint8), np.zeros(len(ol), np.uint8),
               np.zeros(len(ol), np.uint8), dl)
    return g


def _run_scalar(g):
    ug = UnitigGraph()
    n_vtx = 2 * g.n_seq
    visited = np.zeros(n_vtx, bool)
    alen = g.arc_len()
    live_v = np.repeat(g.seq_del == 0, 2)
    u_arr = g.arc_u().astype(np.int64)
    out_live = np.bincount(u_arr[g.del_ == 0], minlength=n_vtx)
    live_idx = np.flatnonzero(g.del_ == 0)
    uniq_u, first = np.unique(u_arr[live_idx], return_index=True)
    first_arc = np.full(n_vtx, -1, np.int64)
    first_arc[uniq_u] = live_idx[first]
    nxt_w = np.full(n_vtx, -1, np.int64)
    nxt_l = np.zeros(n_vtx, np.int64)
    sv = np.flatnonzero(out_live == 1)
    nxt_w[sv] = g.v[first_arc[sv]].astype(np.int64)
    nxt_l[sv] = alen[first_arc[sv]]

    def single_next(v):
        w = nxt_w[v]
        if w < 0:
            return None, 0
        return int(w), int(nxt_l[v])

    starts_mask = live_v.copy()
    vtx = np.arange(n_vtx)
    one_in = live_v & (out_live[vtx ^ 1] == 1)
    if one_in.any():
        cand = np.flatnonzero(one_in)
        pred = (g.v[first_arc[cand ^ 1]].astype(np.int64)) ^ 1
        starts_mask[cand[out_live[pred] == 1]] = False
    return _ma_ug_gen_scalar(g, ug, visited, live_v, out_live,
                             single_next, starts_mask)


def _assert_equal(ref, got):
    assert len(ref.utgs) == len(got.utgs)
    for r, u in zip(ref.utgs, got.utgs):
        assert list(u.vs) == list(r.vs)
        assert list(u.node_len) == list(r.node_len)
        assert u.circ == r.circ and u.len == r.len
        assert u.start == r.start and u.end == r.end
    assert (got.a_src == ref.a_src).all()
    assert (got.a_dst == ref.a_dst).all()
    assert (got.a_ol == ref.a_ol).all()


def test_vectorized_matches_scalar_random_graphs(rng):
    for n, xf, df in [(500, 0.5, 0.3), (2000, 0.5, 0.3),
                      (5000, 0.1, 0.5), (797, 1.0, 0.6),
                      (3000, 0.02, 0.05), (1024, 0.0, 0.0)]:
        g = _rand_graph(rng, n, xf, df, sym_del=True)
        _assert_equal(_run_scalar(g), ma_ug_gen(g))


def test_asymmetric_deletions_fall_back(rng):
    g = _rand_graph(rng, 500, 0.5, 0.3, sym_del=False)
    _assert_equal(_run_scalar(g), ma_ug_gen(g))


def test_empty_and_singleton_graphs():
    g = StringGraph(3, np.array([9000, 8000, 7000], np.int64))
    ug = ma_ug_gen(g)          # no arcs at all: one unitig per read
    assert len(ug.utgs) == 3
    assert all(len(u.vs) == 1 for u in ug.utgs)
