"""Ultralong read -> unitig-path mapping."""

import numpy as np

from hifiasm_tpu.graph.unitig import UnitigGraph
from hifiasm_tpu.io.readstore import revcomp_codes
from hifiasm_tpu.ul import ul_align, ul_arc_support, ul_bridge_arcs
from tests.synth import make_genome, inject_errors


def test_ul_path_through_unitigs(rng):
    g = make_genome(rng, 30000)
    utgs = [g[:10000], g[10000:20000], g[20000:]]
    ul = inject_errors(rng, g[5000:27000].copy(), 0.05)
    paths = ul_align(utgs, [ul])
    uids = [b[0] for b in paths[0].blocks]
    revs = [b[1] for b in paths[0].blocks]
    assert uids == [0, 1, 2], uids
    assert revs == [0, 0, 0]
    # reverse-complement UL read walks the path backwards
    paths_rc = ul_align(utgs, [revcomp_codes(ul)])
    assert [b[0] for b in paths_rc[0].blocks] == [2, 1, 0]
    assert [b[1] for b in paths_rc[0].blocks] == [1, 1, 1]


def test_ul_bridging(rng):
    g = make_genome(rng, 24000)
    utgs = [g[:8000], g[8000:16000], g[16000:]]
    uls = [inject_errors(rng, g[4000:20000].copy(), 0.05) for _ in range(3)]
    paths = ul_align(utgs, uls)
    ug = UnitigGraph([])          # only arcs matter here
    sup = ul_arc_support(ug, paths)
    assert sup.get((0 << 1 | 0, 1 << 1 | 0), 0) >= 2
    assert sup.get((1 << 1 | 0, 2 << 1 | 0), 0) >= 2
    n = ul_bridge_arcs(ug, paths, min_support=2)
    assert n >= 2
