"""UL gap fill: bridged (ol=0) unitig pairs joined with the UL-derived
junction sequence inserted as a pseudo-read (~the UL-bridge consumption of
gradually_renew_g, Overlaps.cpp:39297)."""

import numpy as np

from hifiasm_tpu.graph.sg import CoverageCut
from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph, unitig_seq
from hifiasm_tpu.io.readstore import ReadStore
from hifiasm_tpu.ul import ULPath, ul_fill_bridged, ul_gap_sequences
from tests.synth import inject_errors, make_genome, sample_reads

NT = np.frombuffer(b"ACGT", dtype=np.uint8)


def _two_unitig_fixture(rng):
    g = make_genome(rng, 250)
    r0, r1, gap = g[:100], g[150:250], g[100:150]
    store = ReadStore.from_arrays(["r0", "r1"], [r0.copy(), r1.copy()])
    cov = CoverageCut.full(store.lens)
    ug = UnitigGraph(
        utgs=[Unitig(np.array([0 << 1], np.uint32),
                     np.array([100], np.int64), 100, False, 0, 1),
              Unitig(np.array([1 << 1], np.uint32),
                     np.array([100], np.int64), 100, False, 2, 3)])
    # bridged arc 0-fwd -> 1-fwd plus mirror, no sequence overlap
    ug.a_src = np.array([0 << 1 | 0, 1 << 1 | 1], np.uint32)
    ug.a_dst = np.array([1 << 1 | 0, 0 << 1 | 1], np.uint32)
    ug.a_ol = np.zeros(2, np.int64)
    ul = np.concatenate([r0, gap, r1])
    paths = [ULPath([(0, 0, 0, 100), (1, 0, 150, 250)]) for _ in range(3)]
    return store, cov, ug, paths, [ul] * 3, g, gap


def test_gap_sequences_oriented(rng):
    _, _, _, paths, uls, _, gap = _two_unitig_fixture(rng)
    gaps = ul_gap_sequences(paths, uls)
    np.testing.assert_array_equal(gaps[(0, 2)], gap)
    # complement key carries the reverse complement
    rc = (3 - gap[::-1]) & 3
    np.testing.assert_array_equal(gaps[(2 ^ 1, 0 ^ 1)], rc)


def test_fill_bridged_joins_with_gap_read(rng):
    store, cov, ug, paths, uls, g, gap = _two_unitig_fixture(rng)
    new = ul_fill_bridged(ug, store, cov, paths, uls)
    assert len(new) == 1
    rid, support = new[0]
    assert rid == 2 and support >= 3
    assert store.names[rid].startswith("ulg")
    assert len(ug.utgs) == 1
    u = ug.utgs[0]
    assert list(u.vs) == [0 << 1, rid << 1, 1 << 1]
    # the merged sequence is the full genome: gap bases came from UL
    np.testing.assert_array_equal(unitig_seq(u, store, cov), g)
    # cov arrays were extended for the pseudo-read
    assert len(cov.s) == store.n_reads == 3
    assert int(cov.e[rid]) == len(gap)


def test_fill_bridged_respects_min_support(rng):
    store, cov, ug, paths, uls, _, _ = _two_unitig_fixture(rng)
    new = ul_fill_bridged(ug, store, cov, paths[:1], uls[:1],
                          min_support=2)
    assert new == [] and len(ug.utgs) == 2


def test_ul_gapfill_end_to_end(rng, tmp_path):
    """HiFi coverage has a hole; UL reads span it. The assembly must
    emit ONE contig whose sequence includes the HiFi-uncovered bases."""
    L = 30000
    g = make_genome(rng, L)
    gap_s, gap_e = 14000, 17000
    left, _, _ = sample_reads(rng, g[:gap_s], depth=14, read_len=2500,
                              err_rate=0.002)
    right, _, _ = sample_reads(rng, g[gap_e:], depth=14, read_len=2500,
                               err_rate=0.002)
    reads = left + right
    # error-free UL reads so the filled bases can be asserted exactly
    uls = [g[10000:21000].copy() for _ in range(3)]
    ulf = tmp_path / "ul.fa"
    with open(ulf, "w") as f:
        for i, s in enumerate(uls):
            f.write(f">u{i}\n{NT[s].tobytes().decode()}\n")
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig = None
    from hifiasm_tpu.assemble import assemble
    from hifiasm_tpu.config import HifiasmConfig
    cfg = HifiasmConfig(output_prefix=str(tmp_path / "asm"),
                        n_rounds_ec=1, ul_reads=[str(ulf)],
                        ul_min_base=1000)
    res = assemble(store, cfg)
    lens = sorted(u.len for u in res.ug.utgs)
    assert lens[-1] > 0.8 * L, lens
    big = max(res.ug.utgs, key=lambda u: u.len)
    seq = unitig_seq(big, res.store, res.cov)
    # the gap interior must be present (either orientation)
    mid = g[gap_s + 500:gap_e - 500]
    s_txt = NT[np.clip(seq, 0, 3)].tobytes()
    fwd = NT[mid].tobytes()
    rc = NT[(3 - mid[::-1]) & 3].tobytes()
    assert fwd in s_txt or rc in s_txt
    # at least one UL gap pseudo-read on the path
    assert any(res.store.names[int(v) >> 1].startswith("ulg")
               for v in big.vs)
