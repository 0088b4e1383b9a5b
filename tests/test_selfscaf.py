"""Self-scaffolding from inter-haplotype homology."""

import numpy as np

from hifiasm_tpu.graph.unitig import Unitig, UnitigGraph
from hifiasm_tpu.overlap.paf import PafRecords, PafStore
from hifiasm_tpu.phasing.selfscaf import self_scaffold


def _utg(rids, node_len=1000):
    vs = np.array([r << 1 for r in rids], np.uint32)
    nl = np.full(len(rids), node_len, np.int64)
    return Unitig(vs, nl, int(nl.sum()), False, int(vs[0]),
                  int(vs[-1]) ^ 1)


def test_self_scaffold_joins_via_partner(rng):
    # hap1: contigs A (reads 0-1), B (reads 2-3); hap2: contig C (reads
    # 4-9) homologous to A at its start and B at its end
    ug = UnitigGraph([_utg([0, 1]), _utg([2, 3]), _utg([4, 5, 6, 7, 8, 9])])
    n_reads = 10
    rev = PafStore(n_reads)
    # A-reads trans-link to early C reads, B-reads to late C reads
    rev[0] = PafRecords.from_columns(qs=[0], qe=[900], tn=[4], ts=[0],
                                     te=[900], rev=[0], ml=[900], bl=[900],
                                     el=[1], no_l_indel=[1])
    rev[1] = PafRecords.from_columns(qs=[0], qe=[900], tn=[5], ts=[0],
                                     te=[900], rev=[0], ml=[900], bl=[900],
                                     el=[1], no_l_indel=[1])
    rev[2] = PafRecords.from_columns(qs=[0], qe=[900], tn=[8], ts=[0],
                                     te=[900], rev=[0], ml=[900], bl=[900],
                                     el=[1], no_l_indel=[1])
    rev[3] = PafRecords.from_columns(qs=[0], qe=[900], tn=[9], ts=[0],
                                     te=[900], rev=[0], ml=[900], bl=[900],
                                     el=[1], no_l_indel=[1])
    scafs = self_scaffold(ug, rev, n_reads, [0, 1], [2])
    joined = [s for s in scafs if len(s.members) > 1]
    assert len(joined) == 1
    assert [m[0] for m in joined[0].members] == [0, 1]
