"""Cross-validation: ops/sketch_jax (device) == ops/sketch (host).

Byte-identical Minimizers on random reads with Ns, homopolymer runs,
short reads, filter tables, and is_unique mode — the same contract every
native kernel carries (CLAUDE.md hard rule)."""

import numpy as np
import pytest

from hifiasm_tpu.index.pos_table import FilterTable
from hifiasm_tpu.ops.sketch import sketch_read
from hifiasm_tpu.ops.sketch_jax import sketch_many_jax


def _random_reads(rng, n, lmin=40, lmax=900, n_rate=0.01, homopoly=True):
    reads = []
    for _ in range(n):
        ln = int(rng.integers(lmin, lmax))
        r = rng.integers(0, 4, ln).astype(np.uint8)
        if homopoly:
            # stretch random segments into homopolymer runs
            for _ in range(ln // 50):
                s = int(rng.integers(0, max(ln - 8, 1)))
                e = min(s + int(rng.integers(2, 8)), ln)
                r[s:e] = r[s]
        if n_rate:
            m = rng.random(ln) < n_rate
            r[m] = 4
        reads.append(r)
    return reads


def _assert_equal(mz_a, mz_b, tag):
    assert len(mz_a) == len(mz_b), tag
    np.testing.assert_array_equal(mz_a.hash, mz_b.hash, err_msg=tag)
    np.testing.assert_array_equal(mz_a.pos, mz_b.pos, err_msg=tag)
    np.testing.assert_array_equal(mz_a.rev, mz_b.rev, err_msg=tag)
    np.testing.assert_array_equal(mz_a.span, mz_b.span, err_msg=tag)
    np.testing.assert_array_equal(mz_a.cnt, mz_b.cnt, err_msg=tag)


@pytest.mark.parametrize("k,w", [(7, 5), (17, 11), (31, 17), (51, 51)])
def test_sketch_jax_matches_host(k, w):
    rng = np.random.default_rng(11)
    reads = _random_reads(rng, 24)
    # edge cases: empty, shorter than k, all-N, pure homopolymer
    reads += [np.zeros(0, np.uint8),
              rng.integers(0, 4, max(k - 2, 1)).astype(np.uint8),
              np.full(80, 4, np.uint8),
              np.full(120, 2, np.uint8)]
    dev = sketch_many_jax(reads, k, w, row_chunk=8, l_bucket=64)
    for i, r in enumerate(reads):
        host = sketch_read(r, k, w)
        _assert_equal(dev[i], host, f"read {i} k={k} w={w}")


def test_sketch_jax_with_filter_table():
    rng = np.random.default_rng(7)
    k, w = 17, 11
    reads = _random_reads(rng, 16, lmin=200, lmax=1200, n_rate=0.003)
    # a filter table whose hashes are real k-mer hashes from the reads
    from hifiasm_tpu.ops.sketch import all_kmers_read
    allh = np.concatenate([all_kmers_read(r, k) for r in reads])
    uniq, cnts = np.unique(allh, return_counts=True)
    sel = rng.random(len(uniq)) < 0.3
    ft = FilterTable(hashes=uniq[sel],
                     counts=np.minimum(cnts[sel] * 40, 2000).astype(
                         np.uint16),
                     cutoff=5)
    dev = sketch_many_jax(reads, k, w, ft=ft, row_chunk=8, l_bucket=128)
    for i, r in enumerate(reads):
        host = sketch_read(r, k, w, ft.lookup)
        _assert_equal(dev[i], host, f"ft read {i}")


def test_sketch_jax_is_unique():
    rng = np.random.default_rng(3)
    k, w = 17, 11
    reads = _random_reads(rng, 10, lmin=150, lmax=600, n_rate=0.0)
    from hifiasm_tpu.ops.sketch import all_kmers_read
    allh = np.concatenate([all_kmers_read(r, k) for r in reads])
    uniq, cnts = np.unique(allh, return_counts=True)
    ft = FilterTable(hashes=uniq,
                     counts=np.minimum(cnts, 2000).astype(np.uint16),
                     cutoff=5)
    dev = sketch_many_jax(reads, k, w, ft=ft, is_unique=True,
                          row_chunk=4, l_bucket=128)
    for i, r in enumerate(reads):
        host = sketch_read(r, k, w, ft.lookup, is_unique=True)
        _assert_equal(dev[i], host, f"unique read {i}")


def test_sketch_jax_long_reads_realistic():
    """HiFi-shaped reads at the production (k=51, w=51) parameters."""
    rng = np.random.default_rng(5)
    reads = _random_reads(rng, 6, lmin=8000, lmax=15000, n_rate=0.0005)
    dev = sketch_many_jax(reads, 51, 51, row_chunk=4)
    for i, r in enumerate(reads):
        host = sketch_read(r, 51, 51)
        _assert_equal(dev[i], host, f"long read {i}")
