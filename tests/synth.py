"""Synthetic genome / HiFi read simulation for tests and benchmarks.

The reference repo has no test data and the sandbox has no network, so the
conformance strategy is: simulate a genome, sample HiFi-like reads, run both
this framework and the reference binary (/tmp/hifiasm_ref/hifiasm, built
from /root/reference), and compare outputs.
"""

from __future__ import annotations

import numpy as np


def make_genome(rng, length: int, repeat_frac: float = 0.0,
                het_rate: float = 0.0):
    """Random genome; optionally returns a second haplotype with SNPs."""
    g = rng.integers(0, 4, length).astype(np.uint8)
    if repeat_frac > 0:
        # plant a few exact repeats to exercise high-occ handling
        rep_len = max(200, int(length * repeat_frac / 4))
        src = g[:rep_len].copy()
        for t in range(3):
            p = int(rng.integers(rep_len, length - rep_len))
            g[p:p + rep_len] = src
    if het_rate > 0:
        h2 = g.copy()
        sites = rng.random(length) < het_rate
        h2[sites] = (h2[sites] + rng.integers(1, 4, sites.sum())) % 4
        return g, h2
    return g


def sample_reads(rng, genome: np.ndarray, depth: float, read_len: int,
                 err_rate: float = 0.0, circular: bool = False):
    """Sample error-injected reads (sub/ins/del in HiFi-like 2:4:4 mix).

    Returns (reads, starts, strands); reads are code arrays.
    """
    L = len(genome)
    n_reads = max(1, int(depth * L / read_len))
    reads, starts, strands = [], [], []
    for _ in range(n_reads):
        if circular:
            s = int(rng.integers(0, L))
            seg = np.concatenate([genome, genome])[s:s + read_len]
        else:
            s = int(rng.integers(0, max(1, L - read_len + 1)))
            seg = genome[s:s + read_len].copy()
        strand = int(rng.integers(0, 2))
        if strand:
            seg = (3 - seg[::-1]) & 3
        if err_rate > 0:
            seg = inject_errors(rng, seg, err_rate)
        reads.append(seg.astype(np.uint8))
        starts.append(s)
        strands.append(strand)
    return reads, np.array(starts), np.array(strands)


def inject_errors(rng, codes: np.ndarray, rate: float) -> np.ndarray:
    """HiFi-like errors: mostly homopolymer-adjacent indels + some subs."""
    n = len(codes)
    n_err = rng.poisson(rate * n)
    if n_err == 0:
        return codes
    out = list(codes)
    sites = sorted(rng.integers(0, n, n_err).tolist(), reverse=True)
    for p in sites:
        kind = rng.random()
        if kind < 0.2:      # substitution
            out[p] = (out[p] + int(rng.integers(1, 4))) % 4
        elif kind < 0.6:    # insertion (duplicate base: homopolymer-like)
            out.insert(p, out[p])
        else:               # deletion
            del out[p]
    return np.array(out, dtype=np.uint8)


def reads_to_store(reads, names=None):
    from hifiasm_tpu.io.readstore import ReadStore

    names = names or [f"read{i}" for i in range(len(reads))]
    return ReadStore.from_arrays(names, list(reads))
