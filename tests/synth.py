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
        # duplicate tail sites can outrun the shrinking list (deletions
        # shorten it); clamp — the rng draw sequence is unchanged
        if p >= len(out):
            p = len(out) - 1
        kind = rng.random()
        if kind < 0.2:      # substitution
            out[p] = (out[p] + int(rng.integers(1, 4))) % 4
        elif kind < 0.6:    # insertion (duplicate base: homopolymer-like)
            out.insert(p, out[p])
        else:               # deletion
            del out[p]
    return np.array(out, dtype=np.uint8)


def inject_errors_hifi(rng, codes: np.ndarray, rate: float) -> np.ndarray:
    """Realistic HiFi error model: ~90% of errors are indels placed at
    homopolymer runs (run-length-weighted site choice), ~10% substitutions
    at uniform sites.  Matches the published HiFi error composition the
    reference's consensus paths (Correct.cpp window votes / POA.cpp DAG)
    were built to absorb."""
    n = len(codes)
    n_err = int(rng.poisson(rate * n))
    if n_err == 0:
        return codes
    # homopolymer weight: sites inside/adjacent to a run of length r get
    # weight r (capped), others weight ~0.1 -> ~90% of indels land on runs
    same_prev = np.concatenate([[False], codes[1:] == codes[:-1]])
    run_id = np.cumsum(~same_prev) - 1
    run_len = np.bincount(run_id)[run_id].astype(np.float64)
    w = np.where(run_len >= 2, np.minimum(run_len, 8.0), 0.12)
    w /= w.sum()
    sites = np.unique(rng.choice(n, size=n_err, replace=False, p=w))[::-1]
    out = list(codes)
    for p in sites.tolist():
        kind = rng.random()
        if kind < 0.10:     # substitution
            out[p] = (out[p] + int(rng.integers(1, 4))) % 4
        elif kind < 0.55:   # homopolymer insertion (duplicate the base)
            out.insert(p, out[p])
        else:               # homopolymer deletion
            del out[p]
    return np.array(out, dtype=np.uint8)


def sample_reads_hifi(rng, genome: np.ndarray, depth: float,
                      mean_len: int, err_rate: float = 0.003,
                      chimera_frac: float = 0.015, sigma: float = 0.35):
    """Realistic HiFi library: log-normal read lengths (CV~sigma),
    homopolymer-biased indel-dominated errors, and a small fraction of
    chimeric reads (two random segments joined, either-strand halves) —
    the profile the reference's chimeric cut (gfa_ut.cpp asg_arc_cut) and
    window-vote EC actually face on real data."""
    L = len(genome)
    total = int(depth * L)
    mu = np.log(mean_len) - 0.5 * sigma * sigma  # E[len]=mean_len
    reads, starts, strands = [], [], []
    acc = 0
    while acc < total:
        rl = int(np.clip(rng.lognormal(mu, sigma), 800, L - 1))
        if rng.random() < chimera_frac:
            l1 = max(400, rl // 2)
            l2 = max(400, rl - l1)
            segs = []
            for ll in (l1, l2):
                s = int(rng.integers(0, L - ll))
                seg = genome[s:s + ll].copy()
                if rng.integers(0, 2):
                    seg = (3 - seg[::-1]) & 3
                segs.append(seg)
            seg = np.concatenate(segs)
            s, strand = -1, 0  # no single true locus
        else:
            s = int(rng.integers(0, max(1, L - rl + 1)))
            seg = genome[s:s + rl].copy()
            strand = int(rng.integers(0, 2))
            if strand:
                seg = (3 - seg[::-1]) & 3
        if err_rate > 0:
            seg = inject_errors_hifi(rng, seg, err_rate)
        reads.append(seg.astype(np.uint8))
        starts.append(s)
        strands.append(strand)
        acc += len(seg)
    return reads, np.array(starts), np.array(strands)


def reads_to_store(reads, names=None):
    from hifiasm_tpu.io.readstore import ReadStore

    names = names or [f"read{i}" for i in range(len(reads))]
    return ReadStore.from_arrays(names, list(reads))
