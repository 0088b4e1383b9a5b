"""Human-repeat-structure proxy genome (VERDICT r3 item 7).

The chr11-2M quick-start data (/root/reference/README.md:8-11) cannot be
fetched in this environment (zero egress), so conformance runs on the
closest synthesizable proxy: a genome carrying the repeat classes that
make real human assembly hard, with published structural parameters —

- **alpha-satellite centromeric array**: 171 bp monomers arranged in a
  higher-order repeat (HOR) unit of ~6 monomers; monomers within a HOR
  diverge ~8-12% from each other, HOR copies diverge ~0.5-2% from each
  other (the homogenized live array structure);
- **segmental duplications**: 10-30 kb donor blocks copied to distant
  loci at 96-99% identity, some inverted;
- **LINE-like interspersed elements**: a 6 kb consensus inserted many
  times at 80-95% identity, mostly 5'-truncated (real L1 insertions are
  ~90% truncated);
- **STR/VNTR expansions**: short-motif tandem runs (AT, CAG, 32-mer
  VNTR) of 0.3-2 kb;
- unique background sequence between them.

Reads come from tests/synth.py's empirical HiFi error model
(``inject_errors_hifi``: ~90% indels at homopolymers, Q~28 overall).
"""

from __future__ import annotations

import numpy as np


def _mutate(rng, seq: np.ndarray, div: float) -> np.ndarray:
    """Point-mutate a copy at the given divergence (subs only: keeps
    array arithmetic simple; indel divergence comes from the read error
    model and truncation)."""
    out = seq.copy()
    m = rng.random(len(out)) < div
    out[m] = (out[m] + rng.integers(1, 4, int(m.sum()))) % 4
    return out


def alpha_satellite_array(rng, n_hors: int, monomer_div: float = 0.10,
                          hor_div: float = 0.01,
                          n_monomers: int = 6) -> np.ndarray:
    """A centromeric higher-order-repeat array: ``n_hors`` copies of a
    ~1 kb HOR unit built from 171 bp monomers."""
    base = rng.integers(0, 4, 171).astype(np.uint8)
    hor = np.concatenate([_mutate(rng, base, monomer_div)
                          for _ in range(n_monomers)])
    return np.concatenate([_mutate(rng, hor, hor_div)
                           for _ in range(n_hors)])


def str_expansion(rng, motif_len: int, n_copies: int,
                  div: float = 0.02) -> np.ndarray:
    motif = rng.integers(0, 4, motif_len).astype(np.uint8)
    return _mutate(rng, np.tile(motif, n_copies), div)


def make_human_proxy_genome(rng, length: int = 2_000_000,
                            het_rate: float = 0.0):
    """A ``length``-bp genome with human repeat architecture.

    Budget (fractions of length, loosely matching a pericentromeric
    2 Mb slice): ~10% satellite array, ~8% segdups, ~12% LINEs,
    ~3% STR/VNTR, remainder unique.  Returns the genome (or a
    (hap1, hap2) pair when ``het_rate`` > 0)."""
    g = rng.integers(0, 4, length).astype(np.uint8)

    def _plant(arr: np.ndarray, pos: int):
        end = min(pos + len(arr), length)
        g[pos:end] = arr[:end - pos]

    # one centromere-like satellite array (~10%)
    sat_len = int(length * 0.10)
    hor_len = 171 * 6
    sat = alpha_satellite_array(rng, max(sat_len // hor_len, 4))
    sat_pos = int(length * 0.45)
    _plant(sat, sat_pos)

    # LINE-like elements (~12%): 6 kb consensus, 5'-truncated copies
    line = rng.integers(0, 4, 6000).astype(np.uint8)
    line_budget = int(length * 0.12)
    used = 0
    while used < line_budget:
        full = rng.random() < 0.1
        cut = 0 if full else int(rng.integers(1000, 5500))
        frag = _mutate(rng, line[cut:], float(rng.uniform(0.05, 0.20)))
        if rng.random() < 0.5:
            frag = (3 - frag)[::-1].copy()
        pos = int(rng.integers(0, length - len(frag)))
        if abs(pos - sat_pos) < sat_len:       # keep the array intact
            continue
        _plant(frag, pos)
        used += len(frag)

    # STR/VNTR expansions (~3%)
    for motif_len, copies in ((2, 400), (3, 300), (4, 200), (32, 40),
                              (2, 600), (3, 250)):
        arr = str_expansion(rng, motif_len, copies)
        pos = int(rng.integers(0, length - len(arr)))
        if abs(pos - sat_pos) < sat_len:
            continue
        _plant(arr, pos)

    # segmental duplications LAST (they duplicate whatever is there,
    # including planted elements — as real segdups do), ~8%
    segdup_budget = int(length * 0.08)
    used = 0
    while used < segdup_budget:
        dlen = int(rng.integers(10_000, 30_000))
        src = int(rng.integers(0, length - dlen))
        dst = int(rng.integers(0, length - dlen))
        if abs(src - dst) < dlen * 2:
            continue
        dup = _mutate(rng, g[src:src + dlen],
                      float(rng.uniform(0.01, 0.04)))
        if rng.random() < 0.3:
            dup = (3 - dup)[::-1].copy()
        _plant(dup, dst)
        used += dlen

    if het_rate > 0:
        h2 = g.copy()
        sites = rng.random(length) < het_rate
        h2[sites] = (h2[sites] + rng.integers(1, 4, int(sites.sum()))) % 4
        return g, h2
    return g


def repeat_census(g: np.ndarray, k: int = 31) -> float:
    """Fraction of distinct k-mers occurring more than once (repeat
    content sanity check for the proxy; k <= 31 packs into u64)."""
    n = len(g) - k + 1
    if n <= 0 or k > 31:
        return 0.0
    pw = (np.uint64(4) ** np.arange(k, dtype=np.uint64))
    win = np.lib.stride_tricks.sliding_window_view(
        g.astype(np.uint64), k)
    km = win @ pw
    _, cnt = np.unique(km, return_counts=True)
    return float((cnt > 1).sum() / len(cnt))
