"""Trio binning: yak dump round-trip and read classification."""

import struct

import numpy as np
import pytest

from hifiasm_tpu.io.readstore import ReadStore
from hifiasm_tpu.trio import (
    AMBIGU, FATHER, MOTHER, YAK_COUNTER_BITS, _read_kmers, ha_triobin,
    load_trio_table, yak_hash64_masked,
)
from tests.synth import make_genome, sample_reads


def write_yak_dump(path, k, kmer_hashes, counts, pre=10):
    """Emit the YAK\\2 dump format (yak_ch_restore_core, Trio.cpp:66)."""
    buckets = [[] for _ in range(1 << pre)]
    for h, c in zip(kmer_hashes, counts):
        b = int(h) & ((1 << pre) - 1)
        key = ((int(h) >> pre) << YAK_COUNTER_BITS) | min(int(c), 1023)
        buckets[b].append(key)
    with open(path, "wb") as f:
        f.write(b"YAK\2")
        f.write(struct.pack("<3i", k, pre, YAK_COUNTER_BITS))
        for b in buckets:
            f.write(struct.pack("<2i", len(b), len(b)))
            if b:
                np.array(b, dtype="<u8").tofile(f)


def _genome_kmer_hashes(g, k):
    _, h = _read_kmers(g, k)
    return np.unique(h)


def test_yak_roundtrip(rng, tmp_path):
    k = 31
    hashes = rng.integers(0, 1 << 62, 500).astype(np.uint64)
    counts = np.full(500, 10)
    p = tmp_path / "pat.yak"
    write_yak_dump(str(p), k, hashes, counts)
    m = tmp_path / "mat.yak"
    write_yak_dump(str(m), k, hashes[:10], counts[:10])
    table = load_trio_table(str(p), str(m))
    flags = table.lookup(np.sort(hashes))
    assert (flags & 3 == 2).all()          # strong pat everywhere
    assert (flags >> 2 == 2).sum() == 10   # 10 shared with mat


def test_triobin_classifies_haplotypes(rng, tmp_path):
    k = 31
    h1, h2 = make_genome(rng, 12000, het_rate=0.01)
    k1 = _genome_kmer_hashes(h1, k)
    k2 = _genome_kmer_hashes(h2, k)
    pat_path, mat_path = str(tmp_path / "p.yak"), str(tmp_path / "m.yak")
    write_yak_dump(pat_path, k, k1, np.full(len(k1), 20))
    write_yak_dump(mat_path, k, k2, np.full(len(k2), 20))

    r1, _, _ = sample_reads(rng, h1, depth=3, read_len=3000, err_rate=0.001)
    r2, _, _ = sample_reads(rng, h2, depth=3, read_len=3000, err_rate=0.001)
    store = ReadStore.from_arrays(
        [f"r{i}" for i in range(len(r1) + len(r2))], r1 + r2)
    flags = ha_triobin(store, pat_path, mat_path)
    f1 = flags[:len(r1)]
    f2 = flags[len(r1):]
    assert (f1 == FATHER).mean() > 0.7, f1
    assert (f2 == MOTHER).mean() > 0.7, f2
    assert not (f1 == MOTHER).any()
    assert not (f2 == FATHER).any()


def test_triobin_list(tmp_path, rng):
    reads = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(4)]
    store = ReadStore.from_arrays(["a", "b", "c", "d"], reads)
    (tmp_path / "p.txt").write_text("a\nc\n")
    (tmp_path / "m.txt").write_text("b\n")
    flags = ha_triobin(store, None, None,
                       list_pat=str(tmp_path / "p.txt"),
                       list_mat=str(tmp_path / "m.txt"))
    assert list(flags) == [FATHER, MOTHER, FATHER, AMBIGU]
