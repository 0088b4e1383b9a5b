import numpy as np
import pytest

from hifiasm_tpu.io.readstore import (
    hpc_compress, pack_2bit, unpack_2bit, seq_to_codes, codes_to_seq,
    revcomp_codes,
)
from hifiasm_tpu.ops.hashes import yak_hash64_np
from hifiasm_tpu.ops.sketch import sketch_read

from tests.scalar_spec import yak_hash64_spec, sketch_spec


def test_pack_roundtrip(rng):
    for n in [0, 1, 3, 4, 5, 127, 1000]:
        c = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(c), n), c)


def test_seq_codes_roundtrip():
    s = b"ACGTNacgtn"
    c = seq_to_codes(s)
    assert list(c) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert codes_to_seq(c) == b"ACGTNACGTN"


def test_revcomp():
    c = seq_to_codes(b"AACGTN")
    assert codes_to_seq(revcomp_codes(c)) == b"NACGTT"


def test_hpc_compress():
    c = seq_to_codes(b"AAACCGTTTT")
    comp, ends, rl = hpc_compress(c)
    assert codes_to_seq(comp) == b"ACGT"
    assert list(ends) == [2, 4, 5, 9]
    assert list(rl) == [3, 2, 1, 4]


def test_yak_hash_matches_spec(rng):
    keys = rng.integers(0, 2**63, 1000).astype(np.uint64)
    got = yak_hash64_np(keys)
    want = np.array([yak_hash64_spec(int(x)) for x in keys], dtype=np.uint64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("k,w", [(7, 5), (11, 11), (5, 3), (17, 9)])
def test_sketch_matches_spec(rng, k, w):
    for trial in range(8):
        n = int(rng.integers(50, 800))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        # sprinkle homopolymers to exercise HPC
        if trial % 2:
            reps = rng.integers(1, 5, n)
            codes = np.repeat(codes, reps)
        got = sketch_read(codes, k, w)
        want = sketch_spec(codes, k, w)
        got_set = {(int(h), int(p), int(r), int(s))
                   for h, p, r, s in zip(got.hash, got.pos, got.rev, got.span)}
        want_set = {(e["hash"], e["pos"], e["rev"], e["span"]) for e in want}
        assert got_set == want_set, (
            f"k={k} w={w} n={len(codes)} trial={trial}: "
            f"extra={got_set - want_set} missing={want_set - got_set}")


def test_sketch_with_n_bases(rng):
    k, w = 7, 5
    codes = rng.integers(0, 4, 400).astype(np.uint8)
    codes[100:103] = 4
    codes[250] = 4
    got = sketch_read(codes, k, w)
    want = sketch_spec(codes, k, w)
    got_set = {(int(h), int(p)) for h, p in zip(got.hash, got.pos)}
    want_set = {(e["hash"], e["pos"]) for e in want}
    assert got_set == want_set


def test_sketch_k51_w51(rng):
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    got = sketch_read(codes, 51, 51)
    want = sketch_spec(codes, 51, 51)
    got_set = {(int(h), int(p), int(r)) for h, p, r in zip(got.hash, got.pos, got.rev)}
    want_set = {(e["hash"], e["pos"], e["rev"]) for e in want}
    assert got_set == want_set
    # density sanity: roughly 2/(w+1) per HPC position
    assert 2 * 5000 / 52 * 0.5 < len(got) < 2 * 5000 / 52 * 2


def test_sketch_strand_symmetry(rng):
    """Minimizers of a read and its reverse complement must have identical
    hash multisets (the whole overlap index depends on this)."""
    codes = rng.integers(0, 4, 3000).astype(np.uint8)
    f = sketch_read(codes, 51, 51)
    r = sketch_read(revcomp_codes(codes), 51, 51)
    assert sorted(f.hash.tolist()) == sorted(r.hash.tolist())


def test_sketch_many_matches_per_read(rng):
    from hifiasm_tpu.ops.sketch import sketch_many, sketch_read
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 20000)
    reads, _, _ = sample_reads(rng, g, depth=4, read_len=2500,
                               err_rate=0.003)
    # include a read with Ns and a short read
    r_n = reads[0].copy()
    r_n[100:130] = 4
    reads = reads + [r_n, reads[1][:60]]
    many = sketch_many(reads, 51, 51, None)
    for i, r in enumerate(reads):
        one = sketch_read(r, 51, 51, None)
        np.testing.assert_array_equal(many[i].hash, one.hash,
                                      err_msg=f"read {i} hash")
        np.testing.assert_array_equal(many[i].pos, one.pos,
                                      err_msg=f"read {i} pos")
        np.testing.assert_array_equal(many[i].rev, one.rev)
        np.testing.assert_array_equal(many[i].span, one.span)
