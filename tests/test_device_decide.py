"""Device finalize (het + consensus decisions + ambiguity) vs the host
rules on adversarial vote matrices — including coverage >255, where the
old u8-clamped transfer diverged (the integer forms must match the
UNclamped host semantics exactly)."""

import numpy as np
import jax.numpy as jnp

from hifiasm_tpu.ec.consensus import _ambiguous_mask, consensus_decide
from hifiasm_tpu.ec.device_ec import (
    _decide_planes, _het_planes, _unpack2, _unpack4, _unpack_bits,
)
from hifiasm_tpu.ec.phase import het_from_counts


def test_device_decide_matches_host(rng):
    Rp, L = 8, 512
    qlen = rng.integers(L // 2, L + 1, Rp).astype(np.int32)
    q = rng.integers(0, 5, (Rp, L)).astype(np.uint8)     # incl. Ns
    # vote profiles spanning ties, majorities, and >255 coverage
    cnt = rng.integers(0, 90, (5, Rp, L)).astype(np.float32)
    cnt[:, :2] *= 8                                      # cov > 255 rows
    votes = rng.integers(0, 90, (5, Rp, L)).astype(np.float32)
    votes[:, :2] *= 8
    ins_tot = rng.integers(0, 160, (Rp, L)).astype(np.float32)
    ins_bc = rng.integers(0, 60, (4, Rp, L)).astype(np.float32)
    ins_lc = rng.integers(0, 60, (9, Rp, L)).astype(np.float32)

    het_d, alt_d, het_pk, alt_pk, het_cnt = _het_planes(
        L, jnp.asarray(cnt), jnp.asarray(q), jnp.asarray(qlen))
    subw_pk, ins_pk, ib_pk, il_pk, amb_pk = _decide_planes(
        L, jnp.asarray(votes), jnp.asarray(ins_tot), jnp.asarray(ins_bc),
        jnp.asarray(ins_lc), het_d, jnp.asarray(q), jnp.asarray(qlen))
    het_b = _unpack_bits(np.asarray(het_pk), L)
    alt_b = _unpack2(np.asarray(alt_pk), L)
    subw = _unpack4(np.asarray(subw_pk), L)
    ins_b = _unpack_bits(np.asarray(ins_pk), L)
    amb_b = _unpack_bits(np.asarray(amb_pk), L)

    for r in range(Rp):
        n = int(qlen[r])
        qr = q[r, :n]
        c4 = cnt[:4, r, :n].T.astype(np.int32).copy()
        c4[np.arange(n), np.clip(qr, 0, 3)] += 1
        hs, alt = het_from_counts(qr, c4, del_cnt=cnt[4, r, :n].astype(np.int64))
        exp_het = np.zeros(n, bool)
        exp_het[hs] = True
        assert (het_b[r, :n] == exp_het).all(), f"row {r}: het"
        assert (alt_b[r, :n][hs] == alt[hs]).all(), f"row {r}: alt"
        assert int(np.asarray(het_cnt)[r]) == len(hs)

        v = votes[:, r, :n].T.astype(np.int32).copy()
        v[np.arange(n), np.clip(qr, 0, 3)] += 1
        it = ins_tot[r, :n].astype(np.int32)
        ps, pi, win = consensus_decide(qr, v, it, hs)
        assert ((subw[r, :n] != 15) == ps).all(), f"row {r}: pass_sub"
        assert (subw[r, :n][ps] == win[ps]).all(), f"row {r}: winner"
        assert (ins_b[r, :n] == pi).all(), f"row {r}: pass_ins"
        amb = _ambiguous_mask(qr, v, it, hs, 3, 0.500001)
        assert (amb_b[r, :n] == amb).all(), f"row {r}: amb"
        # beyond qlen everything must pack to zero
        assert not het_b[r, n:].any() and not ins_b[r, n:].any()
        assert (subw[r, n:] == 15).all() or not (subw[r, n:] != 15).any()
