"""Strobemer hashing vs a scalar golden model of the reference loop."""

import numpy as np
import jax.numpy as jnp

from rnabloom_tpu.ops import nthash_ref as ref, strobemer, u64

RNG = np.random.default_rng(12)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def golden_strobemers(seq_codes, k, n, w_min, w_max):
    """Scalar model of StrobeHashIterator.next (:45-75 of body)."""
    P = len(seq_codes) - k + 1
    hashes = [ref.forward_hash(seq_codes, k, i) for i in range(P)]
    M = P - w_max * (n - 2) - w_min
    out = []
    for pos in range(M):
        cur = hashes[pos]
        for s in range(n - 1):
            pos2 = pos + s * w_max + w_min
            h = ref.combine(cur, hashes[pos2])
            end = min(pos + s * w_max + w_max, P)
            for i in range(pos2 + 1, end):
                h2 = ref.combine(cur, hashes[i])
                if h >= h2:  # python ints are unsigned-comparable directly
                    pos2 = i
                    h = h2
            cur = h
        out.append(cur)
    return out


def test_strobemer_matches_golden():
    for n, w_min, w_max in [(2, 5, 12), (3, 4, 10)]:
        s = rand_seq(120)
        codes = np.asarray([ref.encode(s)], np.uint8)
        got, ok = strobemer.strobemer_hashes(
            jnp.asarray(codes), 15, n, w_min, w_max, stranded=True
        )
        got_vals = u64.to_py(u64.reshape(got, (-1,)))
        exp = golden_strobemers(ref.encode(s), 15, n, w_min, w_max)
        assert np.asarray(ok).all()
        assert got_vals[: len(exp)] == exp
