"""Batched JAX ntHash kernels vs the pure-Python golden model."""

import functools

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from rnabloom_tpu.ops import nthash, nthash_ref as ref, u64

RNG = np.random.default_rng(7)

# Jitted wrappers — eager per-op dispatch on the CPU backend is pathologically
# slow to warm up; everything in the library runs under jit anyway.
rolling_hash = functools.partial(
    jax.jit, static_argnames=("k", "stranded")
)(nthash.rolling_hash)
successor_hashes = jax.jit(nthash.successor_hashes, static_argnames=("k",))
predecessor_hashes = jax.jit(nthash.predecessor_hashes, static_argnames=("k",))
variant_hashes_right = jax.jit(nthash.variant_hashes_right, static_argnames=("k",))
variant_hashes_left = jax.jit(nthash.variant_hashes_left, static_argnames=("k",))
multi_hash_j = jax.jit(nthash.multi_hash, static_argnames=("k", "m"))
combine_j = jax.jit(nthash.combine)
canonical_j = jax.jit(lambda fh, rh: nthash.canonical(fh, rh))


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def codes_array(seqs, L=None):
    L = L or max(len(s) for s in seqs)
    arr = np.full((len(seqs), L), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = ref.encode(s)
    return jnp.asarray(arr)


def test_golden_model_self_consistency():
    """Sliding recurrences must agree with from-scratch hashes."""
    seq = ref.encode(rand_seq(80))
    k = 25
    fhs = ref.rolling_forward(seq, k)
    rhs = ref.rolling_reverse(seq, k)
    for i in range(len(fhs)):
        assert fhs[i] == ref.forward_hash(seq, k, i)
        assert rhs[i] == ref.reverse_hash(seq, k, i)
    # reverse hash == forward hash of the reverse complement
    for i in range(len(fhs)):
        window = seq[i : i + k]
        rc = [ref.comp(c) for c in reversed(window)]
        assert rhs[i] == ref.forward_hash(rc, k)
    # backward slide returns to the previous k-mer
    for i in range(1, len(fhs)):
        back = ref.slide_backward(fhs[i], seq[i + k - 1], seq[i - 1], k)
        assert back == fhs[i - 1]
        back_r = ref.slide_backward_rev(rhs[i], seq[i + k - 1], seq[i - 1], k)
        assert back_r == rhs[i - 1]


@pytest.mark.parametrize("k", [2, 25, 32, 63, 64, 65])
def test_rolling_hash_matches_golden(k):
    seqs = [rand_seq(k + extra) for extra in [0, 1, 7, 40]]
    L = max(len(s) for s in seqs)
    codes = codes_array(seqs, L)
    fh, rh, valid = rolling_hash(codes, k, stranded=False)
    fh_py = np.asarray(fh.hi, dtype=np.uint64) << np.uint64(32) | np.asarray(fh.lo, dtype=np.uint64)
    rh_py = np.asarray(rh.hi, dtype=np.uint64) << np.uint64(32) | np.asarray(rh.lo, dtype=np.uint64)
    valid = np.asarray(valid)
    for i, s in enumerate(seqs):
        seq = ref.encode(s)
        exp_f = ref.rolling_forward(seq, k)
        exp_r = ref.rolling_reverse(seq, k)
        n = len(s) - k + 1
        assert list(fh_py[i, :n]) == exp_f
        assert list(rh_py[i, :n]) == exp_r
        assert valid[i, :n].all()
        assert not valid[i, n:].any()  # windows overlapping padding


def test_invalid_bases_masked():
    s = "ACGTN" + rand_seq(30)
    k = 10
    codes = codes_array([s])
    _, _, valid = rolling_hash(codes, k, stranded=False)
    valid = np.asarray(valid)[0]
    for i in range(len(s) - k + 1):
        assert valid[i] == ("N" not in s[i : i + k])


def test_canonical_signed_min():
    seqs = [rand_seq(40) for _ in range(8)]
    k = 25
    codes = codes_array(seqs)
    fh, rh, _ = rolling_hash(codes, k, stranded=False)
    can = u64.to_py(nthash.canonical(fh, rh))
    n = 40 - k + 1
    for i, s in enumerate(seqs):
        seq = ref.encode(s)
        for j in range(n):
            assert can[i * n + j] == ref.canonical_hash(seq, k, j)


@pytest.mark.parametrize("m", [1, 2, 5])
def test_multi_hash(m):
    k = 25
    base_vals = [int(x) for x in RNG.integers(0, 1 << 64, size=32, dtype=np.uint64)]
    base = u64.U64(
        jnp.asarray(np.array([v & 0xFFFFFFFF for v in base_vals], np.uint32)),
        jnp.asarray(np.array([v >> 32 for v in base_vals], np.uint32)),
    )
    got = u64.to_py(u64.reshape(multi_hash_j(base, k, m), (-1,)))
    exp = [h for v in base_vals for h in ref.multi_hash(v, k, m)]
    assert got == exp


def test_combine():
    a_vals = [int(x) for x in RNG.integers(0, 1 << 64, size=64, dtype=np.uint64)]
    b_vals = [int(x) for x in RNG.integers(0, 1 << 64, size=64, dtype=np.uint64)]

    def mk(vals):
        return u64.U64(
            jnp.asarray(np.array([v & 0xFFFFFFFF for v in vals], np.uint32)),
            jnp.asarray(np.array([v >> 32 for v in vals], np.uint32)),
        )

    got = u64.to_py(combine_j(mk(a_vals), mk(b_vals)))
    assert got == [ref.combine(a, b) for a, b in zip(a_vals, b_vals)]


@pytest.mark.parametrize("stranded", [True, False])
def test_successor_predecessor_hashes(stranded):
    k = 25
    s = rand_seq(60)
    seq = ref.encode(s)
    codes = codes_array([s])
    fh, rh, _ = rolling_hash(codes, k, stranded=stranded)
    n = len(s) - k + 1

    # successors of k-mer at position i (first base leaves) == k-mer at i+1
    # when the appended base matches seq[i+k]
    first = codes[:, :n]
    fh4, rh4 = successor_hashes(fh, first, k, rh=rh)
    fh4_py = np.asarray(fh4.hi, np.uint64) << np.uint64(32) | np.asarray(fh4.lo, np.uint64)
    for i in range(n - 1):
        nxt = seq[i + k]
        assert int(fh4_py[0, i, nxt]) == ref.forward_hash(seq, k, i + 1)
        for b in range(4):
            window = seq[i + 1 : i + k] + [b]
            assert int(fh4_py[0, i, b]) == ref.forward_hash(window, k)
    if not stranded:
        rh4_py = np.asarray(rh4.hi, np.uint64) << np.uint64(32) | np.asarray(rh4.lo, np.uint64)
        for i in range(n - 1):
            for b in range(4):
                window = seq[i + 1 : i + k] + [b]
                assert int(rh4_py[0, i, b]) == ref.reverse_hash(window, k)

    # predecessors of k-mer at position i (last base leaves) == k-mer at i-1
    last = codes[:, k - 1 : k - 1 + n]
    fp4, rp4 = predecessor_hashes(fh, last, k, rh=rh)
    fp4_py = np.asarray(fp4.hi, np.uint64) << np.uint64(32) | np.asarray(fp4.lo, np.uint64)
    for i in range(1, n):
        for b in range(4):
            window = [b] + seq[i : i + k - 1]
            assert int(fp4_py[0, i, b]) == ref.forward_hash(window, k)
    if not stranded:
        rp4_py = np.asarray(rp4.hi, np.uint64) << np.uint64(32) | np.asarray(rp4.lo, np.uint64)
        for i in range(1, n):
            for b in range(4):
                window = [b] + seq[i : i + k - 1]
                assert int(rp4_py[0, i, b]) == ref.reverse_hash(window, k)


def test_variant_hashes():
    k = 25
    s = rand_seq(40)
    seq = ref.encode(s)
    codes = codes_array([s])
    fh, rh, _ = rolling_hash(codes, k, stranded=False)
    n = len(s) - k + 1

    last = codes[:, k - 1 : k - 1 + n]
    fv4, rv4 = variant_hashes_right(fh, last, k, rh=rh)
    fv4_py = np.asarray(fv4.hi, np.uint64) << np.uint64(32) | np.asarray(fv4.lo, np.uint64)
    rv4_py = np.asarray(rv4.hi, np.uint64) << np.uint64(32) | np.asarray(rv4.lo, np.uint64)
    for i in range(n):
        for b in range(4):
            window = seq[i : i + k - 1] + [b]
            assert int(fv4_py[0, i, b]) == ref.forward_hash(window, k)
            assert int(rv4_py[0, i, b]) == ref.reverse_hash(window, k)

    first = codes[:, :n]
    fl4, rl4 = variant_hashes_left(fh, first, k, rh=rh)
    fl4_py = np.asarray(fl4.hi, np.uint64) << np.uint64(32) | np.asarray(fl4.lo, np.uint64)
    rl4_py = np.asarray(rl4.hi, np.uint64) << np.uint64(32) | np.asarray(rl4.lo, np.uint64)
    for i in range(n):
        for b in range(4):
            window = [b] + seq[i + 1 : i + k]
            assert int(fl4_py[0, i, b]) == ref.forward_hash(window, k)
            assert int(rl4_py[0, i, b]) == ref.reverse_hash(window, k)
