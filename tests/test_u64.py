"""u64 limb arithmetic vs Python arbitrary-precision ints."""

import numpy as np
import pytest

from rnabloom_tpu.ops import u64

M64 = (1 << 64) - 1
RNG = np.random.default_rng(42)


def rand_u64(n):
    return [int(x) for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)]


def as_u64(vals):
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([v >> 32 for v in vals], dtype=np.uint32)
    import jax.numpy as jnp

    return u64.U64(jnp.asarray(lo), jnp.asarray(hi))


EDGE = [0, 1, 2, 0xFFFFFFFF, 0x100000000, M64, 1 << 63, (1 << 63) - 1, 0xDEADBEEFCAFEBABE]


@pytest.fixture(scope="module")
def vals():
    return EDGE + rand_u64(200)


def test_roundtrip(vals):
    assert u64.to_py(as_u64(vals)) == vals


def test_add(vals):
    a, b = vals, list(reversed(vals))
    got = u64.to_py(u64.add(as_u64(a), as_u64(b)))
    assert got == [(x + y) & M64 for x, y in zip(a, b)]


def test_mul(vals):
    a, b = vals, list(reversed(vals))
    got = u64.to_py(u64.mul(as_u64(a), as_u64(b)))
    assert got == [(x * y) & M64 for x, y in zip(a, b)]


def test_mul_const(vals):
    for c in [0, 1, 3, 0x90B45D39FB6DA1FA, M64]:
        got = u64.to_py(u64.mul_const(as_u64(vals), c))
        assert got == [(x * c) & M64 for x in vals]


@pytest.mark.parametrize("s", [0, 1, 5, 31, 32, 33, 63])
def test_static_shifts_rot(vals, s):
    x = as_u64(vals)
    assert u64.to_py(u64.shl(x, s)) == [(v << s) & M64 for v in vals]
    assert u64.to_py(u64.shr(x, s)) == [(v & M64) >> s for v in vals]
    assert u64.to_py(u64.rotl(x, s)) == [((v << s) | (v >> (64 - s))) & M64 if s else v for v in vals]
    assert u64.to_py(u64.rotr(x, s)) == [((v >> s) | (v << (64 - s))) & M64 if s else v for v in vals]


def test_rot1(vals):
    x = as_u64(vals)
    assert u64.to_py(u64.rotl1(x)) == [((v << 1) | (v >> 63)) & M64 for v in vals]
    assert u64.to_py(u64.rotr1(x)) == [((v >> 1) | (v << 63)) & M64 for v in vals]


def test_dynamic_rot(vals):
    import jax.numpy as jnp

    x = as_u64(vals)
    for s_all in [0, 1, 31, 32, 33, 63]:
        s = jnp.full(len(vals), s_all, dtype=jnp.uint32)
        expect_l = [((v << s_all) | (v >> (64 - s_all))) & M64 if s_all else v for v in vals]
        assert u64.to_py(u64.rotl_dyn(x, s)) == expect_l
        expect_r = [((v >> s_all) | (v << (64 - s_all))) & M64 if s_all else v for v in vals]
        assert u64.to_py(u64.rotr_dyn(x, s)) == expect_r
    # per-lane mixed amounts
    amts = RNG.integers(0, 64, size=len(vals))
    s = jnp.asarray(amts.astype(np.uint32))
    got = u64.to_py(u64.rotl_dyn(x, s))
    assert got == [
        ((v << int(a)) | (v >> (64 - int(a)))) & M64 if a else v for v, a in zip(vals, amts)
    ]


def test_compare(vals):
    a, b = vals, list(reversed(vals))
    xa, xb = as_u64(a), as_u64(b)
    got_u = np.asarray(u64.lt_unsigned(xa, xb))
    assert list(got_u) == [x < y for x, y in zip(a, b)]

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    got_s = np.asarray(u64.lt_signed(xa, xb))
    assert list(got_s) == [signed(x) < signed(y) for x, y in zip(a, b)]
    got_min = u64.to_py(u64.min_signed(xa, xb))
    assert got_min == [x if signed(x) < signed(y) else y for x, y in zip(a, b)]
