"""64-bit unsigned integer arithmetic on TPU via uint32 limb pairs.

TPUs have no native 64-bit integer datapath, and Pallas/Mosaic kernels are
limited to 32-bit lanes.  All ntHash values in this framework are therefore
represented as a pair of uint32 arrays ``(lo, hi)`` — value = hi * 2**32 + lo.
Every op here is elementwise over arbitrary leading batch dims and maps onto
the TPU VPU (8x128 vector unit) with no cross-lane traffic.

The semantics mirror Java ``long`` ops used by the reference implementation
(/root/reference/src/rnabloom/bloom/hash/NTHash.java): wraparound multiply,
logical shifts, rotates, and *signed* 64-bit comparison (Java ``<``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


class U64(NamedTuple):
    """An array of 64-bit unsigned values as two uint32 limb arrays."""

    lo: jax.Array
    hi: jax.Array

    @property
    def shape(self):
        return self.lo.shape


def from_py(value: int, shape=()) -> U64:
    """Broadcast a Python int (mod 2**64) to a U64 of the given shape."""
    value &= (1 << 64) - 1
    # numpy constants: never dispatch eagerly to a device during tracing
    lo = np.full(shape, value & 0xFFFFFFFF, dtype=np.uint32)
    hi = np.full(shape, value >> 32, dtype=np.uint32)
    return U64(lo, hi)


def to_py(x: U64):
    """Materialize to host Python ints (scalar) or list (1-D)."""
    lo = np.asarray(x.lo, dtype=np.uint64)
    hi = np.asarray(x.hi, dtype=np.uint64)
    out = (hi << np.uint64(32)) | lo
    if out.ndim == 0:
        return int(out)
    return [int(v) for v in out.reshape(-1)]


def xor(a: U64, b: U64) -> U64:
    return U64(a.lo ^ b.lo, a.hi ^ b.hi)


def or_(a: U64, b: U64) -> U64:
    return U64(a.lo | b.lo, a.hi | b.hi)


def and_(a: U64, b: U64) -> U64:
    return U64(a.lo & b.lo, a.hi & b.hi)


def add(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(U32)
    return U64(lo, a.hi + b.hi + carry)


def shl(a: U64, s: int) -> U64:
    """Logical shift left by a static amount 0 <= s < 64."""
    if s == 0:
        return a
    if s < 32:
        lo = a.lo << s
        hi = (a.hi << s) | (a.lo >> (32 - s))
        return U64(lo, hi)
    return U64(jnp.zeros_like(a.lo), a.lo << (s - 32))


def shr(a: U64, s: int) -> U64:
    """Logical shift right by a static amount 0 <= s < 64 (Java ``>>>``)."""
    if s == 0:
        return a
    if s < 32:
        lo = (a.lo >> s) | (a.hi << (32 - s))
        hi = a.hi >> s
        return U64(lo, hi)
    return U64(a.hi >> (s - 32), jnp.zeros_like(a.hi))


def rotl(a: U64, s: int) -> U64:
    """Rotate left by a static amount (any int; taken mod 64)."""
    s %= 64
    if s == 0:
        return a
    return or_(shl(a, s), shr(a, 64 - s))


def rotr(a: U64, s: int) -> U64:
    return rotl(a, (64 - s) % 64)


def rotl1(a: U64) -> U64:
    """Rotate left by 1 — the ntHash sliding-window hot op."""
    lo = (a.lo << 1) | (a.hi >> 31)
    hi = (a.hi << 1) | (a.lo >> 31)
    return U64(lo, hi)


def rotr1(a: U64) -> U64:
    lo = (a.lo >> 1) | (a.hi << 31)
    hi = (a.hi >> 1) | (a.lo << 31)
    return U64(lo, hi)


def rotl_dyn(a: U64, s: jax.Array) -> U64:
    """Rotate left by a per-lane dynamic amount (uint32 array, taken mod 64)."""
    s = s.astype(U32) & np.uint32(63)
    # Stage 1: swap limbs if s >= 32 (a rotate by exactly 32).
    swap = s >= 32
    lo1 = jnp.where(swap, a.hi, a.lo)
    hi1 = jnp.where(swap, a.lo, a.hi)
    # Stage 2: funnel shift by r in [0, 31].
    r = s & np.uint32(31)
    rc = (np.uint32(32) - r) & np.uint32(31)  # 0 when r == 0
    zero_r = r == 0
    spill_hi = jnp.where(zero_r, np.uint32(0), hi1 >> rc)
    spill_lo = jnp.where(zero_r, np.uint32(0), lo1 >> rc)
    return U64((lo1 << r) | spill_hi, (hi1 << r) | spill_lo)


def rotr_dyn(a: U64, s: jax.Array) -> U64:
    s = s.astype(U32) & np.uint32(63)
    return rotl_dyn(a, (np.uint32(64) - s) & np.uint32(63))


def mul32_wide(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Full 32x32 -> 64 product of uint32 arrays, as (lo, hi) uint32."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    mid_carry = (mid < lh).astype(U32)  # overflow of lh + hl
    mid_lo = mid << 16
    lo = ll + mid_lo
    lo_carry = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return lo, hi


def mul(a: U64, b: U64) -> U64:
    """Low 64 bits of a * b (Java ``long`` multiply semantics)."""
    lo, carry_hi = mul32_wide(a.lo, b.lo)
    hi = carry_hi + a.lo * b.hi + a.hi * b.lo
    return U64(lo, hi)


def mul_const(a: U64, c: int) -> U64:
    """Multiply by a static Python constant (mod 2**64)."""
    c &= (1 << 64) - 1
    c_lo = np.uint32(c & 0xFFFFFFFF)
    c_hi = np.uint32(c >> 32)
    lo, carry_hi = mul32_wide(a.lo, c_lo)
    hi = carry_hi + a.lo * c_hi + a.hi * c_lo
    return U64(lo, hi)


def eq(a: U64, b: U64) -> jax.Array:
    return (a.lo == b.lo) & (a.hi == b.hi)


def lt_unsigned(a: U64, b: U64) -> jax.Array:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def lt_signed(a: U64, b: U64) -> jax.Array:
    """Java ``long`` comparison a < b: signed on the high limb."""
    a_hi = a.hi.astype(jnp.int32)
    b_hi = b.hi.astype(jnp.int32)
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a.lo < b.lo))


def min_signed(a: U64, b: U64) -> U64:
    """Java Math.min over longs — used for canonical hash selection."""
    take_a = lt_signed(a, b)
    return U64(jnp.where(take_a, a.lo, b.lo), jnp.where(take_a, a.hi, b.hi))


def select(pred: jax.Array, a: U64, b: U64) -> U64:
    return U64(jnp.where(pred, a.lo, b.lo), jnp.where(pred, a.hi, b.hi))


def zeros(shape) -> U64:
    return U64(np.zeros(shape, np.uint32), np.zeros(shape, np.uint32))


def stack(xs, axis=0) -> U64:
    return U64(
        jnp.stack([x.lo for x in xs], axis=axis),
        jnp.stack([x.hi for x in xs], axis=axis),
    )


def concatenate(xs, axis=0) -> U64:
    return U64(
        jnp.concatenate([x.lo for x in xs], axis=axis),
        jnp.concatenate([x.hi for x in xs], axis=axis),
    )


def take(x: U64, idx: jax.Array, axis=0) -> U64:
    return U64(jnp.take(x.lo, idx, axis=axis), jnp.take(x.hi, idx, axis=axis))


def reshape(x: U64, shape) -> U64:
    return U64(x.lo.reshape(shape), x.hi.reshape(shape))


def broadcast_to(x: U64, shape) -> U64:
    return U64(jnp.broadcast_to(x.lo, shape), jnp.broadcast_to(x.hi, shape))
