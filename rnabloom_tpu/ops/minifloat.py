"""MiniFloat 8-bit log-scale counter codec (3-bit mantissa, 5-bit exponent).

The reference stores k-mer counts as stochastic 8-bit MiniFloat counters
(util/MiniFloat.java:31-45, after ABySS plc.h).  The TPU build keeps exact
int32 conservative-update counters on device (deterministic, no RNG in the
hot loop) — this codec exists for compact export/import of counter arrays in
a reference-compatible byte format and for tests that bound the quantization
error the reference itself tolerates.

Encoding: b <= 7 -> value b; else value = ((b & 7) | 8) * 2**((b >> 3) - 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def decode(b: jax.Array) -> jax.Array:
    """MiniFloat byte -> float32 count (MiniFloat.toFloat)."""
    b = b.astype(jnp.int32)
    mant = (b & 7) | 8
    exp = (b >> 3) - 1
    big = (mant.astype(jnp.float32)) * jnp.exp2(exp.astype(jnp.float32))
    return jnp.where(b <= 7, b.astype(jnp.float32), big)


def encode(count: jax.Array) -> jax.Array:
    """float/int count -> nearest representable MiniFloat byte (uint8).

    Deterministic rounding to the nearest representable value (the reference
    reaches representable values stochastically; round-trip error is within
    its quantization error by construction).
    """
    c = jnp.maximum(count.astype(jnp.float32), 0.0)
    small = jnp.clip(jnp.round(c), 0, 7).astype(jnp.int32)
    # exponent e >= 1 such that mantissa = c / 2**(e-1) lies in [8, 16)
    e = jnp.maximum(jnp.floor(jnp.log2(jnp.maximum(c, 8.0))) - 2.0, 1.0)
    mant = jnp.clip(jnp.round(c / jnp.exp2(e - 1.0)), 8, 15)
    # mantissa rounding up to 16 bumps the exponent
    bump = mant >= 16
    e = jnp.where(bump, e + 1.0, e)
    mant = jnp.where(bump, 8.0, mant)
    big = ((e.astype(jnp.int32)) << 3) | (mant.astype(jnp.int32) & 7)
    out = jnp.where(c <= 7.5, small, jnp.minimum(big, 127))
    return out.astype(jnp.uint8)


def max_value() -> float:
    """Largest representable count (byte 127)."""
    return float(15 * 2**14)


def decode_np(b: np.ndarray) -> np.ndarray:
    b = b.astype(np.int32)
    mant = (b & 7) | 8
    exp = (b >> 3) - 1
    return np.where(b <= 7, b.astype(np.float32), mant * np.exp2(exp).astype(np.float32))
