"""MiniFloat 8-bit log-scale counter codec (3-bit mantissa, 5-bit exponent).

The reference stores k-mer counts as stochastic 8-bit MiniFloat counters
(util/MiniFloat.java:31-45, after ABySS plc.h).  The TPU build's RUNTIME
DEFAULT is the same 1-byte cell width (CountingConfig(dtype="mf8") via
stage1.default_graph_config) so ``-mem`` buys the reference's cell count;
the stochastic rounding is a salted deterministic PRNG keyed by
(cell index, batch salt) instead of Math.random(), so runs are
reproducible.  ``dtype="u16"``/"int32" trade cells for exact counts.  The
codec here is also used for compact export/import of counter arrays in a
reference-compatible byte format.

Encoding: b <= 7 -> value b; else value = ((b & 7) | 8) * 2**((b >> 3) - 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _exp2i(e: jax.Array) -> jax.Array:
    """Exact 2**e as float32 from an int32 exponent via bitcast — no
    transcendental (the codec runs over every table cell per merge sweep,
    and exp2/log2 on 2**28 cells per batch is the mf8 path's whole
    overhead vs int32 counters)."""
    return jax.lax.bitcast_convert_type(
        (jnp.clip(e, -126, 127) + 127).astype(jnp.int32) << 23, jnp.float32
    )


def _floor_log2(c: jax.Array) -> jax.Array:
    """floor(log2(c)) for positive float32 c: the float's exponent bits.

    Exact by construction — the old float ``log2`` formulation returned
    12.99999x at exact powers of two, making encode_floor(8192) emit code
    87 (=7680) instead of the exactly-representable 88 (=8192)."""
    return (
        jax.lax.bitcast_convert_type(c.astype(jnp.float32), jnp.int32) >> 23
    ) - 127


def decode(b: jax.Array) -> jax.Array:
    """MiniFloat byte -> float32 count (MiniFloat.toFloat)."""
    b = b.astype(jnp.int32)
    mant = (b & 7) | 8
    exp = (b >> 3) - 1
    big = mant.astype(jnp.float32) * _exp2i(exp)
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
    e = jnp.maximum(_floor_log2(jnp.maximum(c, 8.0)) - 2, 1)
    mant = jnp.round(c * _exp2i(1 - e)).astype(jnp.int32)
    # mantissa rounding up to 16 bumps the exponent (16 * 2**(e-1) ==
    # 8 * 2**e, exactly representable one exponent up)
    bump = mant >= 16
    e = jnp.where(bump, e + 1, e)
    mant = jnp.clip(jnp.where(bump, 8, mant), 8, 15)
    big = (e << 3) | (mant & 7)
    out = jnp.where(c <= 7.5, small, jnp.minimum(big, 127))
    return out.astype(jnp.uint8)


def encode_floor(count: jax.Array) -> jax.Array:
    """float/int count -> largest representable MiniFloat byte <= count."""
    c = jnp.maximum(count.astype(jnp.float32), 0.0)
    small = jnp.clip(jnp.floor(c), 0, 7).astype(jnp.int32)
    e = jnp.maximum(_floor_log2(jnp.maximum(c, 8.0)) - 2, 1)
    mant = jnp.clip(jnp.floor(c * _exp2i(1 - e)).astype(jnp.int32), 8, 15)
    big = (e << 3) | (mant & 7)
    out = jnp.where(c < 8, small, jnp.minimum(big, 127))
    return out.astype(jnp.uint8)


def encode_stochastic(count: jax.Array, u01: jax.Array) -> jax.Array:
    """Stochastically-rounded encode: round up to the next representable
    value with probability proportional to the residual.

    This is the deterministic-PRNG equivalent of the reference's
    Math.random() increment (util/MiniFloat.java:31-38): counts advance in
    expectation even when per-batch increments are smaller than the local
    quantization step (a floor/nearest encode would stick at 16 forever
    under +1-per-batch traffic).  ``u01``: uniform [0,1) values derived
    from a per-(cell, batch) hash — reproducible across runs.
    """
    c = jnp.maximum(count.astype(jnp.float32), 0.0)
    c0 = encode_floor(c).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, 127)
    v0 = decode(c0.astype(jnp.uint8))
    v1 = decode(c1.astype(jnp.uint8))
    frac = jnp.where(v1 > v0, (c - v0) / jnp.maximum(v1 - v0, 1e-9), 0.0)
    return jnp.where(u01 < frac, c1, c0).astype(jnp.uint8)


def increment_codes(codes: jax.Array, delta: jax.Array, u01: jax.Array) -> jax.Array:
    """Fused ``encode_stochastic(decode(codes) + delta, u01)`` for integer
    deltas >= 0, in integer arithmetic only (one float compare for the
    stochastic bump).  This is the mf8 merge-sweep hot path: the sweep runs
    it over EVERY table cell per batch, and the float codec chain
    (decode + encode_floor + two more decodes) was ~3x the VPU work.
    Exhaustively tested equal to the float path (tests/test_histmerge.py).
    """
    # clamp invalid codes (> 127 never occurs in a table; the float path
    # saturates them, and an unclamped exponent here would overflow a shift)
    c = jnp.minimum(codes.astype(jnp.int32), 127)
    d = jnp.maximum(delta.astype(jnp.int32), 0)
    e_old = jnp.maximum((c >> 3) - 1, 0)
    v = jnp.where(c <= 7, c, ((c & 7) | 8) << e_old)
    n = v + d
    # large path: exponent from the float32 representation (exact for the
    # exponent field; n < 2^22 in any realistic batch)
    b = _floor_log2(jnp.maximum(n, 8).astype(jnp.float32))
    e = b - 2  # mantissa m = n >> (e-1) lies in [8, 15]
    m = n >> (e - 1)
    v0 = m << (e - 1)
    raw = (e << 3) | (m & 7)
    sat = raw >= 127
    # rounding quantum v1 - v0 == 2^(e-1) for every non-saturated code
    # (mantissa 15 -> next exponent's mantissa 8 is the same step)
    q = (1 << jnp.maximum(e - 1, 0)).astype(jnp.float32)
    bump = jnp.logical_and(
        jnp.logical_not(sat), u01 * q < (n - v0).astype(jnp.float32)
    )
    big = jnp.minimum(raw + bump.astype(jnp.int32), 127)
    return jnp.where(n <= 7, n, big).astype(jnp.uint8)


def mix_u01(idx: jax.Array, salt) -> jax.Array:
    """Deterministic per-(index, salt) uniform [0,1) (xxhash-style mix)."""
    x = idx.astype(jnp.uint32) * np.uint32(0x9E3779B1)
    x = x ^ (jnp.asarray(salt, jnp.uint32) * np.uint32(0x85EBCA6B))
    x = x ^ (x >> 16)
    x = x * np.uint32(0x27D4EB2F)
    x = x ^ (x >> 15)
    # (x >> 8) < 2^24 fits int32; Mosaic lacks a direct uint32->f32 cast
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) / np.float32(1 << 24)


def max_value() -> float:
    """Largest representable count (byte 127)."""
    return float(15 * 2**14)


def decode_np(b: np.ndarray) -> np.ndarray:
    b = b.astype(np.int32)
    mant = (b & 7) | 8
    exp = (b >> 3) - 1
    return np.where(b <= 7, b.astype(np.float32), mant * np.exp2(exp).astype(np.float32))
