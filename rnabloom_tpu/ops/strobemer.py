"""Randstrobe hashing (vectorized).

Maps hash/StrobeHashIterator.java (+ Strobe3 / Canonical variants): for each
anchor k-mer, each of the n-1 strobes is chosen from the window
[anchor + s*wMax + wMin, anchor + s*wMax + wMax) minimizing
combineHashValues(current, candidate) under *unsigned* comparison with
ties taking the later position (Long.compareUnsigned >= 0).  Used by the
long-read strobemer subsampler (-lrsub).

Batched: the per-anchor window scans become a static loop over window
offsets with elementwise combine + unsigned-min updates across all anchors
at once.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash, u64
from .u64 import U64


def _le_unsigned(a: U64, b: U64) -> jax.Array:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


@partial(jax.jit, static_argnames=("k", "n", "w_min", "w_max", "stranded"))
def strobemer_hashes(
    codes: jax.Array, k: int, n: int, w_min: int, w_max: int, stranded: bool = True
) -> Tuple[U64, jax.Array]:
    """Strobemer hash per anchor position.

    codes: (B, L) uint8.  Returns (hashes (B, M), valid (B, M)) with
    M = P - wMax*(n-2) - wMin  anchors (P = L-k+1), matching the
    reference's anchor range.  Windows truncated at the sequence end are
    handled by masking shorter candidates invalid only when out of range.
    """
    assert n >= 2
    L = codes.shape[-1]
    P = L - k + 1
    M = P - w_max * (n - 2) - w_min
    assert M >= 1, "sequence too short for strobemer parameters"

    fh, rh, valid = nthash.rolling_hash(codes, k, stranded=stranded)
    base = nthash.canonical(fh, rh)

    def slice_p(x: U64, start: int, size: int) -> U64:
        return U64(
            jax.lax.slice_in_dim(x.lo, start, start + size, axis=1),
            jax.lax.slice_in_dim(x.hi, start, start + size, axis=1),
        )

    def slice_v(start: int, size: int):
        return jax.lax.slice_in_dim(valid, start, start + size, axis=1)

    cur = slice_p(base, 0, M)
    ok = slice_v(0, M)
    for s in range(n - 1):
        w0 = s * w_max + w_min
        w1 = s * w_max + w_max
        best: Optional[U64] = None
        best_ok = None
        for off in range(w0, w1):
            size = M
            if off + M <= P:
                cand = slice_p(base, off, M)
                cand_ok = slice_v(off, M)
            else:
                avail = P - off
                if avail <= 0:
                    continue
                cand = slice_p(base, off, avail)
                pad = M - avail
                cand = U64(
                    jnp.pad(cand.lo, ((0, 0), (0, pad))),
                    jnp.pad(cand.hi, ((0, 0), (0, pad))),
                )
                cand_ok = jnp.pad(slice_v(off, avail), ((0, 0), (0, pad)))
            h = nthash.combine(cur, cand)
            if best is None:
                best, best_ok = h, cand_ok
            else:
                # unsigned compare, ties -> later offset wins (le on old)
                take_new = (_le_unsigned(h, best) & cand_ok) | ~best_ok
                best = u64.select(take_new, h, best)
                best_ok = best_ok | cand_ok
        cur = best
        ok = ok & best_ok
    return cur, ok
