"""Batched, closed-form ntHash kernels for TPU.

The reference computes rolling hashes with a sequential per-base slide
(NTHashIterator: one rotate + two table XORs per position).  A literal port
would serialize on the sequence axis — the worst possible shape for a vector
machine.  Instead we use the algebraic identity

    fh(i) = XOR_{j<k} rotl(seed[s[i+j]], k-1-j)
          = rotl( XOR_{p=i}^{i+k-1} rotr(seed[s[p]], p mod 64),  (k-1+i) mod 64 )

so a whole batch of reads is hashed with one table gather, one parallel
prefix-XOR (``jax.lax.associative_scan``, O(log L) depth), one sliding-window
XOR, and one per-lane dynamic rotate — fully parallel across both the batch
and sequence axes on the VPU.  Reverse-strand hashes use the mirror identity

    rh(i) = rotr( XOR_{p} rotl(seed[comp(s[p])], p mod 64),  i mod 64 ).

Semantics (seeds, slide recurrences, canonical signed-min, NTM64 multi-hash,
pair combine) match the reference's NTHash.java (see nthash_ref.py for the
scalar golden model and file:line citations).

All hash values are u64.U64 pairs of uint32 arrays; bases are 2-bit codes
A=0 C=1 G=2 T=3, with 4 = N/invalid/padding.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash_ref as ref
from . import u64
from .u64 import U64

NUM_CODES = 5  # A C G T N


def _seed_table_py(transform):
    # numpy (not jnp) constants: safe to lru_cache across jit traces — they
    # are embedded as fresh constants in every trace that uses them.
    import numpy as np

    vals = [transform(s) & ref.M64 for s in ref.SEEDS]
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([v >> 32 for v in vals], dtype=np.uint32)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _seed_consts(k: int):
    """Precomputed seed tables (host constants baked into the program)."""
    ident = _seed_table_py(lambda s: s)
    rot_k = _seed_table_py(lambda s: ref.rotl64(s, k))
    rot_km1 = _seed_table_py(lambda s: ref.rotl64(s, k - 1))
    rotr_1 = _seed_table_py(lambda s: ref.rotr64(s, 1))
    return {"ident": ident, "rot_k": rot_k, "rot_km1": rot_km1, "rotr_1": rotr_1}


def comp_codes(codes: jax.Array) -> jax.Array:
    """Complement of 2-bit codes; invalid (>=4) stays invalid."""
    return jnp.where(codes < 4, 3 - codes, codes).astype(codes.dtype)


def _gather_seed(table: Tuple[jnp.ndarray, jnp.ndarray], codes: jax.Array) -> U64:
    # 5-entry table lookup as a select chain: XLA TPU lowers per-element
    # gathers to a serialized index engine (~17ns/elem); four vectorized
    # where-ops are ~100x faster.  Code 4 (N/invalid) has seed 0.
    lo, hi = table
    out_lo = jnp.zeros(codes.shape, dtype=jnp.uint32)
    out_hi = jnp.zeros(codes.shape, dtype=jnp.uint32)
    for c in range(4):
        sel = codes == c
        out_lo = jnp.where(sel, np.uint32(lo[c]), out_lo)
        out_hi = jnp.where(sel, np.uint32(hi[c]), out_hi)
    return U64(out_lo, out_hi)


def seed_of(codes: jax.Array, k: int, which: str = "ident") -> U64:
    """seed[c] (or a statically-rotated variant) per lane."""
    return _gather_seed(_seed_consts(k)[which], codes)


def _prefix_xor(x: U64, axis: int) -> U64:
    lo = jax.lax.associative_scan(jnp.bitwise_xor, x.lo, axis=axis)
    hi = jax.lax.associative_scan(jnp.bitwise_xor, x.hi, axis=axis)
    return U64(lo, hi)


def _window_xor(p_incl: U64, k: int, axis: int) -> U64:
    """XOR over sliding windows of length k from an inclusive prefix-XOR.

    out[i] = incl[i + k - 1] ^ incl[i - 1]  (incl[-1] := 0), for i in [0, L-k].
    """
    L = p_incl.lo.shape[axis]
    n = L - k + 1
    hi_part = u64.U64(
        jax.lax.slice_in_dim(p_incl.lo, k - 1, k - 1 + n, axis=axis),
        jax.lax.slice_in_dim(p_incl.hi, k - 1, k - 1 + n, axis=axis),
    )
    if n == 1:
        return hi_part
    lo_part = u64.U64(
        jax.lax.slice_in_dim(p_incl.lo, 0, n - 1, axis=axis),
        jax.lax.slice_in_dim(p_incl.hi, 0, n - 1, axis=axis),
    )
    pad = [(0, 0)] * p_incl.lo.ndim
    pad[axis] = (1, 0)
    lo_padded = u64.U64(jnp.pad(lo_part.lo, pad), jnp.pad(lo_part.hi, pad))
    return u64.xor(hi_part, lo_padded)


def rolling_hash(
    codes: jax.Array, k: int, stranded: bool
) -> Tuple[U64, Optional[U64], jax.Array]:
    """All k-mer hashes of a code batch.

    Args:
      codes: (..., L) uint8 2-bit codes, 4 = invalid/pad.  L >= k.
      k: k-mer length (static).
      stranded: if False also compute reverse-strand hashes.

    Returns:
      (fh, rh, valid): U64 arrays of shape (..., L-k+1); rh is None when
      stranded.  valid[i] is True iff the window [i, i+k) contains no
      invalid base.
    """
    L = codes.shape[-1]
    n = L - k + 1
    assert n >= 1, f"sequence length {L} < k={k}"
    axis = codes.ndim - 1

    pos = np.arange(L, dtype=np.uint32) & np.uint32(63)
    seeds = seed_of(codes, k, "ident")

    # Forward strand: t(p) = rotr(seed[s_p], p); fh(i) = rotl(window, (k-1+i)).
    t_f = u64.rotr_dyn(seeds, pos)
    w_f = _window_xor(_prefix_xor(t_f, axis), k, axis)
    rot_amt = (np.arange(n, dtype=np.uint32) + np.uint32(k - 1)) & np.uint32(63)
    fh = u64.rotl_dyn(w_f, rot_amt)

    rh = None
    if not stranded:
        seeds_c = seed_of(comp_codes(codes), k, "ident")
        t_r = u64.rotl_dyn(seeds_c, pos)
        w_r = _window_xor(_prefix_xor(t_r, axis), k, axis)
        rh = u64.rotr_dyn(w_r, np.arange(n, dtype=np.uint32) & np.uint32(63))

    # Validity: no invalid base inside the window.
    invalid = (codes >= 4).astype(jnp.int32)
    c_incl = jnp.cumsum(invalid, axis=axis)
    hi_c = jax.lax.slice_in_dim(c_incl, k - 1, k - 1 + n, axis=axis)
    if n > 1:
        lo_c = jax.lax.slice_in_dim(c_incl, 0, n - 1, axis=axis)
        pad = [(0, 0)] * c_incl.ndim
        pad[axis] = (1, 0)
        lo_c = jnp.pad(lo_c, pad)
    else:
        lo_c = jnp.zeros_like(hi_c)
    valid = (hi_c - lo_c) == 0

    return fh, rh, valid


def canonical(fh: U64, rh: Optional[U64]) -> U64:
    """Base hash value: signed min(fh, rh) in non-stranded mode, else fh."""
    if rh is None:
        return fh
    return u64.min_signed(fh, rh)


def multi_hash(base: U64, k: int, m: int) -> U64:
    """NTM64: derive m hash values from the base value (trailing axis m).

    h_0 = base;  h_i = g(base * (i ^ k*MULTI_SEED)),  g(x) = x ^ (x >>> 27).
    The multipliers are compile-time constants, so each extra hash costs one
    constant 64-bit multiply + one shift-xor on the VPU.
    """
    outs = [base]
    for i in range(1, m):
        c = (i ^ (k * ref.MULTI_SEED)) & ref.M64
        t = u64.mul_const(base, c)
        t = u64.xor(t, u64.shr(t, ref.MULTI_SHIFT))
        outs.append(t)
    return u64.stack(outs, axis=-1)


def combine(a: U64, b: U64) -> U64:
    """Pair-hash combiner: a ^ (b + 0x9e3779b9 + (a << 6) + (b >>> 2))."""
    inner = u64.add(
        u64.add(b, u64.from_py(0x9E3779B9, b.lo.shape)),
        u64.add(u64.shl(a, 6), u64.shr(b, 2)),
    )
    return u64.xor(a, inner)


def combine_canonical(fh_l: U64, rh_l: U64, fh_r: U64, rh_r: U64) -> U64:
    """Canonical pair hash: min(combine(fl, fr), combine(rr, rl)) signed.

    Mirrors CanonicalKmer.getKmerPairHashValue (CanonicalKmer.java:68-71):
    the reverse-complement of the pair (L, R) is (rc(R), rc(L)).
    """
    return u64.min_signed(combine(fh_l, fh_r), combine(rh_r, rh_l))


def successor_hashes(
    fh: U64, out_codes: jax.Array, k: int, rh: Optional[U64] = None
) -> Tuple[U64, Optional[U64]]:
    """Hashes of the 4 right-neighbors of each k-mer.

    Args:
      fh: (...,) forward hashes of the current k-mers.
      out_codes: (...,) 2-bit code of each k-mer's FIRST base (leaves window).
      rh: reverse hashes (non-stranded mode).

    Returns:
      (fh4, rh4): U64 of shape (..., 4), one per appended base A/C/G/T.
      fh' = rotl(fh,1) ^ rotl(seed[out], k) ^ seed[in]
      rh' = rotr(rh,1) ^ rotr(seed[comp out], 1) ^ rotl(seed[comp in], k-1)
    """
    base4 = np.arange(4, dtype=np.uint8)
    shape4 = out_codes.shape + (4,)
    in_codes = np.broadcast_to(base4, shape4)

    t = u64.xor(u64.rotl1(fh), seed_of(out_codes, k, "rot_k"))
    fh4 = u64.xor(
        u64.broadcast_to(u64.reshape(t, t.lo.shape + (1,)), shape4),
        seed_of(in_codes, k, "ident"),
    )

    rh4 = None
    if rh is not None:
        tr = u64.xor(u64.rotr1(rh), seed_of(comp_codes(out_codes), k, "rotr_1"))
        rh4 = u64.xor(
            u64.broadcast_to(u64.reshape(tr, tr.lo.shape + (1,)), shape4),
            seed_of(comp_codes(in_codes), k, "rot_km1"),
        )
    return fh4, rh4


def predecessor_hashes(
    fh: U64, out_codes: jax.Array, k: int, rh: Optional[U64] = None
) -> Tuple[U64, Optional[U64]]:
    """Hashes of the 4 left-neighbors of each k-mer.

    Args:
      out_codes: 2-bit code of each k-mer's LAST base (leaves window).

    fh' = rotr(fh,1) ^ rotr(seed[out], 1) ^ rotl(seed[in], k-1)
    rh' = rotl(rh,1) ^ rotl(seed[comp out], k) ^ seed[comp in]
    """
    base4 = np.arange(4, dtype=np.uint8)
    shape4 = out_codes.shape + (4,)
    in_codes = np.broadcast_to(base4, shape4)

    t = u64.xor(u64.rotr1(fh), seed_of(out_codes, k, "rotr_1"))
    fh4 = u64.xor(
        u64.broadcast_to(u64.reshape(t, t.lo.shape + (1,)), shape4),
        seed_of(in_codes, k, "rot_km1"),
    )

    rh4 = None
    if rh is not None:
        tr = u64.xor(u64.rotl1(rh), seed_of(comp_codes(out_codes), k, "rot_k"))
        rh4 = u64.xor(
            u64.broadcast_to(u64.reshape(tr, tr.lo.shape + (1,)), shape4),
            seed_of(comp_codes(in_codes), k, "ident"),
        )
    return fh4, rh4


def variant_hashes_right(
    fh: U64, last_codes: jax.Array, k: int, rh: Optional[U64] = None
) -> Tuple[U64, Optional[U64]]:
    """Hashes of the k-mers with the LAST base substituted by each of A/C/G/T.

    fh_variant = fh ^ seed[old_last] ^ seed[new_last]  (last base has rotation
    0 in the forward sum); reverse strand: rotation k-1 of complements.
    Mirrors RightVariantsNTHashIterator behavior.
    """
    base4 = np.arange(4, dtype=np.uint8)
    shape4 = last_codes.shape + (4,)
    in_codes = np.broadcast_to(base4, shape4)

    t = u64.xor(fh, seed_of(last_codes, k, "ident"))
    fh4 = u64.xor(
        u64.broadcast_to(u64.reshape(t, t.lo.shape + (1,)), shape4),
        seed_of(in_codes, k, "ident"),
    )
    rh4 = None
    if rh is not None:
        tr = u64.xor(rh, seed_of(comp_codes(last_codes), k, "rot_km1"))
        rh4 = u64.xor(
            u64.broadcast_to(u64.reshape(tr, tr.lo.shape + (1,)), shape4),
            seed_of(comp_codes(in_codes), k, "rot_km1"),
        )
    return fh4, rh4


def variant_hashes_left(
    fh: U64, first_codes: jax.Array, k: int, rh: Optional[U64] = None
) -> Tuple[U64, Optional[U64]]:
    """Hashes of the k-mers with the FIRST base substituted (rotation k-1)."""
    base4 = np.arange(4, dtype=np.uint8)
    shape4 = first_codes.shape + (4,)
    in_codes = np.broadcast_to(base4, shape4)

    t = u64.xor(fh, seed_of(first_codes, k, "rot_km1"))
    fh4 = u64.xor(
        u64.broadcast_to(u64.reshape(t, t.lo.shape + (1,)), shape4),
        seed_of(in_codes, k, "rot_km1"),
    )
    rh4 = None
    if rh is not None:
        tr = u64.xor(rh, seed_of(comp_codes(first_codes), k, "ident"))
        rh4 = u64.xor(
            u64.broadcast_to(u64.reshape(tr, tr.lo.shape + (1,)), shape4),
            seed_of(comp_codes(in_codes), k, "ident"),
        )
    return fh4, rh4
