"""Pure-Python golden model of ntHash (arbitrary-precision ints).

This is the parity oracle for the vectorized JAX/Pallas kernels in
``nthash.py``.  It implements the published ntHash-1 rolling-hash family used
by the reference assembler (semantics per
/root/reference/src/rnabloom/bloom/hash/NTHash.java — studied for behavior,
re-implemented from the recurrences):

* forward-strand hash   fh(S) = XOR_i rotl64(seed[S_i], k-1-i)
* reverse-strand hash   rh(S) = XOR_i rotl64(seed[comp(S_i)], i)
* O(1) slide            fh'   = rotl64(fh, 1) ^ rotl64(seed[out], k) ^ seed[in]
* canonical             min_signed(fh, rh)        (Java ``<`` on long is signed)
* multi-hash (NTM64)    h_i = g(fh * (i ^ k*MULTI_SEED)),  g(x) = x ^ (x >>> 27)
* pair combine          a ^ (b + 0x9e3779b9 + (a << 6) + (b >>> 2))

Bases are 2-bit codes: A=0, C=1, G=2, T/U=3; complement(c) = 3 - c.
All arithmetic is mod 2**64.
"""

from __future__ import annotations

from typing import List, Sequence

M64 = (1 << 64) - 1

# Published ntHash 64-bit base seeds (Mohamadi et al., Bioinformatics 2016;
# same constants as the BSD-licensed ntHash release).
SEED_A = 0x3C8BFBB395C60474
SEED_C = 0x3193C18562A02B4C
SEED_G = 0x20323ED082572324
SEED_T = 0x295549F54BE24456
SEED_N = 0x0000000000000000

MULTI_SEED = 0x90B45D39FB6DA1FA
MULTI_SHIFT = 27

# 2-bit code -> seed; code 4 (N / invalid) -> 0
SEEDS = [SEED_A, SEED_C, SEED_G, SEED_T, SEED_N]

BASE_TO_CODE = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3}
CODE_TO_BASE = "ACGT"


def rotl64(v: int, s: int) -> int:
    s %= 64
    v &= M64
    return ((v << s) | (v >> (64 - s))) & M64


def rotr64(v: int, s: int) -> int:
    return rotl64(v, 64 - (s % 64))


def comp(code: int) -> int:
    return 3 - code if code < 4 else 4


def encode(seq: str) -> List[int]:
    return [BASE_TO_CODE.get(c.upper(), 4) for c in seq]


def to_signed(v: int) -> int:
    v &= M64
    return v - (1 << 64) if v >= (1 << 63) else v


def min_signed(a: int, b: int) -> int:
    return a if to_signed(a) < to_signed(b) else b


def forward_hash(codes: Sequence[int], k: int, start: int = 0) -> int:
    h = 0
    for i in range(k):
        h ^= rotl64(SEEDS[codes[start + i]], k - 1 - i)
    return h


def reverse_hash(codes: Sequence[int], k: int, start: int = 0) -> int:
    h = 0
    for i in range(k):
        h ^= rotl64(SEEDS[comp(codes[start + i])], i)
    return h


def canonical_hash(codes: Sequence[int], k: int, start: int = 0) -> int:
    return min_signed(forward_hash(codes, k, start), reverse_hash(codes, k, start))


def slide_forward(fh: int, code_out: int, code_in: int, k: int) -> int:
    """fh of the k-mer one base to the right."""
    return rotl64(fh, 1) ^ rotl64(SEEDS[code_out], k) ^ SEEDS[code_in]


def slide_forward_rev(rh: int, code_out: int, code_in: int, k: int) -> int:
    """rh of the k-mer one base to the right."""
    return rotr64(rh, 1) ^ rotr64(SEEDS[comp(code_out)], 1) ^ rotl64(SEEDS[comp(code_in)], k - 1)


def slide_backward(fh: int, code_out: int, code_in: int, k: int) -> int:
    """fh of the k-mer one base to the left (out = last base, in = new first)."""
    return rotr64(fh, 1) ^ rotr64(SEEDS[code_out], 1) ^ rotl64(SEEDS[code_in], k - 1)


def slide_backward_rev(rh: int, code_out: int, code_in: int, k: int) -> int:
    """rh of the k-mer one base to the left."""
    return rotl64(rh, 1) ^ rotl64(SEEDS[comp(code_out)], k) ^ SEEDS[comp(code_in)]


def multi_hash(base: int, k: int, m: int) -> List[int]:
    out = [base & M64]
    for i in range(1, m):
        t = (base * ((i ^ (k * MULTI_SEED)) & M64)) & M64
        t ^= t >> MULTI_SHIFT
        out.append(t & M64)
    return out


def combine(a: int, b: int) -> int:
    """Pair-hash combiner (boost hash_combine variant, 64-bit)."""
    a &= M64
    b &= M64
    return (a ^ ((b + 0x9E3779B9 + ((a << 6) & M64) + (b >> 2)) & M64)) & M64


def rolling_forward(codes: Sequence[int], k: int) -> List[int]:
    """fh at every position of a sequence (len(codes) - k + 1 values)."""
    n = len(codes) - k + 1
    if n <= 0:
        return []
    out = [forward_hash(codes, k, 0)]
    for i in range(1, n):
        out.append(slide_forward(out[-1], codes[i - 1], codes[i + k - 1], k))
    return out


def rolling_reverse(codes: Sequence[int], k: int) -> List[int]:
    n = len(codes) - k + 1
    if n <= 0:
        return []
    out = [reverse_hash(codes, k, 0)]
    for i in range(1, n):
        out.append(slide_forward_rev(out[-1], codes[i - 1], codes[i + k - 1], k))
    return out


def bloom_index(hash_val: int, size: int) -> int:
    """Reference Bloom indexing: (h >>> 1) % size."""
    return ((hash_val & M64) >> 1) % size
