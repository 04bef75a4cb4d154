"""Secondary Bloom filter variants.

* CascadingBloomFilter (bloom/CascadingBloomFilter.java): N bit-lane levels;
  an element inserts into the first level that does not contain it, so
  lookup on the top level answers "seen >= N times".  Batched semantics:
  one level advances per batch occurrence (a within-batch repeat advances
  one level per pass, like the reference's per-occurrence loop).
* PairedKeysPartitionedBloomFilter (bloom/PairedKeysPartitionedBloomFilter
  .java:50-66,181-219): three bit arrays (left key, right key, pair key),
  each size/3; a pair is present only if all three agree.

Neither is wired into the default pipeline (the reference constructs
them nowhere in RNABloom.java's current main path) — they are provided for
API completeness and for downstream tools.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.u64 import U64
from . import filters
from .filters import BloomConfig


@dataclass(frozen=True)
class CascadingConfig:
    size_log2: int  # per level
    num_hash: int
    num_levels: int = 3


def make_cascading(cfg: CascadingConfig) -> List[jax.Array]:
    return [filters.make_bloom(BloomConfig(cfg.size_log2, cfg.num_hash)) for _ in range(cfg.num_levels)]


def cascading_add(
    levels: List[jax.Array], cfg: CascadingConfig, hashes: U64,
    valid: Optional[jax.Array] = None,
) -> List[jax.Array]:
    """Insert each element into its first non-containing level."""
    bcfg = BloomConfig(cfg.size_log2, cfg.num_hash)
    remaining = (
        valid if valid is not None else jnp.ones(hashes.lo.shape[:-1], bool)
    )
    out = []
    for lv in levels:
        present = filters.bloom_lookup(lv, bcfg, hashes)
        insert_here = remaining & ~present
        out.append(filters.bloom_add(lv, bcfg, hashes, insert_here))
        remaining = remaining & present
    return out


def cascading_lookup(levels: List[jax.Array], cfg: CascadingConfig, hashes: U64) -> jax.Array:
    """True iff the element reached the top level (seen >= num_levels)."""
    bcfg = BloomConfig(cfg.size_log2, cfg.num_hash)
    return filters.bloom_lookup(levels[-1], bcfg, hashes)


@dataclass(frozen=True)
class PartitionedPairConfig:
    size_log2: int  # per partition
    num_hash: int


class PartitionedPairState:
    def __init__(self, cfg: PartitionedPairConfig):
        bcfg = BloomConfig(cfg.size_log2, cfg.num_hash)
        self.left = filters.make_bloom(bcfg)
        self.right = filters.make_bloom(bcfg)
        self.pair = filters.make_bloom(bcfg)
        self.cfg = cfg

    def _bcfg(self):
        return BloomConfig(self.cfg.size_log2, self.cfg.num_hash)

    def add(self, h_left: U64, h_right: U64, h_pair: U64, valid=None):
        bcfg = self._bcfg()
        self.left = filters.bloom_add(self.left, bcfg, h_left, valid)
        self.right = filters.bloom_add(self.right, bcfg, h_right, valid)
        self.pair = filters.bloom_add(self.pair, bcfg, h_pair, valid)

    def lookup(self, h_left: U64, h_right: U64, h_pair: U64) -> jax.Array:
        bcfg = self._bcfg()
        return (
            filters.bloom_lookup(self.left, bcfg, h_left)
            & filters.bloom_lookup(self.right, bcfg, h_right)
            & filters.bloom_lookup(self.pair, bcfg, h_pair)
        )

    def lookup_left(self, h_left: U64) -> jax.Array:
        return filters.bloom_lookup(self.left, self._bcfg(), h_left)

    def lookup_right(self, h_right: U64) -> jax.Array:
        return filters.bloom_lookup(self.right, self._bcfg(), h_right)


class SimpleBloomFilter:
    """Single-hash, single-bit-array Bloom filter
    (bloom/SimpleBloomFilter.java): index = hash % size, one lane per key.

    The reference uses it only inside SeqSubsampler internals (where the
    TPU build's subsamplers use a counting sketch instead); provided for
    API-for-API completeness.  Host-side numpy — this filter never sits on
    a device hot path."""

    def __init__(self, size: int):
        self.size = int(size)
        self.bits = np.zeros(self.size, bool)

    def _index(self, h: np.ndarray) -> np.ndarray:
        return (np.asarray(h, np.uint64) % np.uint64(self.size)).astype(np.int64)

    def add(self, h) -> None:
        self.bits[self._index(h)] = True

    def lookup(self, h) -> np.ndarray:
        return self.bits[self._index(h)]

    def lookup_and_add(self, h) -> np.ndarray:
        """getAndSet semantics (SimpleBloomFilter.lookupAndAdd): the
        pre-insert membership, applied element-wise over a batch in order
        (duplicates within the batch observe earlier occurrences)."""
        idx = self._index(h)
        # first occurrence of each index in the batch reports the PRE-batch
        # bit; later duplicates report True
        first = np.zeros(len(idx), bool)
        _, first_pos, inv = np.unique(idx, return_index=True, return_inverse=True)
        is_first = np.arange(len(idx)) == first_pos[inv]
        prev = self.bits[idx]
        out = np.where(is_first, prev, True)
        self.bits[idx] = True
        return out

    def fpr(self) -> float:
        """Fill ratio (SimpleBloomFilter.getFPR: popcount / size)."""
        return float(self.bits.sum()) / self.size

    def empty(self) -> None:
        self.bits[:] = False
