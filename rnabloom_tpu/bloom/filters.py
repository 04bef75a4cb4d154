"""HBM-resident Bloom structures with batched gather/scatter ops.

Design (TPU-first, not a port of bloom/BloomFilter.java):

* A Bloom "bit" is a **uint8 lane** in an HBM array.  Insert is a
  ``scatter-set(1)`` — every colliding write stores the same constant, so
  batched inserts are deterministic with no atomics (the reference instead
  tolerates racy read-modify-writes on a packed bit array,
  buffer/UnsafeByteBuffer.java:35-85).  Lookup is a gather + AND-reduce
  across the ``num_hash`` lanes.

* The counting filter is an **int32 conservative-update sketch**
  (count = min over h cells; update writes max(cell, min+multiplicity)).
  This is exactly the reference's increment-min scheme
  (bloom/CountingBloomFilter.java:170-194) generalized to batched
  multiplicities, with exact deterministic counters instead of stochastic
  8-bit MiniFloat — same estimator, strictly less noise.  Within-batch
  multiplicities are recovered with a small scratch sketch and scatter-add,
  so no sort is needed anywhere in the insert path.

* Filter sizes are powers of two: index = (hash >>> 1) & (size-1), the
  pow2 specialization of the reference's (hash >>> 1) % size
  (bloom/BloomFilter.java:108-111).  Hash values are u64 limb pairs; the
  index math stays entirely in uint32 lanes.

* Every filter array carries one extra trailing "trash" cell; masked-out
  lanes scatter there, which keeps shapes static with no predication.

All ops are functional: they return the new filter array (donate the old one
under jit for in-place updates).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.u64 import U64


def pow2_size(requested: int) -> int:
    """Round a requested cell count up to a power of two (min 1024)."""
    return 1 << max(10, math.ceil(math.log2(max(requested, 2))))


def merge_default() -> bool:
    """Whether filters should default to sort-merge MXU-sweep inserts:
    on for real TPUs, off elsewhere; RNABLOOM_MERGE_INSERTS=0/1 forces."""
    import os

    env = os.environ.get("RNABLOOM_MERGE_INSERTS", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


@dataclass(frozen=True)
class BloomConfig:
    """Static shape/hash parameters of a filter (hashable, jit-static).

    ``merge=True`` switches batch inserts to the sort-merge MXU sweep
    (ops/histmerge.py) — exact same table contents, ~2x faster than the
    scatter engine on large batches.  Merge filters are padded with a full
    trash block instead of one trash cell."""

    size_log2: int
    num_hash: int
    merge: bool = False

    @property
    def size(self) -> int:
        return 1 << self.size_log2

    @property
    def trash(self) -> int:
        if self.merge:
            from ..ops import histmerge

            return histmerge.table_pad(self.size_log2)
        return 1

    @classmethod
    def for_expected(cls, num_elements: int, fpr: float, num_hash: int) -> "BloomConfig":
        """Sizing from expected elements + target FPR.

        Same formula as BloomFilter.getExpectedSize (BloomFilter.java:196-199),
        then rounded up to a power of two.
        """
        r = -num_hash / math.log(1.0 - math.exp(math.log(fpr) / num_hash))
        return cls(pow2_size(int(math.ceil(num_elements * r))).bit_length() - 1, num_hash)


def bloom_indices(hashes: U64, size_log2: int, valid: Optional[jax.Array] = None) -> jax.Array:
    """(hash >>> 1) & (size - 1) as uint32 lane indices.

    Supports size_log2 <= 32 (per-shard sizes; 2**32 lanes = 4 GiB of uint8).
    Invalid lanes are redirected to the trash cell at index ``size``.
    """
    assert size_log2 <= 32
    idx_lo = (hashes.lo >> 1) | (hashes.hi << 31)
    if size_log2 < 32:
        idx = idx_lo & np.uint32((1 << size_log2) - 1)
    else:
        idx = idx_lo
    if valid is not None:
        idx = jnp.where(valid, idx, np.uint32(1 << size_log2))
    return idx


def make_bloom(cfg: BloomConfig) -> jax.Array:
    """Fresh bit-lane array (uint8, size + trash cell(s))."""
    return jnp.zeros(cfg.size + cfg.trash, dtype=jnp.uint8)


def bloom_add(bits: jax.Array, cfg: BloomConfig, hashes: U64, valid: Optional[jax.Array] = None) -> jax.Array:
    """Insert a batch.  hashes: U64 (..., num_hash)."""
    idx = bloom_indices(hashes, cfg.size_log2, _bcast_valid(valid, hashes))
    if cfg.merge:
        from ..ops import histmerge

        return histmerge.hist_update(bits, cfg.size_log2, idx, "set")
    return bits.at[idx.reshape(-1)].set(np.uint8(1), mode="drop")


def bloom_lookup(bits: jax.Array, cfg: BloomConfig, hashes: U64) -> jax.Array:
    """Membership per element.  hashes: U64 (..., num_hash) -> bool (...)."""
    idx = bloom_indices(hashes, cfg.size_log2)
    return jnp.all(jnp.take(bits, idx, axis=0) != 0, axis=-1)


def bloom_lookup_then_add(
    bits: jax.Array, cfg: BloomConfig, hashes: U64, valid: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """Batched lookupThenAdd: returns (new_bits, was_present).

    ``was_present`` is evaluated against the pre-batch snapshot; the
    reference's sequential loop would see earlier same-batch inserts.  The
    difference only shifts first-occurrence accounting within one batch and
    is corrected by the caller's multiplicity logic (see graph.add_kmers).
    """
    found = bloom_lookup(bits, cfg, hashes)
    return bloom_add(bits, cfg, hashes, valid), found


def bloom_popcount(bits: jax.Array, cfg: Optional[BloomConfig] = None) -> jax.Array:
    """Number of set lanes, as float32 (feeds the FPR estimate only)."""
    n = cfg.size if cfg is not None else bits.shape[0] - 1
    return jnp.sum(bits[:n].astype(jnp.float32))


def bloom_fpr(bits: jax.Array, cfg: BloomConfig) -> jax.Array:
    """(popcount / size) ** num_hash (BloomFilter.java:184-194)."""
    pc = jnp.sum(bits[: cfg.size].astype(jnp.float32))
    return (pc / cfg.size) ** cfg.num_hash


# ---------------------------------------------------------------------------
# Counting filter (conservative-update sketch, int32)
# ---------------------------------------------------------------------------

SCRATCH_LOG2_DEFAULT = 22  # 4M cells * 4B = 16 MiB scratch sketch per batch


@dataclass(frozen=True)
class CountingConfig:
    """``blocked=True`` selects the cache-blocked layout: all ``num_hash``
    cells of a key live in one 128-lane row (row index from the base hash,
    distinct lanes from the derived hashes).  Inserts then cost ONE row
    scatter-add of a one-hot bundle instead of ``num_hash`` element
    scatters — ~1.4x faster on the TPU scatter engine, at the standard
    blocked-Bloom cost of slightly correlated cells.  Lookups gather the
    individual cells either way.  The conservative/parity path keeps the
    reference's unblocked ``(h >>> 1) % size`` indexing.

    ``dtype`` sets the counter cell width — the reference's entire value
    proposition is Bloom memory efficiency, with 1-byte MiniFloat counters
    (util/MiniFloat.java:27-45) getting half the total budget in CELLS
    (RNABloom.java:6822-6830):
      * "mf8": 1 B/cell MiniFloat (3-bit mantissa, 5-bit exponent) — counts
        <= 15 exact, larger quantized to ~6-12%.  Increments decode+add+
        re-encode deterministically (the reference reaches the same codes
        stochastically via Math.random(); deterministic expected-value
        encoding stays within its quantization error and is reproducible).
      * "u16": 2 B/cell saturating exact counters (cap 65535 = ntCard's
        max tracked multiplicity, util/NTCardHistogram.java:29).
      * "int32": 4 B/cell exact (the TPU scatter-add fast path).
    Narrow cells exclude the blocked layout (int32-only row bundles).
    """

    size_log2: int
    num_hash: int
    scratch_log2: int = SCRATCH_LOG2_DEFAULT
    blocked: bool = False
    merge: bool = False  # sort-merge MXU sweep inserts (flat layout only)
    dtype: str = "int32"  # "int32" | "u16" | "mf8"

    @property
    def size(self) -> int:
        return 1 << self.size_log2

    @property
    def trash(self) -> int:
        if self.merge:
            from ..ops import histmerge

            return histmerge.table_pad(self.size_log2)
        return 128 if self.blocked else 1

    @property
    def cell_bytes(self) -> int:
        return {"int32": 4, "u16": 2, "mf8": 1}[self.dtype]

    @property
    def jnp_dtype(self):
        return {"int32": jnp.int32, "u16": jnp.uint16, "mf8": jnp.uint8}[self.dtype]


def make_counting(cfg: CountingConfig) -> jax.Array:
    # blocked layout appends a 128-cell trash ROW; flat one trash cell;
    # merge layout a full trash block (see ops/histmerge.py)
    assert not (cfg.merge and cfg.blocked), "merge inserts use the flat layout"
    assert cfg.dtype == "int32" or not cfg.blocked, "narrow counters are unblocked"
    return jnp.zeros(cfg.size + cfg.trash, dtype=cfg.jnp_dtype)


def decode_counts(cells: jax.Array, dtype: str) -> jax.Array:
    """Raw counter cells -> count values (monotonic in the cell code)."""
    if dtype == "mf8":
        from ..ops import minifloat

        return minifloat.decode(cells)
    return cells.astype(jnp.int32)


def encode_counts(values: jax.Array, dtype: str, u01: Optional[jax.Array] = None) -> jax.Array:
    """Count values -> counter cells (monotonic, saturating).

    For mf8, ``u01`` enables stochastic rounding (see minifloat.encode_
    stochastic) — required on increment paths so sub-quantum increments
    advance in expectation; plain nearest-rounding otherwise."""
    if dtype == "mf8":
        from ..ops import minifloat

        if u01 is not None:
            return minifloat.encode_stochastic(values, u01)
        return minifloat.encode(values)
    if dtype == "u16":
        return jnp.clip(values, 0, 65535).astype(jnp.uint16)
    return values.astype(jnp.int32)


def apply_cell_increments(
    cells: jax.Array, inc: jax.Array, dtype: str, salt=0, base_index: int = 0
) -> jax.Array:
    """cells += inc elementwise in the cell encoding (saturating).

    mf8 uses salted stochastic rounding keyed by absolute cell index so the
    same cell rolls a fresh (but reproducible) dice each batch."""
    if dtype == "int32":
        return cells + inc
    if dtype == "u16":
        return jnp.minimum(cells.astype(jnp.int32) + inc, 65535).astype(jnp.uint16)
    from ..ops import minifloat

    u01 = minifloat.mix_u01(
        jnp.arange(cells.shape[0], dtype=jnp.uint32)
        + jnp.asarray(base_index, jnp.uint32),
        salt,
    )
    new = minifloat.increment_codes(cells, inc, u01)
    return jnp.where(inc > 0, new, cells)


def blocked_cells(
    cfg: CountingConfig, hashes: U64, valid: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """(row, lanes) of a key's cells in the blocked layout.

    hashes: U64 (..., num_hash).  Row comes from hash 0; lane i from
    hash i's high bits, forced distinct from lane 0 for i >= 1 so the
    min-reduction never reads one cell twice.
    """
    assert cfg.size_log2 >= 7
    rows_log2 = cfg.size_log2 - 7
    h0_lo, h0_hi = hashes.lo[..., 0], hashes.hi[..., 0]
    row_lo = (h0_lo >> 1) | (h0_hi << 31)
    row = row_lo & np.uint32((1 << min(rows_log2, 32)) - 1)
    lane0 = (hashes.hi[..., 0] >> 8) & np.uint32(127)
    lanes = [lane0]
    for i in range(1, cfg.num_hash):
        step = (hashes.lo[..., i] % np.uint32(127)) + np.uint32(1)
        lanes.append((lane0 + step * np.uint32(i)) & np.uint32(127))
    if valid is not None:
        v = valid if valid.ndim == row.ndim else valid[..., 0]
        row = jnp.where(v, row, np.uint32(1 << rows_log2))
    return row, jnp.stack(lanes, axis=-1)


def counting_count(counts: jax.Array, cfg: CountingConfig, hashes: U64) -> jax.Array:
    """Estimated count per element: min over the h cells.

    Cell codes are monotonic in value for every dtype, so the min is taken
    over raw cells and decoded once."""
    if cfg.blocked:
        row, lanes = blocked_cells(cfg, hashes)
        idx = row[..., None].astype(jnp.uint32) * np.uint32(128) + lanes
        return jnp.min(jnp.take(counts, idx, axis=0), axis=-1)
    idx = bloom_indices(hashes, cfg.size_log2)
    cells = jnp.min(jnp.take(counts, idx, axis=0), axis=-1)
    if cfg.dtype == "int32":
        return cells
    return decode_counts(cells, cfg.dtype)


def counting_increment(
    counts: jax.Array,
    cfg: CountingConfig,
    hashes: U64,
    valid: Optional[jax.Array] = None,
    dec_first: Optional[jax.Array] = None,
    salt=0,
) -> jax.Array:
    """Conservative-update increment of a batch with multiplicity.

    Args:
      hashes: U64 (..., num_hash), one row per k-mer *occurrence*.
      valid: bool (...) — occurrences to count.
      dec_first: bool (...) — subtract 1 from the applied multiplicity for
        these elements (used by the graph to reproduce the reference's
        "first insert goes to dbgbf only" accounting,
        graph/BloomFilterDeBruijnGraph.java:405-412).

    Batched semantics: every occurrence of the same k-mer in the batch sees
    the same pre-batch cell snapshot; the within-batch multiplicity m is
    recovered from a scratch count-min sketch (scatter-add), and all h cells
    are raised to max(cell, min_cell + m).  For exact counters this equals m
    sequential conservative-update increments.
    """
    assert not cfg.blocked, "conservative path keeps the reference layout"
    valid = _bcast_valid(valid, hashes)
    idx = bloom_indices(hashes, cfg.size_log2, valid)

    # Within-batch multiplicity via scratch sketch (keyed by the same hashes,
    # reduced into a smaller range).
    sidx = bloom_indices(hashes, cfg.scratch_log2, valid)
    # int32 regardless of the cell dtype: a uint8 scratch would wrap at 255
    # within a batch and int32->uint8 scatter is a FutureWarning (error soon).
    scratch = jnp.zeros(((1 << cfg.scratch_log2) + 1,), jnp.int32)
    scratch = scratch.at[sidx.reshape(-1)].add(np.int32(1), mode="drop")
    mult = jnp.min(jnp.take(scratch, sidx, axis=0), axis=-1)

    if dec_first is not None:
        mult = mult - dec_first.astype(jnp.int32)

    cur_cells = jnp.min(jnp.take(counts, idx, axis=0), axis=-1)
    cur_min = decode_counts(cur_cells, cfg.dtype)
    new_val = cur_min + jnp.maximum(mult, 0).astype(cur_min.dtype)
    ok = valid[..., 0] if valid is not None else np.ones(new_val.shape, bool)
    new_val = jnp.where(ok, new_val, 0)
    # cell codes are monotonic in value, so scatter-max of codes is the
    # conservative update in any encoding; mf8 rounds stochastically keyed
    # by (key hash, batch salt) so sub-quantum increments advance
    u01 = None
    if cfg.dtype == "mf8":
        from ..ops import minifloat

        u01 = minifloat.mix_u01(hashes.lo[..., 0], salt)
    upd = jnp.broadcast_to(
        encode_counts(new_val, cfg.dtype, u01)[..., None], idx.shape
    )
    return counts.at[idx.reshape(-1)].max(upd.reshape(-1), mode="drop")


def counting_increment_cm(
    counts: jax.Array,
    cfg: CountingConfig,
    hashes: U64,
    valid: Optional[jax.Array] = None,
    salt=0,
) -> jax.Array:
    """Plain count-min increment: scatter-add 1 at all h cells.

    The fast path for stage-1 graph build: one scatter-add per (occurrence,
    hash) and nothing else — no membership pre-pass, no scratch sketch.
    Estimates overcount only by the per-cell collision mass (≈ inserted
    occurrences / size per cell, negligible at the reference's 1% FPR design
    point), whereas the conservative-update path (counting_increment) matches
    the reference's increment-min semantics exactly.
    """
    if cfg.blocked:
        row, lanes = blocked_cells(cfg, hashes, valid)
        bundle = jnp.zeros(lanes.shape[:-1] + (128,), jnp.int32)
        for i in range(cfg.num_hash):
            bundle = bundle + jax.nn.one_hot(lanes[..., i], 128, dtype=jnp.int32)
        rows2d = counts.reshape(-1, 128)
        rows2d = rows2d.at[row.reshape(-1)].add(
            bundle.reshape(-1, 128), mode="drop"
        )
        return rows2d.reshape(-1)
    idx = bloom_indices(hashes, cfg.size_log2, _bcast_valid(valid, hashes))
    if cfg.merge:
        from ..ops import histmerge

        op = {"int32": "add", "u16": "add_u16", "mf8": "add_mf8"}[cfg.dtype]
        return histmerge.hist_update(counts, cfg.size_log2, idx, op, salt)
    if cfg.dtype != "int32":
        # narrow cells can't scatter-add (no saturating atomics): build a
        # transient int32 batch histogram and apply it elementwise in the
        # cell encoding.  One full-table pass per batch — the merge sweep
        # (TPU default) folds this into its single table pass instead.
        hist = jnp.zeros(counts.shape, jnp.int32).at[idx.reshape(-1)].add(
            np.int32(1), mode="drop"
        )
        return apply_cell_increments(counts, hist, cfg.dtype, salt=salt)
    return counts.at[idx.reshape(-1)].add(np.int32(1), mode="drop")


def counting_fpr(counts: jax.Array, cfg: CountingConfig) -> jax.Array:
    pc = jnp.sum((counts[: cfg.size] != 0).astype(jnp.float32))
    return (pc / cfg.size) ** cfg.num_hash


def _bcast_valid(valid: Optional[jax.Array], hashes: U64) -> Optional[jax.Array]:
    """Broadcast a (...)-shaped mask to the (..., num_hash) hash shape."""
    if valid is None:
        return None
    if valid.shape == hashes.lo.shape:
        return valid
    return jnp.broadcast_to(valid[..., None], hashes.lo.shape)


# ---------------------------------------------------------------------------
# Save / restore
# ---------------------------------------------------------------------------


def save_filter(path: str, array: jax.Array, desc: dict) -> None:
    """Persist lanes + JSON descriptor (<path>.npy / <path>.desc.json)."""
    np.save(path + ".npy", np.asarray(array))
    with open(path + ".desc.json", "w") as f:
        json.dump(desc, f)


def load_filter(path: str) -> Tuple[jax.Array, dict]:
    arr = jnp.asarray(np.load(path + ".npy"))
    with open(path + ".desc.json") as f:
        desc = json.load(f)
    return arr, desc
