"""Sort-merge filter inserts: random scatter turned into MXU histogram sweeps.

Stage-1 graph build is bound by XLA's scatter engine (~10 ns per scattered
index on TPU v5e, independent of payload), while a full u32 sort of the same
index stream costs ~1.6 ns/element.  This module exploits that gap: instead
of scattering each (occurrence, hash) cell index into the filter, the stream
is sorted and applied to the table with one *linear sweep* — each table
block is updated with a one-hot x one-hot matmul on the MXU, so the random
accesses become dense linear algebra and the HBM traffic is sequential.

The scheme (exact and order-independent — filter inserts are commutative):

1. ``sort`` the cell-index stream; invalid lanes carry the ``SENTINEL``
   (0xFFFFFFFF) and sink to the tail.
2. View the sorted stream as rows of 128.  Rows whose first and last entry
   are equal are **uniform** — 128 copies of one heavy cell (poly-A tails,
   rRNA k-mers).  They are peeled off into a small per-row scatter
   (+128 each, at most N/128 indices), which absorbs arbitrarily heavy
   duplicate mass; a single cell can then contribute at most 254 entries
   to the remaining *mixed* rows, so mixed load stays hash-uniform across
   table blocks.
3. The mixed rows are compacted (index arithmetic only) and a fixed window
   of ``wrows`` rows is gathered per table block.  A Pallas kernel sweeps
   the table once: for each block it builds row/lane one-hot matrices from
   the window (masked by block id, so neighbour spill-over and sentinels
   contribute zero) and computes the block's histogram as
   ``one_hot(rows)^T @ one_hot(lanes)`` on the MXU.
4. If any block's mixed entries exceed the window (Poisson tail; the
   geometry leaves >6 sigma of headroom) a ``lax.cond`` falls back to the
   plain scatter for that batch, so the result is exact in all cases.

Merge-enabled filter arrays are padded with one full trash *block* (the
sweep rewrites the whole array in place of the usual one trash cell); the
classic trash index ``size`` lands inside that pad.

Replaces the insert half of the reference's lock-free Bloom buffers
(bloom/BloomFilter.java:96-127, bloom/CountingBloomFilter.java:140-194);
lookups stay gather-based (filters.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = np.uint32(0xFFFFFFFF)

_INTERPRET: Optional[bool] = None


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / virtual meshes)."""
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def block_log2_for(size_log2: int) -> int:
    """Sweep block size: ~2^16 cells (gen/matmul-optimal ROWS=512), capped
    so the grid stays <= 2^13 steps and the block fits the table."""
    return min(max(16, size_log2 - 13), size_log2)


SUBBLOCKS = 4  # table blocks swept per grid step (amortizes step overhead)


def padded_blocks(size_log2: int) -> int:
    """Total sweep blocks (real + trash/pad), a multiple of SUBBLOCKS."""
    blocks = 1 << (size_log2 - block_log2_for(size_log2))
    return -(-(blocks + 1) // SUBBLOCKS) * SUBBLOCKS


def table_pad(size_log2: int) -> int:
    """Allocation pad of a merge-enabled filter: trash block(s) rounding
    the sweep grid to whole SUBBLOCKS-groups."""
    blocks = 1 << (size_log2 - block_log2_for(size_log2))
    return (padded_blocks(size_log2) - blocks) << block_log2_for(size_log2)


@dataclass(frozen=True)
class MergeGeometry:
    """Static sweep geometry for one (table size, stream length) pairing."""

    size_log2: int
    block_log2: int  # cells per sweep block
    wrows: int  # window rows of 128 gathered per block
    nrows: int  # padded stream rows of 128

    @property
    def blocks(self) -> int:  # table blocks, excluding the trash block
        return 1 << (self.size_log2 - self.block_log2)

    @property
    def rows(self) -> int:  # table rows of 128 per block
        return 1 << (self.block_log2 - 7)


def plan(size_log2: int, n_stream: int) -> Optional[MergeGeometry]:
    """Choose sweep geometry, or None when the merge path cannot apply.

    The window is sized at the mean mixed load per block plus >6 sigma of
    Poisson headroom, so the scatter fallback fires only on pathological
    batches.
    """
    if size_log2 > 31 or size_log2 < 10 or n_stream < 4096:
        return None
    block_log2 = block_log2_for(size_log2)
    blocks = 1 << (size_log2 - block_log2)
    nrows = -(-n_stream // 128)
    mean = n_stream / blocks
    # mean + 6 sigma Poisson headroom + one alignment row, plus a safety row
    cap = mean + 6.0 * math.sqrt(mean) + 128.0
    wrows = int(-(-cap // 128)) + 1
    wrows = min(wrows, nrows + 1)
    # pad to whole kernel matmul chunks (the sweep never masks a chunk tail)
    wc = min(_wchunk(1 << (block_log2 - 7)), wrows)
    wrows = -(-wrows // wc) * wc
    return MergeGeometry(size_log2, block_log2, wrows, max(nrows, wrows))


def _prepare(idx_flat: jax.Array, geo: MergeGeometry):
    """Sort + peel uniform rows + gather per-block windows.

    Returns (windows (BLOCKS+1, W, 128) u32, uvals (NROWS,) u32 heavy-cell
    values with SENTINEL for mixed rows, overflow bool scalar).
    """
    n = idx_flat.shape[0]
    npad = geo.nrows * 128
    if npad > n:
        idx_flat = jnp.concatenate(
            [idx_flat, jnp.full((npad - n,), SENTINEL, jnp.uint32)]
        )
    s = jnp.sort(idx_flat)
    s2 = s.reshape(geo.nrows, 128)

    uniform = s2[:, 0] == s2[:, -1]
    uvals = jnp.where(uniform, s2[:, 0], SENTINEL)

    mixed = jnp.logical_not(uniform).astype(jnp.int32)
    cpos_excl = jnp.cumsum(mixed) - mixed
    total = cpos_excl[-1] + mixed[-1]

    # compacted row id -> original row id (rows beyond `total` -> sentinel
    # row geo.nrows; uniform rows scatter past the array and are dropped)
    crow = jnp.full((geo.nrows + 1,), geo.nrows, jnp.int32)
    tgt = jnp.where(mixed == 1, cpos_excl, geo.nrows + 1)
    crow = crow.at[tgt].set(jnp.arange(geo.nrows, dtype=jnp.int32), mode="drop")

    blocks = geo.blocks
    bounds = (jnp.arange(blocks, dtype=jnp.uint32) << geo.block_log2).astype(jnp.uint32)
    pos_b = jnp.searchsorted(s, bounds, side="left").astype(jnp.int32)
    row_b = jnp.minimum(pos_b >> 7, geo.nrows - 1)
    cstart = jnp.take(cpos_excl, row_b)

    cend = jnp.concatenate([cstart[1:], total[None]])
    overflow = jnp.any(cend + 1 - cstart > geo.wrows)

    gidx = jnp.minimum(
        cstart[:, None] + jnp.arange(geo.wrows, dtype=jnp.int32)[None, :],
        geo.nrows,
    )
    rows = jnp.take(crow, gidx)  # (BLOCKS, W) original row ids (or sentinel)
    s2p = jnp.concatenate([s2, jnp.full((1, 128), SENTINEL, jnp.uint32)])
    windows = jnp.take(s2p, rows, axis=0)  # (BLOCKS, W, 128)
    # trash/pad blocks sweep with empty windows (delta 0, copy-through)
    npad_blocks = padded_blocks(geo.size_log2) - blocks
    windows = jnp.concatenate(
        [windows, jnp.full((npad_blocks, geo.wrows, 128), SENTINEL, jnp.uint32)]
    )
    return windows, uvals, overflow


def _wchunk(rows: int) -> int:
    """Window rows per matmul chunk, bounding the one-hot to ~2 MiB VMEM."""
    return max(1, (1 << 21) // (128 * rows))


def _sweep_kernel(salt_ref, win_ref, tab_ref, out_ref, *, geo: MergeGeometry, op: str):
    g = pl.program_id(0)
    rows, w = geo.rows, geo.wrows
    wc = min(_wchunk(rows), w)
    nchunk = -(-w // wc)  # plan() pads wrows to a multiple of the chunk
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (wc, 128, rows), 2)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (wc, 128, 128), 2)
    mask = np.int32((1 << geo.block_log2) - 1)

    def sub(s, _):
        b = g * SUBBLOCKS + s

        def chunk(c, delta):
            raw = win_ref[s, pl.ds(c * wc, wc), :]  # (wc, 128) u32
            inblk = jax.lax.shift_right_logical(raw, np.uint32(geo.block_log2)).astype(jnp.int32) == b
            local = jnp.where(inblk, raw.astype(jnp.int32) & mask, -1)
            ohr = ((local >> 7)[:, :, None] == row_iota).astype(jnp.int8)
            ohl = ((local & 127)[:, :, None] == lane_iota).astype(jnp.int8)
            return delta + jax.lax.dot_general(
                ohr.reshape(wc * 128, rows),
                ohl.reshape(wc * 128, 128),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        if nchunk == 1:
            delta = chunk(0, jnp.zeros((rows, 128), jnp.int32))
        else:
            delta = jax.lax.fori_loop(0, nchunk, chunk, jnp.zeros((rows, 128), jnp.int32))
        lo = s * rows
        tab = tab_ref[pl.ds(lo, rows), :]
        if op == "add":
            out_ref[pl.ds(lo, rows), :] = tab + delta.astype(out_ref.dtype)
        elif op == "add_u16":  # saturating 16-bit counters
            out_ref[pl.ds(lo, rows), :] = jnp.minimum(
                tab.astype(jnp.int32) + delta, 65535
            ).astype(out_ref.dtype)
        elif op == "add_mf8":
            # 1-byte MiniFloat counters, stochastically rounded keyed by
            # (absolute cell index, batch salt) so sub-quantum increments
            # advance in expectation (the deterministic-PRNG analog of
            # MiniFloat.java:31-38).  increment_codes is the fused
            # integer-only codec — the float decode/encode chain here cost
            # mf8 ~16% of stage-1 throughput vs int32
            from . import minifloat

            base = (g * SUBBLOCKS + s) * (rows * 128)
            cell = (
                jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 0) * np.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 1)
                + base.astype(jnp.uint32)
            )
            u01 = minifloat.mix_u01(cell, salt_ref[0])
            new = minifloat.increment_codes(tab, delta, u01)
            out_ref[pl.ds(lo, rows), :] = jnp.where(delta > 0, new, tab)
        else:  # "set": lanes hold 0/1 only, so OR == saturating set
            out_ref[pl.ds(lo, rows), :] = tab | (delta > 0).astype(out_ref.dtype)
        return 0

    # unroll the sub-block loop when the unrolled one-hots fit VMEM
    # comfortably (faster); otherwise a fori_loop reuses the buffers
    if SUBBLOCKS * w * 128 * (rows + 128) < (6 << 20):
        for s in range(SUBBLOCKS):
            sub(s, 0)
    else:
        jax.lax.fori_loop(0, SUBBLOCKS, sub, 0)


def _sweep2(
    body: jax.Array, geo: MergeGeometry, windows: jax.Array, op: str, salt=0
) -> jax.Array:
    """One linear pass over the whole (block-padded) 2-D table view."""
    rows = geo.rows
    nblk = padded_blocks(geo.size_log2)
    grid = nblk // SUBBLOCKS
    salt_arr = jnp.asarray(salt, jnp.uint32).reshape(1)
    # aliasing the table through the kernel keeps the whole update in place,
    # so the overflow lax.cond never needs a defensive copy of the filter
    return pl.pallas_call(
        partial(_sweep_kernel, geo=geo, op=op),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBBLOCKS, geo.wrows, 128), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBBLOCKS * rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBBLOCKS * rows, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * rows, 128), body.dtype),
        input_output_aliases={2: 0},
        interpret=_interpret(),
    )(salt_arr, windows, body)


def hist_update(
    table: jax.Array, size_log2: int, idx: jax.Array, op: str, salt=0
) -> jax.Array:
    """Exact merge-based batch update of ``table`` at ``idx``.

    Args:
      table: 1-D filter array (int32 counters or uint8 lanes) padded with a
        full trash block (``size + table_pad(size_log2)`` cells).
      size_log2: log2 of the table's cell count.
      idx: any-shape u32 cell indices; out-of-range values (the ``SENTINEL``
        for masked lanes, or the trash index ``size``) contribute nothing
        to real cells.
      op: "add" (+1 per occurrence) or "set" (mark present).

    Equivalent to ``table.at[idx].add/set(1, mode="drop")`` but sweep-based;
    falls back to that scatter under ``lax.cond`` if a window overflows.
    """
    if idx.ndim > 1:
        # stream order is irrelevant (it gets sorted); flattening hash-major
        # lets XLA fuse the transpose into the producer instead of paying a
        # physical relayout copy of the (..., num_hash) tensor
        idx = jnp.moveaxis(idx, -1, 0)
    flat = idx.reshape(-1)
    geo = plan(size_log2, flat.shape[0])
    if geo is None:
        return _scatter(table, flat, op, salt)
    # route anything out of [0, size) to the sentinel so it sorts to the tail
    size = np.uint32((1 << size_log2) - 1) + np.uint32(1)
    flat = jnp.where(flat < size, flat, SENTINEL)
    windows, uvals, overflow = _prepare(flat, geo)

    nrows2d = padded_blocks(size_log2) * geo.rows
    assert table.shape[0] == nrows2d * 128, (
        f"merge filter must be padded to whole sweep sub-block groups: "
        f"{table.shape[0]} != {nrows2d * 128}"
    )

    has_uniform = jnp.any(uvals != SENTINEL)

    def merge_path(tab):
        tab = _sweep2(tab.reshape(nrows2d, 128), geo, windows, op, salt).reshape(-1)

        # the heavy-duplicate scatter costs ~3 ms even for a no-op update
        # stream, so skip it entirely on batches with no uniform rows
        def apply_uniform(t):
            if op == "add":
                return t.at[uvals].add(np.int32(128).astype(t.dtype), mode="drop")
            if op in ("add_u16", "add_mf8"):
                # narrow cells: total the 128-row multiplicity per heavy cell
                # (duplicates across uniform rows), then gather-modify-set —
                # every duplicate writes the same final code
                su = jnp.sort(uvals)
                left = jnp.searchsorted(su, uvals, side="left")
                right = jnp.searchsorted(su, uvals, side="right")
                inc = (right - left).astype(jnp.int32) * np.int32(128)
                old = jnp.take(t, jnp.minimum(uvals, t.shape[0] - 1), axis=0)
                if op == "add_u16":
                    new = jnp.minimum(old.astype(jnp.int32) + inc, 65535).astype(t.dtype)
                else:
                    from . import minifloat

                    new = minifloat.increment_codes(
                        old, inc, minifloat.mix_u01(uvals, salt)
                    )
                return t.at[uvals].set(new, mode="drop")
            return t.at[uvals].set(np.uint8(1).astype(t.dtype), mode="drop")

        return jax.lax.cond(has_uniform, apply_uniform, lambda t: t, tab)

    def scatter_path(tab):
        # uniform rows were not applied in this branch: scatter everything
        return _scatter(tab, flat, op, salt)

    return jax.lax.cond(overflow, scatter_path, merge_path, table)


def _scatter(table: jax.Array, flat: jax.Array, op: str, salt=0) -> jax.Array:
    if op == "add":
        return table.at[flat].add(np.int32(1).astype(table.dtype), mode="drop")
    if op in ("add_u16", "add_mf8"):
        # narrow cells: transient int32 histogram, applied in the encoding
        from ..bloom.filters import apply_cell_increments

        hist = jnp.zeros(table.shape, jnp.int32).at[flat].add(np.int32(1), mode="drop")
        return apply_cell_increments(
            table, hist, "u16" if op == "add_u16" else "mf8", salt=salt
        )
    return table.at[flat].set(np.uint8(1).astype(table.dtype), mode="drop")
