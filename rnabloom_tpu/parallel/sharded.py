"""Multi-chip graph build: hash-range-sharded filters over a device mesh.

The reference's only parallelism is shared-memory threads racing writes into
one process's Bloom filters (RNABloom.java:1203-1238).  The TPU-native
scale-out story replaces that with:

  * **DP over reads**: each device hashes its own slice of the read batch.
  * **Hash-range sharding of every filter**: device s owns lane indices
    [s * local, (s+1) * local).  A filter of global size 2**G over n = 2**N
    devices keeps local = 2**(G-N) lanes (+1 trash) per device.
  * **All-to-all routing over ICI**: lane indices are bucketed by owner
    shard (sort + searchsorted ranking into fixed-capacity buckets), moved
    with ``jax.lax.all_to_all``, answered by local gather/scatter, and —
    for lookups — routed back with a second all-to-all.  Popcounts/FPR are
    ``psum`` reductions.

One build step costs 6 all-to-alls (dbgbf insert+membership: 2, cbf
conservative update: 3, rpkbf insert: 1) plus one small psum (the scratch
multiplicity sketch is allreduced so within-batch k-mer multiplicities are
global, keeping sharded counts identical to the single-device build).
"""

from __future__ import annotations

import contextlib
import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bloom.filters import BloomConfig, CountingConfig
from ..graph import dbg
from ..graph.dbg import GraphConfig
from ..ops import nthash, u64
from ..ops.u64 import U64

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class ShardedGraphState(NamedTuple):
    """Filter arrays laid out (num_shards, local_size + 1), sharded on axis 0."""

    dbgbf: Optional[jax.Array]
    cbf: jax.Array
    rpkbf: Optional[jax.Array] = None
    fpkbf: Optional[jax.Array] = None


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def make_sharded_graph(
    cfg: GraphConfig, mesh: Mesh, with_rpkbf: bool = False, with_fpkbf: bool = False
) -> ShardedGraphState:
    n = mesh.devices.size
    assert n & (n - 1) == 0, "device count must be a power of two"
    sh = NamedSharding(mesh, P("d", None))

    def filt(size_log2, dtype, trash=1):
        local = (1 << size_log2) // n + trash
        return jax.device_put(jnp.zeros((n, local), dtype=dtype), sh)

    return ShardedGraphState(
        dbgbf=filt(cfg.dbgbf.size_log2, jnp.uint8) if cfg.exact_counts else None,
        # blocked layout appends a 128-cell trash ROW per shard
        cbf=filt(
            cfg.cbf.size_log2, cfg.cbf.jnp_dtype,
            trash=128 if cfg.cbf.blocked else 1,
        ),
        rpkbf=filt(cfg.pkbf.size_log2, jnp.uint8) if with_rpkbf else None,
        fpkbf=filt(cfg.pkbf.size_log2, jnp.uint8) if with_fpkbf else None,
    )


# ---------------------------------------------------------------------------
# Routing primitives (run inside shard_map)
# ---------------------------------------------------------------------------


def _bucket_capacity(m: int, n: int) -> int:
    """Per-round bucket size.

    Below the threshold C = m: a single round is provably enough and
    _routed_rounds skips the while_loop + completion-psum machinery
    entirely — walk-sized requests (up to ~tens of KB per shard, incl.
    the depth-D speculative trees) always take this path.

    Above it (stage-1 build streams), C is the hash-uniform mean per
    target plus >6 sigma of Poisson slack: the receive side processes
    n * C slots per shard, so C ~ m/n keeps per-shard routing work at ~m
    instead of n * m.  Measured on one core, the crossover is n > 4 —
    below that the second-round cond/psum bookkeeping costs more than the
    scatter slots it saves, so small meshes keep the provably-single-round
    C = m.  Heavy-duplicate skew (poly-A, rRNA) overflows a mean-sized
    bucket at most occasionally and rides the exact round-2 fallback."""
    if m <= 32768 or n <= 4:
        return m
    mean = m / n
    c = int(mean + 6.0 * math.sqrt(mean) + 256.0)
    return min(m, (c + 127) // 128 * 128)


_COMM: Optional[dict] = None


@contextlib.contextmanager
def comm_accounting():
    """Trace-time collective accounting (VERDICT r2, sharded cost item).

    Counts every collective the traced program schedules and the per-shard
    payload bytes each moves.  Because routing loops (`_routed_rounds`) and
    walk supersteps are ``lax.while_loop`` bodies traced exactly once, the
    counts read as *collectives per round / per superstep* — the number
    that decides whether multi-chip stage 3 should shard the graph or
    replicate it.  Usage::

        with comm_accounting() as comm:
            jax.eval_shape(step, state, codes)
        # comm == {"all_to_all": ..., "psum": ...,
        #          "a2a_bytes_per_shard": ..., "psum_bytes_per_shard": ...}
    """
    global _COMM
    prev, _COMM = _COMM, {
        "all_to_all": 0,
        "psum": 0,
        "a2a_bytes_per_shard": 0,
        "psum_bytes_per_shard": 0,
    }
    try:
        yield _COMM
    finally:
        _COMM = prev


def _note(kind: str, x) -> None:
    if _COMM is not None:
        _COMM[kind] += 1
        nbytes = int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        _COMM[f"{kind[:4] if kind == 'psum' else 'a2a'}_bytes_per_shard"] += nbytes


def _a2a(x: jax.Array, axis: str) -> jax.Array:
    _note("all_to_all", x)
    return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0, tiled=True)


def _psum(x: jax.Array, axis: str) -> jax.Array:
    _note("psum", x)
    return jax.lax.psum(x, axis)


def _routed_rounds(
    flat,
    lidx: jax.Array,
    target: jax.Array,
    payloads: tuple,
    n: int,
    axis: str,
    sentinel: int,
    local_fn,
    resp_specs: tuple = (),
):
    """Exact all-to-all routing: every request is answered in SOME round.

    A fixed-capacity bucket per target shard routes up to C requests per
    round; requests beyond capacity stay pending and ride the next round
    (``lax.while_loop`` with a psum'd completion predicate, so all shards
    agree on the collective schedule).  This replaces the old single-round
    scatter with ``mode="drop"``, which silently lost requests whenever
    hash skew (e.g. one k-mer repeated 10^5 times in a batch, poly-A/rRNA)
    overflowed one target's bucket — the reference's racy filter writes can
    only ever inflate, never lose (UnsafeByteBuffer.java:35-85), and the
    sharded engine must be at least as safe.

    flat: carried local array (or None) handed to ``local_fn``.
    lidx/target: (m,) request indices and owner shards.
    payloads: tuple of (m,) arrays routed alongside the indices.
    local_fn(flat, req (n, C), req_payloads) -> (flat, resps) with each
    resp (n, C); resps are routed back and aligned to request order.
    resp_specs: tuple of (dtype, fill) for each response.
    Returns (flat, outs) with outs aligned (m,) arrays.
    """
    m = int(lidx.shape[0])
    C = _bucket_capacity(m, n)
    outs0 = tuple(
        jnp.full((m,), fill, dtype=dtype) for (dtype, fill) in resp_specs
    )
    remaining0 = jnp.ones((m,), bool)
    iota_m = jnp.arange(m, dtype=jnp.int32)
    iota_n = jnp.arange(n, dtype=jnp.int32)

    def one_round(carry, cap):
        flat, remaining, outs = carry
        key = jnp.where(remaining, target.astype(jnp.int32), n)
        order = jnp.argsort(key, stable=True)
        ts = key[order]
        start = jnp.searchsorted(ts, iota_n)
        # pending rows rank within their target; done rows (ts == n) drop
        rank = iota_m - start[jnp.minimum(ts, n - 1)].astype(jnp.int32)
        rank = jnp.where(ts < n, rank, cap)
        active = rank < cap  # routed this round (sorted order)
        send = jnp.full((n, cap), sentinel, dtype=lidx.dtype)
        send = send.at[ts, rank].set(lidx[order], mode="drop")
        req = _a2a(send, axis)
        preqs = []
        for p in payloads:
            ps = jnp.zeros((n, cap), dtype=p.dtype)
            ps = ps.at[ts, rank].set(p[order], mode="drop")
            preqs.append(_a2a(ps, axis))
        flat, resps = local_fn(flat, req, tuple(preqs))
        new_outs = []
        for out, resp, (dtype, fill) in zip(outs, resps, resp_specs):
            back = _a2a(resp, axis)
            vals = back.at[ts, rank].get(mode="fill", fill_value=fill)
            prev = out[order]
            new_outs.append(out.at[order].set(jnp.where(active, vals, prev)))
        routed = jnp.zeros((m,), bool).at[order].set(active)
        return flat, remaining & ~routed, tuple(new_outs)

    carry = one_round((flat, remaining0, outs0), C)
    if C >= m:
        # single round is provably complete
        return carry[0], carry[2]

    # exact 2-round cap: round 1 sized for the hash-uniform mean, round 2
    # (capacity m = provably complete) runs only when heavy-duplicate skew
    # overflowed a bucket — under a globally-psum'd predicate so every
    # shard schedules the same collectives.  Never a lax.while_loop: the
    # filter tables would become loop carries and get copied every round.
    need = _psum(jnp.any(carry[1]).astype(jnp.int32), axis) > 0
    carry = jax.lax.cond(
        need, lambda c: one_round(c, m), lambda c: c, carry
    )
    return carry[0], carry[2]


def _global_indices(hashes: U64, size_log2: int, valid, my_shard, local_log2: int, n: int):
    """(local_idx, target_shard) for each hash; invalid lanes -> own trash."""
    idx_lo = (hashes.lo >> 1) | (hashes.hi << 31)
    gidx = idx_lo & np.uint32((1 << size_log2) - 1) if size_log2 < 32 else idx_lo
    t = (gidx >> local_log2).astype(jnp.int32)
    lidx = gidx & np.uint32((1 << local_log2) - 1)
    if valid is not None:
        v = jnp.broadcast_to(valid[..., None], hashes.lo.shape)
        t = jnp.where(v, t, my_shard)
        lidx = jnp.where(v, lidx, np.uint32(1 << local_log2))
    return lidx.reshape(-1), t.reshape(-1)


def _sharded_bloom_insert_lookup(
    bits: jax.Array,  # (1, local+1) block inside shard_map
    hashes: U64,
    valid,
    size_log2: int,
    num_hash: int,
    n: int,
    axis: str,
    do_insert: bool = True,
    do_lookup: bool = True,
):
    """Insert and/or pre-batch membership over the sharded bit lanes.

    Lookup and insert run as separate routing loops so later rounds of a
    skewed batch still observe the PRE-batch snapshot (matching the
    single-device lookup-then-add semantics); bit inserts are idempotent,
    so multi-round insertion is order-free."""
    local_log2 = size_log2 - int(math.log2(n))
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    trash = 1 << local_log2
    lidx, t = _global_indices(hashes, size_log2, valid, my, local_log2, n)
    flat = bits[0]

    present = None
    if do_lookup:
        def gather_fn(fl, req, _):
            return fl, (jnp.take(fl, req, axis=0, mode="clip"),)

        _, (mine,) = _routed_rounds(
            flat, lidx, t, (), n, axis, trash, gather_fn,
            resp_specs=((flat.dtype, 0),),
        )
        present = jnp.all(mine.reshape(hashes.lo.shape) != 0, axis=-1)
    if do_insert:
        def insert_fn(fl, req, _):
            return fl.at[req.reshape(-1)].set(np.uint8(1), mode="drop"), ()

        flat, _ = _routed_rounds(flat, lidx, t, (), n, axis, trash, insert_fn)
    return flat[None], present


def _sharded_counting_increment(
    counts: jax.Array,  # (1, local+1)
    hashes: U64,
    valid,
    dec_first,
    ccfg: CountingConfig,
    n: int,
    axis: str,
    salt=0,
):
    local_log2 = ccfg.size_log2 - int(math.log2(n))
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    trash = 1 << local_log2
    lidx, t = _global_indices(hashes, ccfg.size_log2, valid, my, local_log2, n)
    flat = counts[0]

    def gather_fn(fl, req, _):
        return fl, (jnp.take(fl, req, axis=0, mode="clip"),)

    _, (mine,) = _routed_rounds(
        flat, lidx, t, (), n, axis, trash, gather_fn,
        resp_specs=((flat.dtype, 0),),
    )
    mine = mine.reshape(hashes.lo.shape)
    from ..bloom import filters as _flt

    cur_min = _flt.decode_counts(jnp.min(mine, axis=-1), ccfg.dtype)

    # local within-batch multiplicity via scratch sketch
    from ..bloom import filters as _f

    sidx = _f.bloom_indices(hashes, ccfg.scratch_log2, _f._bcast_valid(valid, hashes))
    scratch = jnp.zeros_like(flat, shape=((1 << ccfg.scratch_log2) + 1,))
    scratch = scratch.at[sidx.reshape(-1)].add(np.int32(1), mode="drop")
    # allreduce the scratch sketch so multiplicities are global across the
    # batch (otherwise a k-mer split over devices would be undercounted)
    scratch = _psum(scratch, axis)
    mult = jnp.min(jnp.take(scratch, sidx, axis=0), axis=-1)
    if dec_first is not None:
        mult = mult - dec_first.astype(jnp.int32)
    new_val = cur_min + jnp.maximum(mult, 0).astype(cur_min.dtype)
    if valid is not None:
        new_val = jnp.where(valid, new_val, 0)

    # scatter-max of the conservative update: cell codes are monotonic in
    # value and max is commutative/idempotent, so multi-round application
    # is exact in any encoding; mf8 rounds stochastically per (key, batch)
    u01 = None
    if ccfg.dtype == "mf8":
        from ..ops import minifloat as _mf

        u01 = _mf.mix_u01(hashes.lo[..., 0], salt)
    new_cells = _flt.encode_counts(new_val, ccfg.dtype, u01)
    upd_flat = jnp.broadcast_to(new_cells[..., None], hashes.lo.shape).reshape(-1)

    def max_fn(fl, req, preq):
        return fl.at[req.reshape(-1)].max(preq[0].reshape(-1), mode="drop"), ()

    flat, _ = _routed_rounds(flat, lidx, t, (upd_flat,), n, axis, trash, max_fn)
    return flat[None]


def _sharded_counting_add_cm(
    counts: jax.Array,  # (1, local+1)
    hashes: U64,
    valid,
    ccfg: CountingConfig,
    n: int,
    axis: str,
    salt=0,
):
    """Count-min increment: route indices once, scatter-add locally."""
    local_log2 = ccfg.size_log2 - int(math.log2(n))
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    trash = 1 << local_log2
    lidx, t = _global_indices(hashes, ccfg.size_log2, valid, my, local_log2, n)

    # each request routes in exactly one round, so the scatter-add applies
    # every increment exactly once (sentinel-padded slots hit the trash cell)
    def add_fn(fl, req, _):
        return fl.at[req.reshape(-1)].add(np.int32(1), mode="drop"), ()

    if ccfg.dtype != "int32":
        # narrow cells: accumulate an int32 shard-local histogram across the
        # routing rounds, then apply it in the cell encoding
        from ..bloom import filters as _f

        hist0 = jnp.zeros(counts[0].shape, jnp.int32)
        hist, _ = _routed_rounds(hist0, lidx, t, (), n, axis, trash, add_fn)
        # rounding-PRNG key = GLOBAL cell index (my * local + i), matching
        # the single-device key stream so sharded == single stays
        # byte-identical for mf8 cells
        base = my.astype(jnp.uint32) * np.uint32(1 << local_log2)
        return _f.apply_cell_increments(
            counts[0], hist, ccfg.dtype, salt=salt, base_index=base
        )[None]
    flat, _ = _routed_rounds(counts[0], lidx, t, (), n, axis, trash, add_fn)
    return flat[None]


def _sharded_counting_add_blocked(
    counts: jax.Array,  # (1, local_rows*128 + 128)
    hashes: U64,
    valid,
    ccfg: CountingConfig,
    n: int,
    axis: str,
):
    """Blocked count-min increment over row-range shards.

    ONE packed u32 per k-mer rides the all-to-all — (local row << 14) |
    (lane0 << 7) | lane1 — instead of num_hash cell indices, halving
    routing traffic; the owner shard unpacks and applies a one-hot row
    scatter-add (the single-chip blocked insert).
    """
    from ..bloom import filters as _f

    assert ccfg.num_hash == 2, "packed routing supports num_hash == 2"
    assert ccfg.dtype == "int32", "blocked layout is int32-only"
    rows_log2 = ccfg.size_log2 - 7
    local_rows_log2 = rows_log2 - int(math.log2(n))
    # trash_row << 14 must stay inside uint32
    assert local_rows_log2 <= 17, "packed routing needs local rows <= 2^17"
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    trash_row = np.uint32(1 << local_rows_log2)

    row, lanes = _f.blocked_cells(ccfg, hashes)  # row: (...,), lanes: (..., 2)
    t = (row >> local_rows_log2).astype(jnp.int32)
    lrow = row & np.uint32((1 << local_rows_log2) - 1)
    if valid is not None:
        t = jnp.where(valid, t, my)
        lrow = jnp.where(valid, lrow, trash_row)
    packed = (lrow << 14) | (lanes[..., 0] << 7) | lanes[..., 1]
    sentinel = int(trash_row) << 14

    def add_fn(rows2d, req, _):
        r = req.reshape(-1)
        r_lrow = (r >> 14).astype(jnp.int32)
        bundle = (
            jax.nn.one_hot((r >> 7) & np.uint32(127), 128, dtype=jnp.int32)
            + jax.nn.one_hot(r & np.uint32(127), 128, dtype=jnp.int32)
        )
        return rows2d.at[r_lrow].add(bundle, mode="drop"), ()

    rows2d, _ = _routed_rounds(
        counts[0].reshape(-1, 128), packed.reshape(-1), t.reshape(-1),
        (), n, axis, sentinel, add_fn,
    )
    return rows2d.reshape(1, -1)


def _blocked_cell_indices(ccfg: CountingConfig, hashes: U64, valid, my, n: int):
    """Per-cell (local flat idx, target shard) in the blocked layout —
    row-range sharding is contiguous in flat index space, so queries route
    individual cells exactly like the unblocked path."""
    from ..bloom import filters as _f

    rows_log2 = ccfg.size_log2 - 7
    local_rows_log2 = rows_log2 - int(math.log2(n))
    row, lanes = _f.blocked_cells(ccfg, hashes)
    t = (row >> local_rows_log2).astype(jnp.int32)[..., None]
    t = jnp.broadcast_to(t, lanes.shape)
    lrow = (row & np.uint32((1 << local_rows_log2) - 1))[..., None]
    lidx = lrow * np.uint32(128) + lanes
    if valid is not None:
        v = jnp.broadcast_to(valid[..., None], lanes.shape)
        t = jnp.where(v, t, my)
        lidx = jnp.where(v, lidx, np.uint32(128 << local_rows_log2))
    return lidx.reshape(-1), t.reshape(-1)


def _routed_gather(flat: jax.Array, lidx: jax.Array, t: jax.Array, n: int, axis: str, sentinel: int, fill=0):
    """Gather flat[lidx] where each index lives on shard ``t`` (exact:
    skewed batches route over multiple rounds)."""

    def gather_fn(fl, req, _):
        return fl, (jnp.take(fl, req, axis=0, mode="clip"),)

    _, (out,) = _routed_rounds(
        flat, lidx, t, (), n, axis, sentinel, gather_fn,
        resp_specs=((flat.dtype, fill),),
    )
    return out


def _sharded_counting_count(
    counts_flat: jax.Array,  # local (local+1,) or blocked rows flat
    ccfg: CountingConfig,
    h: U64,  # (..., num_hash) multi-hashes
    n: int,
    axis: str,
) -> jax.Array:
    """Routed count-min read: min over hash cells, any leading shape."""
    local_log2 = ccfg.size_log2 - int(math.log2(n))
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    if ccfg.blocked:
        lidx, t = _blocked_cell_indices(ccfg, h, None, my, n)
        sentinel = 128 << (ccfg.size_log2 - 7 - int(math.log2(n)))
    else:
        lidx, t = _global_indices(h, ccfg.size_log2, None, my, local_log2, n)
        sentinel = 1 << local_log2
    mine = _routed_gather(counts_flat, lidx, t, n, axis, sentinel)
    from ..bloom import filters as _flt

    return _flt.decode_counts(jnp.min(mine.reshape(h.lo.shape), axis=-1), ccfg.dtype)


def _sharded_bloom_query(
    lanes_flat: jax.Array,  # local (local+1,)
    size_log2: int,
    h: U64,  # (..., num_hash)
    n: int,
    axis: str,
) -> jax.Array:
    """Routed Bloom membership: AND over hash lanes, any leading shape."""
    local_log2 = size_log2 - int(math.log2(n))
    my = jax.lax.axis_index(axis).astype(jnp.int32)
    lidx, t = _global_indices(h, size_log2, None, my, local_log2, n)
    mine = _routed_gather(lanes_flat, lidx, t, n, axis, 1 << local_log2)
    return jnp.all(mine.reshape(h.lo.shape) != 0, axis=-1)


class ShardedBackend:
    """Graph-query backend for walk kernels running inside shard_map.

    Walk lanes are data-parallel over the mesh axis; every filter access
    becomes a routed all-to-all gather against the hash-range-sharded
    filter blocks, and loop-control predicates are global psum-reductions
    so all shards schedule the same collectives (a lax.cond whose branches
    contain collectives deadlocks if shards disagree on the predicate).
    """

    def __init__(self, axis: str, n: int):
        self.axis = axis
        self.n = n

    # jit-static identity: one cache entry per (axis, n)
    def __hash__(self):
        return hash((type(self).__name__, self.axis, self.n))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other.axis == self.axis
            and other.n == self.n
        )

    def counts(self, graph, cfg: GraphConfig, base: U64) -> jax.Array:
        h_cbf = nthash.multi_hash(base, cfg.k, cfg.cbf.num_hash)
        est = _sharded_counting_count(graph.cbf[0], cfg.cbf, h_cbf, self.n, self.axis)
        if not cfg.exact_counts:
            return est.astype(jnp.float32)
        h_dbg = nthash.multi_hash(base, cfg.k, cfg.dbgbf.num_hash)
        member = _sharded_bloom_query(
            graph.dbgbf[0], cfg.dbgbf.size_log2, h_dbg, self.n, self.axis
        )
        return jnp.where(member, est.astype(jnp.float32) + 1.0, 0.0)

    def bloom_lookup(self, lanes, bcfg, hashes: U64) -> jax.Array:
        return _sharded_bloom_query(
            lanes[0], bcfg.size_log2, hashes, self.n, self.axis
        )

    def any_global(self, x: jax.Array) -> jax.Array:
        return _psum(jnp.any(x).astype(jnp.int32), self.axis) > 0


# ---------------------------------------------------------------------------
# Fused sharded build step
# ---------------------------------------------------------------------------


def sharded_build_step(mesh: Mesh, cfg: GraphConfig, add_read_pairs: bool = False):
    """Returns a jitted (state, codes) -> state step over the mesh.

    ``codes`` is (B, L) with B divisible by the device count; rows are
    DP-sharded.  All filter traffic rides all-to-alls inside one program.
    """
    n = mesh.devices.size
    axis = mesh.axis_names[0]

    state_specs = ShardedGraphState(
        dbgbf=P(axis, None) if cfg.exact_counts else None,
        cbf=P(axis, None),
        rpkbf=P(axis, None),
        fpkbf=None,
    )

    def step_local(
        state: ShardedGraphState, codes: jax.Array, salt: jax.Array
    ) -> ShardedGraphState:
        fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
        h_cbf = nthash.multi_hash(base, cfg.k, cfg.cbf.num_hash)
        if cfg.exact_counts:
            h_dbg = nthash.multi_hash(base, cfg.k, cfg.dbgbf.num_hash)
            new_dbg, present = _sharded_bloom_insert_lookup(
                state.dbgbf, h_dbg, valid, cfg.dbgbf.size_log2, cfg.dbgbf.num_hash, n, axis
            )
            dec_first = jnp.logical_and(valid, jnp.logical_not(present))
            new_cbf = _sharded_counting_increment(
                state.cbf, h_cbf, valid, dec_first, cfg.cbf, n, axis, salt
            )
        else:
            # count-min fast path: one all-to-all of indices, local scatter-add
            new_dbg = None
            if cfg.cbf.blocked:
                new_cbf = _sharded_counting_add_blocked(
                    state.cbf, h_cbf, valid, cfg.cbf, n, axis
                )
            else:
                new_cbf = _sharded_counting_add_cm(
                    state.cbf, h_cbf, valid, cfg.cbf, n, axis, salt
                )
        new_rpk = state.rpkbf
        if add_read_pairs and state.rpkbf is not None and cfg.read_pair_distance > 0:
            pair_base, np_ = dbg.pair_base_hashes(cfg, fh, rh, cfg.read_pair_distance)
            pv = jnp.logical_and(valid[..., :np_], valid[..., cfg.read_pair_distance :])
            hp = nthash.multi_hash(pair_base, cfg.k, cfg.pkbf.num_hash)
            new_rpk, _ = _sharded_bloom_insert_lookup(
                state.rpkbf, hp, pv, cfg.pkbf.size_log2, cfg.pkbf.num_hash, n, axis,
                do_lookup=False,
            )
        return ShardedGraphState(new_dbg, new_cbf, new_rpk, None)

    smapped = shard_map(
        step_local,
        mesh=mesh,
        in_specs=(state_specs, P(axis, None), P()),
        out_specs=state_specs,
        check_vma=False,
    )
    jitted = jax.jit(smapped, donate_argnums=(0,))

    def step(state, codes, salt=0):
        return jitted(state, codes, jnp.uint32(salt))

    return step


def sharded_count_query(mesh: Mesh, cfg: GraphConfig):
    """Returns a jitted (state, codes) -> (counts, valid) query over the mesh."""
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    state_specs = ShardedGraphState(
        dbgbf=P(axis, None) if cfg.exact_counts else None,
        cbf=P(axis, None),
        rpkbf=P(axis, None),
        fpkbf=None,
    )

    def query_local(state: ShardedGraphState, codes: jax.Array):
        _, _, base, valid = dbg.seq_hashes(cfg, codes)
        # count estimate: route cbf gathers (request/response all-to-alls)
        local_log2 = cfg.cbf.size_log2 - int(math.log2(n))
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        h_cbf = nthash.multi_hash(base, cfg.k, cfg.cbf.num_hash)
        if cfg.cbf.blocked:
            lidx, t = _blocked_cell_indices(cfg.cbf, h_cbf, valid, my, n)
            sentinel = 128 << (cfg.cbf.size_log2 - 7 - int(math.log2(n)))
        else:
            lidx, t = _global_indices(h_cbf, cfg.cbf.size_log2, valid, my, local_log2, n)
            sentinel = 1 << local_log2
        mine = _routed_gather(state.cbf[0], lidx, t, n, axis, sentinel)
        from ..bloom import filters as _flt

        est = _flt.decode_counts(
            jnp.min(mine.reshape(h_cbf.lo.shape), axis=-1), cfg.cbf.dtype
        )
        if cfg.exact_counts:
            h_dbg = nthash.multi_hash(base, cfg.k, cfg.dbgbf.num_hash)
            _, member = _sharded_bloom_insert_lookup(
                state.dbgbf, h_dbg, valid, cfg.dbgbf.size_log2, cfg.dbgbf.num_hash,
                n, axis, do_insert=False,
            )
            counts = jnp.where(member, est.astype(jnp.float32) + 1.0, 0.0)
        else:
            counts = est.astype(jnp.float32)
        return jnp.where(valid, counts, 0.0), valid

    smapped = shard_map(
        query_local,
        mesh=mesh,
        in_specs=(state_specs, P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )
    return jax.jit(smapped)


def _state_specs(cfg: GraphConfig, axis: str, rpkbf: bool, fpkbf: bool):
    return ShardedGraphState(
        dbgbf=P(axis, None) if cfg.exact_counts else None,
        cbf=P(axis, None),
        rpkbf=P(axis, None) if rpkbf else None,
        fpkbf=P(axis, None) if fpkbf else None,
    )


def sharded_rebuild_step(mesh: Mesh, cfg: GraphConfig, add_frag_pairs: bool = True):
    """Fragment-graph rebuild over the mesh: count-min increments plus
    fragment-pair-key inserts ride the same all-to-all program
    (the sharded analog of dbg.rebuild_step)."""
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    specs = _state_specs(cfg, axis, rpkbf=True, fpkbf=True)

    def step_local(
        state: ShardedGraphState, codes: jax.Array, salt: jax.Array
    ) -> ShardedGraphState:
        fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
        h_cbf = nthash.multi_hash(base, cfg.k, cfg.cbf.num_hash)
        if cfg.exact_counts:
            new_dbg, present = _sharded_bloom_insert_lookup(
                state.dbgbf, nthash.multi_hash(base, cfg.k, cfg.dbgbf.num_hash),
                valid, cfg.dbgbf.size_log2, cfg.dbgbf.num_hash, n, axis,
            )
            dec_first = jnp.logical_and(valid, jnp.logical_not(present))
            new_cbf = _sharded_counting_increment(
                state.cbf, h_cbf, valid, dec_first, cfg.cbf, n, axis, salt
            )
        else:
            new_dbg = None
            if cfg.cbf.blocked:
                new_cbf = _sharded_counting_add_blocked(state.cbf, h_cbf, valid, cfg.cbf, n, axis)
            else:
                new_cbf = _sharded_counting_add_cm(state.cbf, h_cbf, valid, cfg.cbf, n, axis, salt)
        new_fpk = state.fpkbf
        if add_frag_pairs and state.fpkbf is not None and cfg.fragment_pair_distance > 0:
            d = cfg.fragment_pair_distance
            pair_base, np_ = dbg.pair_base_hashes(cfg, fh, rh, d)
            pv = jnp.logical_and(valid[..., :np_], valid[..., d:])
            hp = nthash.multi_hash(pair_base, cfg.k, cfg.pkbf.num_hash)
            new_fpk, _ = _sharded_bloom_insert_lookup(
                state.fpkbf, hp, pv, cfg.pkbf.size_log2, cfg.pkbf.num_hash, n, axis,
                do_lookup=False,
            )
        return ShardedGraphState(new_dbg, new_cbf, state.rpkbf, new_fpk)

    smapped = shard_map(
        step_local, mesh=mesh, in_specs=(specs, P(axis, None), P()),
        out_specs=specs, check_vma=False,
    )
    jitted = jax.jit(smapped, donate_argnums=(0,))

    def step(state, codes, salt=0):
        return jitted(state, codes, jnp.uint32(salt))

    return step


def sharded_pair_support(mesh: Mesh, cfg: GraphConfig, d_frag: int, d_read: int,
                         rpkbf: bool = True, fpkbf: bool = False):
    """(state, codes) -> (2, B, P) packed fragment+read pair support.

    The sharded analog of transcripts._pair_support_both_jit: pair hashes
    at both distances are answered by routed lookups into the sharded
    rpkbf/fpkbf in one program.  A zero distance yields a False plane.
    """
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    specs = _state_specs(cfg, axis, rpkbf=rpkbf, fpkbf=fpkbf)

    def query_local(state: ShardedGraphState, codes: jax.Array):
        fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
        B, Pn = valid.shape
        out = []
        for d, lanes in ((d_frag, state.fpkbf), (d_read, state.rpkbf)):
            if d <= 0 or lanes is None:
                out.append(jnp.zeros((B, Pn), bool))
                continue
            pair_base, np_ = dbg.pair_base_hashes(cfg, fh, rh, d)
            hp = nthash.multi_hash(pair_base, cfg.k, cfg.pkbf.num_hash)
            sup = _sharded_bloom_query(lanes[0], cfg.pkbf.size_log2, hp, n, axis)
            pv = jnp.logical_and(valid[..., :np_], valid[..., d:])
            out.append(jnp.zeros((B, Pn), bool).at[:, :np_].set(sup & pv))
        return jnp.stack(out)

    smapped = shard_map(
        query_local, mesh=mesh, in_specs=(specs, P(axis, None)),
        out_specs=P(None, axis, None), check_vma=False,
    )
    return jax.jit(smapped)


def sharded_variant_counts(mesh: Mesh, cfg: GraphConfig, rpkbf: bool, fpkbf: bool):
    """(state, codes) -> (hit, valid): any existing left/right SNV variant
    per k-mer (the sharded analog of transcripts._variant_exists_jit)."""
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    specs = _state_specs(cfg, axis, rpkbf=rpkbf, fpkbf=fpkbf)

    def query_local(state: ShardedGraphState, codes: jax.Array):
        fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
        Pn = fh.lo.shape[1]
        last = codes[:, cfg.k - 1 : cfg.k - 1 + Pn]
        first = codes[:, :Pn]
        fr4, rr4 = nthash.variant_hashes_right(fh, last, cfg.k, rh)
        fl4, rl4 = nthash.variant_hashes_left(fh, first, cfg.k, rh)
        backend = ShardedBackend(axis, n)
        out = None
        for f4, r4, cur in ((fr4, rr4, last), (fl4, rl4, first)):
            q4 = f4 if cfg.stranded else nthash.canonical(f4, r4)
            counts4 = backend.counts(state, cfg, q4)
            is_self = jnp.arange(4, dtype=jnp.uint8)[None, None, :] == cur[..., None]
            hit = jnp.any((counts4 > 0) & ~is_self, axis=-1)
            out = hit if out is None else (out | hit)
        return jnp.where(valid, out, False), valid

    smapped = shard_map(
        query_local, mesh=mesh, in_specs=(specs, P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)), check_vma=False,
    )
    return jax.jit(smapped)


def sharded_extend_walks(mesh: Mesh, cfg: GraphConfig, wcfg, mode: str,
                         rpkbf: bool, fpkbf: bool,
                         superstep_hops: int = 64, max_supersteps: int = 64):
    """Walk-extension program over the mesh: lanes are DP-sharded, every
    count/pair lookup is a routed gather, and the superstep/branch loop
    runs under globally-agreed predicates (one program, no host syncs)."""
    from ..graph import traverse

    wcfg = _with_spec_default(wcfg)
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    gspecs = _state_specs(cfg, axis, rpkbf=rpkbf, fpkbf=fpkbf)
    backend = ShardedBackend(axis, n)

    def local(wstate, gstate, min_cov, bound):
        dummy = jnp.zeros((1,), jnp.uint8)
        return traverse._extend_walks_fused(
            wstate, gstate, cfg, wcfg, min_cov, bound, dummy,
            mode, superstep_hops, max_supersteps, False, backend=backend,
        )

    smapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), gspecs, P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    # jit the shard_map: an eager shard_map re-traces and re-stages the
    # whole walk program on EVERY call — measured ~5 s of pure dispatch per
    # batch on the 8-device CPU proxy, dwarfing the collectives themselves
    jitted = jax.jit(smapped, donate_argnums=(0,))

    def run(wstate, gstate, min_cov, bound):
        W = wstate.pos.shape[0]
        min_cov = jnp.broadcast_to(jnp.asarray(min_cov, jnp.float32), (W,))
        bound = jnp.broadcast_to(jnp.asarray(bound, jnp.int32), (W,))
        return jitted(wstate, gstate, min_cov, bound)

    return run


def _with_spec_default(wcfg):
    """Routed walks pay ~2 collectives per counts() round, so the sharded
    engines default to depth-2 speculative supersteps
    (traverse.WalkConfig.spec_hops): one batched 20-node tree gather
    advances up to 2 hops.  Depth 2 is the measured optimum on the
    8-device proxy (deeper trees trade 4 x VPU expansion per level for
    halved rounds and lose); callers that set spec_hops keep their value."""
    import dataclasses

    if wcfg.spec_hops == 1 and not wcfg.check_back_branches:
        return dataclasses.replace(wcfg, spec_hops=2)
    return wcfg


def make_group_mesh(r: int, n_devices: Optional[int] = None) -> Mesh:
    """2-D (rep, shard) mesh: filters shard R ways and replicate N/R ways.

    The middle point between full replication (R=1: fastest walks, graph
    must fit one device's HBM) and full hash-range sharding (R=N: graph
    N x bigger, ~13 latency-bound collectives per walk superstep).  With
    R-way groups, per-device HBM holds size/R cells and walk-superstep
    collectives span only the R-device group (riding nearest-neighbor
    ICI), while the N/R groups run their walk-lane slices independently.
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % r == 0, f"group size {r} must divide device count {n}"
    return Mesh(np.array(devs).reshape(n // r, r), ("rep", "shard"))


def group_state(mesh2: Mesh, state: ShardedGraphState, cfg: GraphConfig):
    """Relayout an N-way-sharded state into R-way shards, each replicated
    across the ``rep`` axis (one all-gather within each group — the
    grouped analog of ``replicate_graph``, paid once per graph version)."""
    r = mesh2.shape["shard"]
    sh = NamedSharding(mesh2, P("shard", None))
    cbf_trash = 128 if cfg.cbf.blocked else 1

    def regroup(lanes, trash):
        if lanes is None:
            return None

        def f(x):
            flat = x[:, : x.shape[1] - trash].reshape(r, -1)
            return jnp.concatenate(
                [flat, jnp.zeros((r, trash), x.dtype)], axis=1
            )

        return jax.jit(f, out_shardings=sh)(lanes)

    return ShardedGraphState(
        dbgbf=regroup(state.dbgbf, 1),
        cbf=regroup(state.cbf, cbf_trash),
        rpkbf=regroup(state.rpkbf, 1),
        fpkbf=regroup(state.fpkbf, 1),
    )


def grouped_extend_walks(mesh2: Mesh, cfg: GraphConfig, wcfg, mode: str,
                         rpkbf: bool, fpkbf: bool,
                         superstep_hops: int = 64, max_supersteps: int = 64):
    """Walk extension over a (rep, shard) group mesh: lanes are DP over
    ALL devices, filter gathers ride all-to-alls within each R-device
    shard group only, and loop predicates psum within the group — groups
    never synchronize with each other."""
    from ..graph import traverse

    wcfg = _with_spec_default(wcfg)
    r = mesh2.shape["shard"]
    axis = "shard"
    gspecs = _state_specs(cfg, axis, rpkbf=rpkbf, fpkbf=fpkbf)
    backend = ShardedBackend(axis, r)
    lanes = P(("rep", "shard"))

    def local(wstate, gstate, min_cov, bound):
        dummy = jnp.zeros((1,), jnp.uint8)
        return traverse._extend_walks_fused(
            wstate, gstate, cfg, wcfg, min_cov, bound, dummy,
            mode, superstep_hops, max_supersteps, False, backend=backend,
        )

    smapped = shard_map(
        local, mesh=mesh2,
        in_specs=(lanes, gspecs, lanes, lanes),
        out_specs=lanes,
        check_vma=False,
    )
    jitted = jax.jit(smapped, donate_argnums=(0,))  # see sharded_extend_walks

    def run(wstate, gstate, min_cov, bound):
        W = wstate.pos.shape[0]
        min_cov = jnp.broadcast_to(jnp.asarray(min_cov, jnp.float32), (W,))
        bound = jnp.broadcast_to(jnp.asarray(bound, jnp.int32), (W,))
        return jitted(wstate, gstate, min_cov, bound)

    return run


def replicate_graph(mesh: Mesh, state: ShardedGraphState, cfg: GraphConfig):
    """One all-gather: shard-major filter lanes -> the single-device layout,
    replicated into every device's HBM.

    Why this exists (VERDICT r2, sharded walk-cost item): the routed walk
    engine schedules ~10 all-to-alls + 3 psums per superstep on KB-sized
    payloads (measured by ``comm_accounting``) — pure ICI latency, ~1000x
    slower than local walks on the 8-device CPU proxy.  The filters
    themselves are small (the cbf is <= -mem/2 bytes, tens of MB..GB), so
    for the walk-heavy stages the right layout is graph REPLICATION: pay
    one all-gather when the graph stops mutating, then every superstep is
    collective-free, with walk lanes data-parallel over the mesh.  This is
    the scaling-book recipe: move the collective out of the inner loop and
    into a one-time layout change.
    """
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    cbf_trash = 128 if cfg.cbf.blocked else 1
    pk_trash = cfg.pkbf.trash if cfg.pkbf is not None else 1

    def merge(lanes, trash, out_trash):
        if lanes is None:
            return None
        flat = lanes[:, : lanes.shape[1] - trash].reshape(-1)
        return jnp.concatenate([flat, jnp.zeros((out_trash,), lanes.dtype)])

    @partial(jax.jit, out_shardings=rep)
    def go(s):
        return dbg.GraphState(
            dbgbf=merge(s.dbgbf, 1, cfg.dbgbf.trash),
            cbf=merge(s.cbf, cbf_trash, cfg.cbf.trash),
            rpkbf=merge(s.rpkbf, 1, pk_trash),
            fpkbf=merge(s.fpkbf, 1, pk_trash),
        )

    return go(state)


def sharded_fprs(state: ShardedGraphState, cfg: GraphConfig) -> dict:
    """Filter FPRs from global popcounts (jnp reductions over the
    distributed arrays compile to psum collectives)."""
    from ..bloom import filters as _f

    out = {}

    def bloom_fpr(lanes, bcfg):
        fill = jnp.count_nonzero(lanes[:, :-1]) / bcfg.size
        return float(fill) ** bcfg.num_hash

    trash = 128 if cfg.cbf.blocked else 1
    fill = jnp.count_nonzero(state.cbf[:, :-trash]) / cfg.cbf.size
    out["cbf"] = float(fill) ** cfg.cbf.num_hash
    if state.dbgbf is not None:
        out["dbgbf"] = bloom_fpr(state.dbgbf, cfg.dbgbf)
    if state.rpkbf is not None:
        out["rpkbf"] = bloom_fpr(state.rpkbf, cfg.pkbf)
    if state.fpkbf is not None:
        out["fpkbf"] = bloom_fpr(state.fpkbf, cfg.pkbf)
    return out
