"""Implicit de Bruijn graph over Bloom structures — device-resident state.

TPU-native equivalent of graph/BloomFilterDeBruijnGraph.java: the graph is a
bundle of HBM arrays (dbgbf bit lanes, cbf counters, read/fragment pair-key
bit lanes) plus static hash config.  Nothing is ever materialized as nodes or
edges; all queries are batched hash->gather pipelines and all inserts are
batched scatter pipelines.

Reference semantics preserved (file:line in BloomFilterDeBruijnGraph.java):
  * add: first occurrence goes to dbgbf only; repeats increment cbf (:405-412)
  * getCount: contained-in-dbgbf ? cbf_estimate + 1 : 0 (:552-570)
  * read/fragment paired k-mers at distance d: pair hash of k-mer i and
    k-mer i+d via combineHashValues (:474-494)
  * stranded mode hashes the forward strand only; non-stranded uses the
    canonical (signed-min) hash of both strands.

Batched deviation: "first occurrence" is resolved per batch (pre-batch
membership snapshot + within-batch multiplicity), which equals the
sequential accounting for exact counters.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..bloom import filters
from ..bloom.filters import BloomConfig, CountingConfig
from ..ops import nthash, u64
from ..ops.u64 import U64


@dataclass(frozen=True)
class GraphConfig:
    """Static graph parameters (jit-static, hashable).

    ``exact_counts`` selects the counting scheme:
      * False (default, fast): pure count-min — membership is count > 0,
        inserts are a single scatter-add per (occurrence, hash).  No dbgbf
        array exists.  This is the TPU speed-of-light path: XLA's scatter
        engine is index-rate-bound (~9 ns/index), so stage-1 cost is
        proportional to the number of scattered indices.
      * True: reference-parity accounting — dbgbf bit lanes plus
        conservative-update cbf storing multiplicity-1
        (BloomFilterDeBruijnGraph.java:405-412, :552-570).
    """

    k: int
    stranded: bool
    dbgbf: BloomConfig
    cbf: CountingConfig
    pkbf: Optional[BloomConfig] = None  # shared shape for rpkbf/fpkbf
    read_pair_distance: int = -1
    fragment_pair_distance: int = -1
    exact_counts: bool = False

    @property
    def num_hash_max(self) -> int:
        m = max(self.dbgbf.num_hash, self.cbf.num_hash)
        if self.pkbf is not None:
            m = max(m, self.pkbf.num_hash)
        return m


class GraphState(NamedTuple):
    """Device arrays of the implicit graph (a pytree)."""

    dbgbf: Optional[jax.Array]  # uint8 lanes (exact_counts mode only)
    cbf: jax.Array  # int32 counters
    rpkbf: Optional[jax.Array] = None  # uint8 lanes (read-pair keys)
    fpkbf: Optional[jax.Array] = None  # uint8 lanes (fragment-pair keys)


def make_graph(cfg: GraphConfig, with_rpkbf: bool = False, with_fpkbf: bool = False) -> GraphState:
    return GraphState(
        dbgbf=filters.make_bloom(cfg.dbgbf) if cfg.exact_counts else None,
        cbf=filters.make_counting(cfg.cbf),
        rpkbf=filters.make_bloom(cfg.pkbf) if with_rpkbf else None,
        fpkbf=filters.make_bloom(cfg.pkbf) if with_fpkbf else None,
    )


# ---------------------------------------------------------------------------
# Hashing helpers
# ---------------------------------------------------------------------------


def seq_hashes(cfg: GraphConfig, codes: jax.Array) -> Tuple[U64, Optional[U64], U64, jax.Array]:
    """(fh, rh, base, valid) for every k-mer window of a code batch."""
    fh, rh, valid = nthash.rolling_hash(codes, cfg.k, cfg.stranded)
    base = nthash.canonical(fh, rh)
    return fh, rh, base, valid


def _multi(cfg: GraphConfig, base: U64, m: int) -> U64:
    return nthash.multi_hash(base, cfg.k, m)


def pair_base_hashes(
    cfg: GraphConfig, fh: U64, rh: Optional[U64], distance: int
) -> Tuple[U64, jax.Array]:
    """Combined pair hash of k-mers (i, i+distance) along the last axis.

    Returns (pair_base (..., P-distance), index_count).  Mirrors
    PairedNTHashIterator (stranded) / CanonicalPairedNTHashIterator.
    """
    n = fh.lo.shape[-1]
    np_ = n - distance
    assert np_ >= 1, "sequence shorter than pair distance"

    def slice_(x: U64, start: int, size: int) -> U64:
        ax = x.lo.ndim - 1
        return U64(
            jax.lax.slice_in_dim(x.lo, start, start + size, axis=ax),
            jax.lax.slice_in_dim(x.hi, start, start + size, axis=ax),
        )

    fl = slice_(fh, 0, np_)
    fr = slice_(fh, distance, np_)
    if cfg.stranded or rh is None:
        return nthash.combine(fl, fr), np_
    rl = slice_(rh, 0, np_)
    rr = slice_(rh, distance, np_)
    return nthash.combine_canonical(fl, rl, fr, rr), np_


# ---------------------------------------------------------------------------
# Inserts
# ---------------------------------------------------------------------------


def add_kmers(
    state: GraphState, cfg: GraphConfig, base: U64, valid: jax.Array, salt=0
) -> GraphState:
    """Insert k-mer occurrences (base hash per occurrence) into the counters
    (and dbgbf in exact_counts mode).  ``salt`` (the batch counter) feeds
    the mf8 stochastic-rounding PRNG."""
    h_cbf = _multi(cfg, base, cfg.cbf.num_hash)
    if not cfg.exact_counts:
        return state._replace(
            cbf=filters.counting_increment_cm(
                state.cbf, cfg.cbf, h_cbf, valid=valid, salt=salt
            )
        )
    h_dbg = _multi(cfg, base, cfg.dbgbf.num_hash)
    new_dbg, present = filters.bloom_lookup_then_add(state.dbgbf, cfg.dbgbf, h_dbg, valid)
    # First occurrence of a batch-new k-mer is accounted to dbgbf only.
    dec_first = jnp.logical_and(valid, jnp.logical_not(present))
    new_cbf = filters.counting_increment(
        state.cbf, cfg.cbf, h_cbf, valid=valid, dec_first=dec_first, salt=salt
    )
    return state._replace(dbgbf=new_dbg, cbf=new_cbf)


def add_read_pair_kmers(
    state: GraphState, cfg: GraphConfig, fh: U64, rh: Optional[U64], valid: jax.Array
) -> GraphState:
    """Insert read-distance paired k-mer keys into rpkbf."""
    assert state.rpkbf is not None and cfg.read_pair_distance > 0
    d = cfg.read_pair_distance
    pair_base, np_ = pair_base_hashes(cfg, fh, rh, d)
    pv = jnp.logical_and(valid[..., :np_], valid[..., d:])
    hp = _multi(cfg, pair_base, cfg.pkbf.num_hash)
    return state._replace(rpkbf=filters.bloom_add(state.rpkbf, cfg.pkbf, hp, pv))


def add_fragment_pair_kmers(
    state: GraphState, cfg: GraphConfig, fh: U64, rh: Optional[U64], valid: jax.Array
) -> GraphState:
    assert state.fpkbf is not None and cfg.fragment_pair_distance > 0
    d = cfg.fragment_pair_distance
    pair_base, np_ = pair_base_hashes(cfg, fh, rh, d)
    pv = jnp.logical_and(valid[..., :np_], valid[..., d:])
    hp = _multi(cfg, pair_base, cfg.pkbf.num_hash)
    return state._replace(fpkbf=filters.bloom_add(state.fpkbf, cfg.pkbf, hp, pv))


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


def contains(state: GraphState, cfg: GraphConfig, base: U64) -> jax.Array:
    if not cfg.exact_counts:
        est = filters.counting_count(state.cbf, cfg.cbf, _multi(cfg, base, cfg.cbf.num_hash))
        return est > 0
    return filters.bloom_lookup(state.dbgbf, cfg.dbgbf, _multi(cfg, base, cfg.dbgbf.num_hash))


def get_counts(state: GraphState, cfg: GraphConfig, base: U64) -> jax.Array:
    """Float counts per k-mer.

    exact_counts mode mirrors the reference: in-dbgbf ? cbf + 1 : 0
    (graph/:552-570); count-min mode reads the counters directly.
    """
    est = filters.counting_count(state.cbf, cfg.cbf, _multi(cfg, base, cfg.cbf.num_hash))
    if not cfg.exact_counts:
        return est.astype(jnp.float32)
    member = filters.bloom_lookup(state.dbgbf, cfg.dbgbf, _multi(cfg, base, cfg.dbgbf.num_hash))
    return jnp.where(member, est.astype(jnp.float32) + 1.0, 0.0)


def lookup_read_pair(state: GraphState, cfg: GraphConfig, pair_base: U64) -> jax.Array:
    return filters.bloom_lookup(state.rpkbf, cfg.pkbf, _multi(cfg, pair_base, cfg.pkbf.num_hash))


def lookup_fragment_pair(state: GraphState, cfg: GraphConfig, pair_base: U64) -> jax.Array:
    return filters.bloom_lookup(state.fpkbf, cfg.pkbf, _multi(cfg, pair_base, cfg.pkbf.num_hash))


# ---------------------------------------------------------------------------
# Fused stage-1 step
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "add_read_pairs"), donate_argnames=("state",))
def build_step(
    state: GraphState, cfg: GraphConfig, codes: jax.Array,
    add_read_pairs: bool = False, salt=0,
) -> GraphState:
    """One stage-1 device step: hash a read batch, scatter into all filters.

    codes: (B, L) uint8 2-bit codes (4 = pad/N).  The whole pipeline —
    rolling hash, multi-hash, index math, scatters — fuses into a handful of
    XLA kernels; there is no host round-trip per batch.  ``salt`` is the
    caller's batch counter (mf8 stochastic-rounding seed; traced, so no
    recompile per batch).
    """
    fh, rh, base, valid = seq_hashes(cfg, codes)
    state = add_kmers(state, cfg, base, valid, salt=salt)
    if add_read_pairs and state.rpkbf is not None and cfg.read_pair_distance > 0:
        state = add_read_pair_kmers(state, cfg, fh, rh, valid)
    return state


@partial(jax.jit, static_argnames=("cfg", "add_frag_pairs"), donate_argnames=("state",))
def rebuild_step(
    state: GraphState, cfg: GraphConfig, codes: jax.Array,
    add_frag_pairs: bool = True, salt=0,
) -> GraphState:
    """Fragment-graph rebuild step: counters + fpkbf pairs in one program."""
    fh, rh, base, valid = seq_hashes(cfg, codes)
    state = add_kmers(state, cfg, base, valid, salt=salt)
    if add_frag_pairs and state.fpkbf is not None and cfg.fragment_pair_distance > 0:
        state = add_fragment_pair_kmers(state, cfg, fh, rh, valid)
    return state


@partial(jax.jit, static_argnames=("cfg",))
def count_step(state: GraphState, cfg: GraphConfig, codes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Counts for every k-mer of a read batch: (counts (B,P) float32, valid)."""
    _, _, base, valid = seq_hashes(cfg, codes)
    counts = get_counts(state, cfg, base)
    return jnp.where(valid, counts, 0.0), valid


def fprs(state: GraphState, cfg: GraphConfig) -> dict:
    out = {"cbf": float(filters.counting_fpr(state.cbf, cfg.cbf))}
    if state.dbgbf is not None:
        out["dbgbf"] = float(filters.bloom_fpr(state.dbgbf, cfg.dbgbf))
    if state.rpkbf is not None:
        out["rpkbf"] = float(filters.bloom_fpr(state.rpkbf, cfg.pkbf))
    if state.fpkbf is not None:
        out["fpkbf"] = float(filters.bloom_fpr(state.fpkbf, cfg.pkbf))
    return out
