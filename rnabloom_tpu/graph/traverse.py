"""Frontier-batched de Bruijn graph traversal on device.

The reference walks the implicit graph one k-mer at a time per thread
(Kmer.getSuccessors -> 4 hash derivations + filter lookups per step,
graph/Kmer.java:199-255; naiveExtendRight GraphUtils.java:6835-6886;
greedyExtendRightOnce GraphUtils.java:501-625).  A TPU cannot chase pointers
— instead W walks advance in lockstep as array lanes:

  * **Superstep A (cheap walk)**: a ``lax.while_loop`` advances every active
    lane while it has exactly one viable successor (the overwhelmingly common
    case), freezing lanes that hit a dead end, a branch, a cycle, or a
    terminator.  Cost per hop: 4 successor hash derivations (VPU) + 4*h
    counter gathers per lane.
  * **Superstep B (branch resolution)**: frozen branch lanes are resolved in
    one vectorized step — either greedy lookahead scoring (exhaustive
    depth-``lookahead`` expansion, score = max over paths of min coverage,
    mirroring getMaxMedianCoverageRight) or naive tip-filtering (candidates
    must pass a depth probe; >1 survivor stops the walk).
  * The host alternates A and B until all lanes stop — two device dispatches
    per superstep regardless of walk count.

Walks always extend to the *right* in walk coordinates.  Left extension of a
sequence is a right extension of its reverse complement: in canonical mode
lookups are strand-symmetric; in stranded mode lookups use the walk k-mer's
reverse-strand hash (the actual forward-strand k-mer's hash).

Deviations from the reference (documented for the parity checker):
  * hasDepthLeft/Right DFS probes (Kmer.java:407-486) are replaced by a
    width-2 beam descent of ``tip_probe_depth`` steps — exact for real
    tips (dead ends), approximate only when every deep path leaves the
    two best-scoring branches at some step.
  * cycle detection compares against a ring of the last ``cycle_window``
    k-mer hashes instead of the full visited set.
  * back-branch stops (naiveExtendRight, GraphUtils.java:6846-6851) are
    depth-qualified like the reference's variant.hasDepth — but the probe
    depth is ``tip_probe_depth`` (< k), not the full maxTipLength.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bloom import filters
from ..ops import nthash, u64
from ..ops.u64 import U64
from . import dbg as dbgmod
from .dbg import GraphConfig, GraphState

# status codes
ACTIVE = 0
BRANCH = 1  # frozen at a branch, waiting for resolution
DEAD = 2  # no viable successor
CYCLE = 3  # revisited a recent k-mer
TERM = 4  # hit a terminator (screening BF)
FULL = 5  # reached max buffer length / bound
STOPPED_BRANCH = 6  # naive mode: too many good branches


@dataclass(frozen=True)
class WalkConfig:
    """Static traversal parameters."""

    max_len: int  # output buffer length (incl. seed)
    lookahead: int = 3
    tip_probe_depth: int = 8  # must stay < k (probe out-chars read the buffer)
    cycle_window: int = 64
    left: bool = False  # walk is the reverse complement of the sequence
    # stop when the current k-mer has a DEEP left SNV variant — an incoming
    # branch merges here (naiveExtendRight's back-branch check,
    # GraphUtils.java:6846-6851).  Depth-qualified as in the reference
    # (variant depth > maxTipLength), with the probe bounded by
    # tip_probe_depth; shallow variants (tips) do not stop the walk.
    check_back_branches: bool = False
    use_terminators: bool = False
    term_cfg: Optional["filters.BloomConfig"] = None  # screening BF shape
    # pair-scored branch resolution (extendPE semantics)
    pair_ring: int = 0  # >0 enables the k-mer hash ring for pair lookups
    pair_probe_depth: int = 24  # naive probe length per candidate at branches
    # speculative hops per superstep round: expand the full depth-D
    # successor tree (4 + 16 + .. + 4^D k-mers) and fetch ALL its counts in
    # ONE batched gather, then advance up to D hops locally.  On a sharded
    # backend every counts() call is a routed all-to-all round of pure ICI
    # latency, so D-hop speculation divides the walk's collective count by
    # ~D at the cost of 4^D/4 extra gathered cells — the right trade
    # whenever the graph is distributed.  1 = classic one-hop rounds (the
    # single-device default: local gathers are cheap, tree expansion isn't
    # free).  Must stay < k and is ignored when check_back_branches is on
    # (variant probes need per-hop rounds anyway).
    spec_hops: int = 1


class WalkState(NamedTuple):
    buf: jax.Array  # (W, max_len) uint8 codes, seed at [0, pos)
    pos: jax.Array  # (W,) int32
    fh: U64  # (W,) forward hash of current walk k-mer
    rh: U64  # (W,) reverse hash (zeros unused in stranded+right mode)
    hist: U64  # (W, cycle_window) recent query hashes (ring)
    status: jax.Array  # (W,) int32
    hops: jax.Array  # (W,) int32 total appended bases
    path_min: jax.Array  # (W,) float32 running min coverage along the path
    # ring of (fh, rh) of the k-mer ending at buffer position p, slot p % R
    ring_fh: Optional[U64] = None  # (W, R)
    ring_rh: Optional[U64] = None  # (W, R)


@partial(jax.jit, static_argnames=("cfg", "wcfg"))
def _make_walks_jit(cfg: GraphConfig, wcfg: WalkConfig, seeds_j: jax.Array, lens_j: jax.Array):
    W, Ls = seeds_j.shape
    k = cfg.k
    fh_all, rh_all, valid_all = nthash.rolling_hash(seeds_j, k, stranded=False)
    P = Ls - k + 1
    rows = np.arange(W)
    last = jnp.maximum(lens_j - k, 0)
    fh = u64.U64(fh_all.lo[rows, last], fh_all.hi[rows, last])
    rh = u64.U64(rh_all.lo[rows, last], rh_all.hi[rows, last])
    n_kmers = lens_j - k + 1
    in_seed = np.arange(P)[None, :] < n_kmers[:, None]
    valid = jnp.all(jnp.where(in_seed, valid_all, True), axis=1) & (n_kmers >= 1)
    buf = jnp.zeros((W, wcfg.max_len), dtype=jnp.uint8).at[:, :Ls].set(seeds_j)
    qh = _query_hash(cfg, wcfg, fh, rh)
    hist = u64.U64(
        jnp.zeros((W, wcfg.cycle_window), jnp.uint32).at[:, 0].set(qh.lo),
        jnp.zeros((W, wcfg.cycle_window), jnp.uint32).at[:, 0].set(qh.hi),
    )
    status = jnp.where(valid.reshape(W), ACTIVE, DEAD).astype(jnp.int32)
    ring_fh = ring_rh = None
    if wcfg.pair_ring > 0:
        R = wcfg.pair_ring
        # k-mer i of a seed ends at position i + k - 1; rows scatter only
        # their real k-mers (others drop out of bounds)
        slot = (np.arange(P)[None, :] + k - 1) % R
        slot_j = jnp.where(in_seed, slot, R).astype(jnp.int32)
        rws = jnp.broadcast_to(jnp.asarray(rows)[:, None], (W, P))
        zeros = jnp.zeros((W, R), jnp.uint32)
        ring_fh = u64.U64(
            zeros.at[rws, slot_j].set(fh_all.lo, mode="drop"),
            zeros.at[rws, slot_j].set(fh_all.hi, mode="drop"),
        )
        ring_rh = u64.U64(
            zeros.at[rws, slot_j].set(rh_all.lo, mode="drop"),
            zeros.at[rws, slot_j].set(rh_all.hi, mode="drop"),
        )
    return WalkState(
        buf=buf,
        pos=lens_j,
        fh=fh,
        rh=rh,
        hist=hist,
        status=status,
        hops=jnp.zeros((W,), jnp.int32),
        path_min=jnp.full((W,), jnp.inf, jnp.float32),
        ring_fh=ring_fh,
        ring_rh=ring_rh,
    )


def make_walks(
    cfg: GraphConfig,
    wcfg: WalkConfig,
    seeds: np.ndarray,
    seed_lens: Optional[np.ndarray] = None,
) -> WalkState:
    """Initialize walks from seed sequences (k-mers or whole fragments).

    seeds: (W, Ls) uint8 codes, Ls >= k, padded with 4 beyond each row's
    seed_lens (default: full rows).  Callers pass revcomp'd seeds for left
    walks.  The walk continues from each seed's LAST k-mer; with
    wcfg.pair_ring > 0 every seed k-mer's hashes pre-fill the pair ring.
    The walk count pads to a power of two (each distinct W is a fresh TPU
    compilation); padded lanes start DEAD.
    """
    W0, Ls = seeds.shape
    k = cfg.k
    assert Ls >= k
    if seed_lens is None:
        seed_lens = np.full(W0, Ls, np.int64)
    seed_lens = np.asarray(seed_lens)
    W = 1 << max(6, (W0 - 1).bit_length())
    if W != W0:
        seeds = np.concatenate(
            [seeds, np.full((W - W0, Ls), 4, seeds.dtype)], axis=0
        )
        seed_lens = np.concatenate([seed_lens, np.full(W - W0, k, np.int64)])
    return _make_walks_jit(
        cfg, wcfg, jnp.asarray(seeds), jnp.asarray(seed_lens.astype(np.int32))
    )


@partial(jax.jit, static_argnames=("cfg", "wcfg"))
def revcomp_reseed(cfg: GraphConfig, wcfg: WalkConfig, buf: jax.Array, pos: jax.Array) -> WalkState:
    """Re-seed walks with the reverse complement of finished walk buffers —
    the right->left extension hand-off stays ON DEVICE (a host revcomp here
    costs a full tunnel readback + re-upload per batch)."""
    B, L = buf.shape
    j = jnp.arange(L)[None, :]
    src = jnp.clip(pos[:, None].astype(jnp.int32) - 1 - j, 0, L - 1)
    vals = jnp.take_along_axis(buf, src, axis=1)
    rc = jnp.where(
        j < pos[:, None], jnp.where(vals < 4, 3 - vals, 4), 4
    ).astype(jnp.uint8)
    return _make_walks_jit(cfg, wcfg, rc, pos.astype(jnp.int32))


def _query_hash(cfg: GraphConfig, wcfg: WalkConfig, fh: U64, rh: U64) -> U64:
    """Filter-query hash of a walk k-mer (see module docstring)."""
    if cfg.stranded:
        return rh if wcfg.left else fh
    return u64.min_signed(fh, rh)


class DeviceBackend:
    """Single-device graph queries (the default).

    The traversal engine routes every filter access through a backend so
    the same walk kernels run over hash-range-sharded filters on a device
    mesh (parallel.sharded.ShardedBackend): counts/lookups become routed
    all-to-all gathers and the loop-control predicates become global
    reductions so every shard agrees on each collective's schedule."""

    def counts(self, graph: GraphState, cfg: GraphConfig, base: U64) -> jax.Array:
        return dbgmod.get_counts(graph, cfg, base)

    def bloom_lookup(self, lanes, bcfg, hashes: U64) -> jax.Array:
        return filters.bloom_lookup(lanes, bcfg, hashes)

    def any_global(self, x: jax.Array) -> jax.Array:
        return jnp.any(x)


DEVICE_BACKEND = DeviceBackend()


def _counts_of(graph: GraphState, cfg: GraphConfig, base: U64) -> jax.Array:
    return dbgmod.get_counts(graph, cfg, base)


def _successors(
    cfg: GraphConfig, wcfg: WalkConfig, fh: U64, rh: U64, out_codes: jax.Array
) -> Tuple[U64, U64, U64]:
    """(fh4, rh4, query4) for the 4 candidate next walk k-mers."""
    fh4, rh4 = nthash.successor_hashes(fh, out_codes, cfg.k, rh=rh)
    q4 = _query_hash(cfg, wcfg, fh4, rh4)
    return fh4, rh4, q4


def _gather_out_codes(buf: jax.Array, pos: jax.Array, k: int) -> jax.Array:
    """First base of each lane's current k-mer: buf[pos - k]."""
    return jnp.take_along_axis(buf, jnp.maximum(pos - k, 0)[:, None], axis=1)[:, 0]


def _in_hist(hist: U64, q: U64) -> jax.Array:
    return jnp.any((hist.lo == q.lo[:, None]) & (hist.hi == q.hi[:, None]), axis=1)


def _push_hist(hist: U64, q: U64, hops: jax.Array, wcfg: WalkConfig, advance) -> U64:
    slot = ((hops + 1) % wcfg.cycle_window).astype(jnp.int32)
    lo = hist.lo.at[jnp.arange(hist.lo.shape[0]), slot].set(
        jnp.where(advance, q.lo, hist.lo[jnp.arange(hist.lo.shape[0]), slot])
    )
    hi = hist.hi.at[jnp.arange(hist.hi.shape[0]), slot].set(
        jnp.where(advance, q.hi, hist.hi[jnp.arange(hist.hi.shape[0]), slot])
    )
    return u64.U64(lo, hi)


def _apply_advance(
    state: WalkState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    advance: jax.Array,  # (W,) bool
    code: jax.Array,  # (W,) uint8 chosen base
    fh4: U64,
    rh4: U64,
    q4: U64,
    counts4: Optional[jax.Array] = None,
) -> WalkState:
    W = state.pos.shape[0]
    rows = jnp.arange(W)
    ci = code.astype(jnp.int32)
    fh_new = u64.U64(fh4.lo[rows, ci], fh4.hi[rows, ci])
    rh_new = u64.U64(rh4.lo[rows, ci], rh4.hi[rows, ci])
    q_new = u64.U64(q4.lo[rows, ci], q4.hi[rows, ci])

    pos_new = jnp.where(advance, state.pos + 1, state.pos)
    buf_new = state.buf.at[rows, jnp.minimum(state.pos, wcfg.max_len - 1)].set(
        jnp.where(advance, code, state.buf[rows, jnp.minimum(state.pos, wcfg.max_len - 1)])
    )
    fh_out = u64.select(advance, fh_new, state.fh)
    rh_out = u64.select(advance, rh_new, state.rh)
    hist_new = _push_hist(state.hist, q_new, state.hops, wcfg, advance)
    hops_new = jnp.where(advance, state.hops + 1, state.hops)
    path_min = state.path_min
    if counts4 is not None:
        cnew = counts4[rows, ci]
        path_min = jnp.where(advance, jnp.minimum(path_min, cnew), path_min)
    ring_fh, ring_rh = state.ring_fh, state.ring_rh
    if ring_fh is not None:
        R = wcfg.pair_ring
        slot = jnp.where(advance, state.pos % R, R)  # new k-mer ends at old pos
        ring_fh = u64.U64(
            ring_fh.lo.at[rows, slot].set(fh_new.lo, mode="drop"),
            ring_fh.hi.at[rows, slot].set(fh_new.hi, mode="drop"),
        )
        ring_rh = u64.U64(
            ring_rh.lo.at[rows, slot].set(rh_new.lo, mode="drop"),
            ring_rh.hi.at[rows, slot].set(rh_new.hi, mode="drop"),
        )
    return state._replace(
        buf=buf_new,
        pos=pos_new,
        fh=fh_out,
        rh=rh_out,
        hist=hist_new,
        hops=hops_new,
        path_min=path_min,
        ring_fh=ring_fh,
        ring_rh=ring_rh,
    )


def _superstep_round_spec(
    st: WalkState,
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    min_cov: jax.Array,
    bound: jax.Array,
    terminators: Optional[jax.Array],
    backend: DeviceBackend,
    D: int,
) -> WalkState:
    """One speculative round: depth-D successor tree, one batched count
    gather (plus one batched terminator lookup), then D local hops with
    the exact per-hop semantics of the classic superstep body."""
    W = st.pos.shape[0]
    rows = jnp.arange(W)

    # ---- expand the tree.  The char leaving the window at hop d+1 is
    # buf[pos - k + d]: within the stored buffer for every d < k, and
    # identical for all 4^d level-d nodes (they share the walk's window).
    fh_lv, rh_lv, q_lv = [], [], []
    fh_cur, rh_cur = st.fh, st.rh
    width = 1
    for d in range(D):
        out = jnp.take_along_axis(
            st.buf, jnp.maximum(st.pos - cfg.k + d, 0)[:, None], axis=1
        )[:, 0]
        outb = out if width == 1 else jnp.broadcast_to(out[:, None], (W, width))
        f4, r4 = nthash.successor_hashes(fh_cur, outb, cfg.k, rh=rh_cur)
        width *= 4
        f4 = u64.reshape(f4, (W, width))
        r4 = u64.reshape(r4, (W, width))
        fh_lv.append(f4)
        rh_lv.append(r4)
        q_lv.append(_query_hash(cfg, wcfg, f4, r4))
        fh_cur, rh_cur = f4, r4

    qcat = u64.concatenate(q_lv, axis=1)
    counts_all = backend.counts(graph, cfg, qcat)  # ONE routed round
    term_all = None
    if wcfg.use_terminators and terminators is not None:
        th = nthash.multi_hash(qcat, cfg.k, wcfg.term_cfg.num_hash)
        term_all = backend.bloom_lookup(terminators, wcfg.term_cfg, th)

    offs = np.concatenate([[0], np.cumsum([4 ** (d + 1) for d in range(D)])])
    path = jnp.zeros(W, jnp.int32)  # base-4 index of the walked tree path
    arange4 = jnp.arange(4, dtype=jnp.int32)[None, :]
    for d in range(D):
        active = st.status == ACTIVE
        sel = path[:, None] * 4 + arange4  # (W, 4) level-local indices
        c4 = jnp.take_along_axis(counts_all[:, offs[d] : offs[d + 1]], sel, axis=1)
        fh4 = u64.U64(
            jnp.take_along_axis(fh_lv[d].lo, sel, axis=1),
            jnp.take_along_axis(fh_lv[d].hi, sel, axis=1),
        )
        rh4 = u64.U64(
            jnp.take_along_axis(rh_lv[d].lo, sel, axis=1),
            jnp.take_along_axis(rh_lv[d].hi, sel, axis=1),
        )
        q4 = u64.U64(
            jnp.take_along_axis(q_lv[d].lo, sel, axis=1),
            jnp.take_along_axis(q_lv[d].hi, sel, axis=1),
        )

        viable = c4 >= jnp.maximum(min_cov, 1.0)[:, None]
        nviable = jnp.sum(viable.astype(jnp.int32), axis=1)
        code = jnp.argmax(viable, axis=1).astype(jnp.uint8)
        ci = code.astype(jnp.int32)
        qn = u64.U64(q4.lo[rows, ci], q4.hi[rows, ci])
        cyc = _in_hist(st.hist, qn)
        term = jnp.zeros_like(cyc)
        if term_all is not None:
            term = jnp.take_along_axis(
                term_all[:, offs[d] : offs[d + 1]],
                (path * 4 + ci)[:, None],
                axis=1,
            )[:, 0]
        full = (st.pos >= wcfg.max_len - 1) | (st.hops >= bound)

        advance = active & (nviable == 1) & ~cyc & ~term & ~full
        new_status = jnp.where(
            ~active,
            st.status,
            jnp.where(
                nviable == 0,
                DEAD,
                jnp.where(
                    nviable > 1,
                    BRANCH,
                    jnp.where(
                        cyc, CYCLE,
                        jnp.where(term, TERM, jnp.where(full, FULL, ACTIVE)),
                    ),
                ),
            ),
        )
        st = _apply_advance(st, cfg, wcfg, advance, code, fh4, rh4, q4, counts4=c4)
        st = st._replace(status=new_status.astype(jnp.int32))
        path = jnp.where(advance, path * 4 + ci, path)
    return st


@partial(
    jax.jit,
    static_argnames=("cfg", "wcfg", "max_hops", "backend"),
    donate_argnames=("state",),
)
def walk_superstep(
    state: WalkState,
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    min_cov: jax.Array,  # (W,) float32 per-lane coverage floor
    bound: jax.Array,  # (W,) int32 max hops per lane
    max_hops: int,
    terminators: Optional[jax.Array] = None,  # screening BF lanes
    backend: DeviceBackend = DEVICE_BACKEND,
) -> WalkState:
    """Advance all active lanes while each has exactly one viable successor.

    Lanes freeze with BRANCH status when >1 successors pass min_cov; the
    branch is resolved by resolve_branches().  One device dispatch runs up
    to ``max_hops`` hops for the whole batch.  With wcfg.spec_hops = D > 1
    (sharded engines), each round advances up to D hops off one batched
    tree gather — identical outputs, ~D x fewer collectives.
    """
    D = wcfg.spec_hops
    if D > 1 and not wcfg.check_back_branches:
        assert D < cfg.k, "speculative depth must stay within the k-mer window"

        def outer_spec(i, st):
            return jax.lax.cond(
                backend.any_global(st.status == ACTIVE),
                lambda s: _superstep_round_spec(
                    s, graph, cfg, wcfg, min_cov, bound, terminators,
                    backend, D,
                ),
                lambda s: s,
                st,
            )

        return jax.lax.fori_loop(0, -(-max_hops // D), outer_spec, state)

    def body(st: WalkState) -> WalkState:
        active = st.status == ACTIVE
        out_codes = _gather_out_codes(st.buf, st.pos, cfg.k)
        fh4, rh4, q4 = _successors(cfg, wcfg, st.fh, st.rh, out_codes)
        counts = backend.counts(graph, cfg, q4)  # (W, 4)
        viable = counts >= jnp.maximum(min_cov, 1.0)[:, None]
        nviable = jnp.sum(viable.astype(jnp.int32), axis=1)

        # the single viable candidate (valid only when nviable == 1)
        code = jnp.argmax(viable, axis=1).astype(jnp.uint8)
        rows = jnp.arange(st.pos.shape[0])
        qn = u64.U64(q4.lo[rows, code.astype(jnp.int32)], q4.hi[rows, code.astype(jnp.int32)])

        cyc = _in_hist(st.hist, qn)
        term = jnp.zeros_like(cyc)
        if wcfg.use_terminators and terminators is not None:
            tcfg = wcfg.term_cfg
            th = nthash.multi_hash(qn, cfg.k, tcfg.num_hash)
            term = backend.bloom_lookup(terminators, tcfg, th)

        full = (st.pos >= wcfg.max_len - 1) | (st.hops >= bound)

        back = jnp.zeros_like(cyc)
        if wcfg.check_back_branches:
            # naiveExtendRight's back-branch stop: an incoming branch merges
            # at this k-mer.  The reference additionally requires the
            # variant to have depth > maxTipLength (GraphUtils.java:
            # 6846-6851) — probe each viable left variant with a greedy
            # descent of tip_probe_depth steps (capped < k, the bounded
            # stand-in for the unbounded depth qualification); shallow
            # variants are mere tips and do not stop the walk.
            flv, rlv = nthash.variant_hashes_left(st.fh, out_codes, cfg.k, st.rh)
            qv = _query_hash(cfg, wcfg, flv, rlv)
            cv = backend.counts(graph, cfg, qv)  # (W, 4)
            is_self = (
                jnp.arange(4, dtype=jnp.uint8)[None, :] == out_codes[:, None]
            )
            viable_v = (cv >= jnp.maximum(min_cov, 1.0)[:, None]) & ~is_self
            depth_v = _variant_depth_probe(
                graph, cfg, wcfg, st.buf, st.pos, flv, rlv, viable_v,
                min_cov, backend=backend,
            )
            back = jnp.any(depth_v >= wcfg.tip_probe_depth, axis=1)

        advance = active & (nviable == 1) & ~cyc & ~term & ~full & ~back
        new_status = jnp.where(
            ~active,
            st.status,
            jnp.where(
                back,
                STOPPED_BRANCH,
                jnp.where(
                    nviable == 0,
                    DEAD,
                    jnp.where(
                        nviable > 1,
                        BRANCH,
                        jnp.where(cyc, CYCLE, jnp.where(term, TERM, jnp.where(full, FULL, ACTIVE))),
                    ),
                ),
            ),
        )
        st = _apply_advance(st, cfg, wcfg, advance, code, fh4, rh4, q4, counts4=counts)
        return st._replace(status=new_status.astype(jnp.int32))

    def cond(st: WalkState) -> jax.Array:
        return backend.any_global(st.status == ACTIVE)

    def outer(i, st):
        return jax.lax.cond(cond(st), body, lambda s: s, st)

    return jax.lax.fori_loop(0, max_hops, outer, state)


def _expand_scores(
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    buf: jax.Array,
    pos: jax.Array,
    fh4: U64,
    rh4: U64,
    q4: U64,
    backend: DeviceBackend = DEVICE_BACKEND,
) -> jax.Array:
    """Greedy lookahead scores per candidate (W, 4).

    score(c) = max over depth-(lookahead-1) expansions from c of the minimum
    coverage along the path (getMaxMedianCoverageRight semantics: a path
    shorter than ``lookahead`` scores 0; lookahead == 1 scores count(c)).
    """
    W = pos.shape[0]
    if wcfg.lookahead == 1:
        return backend.counts(graph, cfg, q4)

    # out-char for the candidates' successors: second base of current k-mer
    rows = jnp.arange(W)
    out1 = jnp.take_along_axis(buf, jnp.maximum(pos - cfg.k + 1, 0)[:, None], axis=1)[:, 0]
    out1 = jnp.broadcast_to(out1[:, None], (W, 4))
    fh_l1, rh_l1 = nthash.successor_hashes(fh4, out1, cfg.k, rh=rh4)  # (W,4,4)
    q_l1 = _query_hash(cfg, wcfg, fh_l1, rh_l1)

    if wcfg.lookahead == 2:
        # one batched gather for both levels: on a sharded backend every
        # counts() call is a routed all-to-all round (pure ICI latency), so
        # the whole lookahead tree rides ONE round
        qcat = u64.concatenate(
            [q4, u64.reshape(q_l1, (W, 16))], axis=1
        )
        ccat = backend.counts(graph, cfg, qcat)
        cand_counts, c_l1 = ccat[:, :4], ccat[:, 4:20].reshape(W, 4, 4)
        # path = [cand, n1]: min(count(c), count(n1)), max over n1
        path_min = jnp.minimum(cand_counts[:, :, None], c_l1)
        return jnp.max(path_min, axis=-1)

    out2 = jnp.take_along_axis(buf, jnp.maximum(pos - cfg.k + 2, 0)[:, None], axis=1)[:, 0]
    out2 = jnp.broadcast_to(out2[:, None, None], (W, 4, 4))
    fh_l2, rh_l2 = nthash.successor_hashes(fh_l1, out2, cfg.k, rh=rh_l1)  # (W,4,4,4)
    q_l2 = _query_hash(cfg, wcfg, fh_l2, rh_l2)
    qcat = u64.concatenate(
        [q4, u64.reshape(q_l1, (W, 16)), u64.reshape(q_l2, (W, 64))], axis=1
    )
    ccat = backend.counts(graph, cfg, qcat)  # ONE routed round for the tree
    cand_counts = ccat[:, :4]
    c_l1 = ccat[:, 4:20].reshape(W, 4, 4)
    c_l2 = ccat[:, 20:84].reshape(W, 4, 4, 4)

    # path = [cand, n1, n2]
    path_min = jnp.minimum(
        jnp.minimum(cand_counts[:, :, None, None], c_l1[:, :, :, None]), c_l2
    )
    if wcfg.lookahead == 3:
        return jnp.max(path_min, axis=(-2, -1))

    # lookahead > 3: the first three levels expand exhaustively (64 paths per
    # candidate); each leaf then continues with a greedy max-count descent
    # for the remaining depth, extending the path minimum.  Exact when the
    # best deep path follows max counts from its depth-3 leaf (the common
    # case); the reference expands exhaustively at any depth
    # (getMaxMedianCoverageRight GraphUtils.java:249-499).
    leaves = W * 64
    fh_c = u64.reshape(fh_l2, (leaves,))
    rh_c = u64.reshape(rh_l2, (leaves,))
    pmin = path_min.reshape(leaves)

    def body(i, carry):
        fh_c, rh_c, pmin = carry
        off = jnp.maximum(pos - cfg.k + 3 + i, 0)
        outc = jnp.take_along_axis(buf, off[:, None], axis=1)[:, 0]
        outc = jnp.broadcast_to(outc[:, None], (W, 64)).reshape(leaves)
        f4, r4 = nthash.successor_hashes(fh_c, outc, cfg.k, rh=rh_c)
        qq = _query_hash(cfg, wcfg, f4, r4)
        cc = backend.counts(graph, cfg, qq)  # (leaves, 4)
        best = jnp.argmax(cc, axis=1).astype(jnp.int32)
        rows = jnp.arange(leaves)
        fh_n = u64.U64(f4.lo[rows, best], f4.hi[rows, best])
        rh_n = u64.U64(r4.lo[rows, best], r4.hi[rows, best])
        pmin_n = jnp.minimum(pmin, cc[rows, best])
        return fh_n, rh_n, pmin_n

    _, _, pmin = jax.lax.fori_loop(0, wcfg.lookahead - 3, body, (fh_c, rh_c, pmin))
    return jnp.max(pmin.reshape(W, 4, 16), axis=-1)


def _variant_depth_probe(
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    buf: jax.Array,
    pos: jax.Array,
    flv: U64,
    rlv: U64,
    viable0: jax.Array,  # (W, 4)
    min_cov: jax.Array,
    backend: DeviceBackend = DEVICE_BACKEND,
) -> jax.Array:
    """Greedy forward depth of each LEFT VARIANT of the current k-mer.

    The variant shares the current k-mer's window; its first probe step
    departs the VARIANT base, later steps depart the walk buffer (the
    variant path rejoins the walk's suffix).  Returns (W, 4) int32 depths
    (the variant itself counts as depth 1 when viable)."""
    W = pos.shape[0]
    depth = viable0.astype(jnp.int32)
    fh_c = u64.reshape(flv, (W * 4,))
    rh_c = u64.reshape(rlv, (W * 4,))
    alive = viable0.reshape(W * 4)
    var_base = jnp.broadcast_to(
        jnp.arange(4, dtype=jnp.uint8)[None, :], (W, 4)
    ).reshape(W * 4)
    mc = jnp.broadcast_to(jnp.maximum(min_cov, 1.0)[:, None], (W, 4)).reshape(W * 4)
    rows = jnp.arange(W * 4)

    def body(i, carry):
        fh_c, rh_c, alive, depth = carry
        off = jnp.minimum(jnp.maximum(pos - cfg.k + i, 0), wcfg.max_len - 1)
        buf_out = jnp.take_along_axis(buf, off[:, None], axis=1)[:, 0]
        buf_out = jnp.broadcast_to(buf_out[:, None], (W, 4)).reshape(W * 4)
        outc = jnp.where(i == 0, var_base, buf_out)
        f4, r4 = nthash.successor_hashes(fh_c, outc, cfg.k, rh=rh_c)
        qq = _query_hash(cfg, wcfg, f4, r4)
        cc = backend.counts(graph, cfg, qq)
        ok = cc >= mc[:, None]
        best = jnp.argmax(jnp.where(ok, cc, -1.0), axis=1).astype(jnp.int32)
        alive_n = alive & jnp.any(ok, axis=1)
        fh_n = u64.U64(f4.lo[rows, best], f4.hi[rows, best])
        rh_n = u64.U64(r4.lo[rows, best], r4.hi[rows, best])
        depth_n = depth + alive_n.reshape(W, 4).astype(jnp.int32)
        return (
            u64.select(alive_n, fh_n, fh_c),
            u64.select(alive_n, rh_n, rh_c),
            alive_n,
            depth_n,
        )

    _, _, _, depth = jax.lax.fori_loop(
        0, wcfg.tip_probe_depth - 1, body, (fh_c, rh_c, alive, depth)
    )
    return depth


def _tip_probe(
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    buf: jax.Array,
    pos: jax.Array,
    fh4: U64,
    rh4: U64,
    q4: U64,
    min_cov: jax.Array,
    backend: DeviceBackend = DEVICE_BACKEND,
) -> jax.Array:
    """Beam-2 depth probe per candidate: depth reached following the two
    best viable successor paths, up to tip_probe_depth.  Returns (W, 4)
    int32 depths (candidate itself = depth 1 when viable).

    The reference's hasDepth is an exhaustive DFS (graph/Kmer.java:407-486);
    a single greedy descent misclassifies branchy-but-deep paths whose
    max-count branch dead-ends.  A width-2 beam keeps the sibling branch
    alive — still bounded, still one lane per candidate pair."""
    W = pos.shape[0]
    counts = backend.counts(graph, cfg, q4)
    viable0 = counts >= jnp.maximum(min_cov, 1.0)[:, None]
    depth = viable0.astype(jnp.int32)

    # beam slots start as two copies of the candidate (slot 1 inactive
    # until a branch splits the beam — identical hashes are harmless)
    def dup(x):
        return jnp.stack([x, x], axis=-1).reshape(W * 4 * 2)

    fh_c = u64.U64(dup(fh4.lo.reshape(W * 4)), dup(fh4.hi.reshape(W * 4)))
    rh_c = u64.U64(dup(rh4.lo.reshape(W * 4)), dup(rh4.hi.reshape(W * 4)))
    alive = jnp.stack(
        [viable0.reshape(W * 4), jnp.zeros(W * 4, bool)], axis=-1
    ).reshape(W * 4 * 2)

    def body(i, carry):
        fh_c, rh_c, alive, depth = carry
        off = jnp.minimum(pos - cfg.k + 1 + i, wcfg.max_len - 1)
        outc = jnp.take_along_axis(buf, off[:, None], axis=1)[:, 0]
        outc = jnp.broadcast_to(outc[:, None, None], (W, 4, 2)).reshape(W * 4 * 2)
        f4, r4 = nthash.successor_hashes(fh_c, outc, cfg.k, rh=rh_c)  # (W*4*2, 4)
        qq = _query_hash(cfg, wcfg, f4, r4)
        cc = backend.counts(graph, cfg, qq)
        mc = jnp.broadcast_to(
            jnp.maximum(min_cov, 1.0)[:, None, None], (W, 4, 2)
        ).reshape(W * 4 * 2)
        ok = (cc >= mc[:, None]) & alive[:, None]
        # merge both slots' successors and keep the top-2 viable by count
        score = jnp.where(ok, cc, -1.0).reshape(W * 4, 8)
        top1 = jnp.argmax(score, axis=1)
        rows8 = jnp.arange(W * 4)
        s2 = score.at[rows8, top1].set(-1.0)
        top2 = jnp.argmax(s2, axis=1)
        ok8 = ok.reshape(W * 4, 8)

        flo = f4.lo.reshape(W * 4, 8)
        fhi = f4.hi.reshape(W * 4, 8)
        rlo = r4.lo.reshape(W * 4, 8)
        rhi = r4.hi.reshape(W * 4, 8)
        pick = jnp.stack([top1, top2], axis=-1)  # (W*4, 2)
        rows2 = rows8[:, None]
        fh_n = u64.U64(flo[rows2, pick].reshape(-1), fhi[rows2, pick].reshape(-1))
        rh_n = u64.U64(rlo[rows2, pick].reshape(-1), rhi[rows2, pick].reshape(-1))
        alive_n = ok8[rows2, pick].reshape(-1)
        any_alive = alive_n.reshape(W * 4, 2).any(axis=1)
        depth_n = depth + any_alive.reshape(W, 4).astype(jnp.int32)
        return (
            u64.select(alive_n, fh_n, fh_c),
            u64.select(alive_n, rh_n, rh_c),
            alive_n,
            depth_n,
        )

    # NOTE: probe out-chars come from the *current* buffer; beyond the stored
    # window this is approximate for the rare probe deeper than k.
    fh_c, rh_c, alive, depth = jax.lax.fori_loop(
        0, wcfg.tip_probe_depth - 1, body, (fh_c, rh_c, alive, depth)
    )
    return depth


def _probe_with_hashes(
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    buf: jax.Array,
    pos: jax.Array,
    fh4: U64,
    rh4: U64,
    q4: U64,
    min_cov: jax.Array,
    backend: DeviceBackend = DEVICE_BACKEND,
):
    """Greedy naive descent of depth pair_probe_depth per candidate,
    recording each probe k-mer's (fh, rh, count, alive).

    Returns (fh_p, rh_p (W,4,D)), counts_p (W,4,D), alive_p (W,4,D).
    Probe j=0 is the candidate itself.  Exact while probe depth < k (the
    departing base comes from the walk buffer).
    """
    W = pos.shape[0]
    D = wcfg.pair_probe_depth
    assert D <= cfg.k - 1, "pair_probe_depth must stay below k"
    counts0 = backend.counts(graph, cfg, q4)
    alive0 = counts0 >= jnp.maximum(min_cov, 1.0)[:, None]

    fh_c = u64.reshape(fh4, (W * 4,))
    rh_c = u64.reshape(rh4, (W * 4,))
    alive = alive0.reshape(W * 4)

    mc = jnp.broadcast_to(jnp.maximum(min_cov, 1.0)[:, None], (W, 4)).reshape(W * 4)
    rows = np.arange(W * 4)

    def step(carry, j):
        fh_c, rh_c, alive = carry
        off = jnp.minimum(pos - cfg.k + j, wcfg.max_len - 1)
        outc = jnp.take_along_axis(buf, off[:, None], axis=1)[:, 0]
        outc = jnp.broadcast_to(outc[:, None], (W, 4)).reshape(W * 4)
        f4, r4 = nthash.successor_hashes(fh_c, outc, cfg.k, rh=rh_c)
        qq = _query_hash(cfg, wcfg, f4, r4)
        cc = backend.counts(graph, cfg, qq)  # (W*4, 4)
        ok = cc >= mc[:, None]
        best = jnp.argmax(jnp.where(ok, cc, -1.0), axis=1).astype(jnp.int32)
        alive_n = alive & jnp.any(ok, axis=1)
        fh_n = u64.select(alive_n, u64.U64(f4.lo[rows, best], f4.hi[rows, best]), fh_c)
        rh_n = u64.select(alive_n, u64.U64(r4.lo[rows, best], r4.hi[rows, best]), rh_c)
        cnt_n = jnp.where(alive_n, cc[rows, best], 0.0)
        return (fh_n, rh_n, alive_n), (fh_n.lo, fh_n.hi, rh_n.lo, rh_n.hi, cnt_n, alive_n)

    # scan keeps the compiled graph small (the unrolled form took minutes on
    # the remote TPU compiler); probe step j's departing base is buf[pos-k+j]
    (_, _, _), ys = jax.lax.scan(
        step, (fh_c, rh_c, alive), np.arange(1, D, dtype=np.int32)
    )
    fl, fhi, rl, rhi, cs, al = ys  # each (D-1, W*4)

    def with_first(first, rest):
        return jnp.concatenate([first[None], rest], axis=0)

    shape = (D, W, 4)
    fh_p = u64.U64(
        jnp.transpose(with_first(fh_c.lo, fl).reshape(shape), (1, 2, 0)),
        jnp.transpose(with_first(fh_c.hi, fhi).reshape(shape), (1, 2, 0)),
    )
    rh_p = u64.U64(
        jnp.transpose(with_first(rh_c.lo, rl).reshape(shape), (1, 2, 0)),
        jnp.transpose(with_first(rh_c.hi, rhi).reshape(shape), (1, 2, 0)),
    )
    counts_p = jnp.transpose(
        with_first(counts0.reshape(W * 4), cs).reshape(shape), (1, 2, 0)
    )
    alive_p = jnp.transpose(with_first(alive, al).reshape(shape), (1, 2, 0))
    return fh_p, rh_p, counts_p, alive_p


def _pair_scores(
    state: WalkState,
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    fh_p: U64,
    rh_p: U64,
    counts_p: jax.Array,
    alive_p: jax.Array,
    backend: DeviceBackend = DEVICE_BACKEND,
):
    """extendRightPE candidate scores from read+fragment pair support.

    score = min(path_min, median probe cov) * (n_read + n_frag) /
    (last_supported + 1); a candidate is viable when every pair class with
    reachable partners has at least one supporting pair
    (GraphUtils.extendRightPE :6206-6309).
    """
    W, _, D = counts_p.shape
    R = wcfg.pair_ring
    j = jnp.arange(D)

    def class_support(dist: int, pkbf_lanes):
        # partner k-mer ends at buffer position pos - dist + j
        end_pos = state.pos[:, None, None] - dist + j[None, None, :]
        # a ring slot is live only for the last R-1 written positions
        # (distance exactly R aliases the newest entry)
        reachable = (end_pos >= cfg.k - 1) & (
            state.pos[:, None, None] - end_pos < R
        )
        slot = jnp.where(reachable, end_pos % R, 0).astype(jnp.int32)
        rows = jnp.arange(W)[:, None, None]
        pf = u64.U64(state.ring_fh.lo[rows, slot], state.ring_fh.hi[rows, slot])
        pr = u64.U64(state.ring_rh.lo[rows, slot], state.ring_rh.hi[rows, slot])
        if cfg.stranded:
            ph = (
                nthash.combine(rh_p, pr) if wcfg.left else nthash.combine(pf, fh_p)
            )
        else:
            if wcfg.left:
                ph = nthash.combine_canonical(rh_p, fh_p, pr, pf)
            else:
                ph = nthash.combine_canonical(pf, pr, fh_p, rh_p)
        hp = nthash.multi_hash(ph, cfg.k, cfg.pkbf.num_hash)
        sup = backend.bloom_lookup(pkbf_lanes, cfg.pkbf, hp)
        sup = sup & reachable & alive_p
        return sup, jnp.any(reachable & alive_p, axis=-1)

    zero_sup = jnp.zeros(counts_p.shape, bool)
    if graph.rpkbf is not None and cfg.read_pair_distance > 0:
        sup_r, reach_r = class_support(cfg.read_pair_distance, graph.rpkbf)
    else:
        sup_r, reach_r = zero_sup, jnp.zeros(counts_p.shape[:2], bool)
    if graph.fpkbf is not None and cfg.fragment_pair_distance > 0:
        sup_f, reach_f = class_support(cfg.fragment_pair_distance, graph.fpkbf)
    else:
        sup_f, reach_f = zero_sup, jnp.zeros(counts_p.shape[:2], bool)
    n_r = jnp.sum(sup_r.astype(jnp.int32), axis=-1)
    n_f = jnp.sum(sup_f.astype(jnp.int32), axis=-1)
    any_sup = sup_r | sup_f
    last = jnp.max(jnp.where(any_sup, j[None, None, :], -1), axis=-1)

    # median probe coverage over alive probe k-mers
    big = jnp.where(alive_p, counts_p, jnp.inf)
    s = jnp.sort(big, axis=-1)
    nv = jnp.sum(alive_p.astype(jnp.int32), axis=-1)
    half = jnp.maximum(nv // 2, 0)
    lo_i = jnp.maximum(jnp.where(nv % 2 == 0, half - 1, half), 0)
    med = (
        jnp.take_along_axis(s, lo_i[..., None], axis=-1)[..., 0]
        + jnp.take_along_axis(s, half[..., None], axis=-1)[..., 0]
    ) / 2.0
    med = jnp.where(nv > 0, med, 0.0)

    ok = (
        (last >= 0)
        & (~reach_r | (n_r > 0))
        & (~reach_f | (n_f > 0))
        & (reach_r | reach_f)
    )
    score = (
        jnp.minimum(state.path_min[:, None], med)
        * (n_r + n_f).astype(jnp.float32)
        / jnp.maximum(last + 1, 1).astype(jnp.float32)
    )
    return jnp.where(ok, score, -1.0), med, ok


@partial(
    jax.jit,
    static_argnames=("cfg", "wcfg", "mode", "backend"),
    donate_argnames=("state",),
)
def resolve_branches(
    state: WalkState,
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    min_cov: jax.Array,
    mode: str = "greedy",
    backend: DeviceBackend = DEVICE_BACKEND,
) -> WalkState:
    """Resolve lanes frozen with BRANCH status.

    mode="greedy": pick the candidate with the best lookahead score
      (ties: higher candidate count, then smaller base code — the
      reference's first-wins iteration order).  Lane resumes ACTIVE.
    mode="naive": candidates must reach tip_probe_depth; exactly one
      survivor resumes the walk, otherwise the lane stops (STOPPED_BRANCH).
    mode="pair": extendPE semantics — candidates probed naively and scored
      by read/fragment paired-k-mer support against the walk's pair ring;
      no viable candidate stops the lane (requires wcfg.pair_ring > 0).
    """
    at_branch = state.status == BRANCH
    out_codes = _gather_out_codes(state.buf, state.pos, cfg.k)
    fh4, rh4, q4 = _successors(cfg, wcfg, state.fh, state.rh, out_codes)
    counts = backend.counts(graph, cfg, q4)
    viable = counts >= jnp.maximum(min_cov, 1.0)[:, None]

    if mode == "greedy":
        scores = _expand_scores(
            graph, cfg, wcfg, state.buf, state.pos, fh4, rh4, q4, backend=backend
        )
        scores = jnp.where(viable, scores, -1.0)
        # lexicographic: best score, then higher candidate count, then first
        # base order (argmax takes the first maximum — the reference's
        # first-candidate-wins tie rule)
        is_best = scores >= jnp.max(scores, axis=1, keepdims=True)
        best = jnp.argmax(
            jnp.where(is_best & viable, counts, -1.0), axis=1
        ).astype(jnp.uint8)
        advance = at_branch
        new_status = jnp.where(at_branch, ACTIVE, state.status)
    elif mode == "pair":
        fh_p, rh_p, counts_p, alive_p = _probe_with_hashes(
            graph, cfg, wcfg, state.buf, state.pos, fh4, rh4, q4, min_cov,
            backend=backend,
        )
        scores, med, ok = _pair_scores(
            state, graph, cfg, wcfg, fh_p, rh_p, counts_p, alive_p,
            backend=backend,
        )
        scores = jnp.where(viable, scores, -1.0)
        any_ok = jnp.any(scores >= 0.0, axis=1)
        is_best = scores >= jnp.max(scores, axis=1, keepdims=True)
        best = jnp.argmax(jnp.where(is_best, med, -1.0), axis=1).astype(jnp.uint8)
        advance = at_branch & any_ok
        new_status = jnp.where(
            at_branch, jnp.where(any_ok, ACTIVE, STOPPED_BRANCH), state.status
        )
    else:
        depth = _tip_probe(
            graph, cfg, wcfg, state.buf, state.pos, fh4, rh4, q4, min_cov,
            backend=backend,
        )
        deep = depth >= wcfg.tip_probe_depth
        ndeep = jnp.sum(deep.astype(jnp.int32), axis=1)
        best = jnp.argmax(jnp.where(deep, counts, -1.0), axis=1).astype(jnp.uint8)
        advance = at_branch & (ndeep == 1)
        new_status = jnp.where(
            at_branch, jnp.where(ndeep == 1, ACTIVE, STOPPED_BRANCH), state.status
        )

    # cycle / capacity guards for the chosen hop
    rows = jnp.arange(state.pos.shape[0])
    ci = best.astype(jnp.int32)
    qn = u64.U64(q4.lo[rows, ci], q4.hi[rows, ci])
    cyc = _in_hist(state.hist, qn)
    full = state.pos >= wcfg.max_len - 1
    advance = advance & ~cyc & ~full
    new_status = jnp.where(
        at_branch & cyc, CYCLE, jnp.where(at_branch & full, FULL, new_status)
    )

    st = _apply_advance(state, cfg, wcfg, advance, best, fh4, rh4, q4, counts4=counts)
    return st._replace(status=new_status.astype(jnp.int32))


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "wcfg", "mode", "superstep_hops", "max_supersteps", "has_term",
        "backend",
    ),
)
def _extend_walks_fused(
    state: WalkState,
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    min_cov: jax.Array,
    bound: jax.Array,
    terminators: jax.Array,
    mode: str,
    superstep_hops: int,
    max_supersteps: int,
    has_term: bool,
    backend: DeviceBackend = DEVICE_BACKEND,
) -> WalkState:
    """One device dispatch for the whole extension: lax.while_loop
    alternating walk supersteps and branch resolution.

    The previous host driver read back every lane's status between
    supersteps; on a tunneled TPU each readback costs ~200 ms of latency,
    which dominated stage-2/3 wall clock.  Fusing the loop keeps the
    branch-resolution control flow entirely on device."""
    term = terminators if has_term else None

    def step(carry):
        st, i = carry
        st = walk_superstep(
            st, graph, cfg, wcfg, min_cov, bound, superstep_hops,
            terminators=term, backend=backend,
        )
        st = jax.lax.cond(
            backend.any_global(st.status == BRANCH),
            lambda s: resolve_branches(
                s, graph, cfg, wcfg, min_cov, mode=mode, backend=backend
            ),
            lambda s: s,
            st,
        )
        return st, i + 1

    def cond(carry):
        st, i = carry
        live = backend.any_global((st.status == ACTIVE) | (st.status == BRANCH))
        return live & (i < max_supersteps)

    state, _ = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
    return state


def extend_walks(
    state: WalkState,
    graph: GraphState,
    cfg: GraphConfig,
    wcfg: WalkConfig,
    min_cov,
    bound,
    mode: str = "greedy",
    terminators: Optional[jax.Array] = None,
    superstep_hops: int = 64,
    max_supersteps: int = 64,
    backend: DeviceBackend = DEVICE_BACKEND,
) -> WalkState:
    """Extend all walk lanes to completion (single fused device dispatch)."""
    W = state.pos.shape[0]
    min_cov = jnp.broadcast_to(jnp.asarray(min_cov, jnp.float32), (W,))
    bound = jnp.broadcast_to(jnp.asarray(bound, jnp.int32), (W,))
    if terminators is None:
        dummy = jnp.zeros((1,), jnp.uint8)
        return _extend_walks_fused(
            state, graph, cfg, wcfg, min_cov, bound, dummy,
            mode, superstep_hops, max_supersteps, False, backend=backend,
        )
    return _extend_walks_fused(
        state, graph, cfg, wcfg, min_cov, bound, terminators,
        mode, superstep_hops, max_supersteps, True, backend=backend,
    )


@jax.jit
def _harvest_meta(pos: jax.Array, status: jax.Array) -> jax.Array:
    return jnp.stack([pos, status])


def harvest(state: WalkState) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(buf, pos, status) as numpy — the walks' emitted code sequences.

    pos/status ride one packed transfer (each separate readback pays a
    full host-tunnel round trip)."""
    buf, meta = jax.device_get(
        (state.buf, _harvest_meta(state.pos, state.status))
    )
    return buf, meta[0], meta[1]
