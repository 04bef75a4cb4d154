"""Graph execution engine: one query surface, single-chip or mesh.

Pipelines, error correction, fragment connection, and transcript extension
call graph operations through this module.  A plain ``GraphState`` executes
the single-device kernels (graph/dbg.py, graph/traverse.py); a ``MeshGraph``
executes the hash-range-sharded mesh programs (parallel/sharded.py), where
filters are sharded by hash range across devices, queries ride all-to-all
collectives, and walk lanes are data-parallel — the TPU-native replacement
for the reference's shared-memory thread pool (RNABloom.java:1203-1238).

Both paths produce identical filters, counts, and walks (equivalence-tested
on an 8-device mesh), so sharding is purely a deployment decision:
``MeshGraph.wrap`` activates whenever more than one device is visible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import dbg, traverse
from .dbg import GraphConfig, GraphState


@dataclass
class MeshGraph:
    """Sharded graph state + per-program cache over a device mesh."""

    mesh: object  # jax.sharding.Mesh
    state: object  # parallel.sharded.ShardedGraphState
    _programs: dict = field(default_factory=dict)

    @property
    def rpkbf(self):
        return self.state.rpkbf

    @property
    def fpkbf(self):
        return self.state.fpkbf

    def _prog(self, key, make):
        p = self._programs.get(key)
        if p is None:
            p = make()
            self._programs[key] = p
        return p

    def _flags(self) -> Tuple[bool, bool]:
        return self.state.rpkbf is not None, self.state.fpkbf is not None


# -- dispatch accounting ----------------------------------------------------
# every engine entry point counts one device dispatch (on the tunneled axon
# backend each dispatch costs a ~200 ms round trip, so dispatches/batch is
# the stage-2/3 latency budget; bench.py reports these per pipeline stage)

DISPATCHES = {"build": 0, "query": 0, "walk": 0}


def _tick(kind: str) -> None:
    DISPATCHES[kind] += 1


def dispatch_counts() -> dict:
    return dict(DISPATCHES)


def reset_dispatch_counts() -> None:
    for k in DISPATCHES:
        DISPATCHES[k] = 0


def make_mesh_if_multi(min_devices: int = 2):
    """A 1-D mesh over all devices when >1 are visible (power of two)."""
    from ..parallel import sharded

    n = len(jax.devices())
    n = 1 << (n.bit_length() - 1)  # largest power of two
    if n < min_devices:
        return None
    return sharded.make_mesh(n)


def make_graph(
    cfg: GraphConfig,
    mesh=None,
    with_rpkbf: bool = False,
    with_fpkbf: bool = False,
):
    if mesh is None:
        return dbg.make_graph(cfg, with_rpkbf=with_rpkbf, with_fpkbf=with_fpkbf)
    from ..parallel import sharded

    state = sharded.make_sharded_graph(
        cfg, mesh, with_rpkbf=with_rpkbf, with_fpkbf=with_fpkbf
    )
    return MeshGraph(mesh=mesh, state=state)


def is_sharded(graph) -> bool:
    return isinstance(graph, MeshGraph)


def _pad_rows(codes, n: int):
    B = codes.shape[0]
    if B % n == 0:
        return codes
    pad = n - B % n
    return np.concatenate([codes, np.full((pad,) + codes.shape[1:], 4, codes.dtype)])


# ---------------------------------------------------------------------------
# inserts
# ---------------------------------------------------------------------------


def build_step(graph, cfg: GraphConfig, codes, add_read_pairs: bool = False, salt=0):
    _tick("build")
    if not is_sharded(graph):
        return dbg.build_step(
            graph, cfg, jnp.asarray(codes), add_read_pairs=add_read_pairs, salt=salt
        )
    from ..parallel import sharded

    step = graph._prog(
        ("build", cfg, add_read_pairs),
        lambda: sharded.sharded_build_step(graph.mesh, cfg, add_read_pairs=add_read_pairs),
    )
    codes = jnp.asarray(_pad_rows(np.asarray(codes), graph.mesh.devices.size))
    graph.state = step(graph.state, codes, jnp.uint32(salt))
    return graph


def rebuild_step(graph, cfg: GraphConfig, codes, add_frag_pairs: bool = True, salt=0):
    _tick("build")
    if not is_sharded(graph):
        return dbg.rebuild_step(
            graph, cfg, jnp.asarray(codes), add_frag_pairs=add_frag_pairs, salt=salt
        )
    from ..parallel import sharded

    step = graph._prog(
        ("rebuild", cfg, add_frag_pairs),
        lambda: sharded.sharded_rebuild_step(graph.mesh, cfg, add_frag_pairs=add_frag_pairs),
    )
    codes = jnp.asarray(_pad_rows(np.asarray(codes), graph.mesh.devices.size))
    graph.state = step(graph.state, codes, jnp.uint32(salt))
    return graph


def fresh_rebuild_state(
    graph, cfg: GraphConfig, keep_rpkbf: bool = True, with_fpkbf: bool = True,
    copy_rpkbf: bool = False,
):
    """Zeroed counters (+ fresh fpkbf) for the stage-2b fragment graph,
    keeping the read-pair keys (populateGraphFromFragments).

    ``copy_rpkbf`` deep-copies the read-pair lanes — required when the
    source graph must survive donation by later rebuild steps (the pooled
    path reuses one shared graph across samples)."""
    from ..bloom.filters import make_bloom

    if not is_sharded(graph):
        rpk = graph.rpkbf if keep_rpkbf else None
        if rpk is not None and copy_rpkbf:
            rpk = jnp.array(rpk, copy=True)
        return dbg.GraphState(
            dbgbf=None,
            cbf=jnp.zeros_like(graph.cbf),
            rpkbf=rpk,
            fpkbf=make_bloom(cfg.pkbf) if with_fpkbf else None,
        )
    from ..parallel import sharded

    fresh = sharded.make_sharded_graph(
        cfg, graph.mesh, with_rpkbf=False, with_fpkbf=with_fpkbf
    )
    rpk = graph.state.rpkbf if keep_rpkbf else None
    if rpk is not None and copy_rpkbf:
        rpk = jnp.array(rpk, copy=True)
    return MeshGraph(
        mesh=graph.mesh,
        state=sharded.ShardedGraphState(
            dbgbf=None,
            cbf=fresh.cbf,
            rpkbf=rpk,
            fpkbf=fresh.fpkbf,
        ),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg", "d_frag", "d_read"))
def _pair_support_both_jit(graph: GraphState, cfg: GraphConfig, codes, d_frag: int, d_read: int):
    """Fragment + read pair support in ONE dispatch, packed into one array
    (each host readback costs ~200 ms of tunnel latency)."""
    fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
    B, P = valid.shape
    out = []
    for d, which in ((d_frag, "frag"), (d_read, "read")):
        if d <= 0:
            out.append(jnp.zeros((B, P), bool))
            continue
        pair_base, np_ = dbg.pair_base_hashes(cfg, fh, rh, d)
        sup = (
            dbg.lookup_fragment_pair(graph, cfg, pair_base)
            if which == "frag"
            else dbg.lookup_read_pair(graph, cfg, pair_base)
        )
        pv = jnp.logical_and(valid[..., :np_], valid[..., d:])
        padded = jnp.zeros((B, P), bool).at[:, :np_].set(jnp.logical_and(sup, pv))
        out.append(padded)
    return jnp.stack(out)


@_partial(jax.jit, static_argnames=("cfg",))
def _variant_exists_jit(graph: GraphState, cfg: GraphConfig, codes: jax.Array):
    """Per k-mer: does any left/right SNV variant exist in the graph?

    The reference's isBranchFree (GraphUtils.java:7651-7672) additionally
    requires the variant to have depth > maxTipLength; here any existing
    variant counts as a branch (stricter — a tip-length probe per variant
    would cost a walk per position)."""
    from ..ops import nthash

    fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
    P = fh.lo.shape[1]
    last = codes[:, cfg.k - 1 : cfg.k - 1 + P]
    first = codes[:, :P]
    fr4, rr4 = nthash.variant_hashes_right(fh, last, cfg.k, rh)
    fl4, rl4 = nthash.variant_hashes_left(fh, first, cfg.k, rh)
    out = None
    for f4, r4, cur in ((fr4, rr4, last), (fl4, rl4, first)):
        q4 = f4 if cfg.stranded else nthash.canonical(f4, r4)
        counts4 = dbg.get_counts(graph, cfg, q4)  # (B, P, 4)
        is_self = jnp.arange(4, dtype=jnp.uint8)[None, None, :] == cur[..., None]
        hit = jnp.any((counts4 > 0) & ~is_self, axis=-1)
        out = hit if out is None else (out | hit)
    return jnp.where(valid, out, False), valid


def _use_replicated() -> bool:
    """Mesh read-only queries/walks default to the replicated engine; set
    RNB_MESH_WALK=routed for graphs too large to fit one device's HBM."""
    return os.environ.get("RNB_MESH_WALK", "replicated") == "replicated"


def _dp_codes(graph, codes):
    """Pad a host code batch to the device count and DP-shard its rows."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    codes = np.asarray(codes)
    B = codes.shape[0]
    padded = jnp.asarray(_pad_rows(codes, graph.mesh.devices.size))
    sh = NamedSharding(graph.mesh, P(graph.mesh.axis_names[0], None))
    return jax.device_put(padded, sh), B


def count_step(graph, cfg: GraphConfig, codes) -> Tuple[jax.Array, jax.Array]:
    """(counts (B, P) float32, valid) for every k-mer of a code batch."""
    _tick("query")
    if not is_sharded(graph):
        return dbg.count_step(graph, cfg, jnp.asarray(codes))
    from ..parallel import sharded

    if _use_replicated():
        padded, B = _dp_codes(graph, codes)
        counts, valid = dbg.count_step(_replicated_graph(graph, cfg), cfg, padded)
        return counts[:B], valid[:B]
    q = graph._prog(
        ("count", cfg), lambda: sharded.sharded_count_query(graph.mesh, cfg)
    )
    B = np.asarray(codes).shape[0]
    padded = jnp.asarray(_pad_rows(np.asarray(codes), graph.mesh.devices.size))
    counts, valid = q(graph.state, padded)
    return counts[:B], valid[:B]


def pair_support_both(graph, cfg: GraphConfig, codes, d_frag: int, d_read: int) -> np.ndarray:
    """(2, B, P) bool: fragment- then read-pair support planes."""
    _tick("query")
    if not is_sharded(graph):
        return np.asarray(
            _pair_support_both_jit(graph, cfg, jnp.asarray(codes), d_frag, d_read)
        )
    from ..parallel import sharded

    if _use_replicated():
        padded, B = _dp_codes(graph, codes)
        rep = _replicated_graph(graph, cfg)
        # a missing filter answers a False plane (matches the routed engine)
        out = _pair_support_both_jit(
            rep, cfg, padded,
            d_frag if rep.fpkbf is not None else 0,
            d_read if rep.rpkbf is not None else 0,
        )
        return np.asarray(out)[:, :B]
    rpk, fpk = graph._flags()
    q = graph._prog(
        ("pair", cfg, d_frag, d_read),
        lambda: sharded.sharded_pair_support(graph.mesh, cfg, d_frag, d_read, rpk, fpk),
    )
    B = np.asarray(codes).shape[0]
    padded = jnp.asarray(_pad_rows(np.asarray(codes), graph.mesh.devices.size))
    return np.asarray(q(graph.state, padded))[:, :B]


@_partial(jax.jit, static_argnames=("cfg", "with_read_pairs"))
def _counts_read_support_jit(
    graph: GraphState, cfg: GraphConfig, codes: jax.Array, with_read_pairs: bool
):
    """Counts + read-pair support for a code batch in ONE program (each
    host readback costs ~200 ms of tunnel latency on the axon backend)."""
    fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
    counts = jnp.where(valid, dbg.get_counts(graph, cfg, base), 0.0)
    B, P = valid.shape
    d = cfg.read_pair_distance
    sup = jnp.zeros((B, P), bool)
    if with_read_pairs and d > 0:
        pair_base, np_ = dbg.pair_base_hashes(cfg, fh, rh, d)
        s = dbg.lookup_read_pair(graph, cfg, pair_base)
        pv = jnp.logical_and(valid[..., :np_], valid[..., d:])
        sup = sup.at[:, :np_].set(jnp.logical_and(s, pv))
    return counts, valid, sup


def counts_and_read_support(graph, cfg: GraphConfig, codes):
    """(counts, valid, read-pair support) as numpy — fused into one
    dispatch on the single-device AND replicated-mesh engines; only the
    routed mesh fallback still pays two dispatches (its query programs are
    per-filter)."""
    _tick("query")
    if not is_sharded(graph):
        st = graph
        return jax.device_get(
            _counts_read_support_jit(st, cfg, jnp.asarray(codes), st.rpkbf is not None)
        )
    if _use_replicated():
        padded, B = _dp_codes(graph, codes)
        rep = _replicated_graph(graph, cfg)
        c, v, s = jax.device_get(
            _counts_read_support_jit(rep, cfg, padded, rep.rpkbf is not None)
        )
        return c[:B], v[:B], s[:B]
    sup = pair_support_both(graph, cfg, codes, 0, cfg.read_pair_distance)[1]
    counts, valid = jax.device_get(count_step(graph, cfg, codes))
    return counts, valid, sup


def variant_exists(graph, cfg: GraphConfig, codes) -> Tuple[np.ndarray, np.ndarray]:
    """Per k-mer: does any left/right SNV variant exist in the graph?"""
    _tick("query")
    if not is_sharded(graph):
        hit, valid = _variant_exists_jit(graph, cfg, jnp.asarray(codes))
        return np.asarray(hit), np.asarray(valid)
    from ..parallel import sharded

    if _use_replicated():
        padded, B = _dp_codes(graph, codes)
        hit, valid = _variant_exists_jit(_replicated_graph(graph, cfg), cfg, padded)
        return np.asarray(hit)[:B], np.asarray(valid)[:B]
    rpk, fpk = graph._flags()
    q = graph._prog(
        ("variant", cfg),
        lambda: sharded.sharded_variant_counts(graph.mesh, cfg, rpk, fpk),
    )
    B = np.asarray(codes).shape[0]
    padded = jnp.asarray(_pad_rows(np.asarray(codes), graph.mesh.devices.size))
    hit, valid = q(graph.state, padded)
    return np.asarray(hit)[:B], np.asarray(valid)[:B]


def _replicated_graph(graph, cfg: GraphConfig):
    """Cached merged+replicated GraphState for the current filter contents.

    Invalidated whenever ``graph.state`` is rebound (build/rebuild steps
    replace the state tuple, so identity tracks mutation)."""
    from ..parallel import sharded

    cached = graph._programs.get("rep_graph")
    if cached is not None and cached[0] is graph.state:
        return cached[1]
    rep = sharded.replicate_graph(graph.mesh, graph.state, cfg)
    graph._programs["rep_graph"] = (graph.state, rep)
    return rep


def _pad_lanes(tree, pad: int):
    """Append ``pad`` copies of lane 0 along axis 0 of every leaf."""
    return jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]
        ),
        tree,
    )


def extend_walks(
    wstate, graph, cfg: GraphConfig, wcfg, min_cov, bound, mode: str = "greedy"
):
    """Walk extension on whichever engine owns the filters.

    On a mesh the default is the REPLICATED engine: the filters are merged
    and all-gathered into every device's HBM once per graph version, walk
    lanes are data-parallel, and supersteps are collective-free.  The
    routed (hash-range-sharded) engine costs ~13 collectives per superstep
    on KB payloads (``sharded.comm_accounting``) — ICI-latency-bound and
    ~1000x slower on the 8-device CPU proxy — so it is kept only for
    graphs too large to replicate (``RNB_MESH_WALK=routed``).
    """
    _tick("walk")
    if not is_sharded(graph):
        return traverse.extend_walks(wstate, graph, cfg, wcfg, min_cov, bound, mode=mode)
    from ..parallel import sharded

    walk_env = os.environ.get("RNB_MESH_WALK", "replicated")
    if walk_env in ("replicated", "grouped"):
        # one engine for both layouts: filters shard R ways and replicate
        # N/R ways (R=1 == full replication).  Replication used to ride a
        # GSPMD program over lane-sharded arrays; the explicit shard_map
        # walk is ~9x faster on the 8-device proxy (the partitioner
        # scheduled per-op resharding the mesh never needed), so the
        # replicated default is simply the grouped engine at R=1.
        r = 1 if walk_env == "replicated" else int(os.environ.get("RNB_MESH_GROUP", "2"))
        n = graph.mesh.devices.size
        gmesh = graph._prog(("gmesh", r), lambda: sharded.make_group_mesh(r, n))
        cached = graph._programs.get(("gstate", r))
        if cached is None or cached[0] is not graph.state:
            gst = sharded.group_state(gmesh, graph.state, cfg)
            graph._programs[("gstate", r)] = (graph.state, gst)
        else:
            gst = cached[1]
        rpk, fpk = gst.rpkbf is not None, gst.fpkbf is not None
        run = graph._prog(
            ("gwalk", cfg, wcfg, mode, r),
            lambda: sharded.grouped_extend_walks(gmesh, cfg, wcfg, mode, rpk, fpk),
        )
        W = int(wstate.pos.shape[0])
        pad = (-W) % n
        if pad:
            wstate = _pad_lanes(wstate, pad)
        min_cov = jnp.broadcast_to(jnp.asarray(min_cov, jnp.float32), (W + pad,))
        bound = jnp.broadcast_to(jnp.asarray(bound, jnp.int32), (W + pad,))
        out = run(wstate, gst, min_cov, bound)
        return jax.tree.map(lambda x: x[:W], out) if pad else out

    rpk, fpk = graph._flags()
    run = graph._prog(
        ("walk", cfg, wcfg, mode),
        lambda: sharded.sharded_extend_walks(graph.mesh, cfg, wcfg, mode, rpk, fpk),
    )
    return run(wstate, graph.state, min_cov, bound)


def fprs(graph, cfg: GraphConfig) -> dict:
    if not is_sharded(graph):
        return dbg.fprs(graph, cfg)
    from ..parallel import sharded

    return sharded.sharded_fprs(graph.state, cfg)


# ---------------------------------------------------------------------------
# host transfer (checkpointing)
# ---------------------------------------------------------------------------


def to_host_state(graph, cfg: GraphConfig) -> GraphState:
    """Merge shards into the single-device filter layout (lanes then one
    trash cell) so checkpoints are engine-independent."""
    if not is_sharded(graph):
        return graph

    replicate = None
    if jax.process_count() > 1:
        # shards live on other hosts' devices: replicate before reading
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicate = jax.jit(
            lambda x: x, out_shardings=NamedSharding(graph.mesh, P())
        )

    def merge(lanes, trash, out_trash):
        if lanes is None:
            return None
        host = np.asarray(jax.device_get(replicate(lanes)) if replicate else lanes)
        flat = np.concatenate([host[i, :-trash] for i in range(host.shape[0])])
        return jnp.asarray(np.concatenate([flat, np.zeros(out_trash, host.dtype)]))

    cbf_trash = 128 if cfg.cbf.blocked else 1
    pk_trash = cfg.pkbf.trash if cfg.pkbf is not None else 1
    return GraphState(
        dbgbf=merge(graph.state.dbgbf, 1, cfg.dbgbf.trash),
        cbf=merge(graph.state.cbf, cbf_trash, cfg.cbf.trash),
        rpkbf=merge(graph.state.rpkbf, 1, pk_trash),
        fpkbf=merge(graph.state.fpkbf, 1, pk_trash),
    )


def from_host_state(state: GraphState, cfg: GraphConfig, mesh) -> MeshGraph:
    """Split a single-device checkpoint back into mesh shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel import sharded

    n = mesh.devices.size
    sh = NamedSharding(mesh, P(mesh.axis_names[0], None))

    def split(arr, in_trash, trash):
        if arr is None:
            return None
        host = np.asarray(arr)[: arr.shape[0] - in_trash]
        local = host.shape[0] // n
        blocks = host.reshape(n, local)
        out = np.concatenate(
            [blocks, np.zeros((n, trash), host.dtype)], axis=1
        )
        return jax.device_put(jnp.asarray(out), sh)

    cbf_trash = 128 if cfg.cbf.blocked else 1
    pk_trash = cfg.pkbf.trash if cfg.pkbf is not None else 1
    return MeshGraph(
        mesh=mesh,
        state=sharded.ShardedGraphState(
            dbgbf=split(state.dbgbf, cfg.dbgbf.trash, 1),
            cbf=split(state.cbf, cfg.cbf.trash, cbf_trash),
            rpkbf=split(state.rpkbf, pk_trash, 1),
            fpkbf=split(state.fpkbf, pk_trash, 1),
        ),
    )
