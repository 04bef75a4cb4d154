"""Read-to-unitig mapping and pileup consensus polish.

Replaces the reference's step 3+4 of uniqueOLC: minimap2 read->unitig
mapping (olc/OverlapLayoutConsensus.java:661 mapWithMinimapFiltered) and
racon consensus (:849 consensusWithRacon).  Reads were already polished
against the de Bruijn graph upstream, so instead of partial-order
alignment this computes a column-wise majority vote: every mapped read
scatter-adds one-hot base votes into a (unitig, position, base) tensor on
device, and the consensus is the argmax wherever depth suffices.  Indels
relative to the unitig are not re-aligned (documented deviation; residual
indel errors are rare post-correction).

Also derives the per-unitig length-normalized read counts used by the
greedy layout's edge filter (PafUtils.getLengthNormalizedReadCounts :352).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .overlap import Minimizers, OverlapParams, OverlapRecord, map_to_targets


@dataclass
class Placement:
    """A read placed on a unitig, in unitig-forward coordinates."""

    read: int
    target: int
    orient: int  # 0: read forward, 1: read reverse-complemented
    start: int  # unitig position of the (oriented) read's first base
    q_start: int  # aligned span on the read's forward strand
    q_end: int
    t_start: int  # aligned span on the unitig
    t_end: int


def place_reads(
    read_mins: Minimizers,
    unitig_mins: Minimizers,
    read_lengths: np.ndarray,
    params: OverlapParams,
) -> List[Placement]:
    """Best placement of each read onto the unitig set."""
    recs = map_to_targets(read_mins, unitig_mins, params)
    best: Dict[Tuple[int, int], OverlapRecord] = {}
    for r in recs:
        cur = best.get((r.q, r.t))
        if cur is None or r.shared > cur.shared:
            best[(r.q, r.t)] = r
    out: List[Placement] = []
    for r in best.values():
        rl = int(read_lengths[r.q])
        if r.strand == 1:
            start = r.t_start - r.q_start
            orient = 0
        else:
            # reverse-complement the read: fwd pos p -> rl - (p + k)... the
            # aligned block's right end on the read maps to t_start
            start = r.t_start - (rl - r.q_end)
            orient = 1
        out.append(
            Placement(
                read=r.q, target=r.t, orient=orient, start=start,
                q_start=r.q_start, q_end=r.q_end,
                t_start=r.t_start, t_end=r.t_end,
            )
        )
    return out


@partial(jax.jit, static_argnames=("n_unitigs", "max_len"))
def _vote_kernel(
    unitig_codes: jax.Array,  # (U, L) uint8, 4 = pad
    read_codes: jax.Array,  # (R, Lr) uint8 oriented, 4 = pad
    tgt: jax.Array,  # (R,) int32 unitig index
    start: jax.Array,  # (R,) int32 placement offset
    min_depth: int,
    n_unitigs: int,
    max_len: int,
):
    R, Lr = read_codes.shape
    pos = start[:, None] + jnp.arange(Lr, dtype=jnp.int32)[None, :]
    valid = (read_codes < 4) & (pos >= 0) & (pos < max_len)
    pos = jnp.clip(pos, 0, max_len - 1)
    base = jnp.where(valid, read_codes, 0).astype(jnp.int32)
    flat = (tgt[:, None] * max_len + pos) * 4 + base
    votes = jnp.zeros((n_unitigs * max_len * 4,), jnp.int32)
    votes = votes.at[flat.reshape(-1)].add(valid.reshape(-1).astype(jnp.int32))
    votes = votes.reshape(n_unitigs, max_len, 4)
    depth = votes.sum(axis=-1)
    winner = jnp.argmax(votes, axis=-1).astype(jnp.uint8)
    polished = jnp.where(
        (depth >= min_depth) & (unitig_codes < 4), winner, unitig_codes
    )
    return polished, depth


_RC = np.array([3, 2, 1, 0, 4], np.uint8)


def polish(
    unitigs: Sequence[np.ndarray],
    reads: Sequence[np.ndarray],
    placements: Sequence[Placement],
    min_depth: int = 2,
    batch_reads: int = 2048,
) -> List[np.ndarray]:
    """Majority-vote consensus over placed reads (device scatter-add)."""
    if not unitigs:
        return []
    U = len(unitigs)
    L = max(len(u) for u in unitigs)
    ucodes = np.full((U, L), 4, np.uint8)
    for i, u in enumerate(unitigs):
        ucodes[i, : len(u)] = u

    placed = [p for p in placements if 0 <= p.target < U]
    if not placed:
        return [np.array(u, np.uint8) for u in unitigs]
    Lr = max(len(reads[p.read]) for p in placed)
    polished = jnp.asarray(ucodes)
    for s in range(0, len(placed), batch_reads):
        chunk = placed[s : s + batch_reads]
        rcodes = np.full((len(chunk), Lr), 4, np.uint8)
        tgt = np.zeros(len(chunk), np.int32)
        start = np.zeros(len(chunk), np.int32)
        for i, p in enumerate(chunk):
            r = reads[p.read]
            if p.orient == 1:
                r = _RC[r[::-1]]
            rcodes[i, : len(r)] = r
            tgt[i] = p.target
            start[i] = p.start
        polished, _ = _vote_kernel(
            polished, jnp.asarray(rcodes), jnp.asarray(tgt), jnp.asarray(start),
            min_depth, U, L,
        )
    out = np.asarray(polished)
    return [out[i, : len(unitigs[i])].copy() for i in range(U)]


def normalized_read_counts(
    placements: Sequence[Placement], unitig_lengths: np.ndarray
) -> Dict[int, float]:
    """Per-unitig count: each read adds aligned_span / unitig_length,
    split across targets when it maps to several (multimap split)."""
    by_read: Dict[int, List[Placement]] = {}
    for p in placements:
        by_read.setdefault(p.read, []).append(p)
    counts: Dict[int, float] = {}
    for hits in by_read.values():
        share = 1.0 / len(hits)
        for p in hits:
            tl = float(unitig_lengths[p.target])
            if tl > 0:
                inc = share * (p.t_end - p.t_start) / tl
                counts[p.target] = counts.get(p.target, 0.0) + inc
    return counts


def junction_placements(
    placements: Sequence[Placement],
) -> List[Tuple[int, int, int, int, int]]:
    """(read, target, orient, q_start, q_end) tuples for
    OverlapGraph.add_mapping_support."""
    return [(p.read, p.target, p.orient, p.q_start, p.q_end) for p in placements]
