"""Minimizer-based read overlap detection (internal ava engine).

The reference shells out to minimap2 for all-vs-all long-read overlaps
(olc/OverlapLayoutConsensus.java:78-106) and parses PAF.  No external
binaries exist in this environment, so this module implements the same
contract internally: window minimizers over the canonical ntHash stream
(hash/MinimizerHashIterator.java), an inverted-index hash join, and
diagonal-binned chaining to estimate overlap coordinates — returning
PAF-like records consumed by the layout step.

Minimizer extraction is device-side (rolling hash + sliding-window min);
the join and chaining are host-side numpy.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dbg import GraphConfig
from ..ops import nthash
from ..utils import seq as sequtils


@dataclass
class OverlapParams:
    w: int = 10  # minimizer window
    min_shared: int = 4  # minimizers supporting an overlap
    diag_band: int = 100  # diagonal tolerance (bases)
    min_overlap: int = 150  # bases
    max_overhang: int = 100  # dovetail tolerance


@dataclass
class OverlapRecord:
    """PAF-like overlap: query/target ids, strand, coords, support."""

    q: int
    t: int
    strand: int  # +1 same strand, -1 query is reverse-complemented
    q_start: int
    q_end: int
    t_start: int
    t_end: int
    shared: int


@partial(jax.jit, static_argnames=("k",))
def _minimizer_keys(codes: jax.Array, k: int):
    """Canonical hash keys per k-mer position (invalid -> all-ones)."""
    fh, rh, valid = nthash.rolling_hash(codes, k, stranded=False)
    base = nthash.canonical(fh, rh)
    key_hi = jnp.where(valid, base.hi, jnp.uint32(0xFFFFFFFF))
    key_lo = jnp.where(valid, base.lo, jnp.uint32(0xFFFFFFFF))
    return key_lo, key_hi


def extract_minimizers(
    codes: np.ndarray, lengths: np.ndarray, k: int, w: int
) -> List[List[Tuple[int, int]]]:
    """Per read: [(hash64, position)] winnowed minimizers (host finish)."""
    key_lo, key_hi = _minimizer_keys(jnp.asarray(codes), k)
    lo = np.asarray(key_lo).astype(np.uint64)
    hi = np.asarray(key_hi).astype(np.uint64)
    keys = (hi << np.uint64(32)) | lo
    out: List[List[Tuple[int, int]]] = []
    for b in range(codes.shape[0]):
        n = max(int(lengths[b]) - k + 1, 0)
        row = keys[b, :n]
        mins: List[Tuple[int, int]] = []
        last = -1
        for s in range(max(n - w + 1, 1)):
            e = min(s + w, n)
            j = s + int(np.argmin(row[s:e]))
            if j != last and row[j] != np.uint64(0xFFFFFFFFFFFFFFFF):
                mins.append((int(row[j]), j))
                last = j
        out.append(mins)
    return out


def find_overlaps(
    minimizers: List[List[Tuple[int, int]]],
    lengths: np.ndarray,
    params: OverlapParams,
) -> List[OverlapRecord]:
    """All-vs-all overlap candidates via minimizer hash join + diagonal bins.

    Reads are assumed pre-oriented onto one strand (the long-read pipeline
    orients by poly-A before OLC); opposite-strand overlaps are therefore
    not searched — a documented narrowing vs minimap2's ava mode.
    """
    index: Dict[int, List[Tuple[int, int]]] = {}
    for rid, mins in enumerate(minimizers):
        for h, p in mins:
            index.setdefault(h, []).append((rid, p))

    votes: Dict[Tuple[int, int, int], List[Tuple[int, int]]] = {}
    for q, mins in enumerate(minimizers):
        for h, qp in mins:
            for t, tp in index.get(h, ()):  # noqa: B020
                if t <= q:
                    continue
                diag = (qp - tp) // params.diag_band
                votes.setdefault((q, t, diag), []).append((qp, tp))

    out: List[OverlapRecord] = []
    seen_pairs = set()
    for (q, t, diag), hits in votes.items():
        if len(hits) < params.min_shared or (q, t) in seen_pairs:
            continue
        qs = min(h[0] for h in hits)
        qe = max(h[0] for h in hits)
        ts = min(h[1] for h in hits)
        te = max(h[1] for h in hits)
        if qe - qs < params.min_overlap and te - ts < params.min_overlap:
            continue
        seen_pairs.add((q, t))
        out.append(
            OverlapRecord(
                q=q, t=t, strand=1, q_start=qs, q_end=qe, t_start=ts, t_end=te,
                shared=len(hits),
            )
        )
    return out


def classify(rec: OverlapRecord, q_len: int, t_len: int, params: OverlapParams) -> str:
    """'q_contained' | 't_contained' | 'dovetail' | 'internal'
    (PafUtils containment/dovetail predicates :117-218)."""
    h = params.max_overhang
    q_l, q_r = rec.q_start, q_len - rec.q_end
    t_l, t_r = rec.t_start, t_len - rec.t_end
    if q_l <= h and q_r <= h:
        return "q_contained"
    if t_l <= h and t_r <= h:
        return "t_contained"
    if (q_l <= h and t_r <= h) or (t_l <= h and q_r <= h):
        return "dovetail"
    return "internal"
