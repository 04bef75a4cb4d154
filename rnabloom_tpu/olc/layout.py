"""Overlap-graph layout: containment removal, transitive reduction, paths.

Host-side equivalent of olc/Layout.java: vertices are reads, edges come
from dovetail overlaps; contained reads are dropped
(extractUniqueFromOverlaps :1642), redundant/transitive edges removed
(:235-:274), and transcripts emerge as greedy maximum-support paths
(extractGreedyPaths :3726-3896, simple paths :3349).  Consensus polishing
(racon in the reference, :849) is replaced by stitching reads at their
overlap coordinates — corrected reads are already graph-polished upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .overlap import OverlapParams, OverlapRecord, classify


@dataclass
class LayoutResult:
    paths: List[List[Tuple[int, int]]]  # [(read_id, stitch_offset)]
    contained: List[int]
    singletons: List[int]


def layout_greedy(
    overlaps: List[OverlapRecord],
    lengths: np.ndarray,
    params: OverlapParams,
) -> LayoutResult:
    """Greedy best-overlap layout over pre-oriented reads."""
    n = len(lengths)
    contained = set()
    for rec in overlaps:
        kind = classify(rec, int(lengths[rec.q]), int(lengths[rec.t]), params)
        if kind == "q_contained":
            contained.add(rec.q)
        elif kind == "t_contained":
            contained.add(rec.t)

    # dovetail edges between non-contained reads: u -> v means v extends u
    # to the right; weight = shared minimizer support
    edges: Dict[int, Tuple[int, int, int]] = {}  # u -> (v, support, offset)
    redges: Dict[int, Tuple[int, int]] = {}  # v -> (u, support)
    for rec in overlaps:
        if rec.q in contained or rec.t in contained:
            continue
        kind = classify(rec, int(lengths[rec.q]), int(lengths[rec.t]), params)
        if kind != "dovetail":
            continue
        # orient the edge: the read whose overlap reaches its right end is
        # extended by the other
        q_r = int(lengths[rec.q]) - rec.q_end
        t_r = int(lengths[rec.t]) - rec.t_end
        if q_r <= params.max_overhang and rec.t_start <= rec.q_start:
            u, v = rec.q, rec.t
            offset = rec.q_start - rec.t_start  # v starts at u pos offset
        elif t_r <= params.max_overhang and rec.q_start <= rec.t_start:
            u, v = rec.t, rec.q
            offset = rec.t_start - rec.q_start
        else:
            continue
        if offset <= 0:
            continue
        best = edges.get(u)
        if best is None or rec.shared > best[1]:
            rbest = redges.get(v)
            if rbest is None or rec.shared > rbest[1]:
                edges[u] = (v, rec.shared, offset)
                redges[v] = (u, rec.shared)

    # drop conflicting edges (keep mutual best)
    out_edges = {}
    for u, (v, s, off) in edges.items():
        if redges.get(v, (None, -1))[0] == u:
            out_edges[u] = (v, off)

    has_pred = {v for v, _ in out_edges.values()}
    used = set(contained)
    paths: List[List[Tuple[int, int]]] = []
    for u in sorted(out_edges):
        if u in has_pred or u in used:
            continue
        path = [(u, 0)]
        used.add(u)
        cur = u
        pos = 0
        while cur in out_edges:
            v, off = out_edges[cur]
            if v in used:
                break
            pos += off
            path.append((v, pos))
            used.add(v)
            cur = v
        paths.append(path)

    singletons = [i for i in range(n) if i not in used]
    return LayoutResult(paths=paths, contained=sorted(contained), singletons=singletons)


def stitch_path(
    path: List[Tuple[int, int]], reads: List[np.ndarray]
) -> np.ndarray:
    """Concatenate a layout path at its stitch offsets (consensus-free)."""
    if len(path) == 1:
        return reads[path[0][0]]
    end = max(off + len(reads[rid]) for rid, off in path)
    out = np.full(end, 4, np.uint8)
    # later reads overwrite earlier ones in their overlap — with corrected
    # reads the bases agree except at residual errors
    for rid, off in path:
        r = reads[rid]
        out[off : off + len(r)] = r
    return out
