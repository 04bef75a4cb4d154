"""Overlap-layout orchestration: the internal uniqueOLC flow.

Maps olc/OverlapLayoutConsensus.uniqueOLC (:1129-1228), the reference's
long-read stage 3, without external binaries:

  1. all-vs-all overlap + unique-read extraction
     (overlapWithMinimapAndExtractUnique :108, extractUniqueFromOverlaps
     Layout.java:1642 — containment + interior-depth screen)
  2. overlap unique reads -> unitigs (overlapWithMinimapAndLayoutSimple
     :500, extractSimplePaths Layout.java:3349)
  3. map all reads to unitigs (mapWithMinimapFiltered :661)
  4. polish unitigs by pileup consensus (consensusWithRacon :849 -> see
     olc/consensus.py)
  5. overlap polished unitigs, prune with poly-A + binomial edge filter,
     lay out greedy max-weight paths (overlapWithMinimapAndLayoutGreedy
     :566, extractGreedyPaths Layout.java:3726)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from . import consensus as cns
from .graph import OverlapGraph, build_graph, vid, vrc, vread
from .overlap import (
    Minimizers,
    OverlapParams,
    OverlapRecord,
    classify,
    extract_minimizers,
    find_overlaps,
    oriented_t_coords,
)

_RC = np.array([3, 2, 1, 0, 4], np.uint8)


@dataclass
class UniqueOLCResult:
    transcripts: List[np.ndarray]  # 2-bit codes
    counts: List[float]  # length-normalized read support per transcript
    n_unique: int = 0
    n_unitigs: int = 0
    n_paths: int = 0


def _pad_batch(reads: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    L = max((len(r) for r in reads), default=1)
    codes = np.full((len(reads), max(L, 1)), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
        lens[i] = len(r)
    return codes, lens


def extract_unique(
    records: Sequence[OverlapRecord],
    lengths: np.ndarray,
    params: OverlapParams,
    min_seq_depth: int = 1,
    polya_flags: Optional[Sequence[bool]] = None,
) -> List[int]:
    """Reads that survive containment removal and the interior-depth screen.

    A read is contained when another read covers it end to end within
    max_overhang; contained reads carrying a poly-A tail are kept when
    their container has none (the reference's polyAInfoMap special case,
    Layout.java findContainedTargetOverlaps overloads).  With
    min_seq_depth > 1, reads whose interior is not covered by at least
    min_seq_depth-1 overlapping reads are dropped as unsupported.
    """
    n = len(lengths)
    contained_by: Dict[int, int] = {}
    bin_size = 100
    depth = [None] * n  # lazy per-read interior coverage histograms

    def hist(r: int) -> np.ndarray:
        h = depth[r]
        if h is None:
            h = np.zeros(max(int(lengths[r]), 1) // bin_size + 1, np.int32)
            depth[r] = h
        return h

    need_depth = min_seq_depth > 1
    for rec in records:
        q_len, t_len = int(lengths[rec.q]), int(lengths[rec.t])
        kind = classify(rec, q_len, t_len, params)
        if kind == "q_contained" and rec.q not in contained_by:
            contained_by[rec.q] = rec.t
        elif kind == "t_contained" and rec.t not in contained_by:
            contained_by[rec.t] = rec.q
        if need_depth:
            hist(rec.q)[rec.q_start // bin_size : rec.q_end // bin_size + 1] += 1
            hist(rec.t)[rec.t_start // bin_size : rec.t_end // bin_size + 1] += 1

    kept: List[int] = []
    for r in range(n):
        container = contained_by.get(r)
        if container is not None:
            if polya_flags is None or not polya_flags[r] or polya_flags[container]:
                continue
        if need_depth:
            h = depth[r]
            clip_bins = params.max_overhang // bin_size + 1
            interior = (
                h[clip_bins:-clip_bins] if h is not None and len(h) > 2 * clip_bins
                else (h if h is not None else np.zeros(1, np.int32))
            )
            if interior.size and int(interior.min()) < min_seq_depth - 1:
                continue
        kept.append(r)
    return kept


def stitch_path(
    path: List[Tuple[int, int]], reads: Sequence[np.ndarray]
) -> np.ndarray:
    """Overlay a layout path of (oriented vid, stitch offset)."""
    if len(path) == 1:
        v, _ = path[0]
        r = reads[vread(v)]
        return _RC[r[::-1]] if v & 1 else np.array(r, np.uint8)
    end = max(off + len(reads[vread(v)]) for v, off in path)
    out = np.full(end, 4, np.uint8)
    # later reads overwrite earlier ones in their overlap — reads are
    # graph-corrected upstream so the bases agree except residual errors
    for v, off in path:
        r = reads[vread(v)]
        if v & 1:
            r = _RC[r[::-1]]
        out[off : off + len(r)] = r
    return out


def layout_unitigs(
    reads: Sequence[np.ndarray],
    k: int,
    params: OverlapParams,
) -> Tuple[List[np.ndarray], List[List[Tuple[int, int]]], Set[int]]:
    """Unitigs (maximal unambiguous chains) over a read set.
    Returns (unitig codes, paths, contained read ids)."""
    codes, lens = _pad_batch(reads)
    mins = extract_minimizers(codes, lens, k, params.w)
    overlaps = find_overlaps(mins, params)
    g, contained = build_graph(overlaps, lens, params)
    g.remove_redundant_nodes()
    g.remove_transitive_edges(fuzz=params.diag_band)
    paths = g.simple_paths()
    in_graph = {vread(v) for v in g.vertices()}
    unitigs = [stitch_path(p, reads) for p in paths]
    # reads with no dovetails and not contained pass through as unitigs
    for r in range(len(reads)):
        if r not in in_graph and r not in contained:
            unitigs.append(np.array(reads[r], np.uint8))
            paths.append([(vid(r, 0), 0)])
    return unitigs, paths, contained


def unique_olc(
    reads: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
    polya_flags: Optional[Sequence[bool]] = None,
    sample_lengths: Optional[np.ndarray] = None,
    min_seq_depth: int = 1,
    polish_min_depth: int = 2,
    polya_finder=None,
) -> UniqueOLCResult:
    """Full internal uniqueOLC: unique reads -> unitigs -> polish ->
    greedy transcript layout."""
    params = params or OverlapParams()
    if not reads:
        return UniqueOLCResult([], [])
    codes, lens = _pad_batch(reads)
    all_mins = extract_minimizers(codes, lens, k, params.w)

    # 1. unique-read extraction
    overlaps = find_overlaps(all_mins, params)
    kept = extract_unique(overlaps, lens, params, min_seq_depth, polya_flags)
    if not kept:
        kept = list(range(len(reads)))
    unique_reads = [reads[i] for i in kept]

    # 2. unitigs over unique reads
    unitigs, _, _ = layout_unitigs(unique_reads, k, params)
    if not unitigs:
        return UniqueOLCResult([], [], n_unique=len(kept))

    # 3. map ALL reads to unitigs
    ucodes, ulens = _pad_batch(unitigs)
    umins = extract_minimizers(ucodes, ulens, k, params.w)
    placements = cns.place_reads(all_mins, umins, lens, params)

    # 4. polish
    polished = cns.polish(unitigs, reads, placements, min_depth=polish_min_depth)

    # 5. greedy layout over polished unitigs
    pcodes, plens = _pad_batch(polished)
    pmins = extract_minimizers(pcodes, plens, k, params.w)
    p_overlaps = find_overlaps(pmins, params)
    g, p_contained = build_graph(p_overlaps, plens, params)
    g.remove_redundant_nodes()
    g.remove_transitive_edges(fuzz=params.diag_band)

    if polya_finder is not None:
        upolya = [
            polya_finder(polished[i]) for i in range(len(polished))
        ]
        g.prune_polya(upolya)

    read_counts = cns.normalized_read_counts(placements, plens)
    g.add_mapping_support(cns.junction_placements(placements))
    if sample_lengths is not None and len(sample_lengths):
        g.filter_edges_binomial(read_counts, np.asarray(sample_lengths))

    transcripts: List[np.ndarray] = []
    counts: List[float] = []
    in_graph = {vread(v) for v in g.vertices()}
    greedy = g.greedy_paths(read_counts)
    for path, c in greedy:
        transcripts.append(stitch_path(path, polished))
        counts.append(c)
    n_paths = len(greedy)
    for u in range(len(polished)):
        if u not in in_graph and u not in p_contained:
            transcripts.append(polished[u])
            counts.append(read_counts.get(u, 0.0))
    return UniqueOLCResult(
        transcripts=transcripts,
        counts=counts,
        n_unique=len(kept),
        n_unitigs=len(unitigs),
        n_paths=n_paths,
    )
