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
    extract_minimizers_reads,
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
    from .overlap import (
        KIND_Q_CONTAINED, KIND_T_CONTAINED, Overlaps, classify_batch,
    )

    n = len(lengths)
    bin_size = 100
    need_depth = min_seq_depth > 1
    contained_by: Dict[int, int] = {}
    depth = [None] * n  # per-read interior coverage histograms

    if isinstance(records, Overlaps):
        ov = records
        kinds = classify_batch(ov, np.asarray(lengths), params)
        ev = np.flatnonzero((kinds == KIND_Q_CONTAINED) | (kinds == KIND_T_CONTAINED))
        is_q = kinds[ev] == KIND_Q_CONTAINED
        reads_ev = np.where(is_q, ov.q[ev], ov.t[ev])
        partners = np.where(is_q, ov.t[ev], ov.q[ev])
        # first containment record per read wins (record order)
        uniq_r, first_idx = np.unique(reads_ev, return_index=True)
        contained_by = dict(
            zip(uniq_r.tolist(), partners[first_idx].tolist())
        )
        if need_depth and len(ov):
            # range-add via +1/-1 difference marks + one global cumsum:
            # every read gets (bins + 1) slots, so each event's -1 lands in
            # its own read's range and nothing carries across reads
            bins = np.maximum(np.asarray(lengths, np.int64), 1) // bin_size + 1
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(bins + 1, out=offs[1:])
            acc = np.zeros(offs[-1] + 1, np.int32)
            for side_r, s0, e0 in (
                (ov.q, ov.q_start, ov.q_end),
                (ov.t, ov.t_start, ov.t_end),
            ):
                start = offs[side_r] + s0 // bin_size
                stop = offs[side_r] + np.minimum(
                    e0 // bin_size + 1, bins[side_r]
                )
                np.add.at(acc, start, 1)
                np.add.at(acc, stop, -1)
            flat = np.cumsum(acc)
            depth = [flat[offs[r] : offs[r] + bins[r]] for r in range(n)]
    else:
        def hist(r: int) -> np.ndarray:
            h = depth[r]
            if h is None:
                h = np.zeros(max(int(lengths[r]), 1) // bin_size + 1, np.int32)
                depth[r] = h
            return h

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
    mins = extract_minimizers_reads(reads, k, params.w)
    overlaps = find_overlaps(mins, params)
    g, contained = build_graph(overlaps, mins.lengths, params)
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
    seed_indices: Optional[Sequence[int]] = None,
    external_overlaps=None,
) -> UniqueOLCResult:
    """Full internal uniqueOLC: unique reads -> unitigs -> polish ->
    greedy transcript layout.

    ``seed_indices``: run the unique-extraction/unitig steps over this
    subset only (the -lrsub seed reads; RNABloom.java:7424 passes the
    seed FASTA as uniqueOLC's input while ALL corrected reads are still
    mapped for polish and counts).

    ``external_overlaps``: precomputed ava overlap set (an interop PAF
    read back through io.paf.paf_to_overlaps) used for unique extraction
    instead of the internal minimizer engine (ignored when seeding)."""
    params = params or OverlapParams()
    if not reads:
        return UniqueOLCResult([], [])
    all_mins = extract_minimizers_reads(reads, k, params.w)
    lens = all_mins.lengths

    # 1. unique-read extraction (over the seeds when subsampling)
    if seed_indices is not None:
        sub = list(seed_indices)
        s_mins = extract_minimizers_reads([reads[i] for i in sub], k, params.w)
        s_lens = s_mins.lengths
        s_polya = [polya_flags[i] for i in sub] if polya_flags is not None else None
        overlaps = find_overlaps(s_mins, params)
        kept_sub = extract_unique(overlaps, s_lens, params, min_seq_depth, s_polya)
        kept = [sub[i] for i in kept_sub] or sub
    else:
        # external ava overlaps (e.g. minimap2 PAF via io.paf.paf_to_overlaps)
        # stand in for the internal engine in the unique-extraction step —
        # the reference's overlap source (olc/OverlapLayoutConsensus.java:78-106)
        overlaps = (
            external_overlaps if external_overlaps is not None
            else find_overlaps(all_mins, params)
        )
        kept = extract_unique(overlaps, lens, params, min_seq_depth, polya_flags)
        if not kept:
            kept = list(range(len(reads)))
    unique_reads = [reads[i] for i in kept]

    # 2. unitigs over unique reads
    unitigs, _, _ = layout_unitigs(unique_reads, k, params)
    if not unitigs:
        return UniqueOLCResult([], [], n_unique=len(kept))

    # 3. map ALL reads to unitigs
    umins = extract_minimizers_reads(unitigs, k, params.w)
    placements = cns.place_reads(all_mins, umins, lens, params)

    # 4. polish
    polished = cns.polish(unitigs, reads, placements, min_depth=polish_min_depth)

    # 5. greedy layout over polished unitigs
    return _greedy_transcripts(
        polished, placements, k, params, sample_lengths, polya_finder,
        n_unique=len(kept), n_unitigs=len(unitigs),
    )


def cluster_reads(
    records: Sequence[OverlapRecord], n_reads: int
) -> List[List[int]]:
    """Overlap-connected read clusters via union-find
    (Layout.ReadClusters3 :1145 — the legacy clustered long-read path
    groups reads by overlap connectivity before per-cluster assembly)."""
    parent = list(range(n_reads))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for rec in records:
        a, b = find(rec.q), find(rec.t)
        if a != b:
            parent[b] = a
    groups: Dict[int, List[int]] = {}
    for r in range(n_reads):
        groups.setdefault(find(r), []).append(r)
    return sorted(groups.values(), key=len, reverse=True)


def ava_clustered_olc(
    reads: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
    max_cluster: int = 5000,
    hpc: bool = False,
    sketch_cluster: bool = False,
) -> List[np.ndarray]:
    """Legacy clustered assembly (avaClusteredOLC,
    olc/OverlapLayoutConsensus.java:1230): all-vs-all overlaps, cluster by
    connectivity, then per-cluster junction-resolved greedy layout.
    Superseded by unique_olc in the current pipeline; kept for parity with
    the reference's alternate flow.

    ``hpc`` (-hpc): cluster membership is decided on homopolymer-compressed
    minimizers (the reference's HPC clustering option); layout coordinates
    still come from raw-read overlaps.  ``sketch_cluster``: membership via
    bottom-sketch containment against cluster representatives instead of
    overlap connectivity (ContainmentCalculator, RNABloom.java:2719-2838)."""
    params = params or OverlapParams()
    if not reads:
        return []
    mins = extract_minimizers_reads(reads, k, params.w)
    lens = mins.lengths
    records = find_overlaps(mins, params)
    by_pair: Dict[Tuple[int, int], List[OverlapRecord]] = {}
    for rec in records:
        by_pair.setdefault((rec.q, rec.t), []).append(rec)

    if sketch_cluster:
        from . import sketch as sketchmod

        clusters = sketchmod.containment_clusters(reads, k)
    else:
        cluster_records = records
        if hpc:
            from ..utils import align as alignutils

            hpc_reads = [alignutils.homopolymer_compress(np.asarray(r)) for r in reads]
            hmins = extract_minimizers_reads(hpc_reads, k, params.w)
            cluster_records = find_overlaps(hmins, params)
        clusters = cluster_reads(cluster_records, len(reads))

    out: List[np.ndarray] = []
    for cluster in clusters:
        if len(cluster) == 1:
            out.append(np.array(reads[cluster[0]], np.uint8))
            continue
        cset = set(cluster[:max_cluster])
        recs = [r for r in records if r.q in cset and r.t in cset]
        g, contained = build_graph(recs, lens, params)
        g.remove_redundant_nodes()
        g.remove_transitive_edges(fuzz=params.diag_band)
        g.resolve_junctions()
        in_graph = set()
        for path in g.simple_paths():
            out.append(stitch_path(path, reads))
            in_graph.update(vread(v) for v, _ in path)
        for r in cluster:
            if r not in in_graph and r not in contained:
                out.append(np.array(reads[r], np.uint8))
    return out


def layout_backbones(
    reads: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
) -> List[np.ndarray]:
    """Backbone layout (Layout.layoutBackbones, olc/Layout.java:4060-4309):
    contained reads are dropped, junctions resolved (no transitive
    reduction), and unambiguous dovetail chains assembled into backbones;
    reads with no dovetail overlaps pass through unchanged."""
    params = params or OverlapParams()
    if not reads:
        return []
    mins = extract_minimizers_reads(reads, k, params.w)
    records = find_overlaps(mins, params)
    g, contained = build_graph(records, mins.lengths, params)
    g.resolve_junctions()
    out: List[np.ndarray] = []
    in_graph: Set[int] = set()
    for path in g.simple_paths():
        out.append(stitch_path(path, reads))
        in_graph.update(vread(v) for v, _ in path)
    for r in range(len(reads)):
        if r not in in_graph and r not in contained:
            out.append(np.array(reads[r], np.uint8))
    return out


def trim_split_by_read_depth(
    targets: Sequence[np.ndarray],
    reads: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
    min_depth: int = 2,
    min_len: int = 200,
) -> List[np.ndarray]:
    """Trim/split assembled sequences where mapped-read depth is too low
    (OverlapLayoutConsensus.trimSplitByReadDepth :176): reads are mapped
    back to the targets, a pileup depth profile is computed on device, and
    each target is cut into its >= min_depth segments."""
    params = params or OverlapParams()
    if not targets:
        return []
    tmins = extract_minimizers_reads(targets, k, params.w)
    rmins = extract_minimizers_reads(reads, k, params.w)
    placements = cns.place_reads(rmins, tmins, rmins.lengths, params)

    depth = [np.zeros(len(t), np.int32) for t in targets]
    for p in placements:
        d = depth[p.target]
        s = max(p.t_start, 0)
        e = min(p.t_end, len(d))
        if e > s:
            d[s:e] += 1

    out: List[np.ndarray] = []
    for t, d in zip(targets, depth):
        ok = d >= min_depth
        if not ok.any():
            continue
        padded = np.concatenate(([False], ok, [False]))
        delta = np.diff(padded.astype(np.int8))
        for s, e in zip(np.flatnonzero(delta == 1), np.flatnonzero(delta == -1)):
            if e - s >= min_len:
                out.append(np.array(t[s:e], np.uint8))
    return out


def overlap_layout_consensus(
    reads: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
    polish_rounds: int = 1,
) -> List[np.ndarray]:
    """Basic OLC flow (overlapLayoutConsensus,
    olc/OverlapLayoutConsensus.java:915; ``polish_rounds=2`` mirrors
    overlapLayoutConsensus2 :956): one all-vs-all overlap pass, unitig
    layout, then N pileup-polish rounds with all reads mapped back."""
    params = params or OverlapParams()
    if not reads:
        return []
    layouts, _, _ = layout_unitigs(reads, k, params)
    if not layouts:
        return [np.array(r, np.uint8) for r in reads]
    all_mins = extract_minimizers_reads(reads, k, params.w)
    for _ in range(max(polish_rounds, 1)):
        umins = extract_minimizers_reads(layouts, k, params.w)
        placements = cns.place_reads(all_mins, umins, all_mins.lengths, params)
        layouts = cns.polish(layouts, reads, placements, min_depth=1)
    return layouts


def map_clustered_olc(
    reads: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
    min_cluster: int = 1,
) -> List[np.ndarray]:
    """Mapping-based clustered assembly (mapClusteredOLC,
    olc/OverlapLayoutConsensus.java:1336): unique seed extraction, all
    reads mapped onto the seeds, reads grouped by best seed, per-cluster
    junction-resolved layout (the per-cluster `<id>.DONE` orchestration of
    the reference collapses into one in-process loop)."""
    params = params or OverlapParams()
    if not reads:
        return []
    mins = extract_minimizers_reads(reads, k, params.w)
    lens = mins.lengths
    overlaps = find_overlaps(mins, params)
    seeds = extract_unique(overlaps, lens, params, 1, None)
    if not seeds:
        seeds = list(range(len(reads)))
    smins = extract_minimizers_reads([reads[i] for i in seeds], k, params.w)
    placements = cns.place_reads(mins, smins, lens, params)

    best_shared: Dict[int, int] = {}
    best_seed: Dict[int, int] = {}
    for pl in placements:
        span = pl.q_end - pl.q_start
        if span > best_shared.get(pl.read, 0):
            best_shared[pl.read] = span
            best_seed[pl.read] = pl.target
    clusters: Dict[int, List[int]] = {}
    for r in range(len(reads)):
        clusters.setdefault(best_seed.get(r, -1), []).append(r)

    out: List[np.ndarray] = []
    for sid, members in sorted(clusters.items(), key=lambda kv: -len(kv[1])):
        if sid < 0 or len(members) < min_cluster:
            out.extend(np.array(reads[r], np.uint8) for r in members)
            continue
        out.extend(ava_clustered_olc([reads[r] for r in members], k, params))
    return out


def seeded_unique_olc(
    reads: Sequence[np.ndarray],
    seeds: Sequence[np.ndarray],
    k: int,
    params: Optional[OverlapParams] = None,
    sample_lengths: Optional[np.ndarray] = None,
    min_seq_depth: int = 2,
    polish_min_depth: int = 2,
    polya_finder=None,
) -> UniqueOLCResult:
    """Seed-based assembly (seededUniqueOLC,
    olc/OverlapLayoutConsensus.java:1025): subsampled seed reads are
    collapsed by overlap layout, trimmed/split where full-read-set mapping
    depth is insufficient, re-laid-out into unitigs, then polished and
    greedily extended exactly like uniqueOLC steps 3-5."""
    params = params or OverlapParams()
    if not reads or not seeds:
        return UniqueOLCResult([], [])

    # 0. collapse the seeds by overlap layout
    seed_unitigs, _, _ = layout_unitigs(seeds, k, params)
    if not seed_unitigs:
        return UniqueOLCResult([], [])

    # 1-2. cut seed unitigs where read-mapping depth is too low
    cut = trim_split_by_read_depth(
        seed_unitigs, reads, k, params, min_depth=min_seq_depth, min_len=2 * k
    )
    if not cut:
        cut = seed_unitigs

    # 3. unitigs over the cut sequences
    unitigs, _, _ = layout_unitigs(cut, k, params)
    if not unitigs:
        return UniqueOLCResult([], [])

    # 4-5. map all reads, polish, greedy layout (shared with unique_olc)
    all_mins = extract_minimizers_reads(reads, k, params.w)
    umins = extract_minimizers_reads(unitigs, k, params.w)
    placements = cns.place_reads(all_mins, umins, all_mins.lengths, params)
    polished = cns.polish(unitigs, reads, placements, min_depth=polish_min_depth)
    return _greedy_transcripts(
        polished, placements, k, params, sample_lengths, polya_finder,
        n_unique=len(seeds), n_unitigs=len(unitigs),
    )


def _greedy_transcripts(
    polished: Sequence[np.ndarray],
    placements,
    k: int,
    params: OverlapParams,
    sample_lengths: Optional[np.ndarray],
    polya_finder,
    n_unique: int = 0,
    n_unitigs: int = 0,
) -> UniqueOLCResult:
    """Step 5 of uniqueOLC: overlap the polished unitigs and extract
    binomial-filtered greedy max-weight paths."""
    pmins = extract_minimizers_reads(polished, k, params.w)
    plens = pmins.lengths
    p_overlaps = find_overlaps(pmins, params)
    g, p_contained = build_graph(p_overlaps, plens, params)
    g.remove_redundant_nodes()
    g.remove_transitive_edges(fuzz=params.diag_band)
    if polya_finder is not None:
        g.prune_polya([polya_finder(u) for u in polished])
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
    for u in range(len(polished)):
        if u not in in_graph and u not in p_contained:
            transcripts.append(np.array(polished[u], np.uint8))
            counts.append(read_counts.get(u, 0.0))
    return UniqueOLCResult(
        transcripts=transcripts, counts=counts,
        n_unique=n_unique, n_unitigs=n_unitigs, n_paths=len(greedy),
    )
