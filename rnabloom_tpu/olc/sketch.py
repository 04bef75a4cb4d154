"""Bottom sketches: containment and resemblance estimates.

Maps the reference's bottom-sketch machinery (GraphUtils.java:2787-2977:
getBottomSketch / getContainment / getResemblance), used by the legacy
clustering path to decide whether two long reads belong to the same
transcript cluster without a full overlap.  A bottom sketch is the ``s``
numerically smallest canonical ntHash values of a sequence's k-mers;
containment(A in B) ~= |sketch_s(A) ∩ hashes(B)| / s, and
resemblance(A, B) ~= |sketch_s(A ∪ B) ∩ sketch_s(A) ∩ sketch_s(B)| / s
(MinHash bottom-s estimators of |A∩B|/|A| and Jaccard).

Hashing is batched on device (one dispatch per padded length bucket);
sketch selection is a host partial sort.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def _kmer_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Canonical u64 ntHash of every k-mer (host array of one sequence)."""
    import jax.numpy as jnp

    from ..graph import dbg
    from ..bloom.filters import BloomConfig, CountingConfig

    cfg = dbg.GraphConfig(
        k=k, stranded=False, dbgbf=BloomConfig(8, 1),
        cbf=CountingConfig(8, 1, 8), pkbf=None,
    )
    arr = jnp.asarray(codes[None, :])
    _, _, base, valid = dbg.seq_hashes(cfg, arr)
    lo = np.asarray(base.lo)[0].astype(np.uint64)
    hi = np.asarray(base.hi)[0].astype(np.uint64)
    v = np.asarray(valid)[0]
    return ((hi << np.uint64(32)) | lo)[v]


def bottom_sketches(
    reads: Sequence[np.ndarray], k: int, s: int = 200
) -> List[np.ndarray]:
    """Per read: sorted array of its ``s`` smallest distinct k-mer hashes.

    Reads are bucketed by padded length so each distinct device shape
    compiles once (same trick as the subsampler's hash batching).
    """
    import jax.numpy as jnp

    from ..graph import dbg
    from ..bloom.filters import BloomConfig, CountingConfig

    cfg = dbg.GraphConfig(
        k=k, stranded=False, dbgbf=BloomConfig(8, 1),
        cbf=CountingConfig(8, 1, 8), pkbf=None,
    )
    out: List[np.ndarray] = [np.empty(0, np.uint64)] * len(reads)
    buckets: dict = {}
    for i, r in enumerate(reads):
        if len(r) < k:
            continue
        L = 1 << max(6, (len(r) - 1).bit_length())
        buckets.setdefault(L, []).append(i)
    for L, idxs in buckets.items():
        for start in range(0, len(idxs), 256):
            chunk = idxs[start : start + 256]
            batch = np.full((len(chunk), L), 4, np.uint8)
            for j, i in enumerate(chunk):
                batch[j, : len(reads[i])] = reads[i]
            _, _, base, valid = dbg.seq_hashes(cfg, jnp.asarray(batch))
            lo = np.asarray(base.lo).astype(np.uint64)
            hi = np.asarray(base.hi).astype(np.uint64)
            v = np.asarray(valid)
            h = (hi << np.uint64(32)) | lo
            for j, i in enumerate(chunk):
                hs = np.unique(h[j][v[j]])
                out[i] = hs[:s] if len(hs) > s else hs
    return out


def containment(sketch_a: np.ndarray, hashes_b: np.ndarray) -> float:
    """|sketch(A) ∩ k-mers(B)| / |sketch(A)| (getContainment :2787)."""
    if len(sketch_a) == 0:
        return 0.0
    inter = np.isin(sketch_a, hashes_b, assume_unique=False).sum()
    return float(inter) / len(sketch_a)


def resemblance(sketch_a: np.ndarray, sketch_b: np.ndarray, s: int = 200) -> float:
    """Bottom-s MinHash Jaccard estimate (getResemblance :2900)."""
    if len(sketch_a) == 0 or len(sketch_b) == 0:
        return 0.0
    merged = np.union1d(sketch_a, sketch_b)[:s]
    inter = np.intersect1d(sketch_a, sketch_b, assume_unique=True)
    shared = np.isin(merged, inter, assume_unique=False).sum()
    return float(shared) / min(s, len(merged))


def containment_clusters(
    reads: Sequence[np.ndarray],
    k: int,
    s: int = 200,
    min_containment: float = 0.5,
) -> List[List[int]]:
    """Greedy sketch-containment clustering (the legacy ContainmentCalculator
    flow, RNABloom.java:2719-2838): reads sorted longest-first; each read
    joins the first existing cluster whose representative's sketch it is
    contained in, else founds a new cluster."""
    order = sorted(range(len(reads)), key=lambda i: -len(reads[i]))
    sketches = bottom_sketches(reads, k, s)
    full = [None] * len(reads)  # representative's full hash set, lazily
    reps: List[int] = []
    clusters: List[List[int]] = []
    assign: List[List[int]] = []
    for i in order:
        if len(reads[i]) < k:
            continue
        placed = False
        for c, rep in enumerate(reps):
            if full[rep] is None:
                full[rep] = _kmer_hashes(reads[rep], k)
            if containment(sketches[i], full[rep]) >= min_containment:
                clusters[c].append(i)
                placed = True
                break
        if not placed:
            reps.append(i)
            clusters.append([i])
    return clusters
