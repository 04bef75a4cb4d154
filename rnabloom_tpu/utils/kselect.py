"""k-mer size auto-selection from a read sample.

The reference parses k as a list/range ('25,26,30-50:5') and picks the k
maximizing the number of non-singleton unique k-mers, estimated by ntCard
(RNABloom.java:5700-5743, :6938-6974).  No external ntcard binary exists in
this environment, so the estimate comes from an internal counting sketch
over a bounded read sample — same selection criterion, internal counter.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..bloom import filters
from ..bloom.filters import CountingConfig
from ..io import fastx
from ..ops import nthash
from ..utils import seq as sequtils


def parse_k_spec(spec: str) -> List[int]:
    """'25,26,30-50:5' -> [25, 26, 30, 35, 40, 45, 50]."""
    out: List[int] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            rng, _, step = part.partition(":")
            lo, hi = rng.split("-")
            out.extend(range(int(lo), int(hi) + 1, int(step) if step else 1))
        else:
            out.append(int(part))
    return sorted(set(out))


def count_nonsingletons(
    reads: Sequence[np.ndarray], k: int, sketch_log2: int = 22
) -> Tuple[int, int]:
    """(distinct_estimate, nonsingleton_estimate) over the sample."""
    ccfg = CountingConfig(size_log2=sketch_log2, num_hash=2, scratch_log2=18,
                          merge=filters.merge_default())
    counts = filters.make_counting(ccfg)
    L = max((len(r) for r in reads), default=0)
    if L < k:
        return 0, 0
    B = 512
    for s in range(0, len(reads), B):
        chunk = reads[s : s + B]
        arr = np.full((len(chunk), L), 4, np.uint8)
        for i, r in enumerate(chunk):
            arr[i, : len(r)] = r
        fh, rh, valid = nthash.rolling_hash(jnp.asarray(arr), k, stranded=False)
        base = nthash.canonical(fh, rh)
        h = nthash.multi_hash(base, k, ccfg.num_hash)
        counts = filters.counting_increment_cm(counts, ccfg, h, valid=valid)
    c = np.asarray(counts[: ccfg.size])
    # cell-level estimates (collision-inflated equally across k values)
    distinct = int((c > 0).sum())
    nonsingleton = int((c > 1).sum())
    return distinct, nonsingleton


def select_k(paths: Sequence[str], k_values: Sequence[int], sample_size: int = 2000) -> int:
    """Pick the k maximizing non-singleton unique k-mers over a sample."""
    if len(k_values) == 1:
        return k_values[0]
    reads: List[np.ndarray] = []
    for path in paths:
        for _, s, _ in fastx.read_seqs(path):
            reads.append(sequtils.encode(s))
            if len(reads) >= sample_size:
                break
        if len(reads) >= sample_size:
            break
    best_k, best_score = k_values[0], -1
    for k in k_values:
        _, nonsingleton = count_nonsingletons(reads, k)
        if nonsingleton > best_score:
            best_k, best_score = k, nonsingleton
    return best_k


class NTCardHistogram:
    """Parser for an ntCard ``.hist`` file (util/NTCardHistogram.java:35-95).

    The file holds ``F0``/``F1`` totals and per-multiplicity unique-k-mer
    counts (``1..65535``).  Used when the user supplies a precomputed
    histogram (-nk alternative) instead of the internal sketch.
    """

    MAX_COUNT = 65535

    def __init__(self, path: str):
        self.f0 = 0  # distinct k-mers
        self.f1 = 0  # total k-mers
        self.counts = np.zeros(self.MAX_COUNT + 1, np.int64)
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 2:
                    continue
                key, val = parts
                if key == "F0":
                    self.f0 = int(val)
                elif key == "F1":
                    self.f1 = int(val)
                elif key.isdigit():
                    c = int(key)
                    if 1 <= c <= self.MAX_COUNT:
                        self.counts[c] = int(val)

    @property
    def num_unique(self) -> int:
        return self.f0

    @property
    def num_singletons(self) -> int:
        return int(self.counts[1])

    def min_cov_threshold(self, percentile: float = 0.05) -> int:
        """Smallest multiplicity c where the histogram turns upward after
        the error spike (getMinCovThreshold-style heuristic): the first
        local minimum of the count histogram."""
        c = self.counts
        for i in range(2, self.MAX_COUNT):
            if c[i] > 0 and c[i] <= c[i + 1]:
                return i
        return 2


def estimate_num_unique_kmers(
    paths: Sequence[str], k: int, sample_size: int = 10000, sketch_log2: int = 26
) -> int:
    """Distinct-k-mer estimate for Bloom sizing (replaces external ntCard;
    RNABloom.java:6986-7012 uses ntCard's F0 with getExpectedSize).

    Counts distinct k-mers of a read sample in a sketch, then scales by
    total reads / sampled reads (transcriptome k-mer counts grow roughly
    linearly until coverage saturates, so this overestimates — safe for
    sizing)."""
    ccfg = CountingConfig(size_log2=sketch_log2, num_hash=2, scratch_log2=16,
                          merge=filters.merge_default())
    sketch = filters.make_counting(ccfg)
    sampled = 0
    total = 0
    max_len = 512
    batch: List[np.ndarray] = []

    def flush(sketch, batch):
        if not batch:
            return sketch
        L = max(len(b) for b in batch)
        codes = np.full((len(batch), L), 4, np.uint8)
        for i, b in enumerate(batch):
            codes[i, : len(b)] = b
        fh, rh, valid = nthash.rolling_hash(jnp.asarray(codes), k, False)
        base = nthash.canonical(fh, rh)
        h = nthash.multi_hash(base, k, ccfg.num_hash)
        return filters.counting_increment_cm(sketch, ccfg, h, valid=valid)

    for path in paths:
        for _, s, _ in fastx.read_seqs(path):
            total += 1
            if sampled < sample_size:
                codes = sequtils.encode(s[:max_len])
                if len(codes) >= k:
                    batch.append(codes)
                    sampled += 1
                    if len(batch) == 64:
                        sketch = flush(sketch, batch)
                        batch = []
    sketch = flush(sketch, batch)
    distinct = float(jnp.sum((sketch[: ccfg.size] != 0).astype(jnp.float32)))
    if sampled == 0:
        return 0
    return int(distinct * max(total / sampled, 1.0))
