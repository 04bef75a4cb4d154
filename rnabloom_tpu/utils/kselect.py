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
    ccfg = CountingConfig(size_log2=sketch_log2, num_hash=2, scratch_log2=18)
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
    c = np.asarray(counts[:-1])
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
