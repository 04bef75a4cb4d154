"""Alignment-adjacent utilities: banded edit distance, intervals, HPC.

Host-side equivalents of SeqUtils.getPercentIdentity (banded edit distance,
SeqUtils.java:164-272), homopolymer compression (:962), and IntervalUtils
(merge/overlap/dovetail predicates).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def banded_edit_distance(a: np.ndarray, b: np.ndarray, band: Optional[int] = None) -> int:
    """Levenshtein distance within a diagonal band (O(n*band))."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    if band is None:
        band = max(abs(n - m) + 8, (max(n, m) // 10) + 1)
    band = max(band, abs(n - m) + 1)
    INF = n + m + 1
    # rows indexed by diagonal offset j - i in [-band, band]
    prev = np.full(2 * band + 1, INF, np.int32)
    for off in range(0, band + 1):  # row 0: distance to b[:j] is j
        if off <= m:
            prev[band + off] = off
    for i in range(1, n + 1):
        cur = np.full(2 * band + 1, INF, np.int32)
        lo = max(0, i - band)
        hi = min(m, i + band)
        for j in range(lo, hi + 1):
            off = j - i
            if j == 0:
                cur[band + off] = i
                continue
            sub = prev[band + off] + (a[i - 1] != b[j - 1])
            ins = cur[band + off - 1] + 1 if off - 1 >= -band else INF
            dele = prev[band + off + 1] + 1 if off + 1 <= band else INF
            cur[band + off] = min(sub, ins, dele)
        prev = cur
    off = m - n
    if abs(off) > band:
        return INF
    return int(prev[band + off])


def percent_identity(a: np.ndarray, b: np.ndarray) -> float:
    """1 - edits / max_len, via banded edit distance (SeqUtils :164-272)."""
    n, m = len(a), len(b)
    if max(n, m) == 0:
        return 0.0
    d = banded_edit_distance(a, b)
    return max(0.0, 1.0 - d / max(n, m))


def homopolymer_compress(codes: np.ndarray) -> np.ndarray:
    """Collapse homopolymer runs to single bases (SeqUtils :962)."""
    if len(codes) == 0:
        return codes
    keep = np.concatenate(([True], codes[1:] != codes[:-1]))
    return codes[keep]


# ---------------------------------------------------------------------------
# Interval utilities (IntervalUtils.java)
# ---------------------------------------------------------------------------


def overlaps(a: Tuple[int, int], b: Tuple[int, int]) -> bool:
    return a[0] < b[1] and b[0] < a[1]


def overlap_size(a: Tuple[int, int], b: Tuple[int, int]) -> int:
    return max(0, min(a[1], b[1]) - max(a[0], b[0]))


def merge_intervals(intervals: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    if not intervals:
        return []
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def is_dovetail(
    a: Tuple[int, int], a_len: int, b: Tuple[int, int], b_len: int, max_overhang: int
) -> bool:
    """a's suffix overlaps b's prefix (or vice versa) within the overhang."""
    return (a_len - a[1] <= max_overhang and b[0] <= max_overhang) or (
        b_len - b[1] <= max_overhang and a[0] <= max_overhang
    )
