"""Assembly artifact detection and trimming.

Host-side equivalents of the reference's artifact family (GraphUtils):
  * reverse-complement / hairpin artifacts: a sequence whose tail is the
    reverse complement of its head (template switching during library prep)
    — trimReverseComplementArtifact :7762/:7918/:8588 + hairpin trimming
    :8059-8304.  The reference aligns the sequence to its own revcomp with
    banded percent identity; here the fold point is located with exact
    seed matching plus a mismatch-tolerant extension.
  * chimeras: both halves were previously assembled separately but the
    junction has no support — isChimera :7674; detected from the screening
    filter's seen-k-mer profile.
  * low-complexity: 1/2/3-mer frequency dominance (SeqUtils
    isLowComplexity2 :370-683 family).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _revcomp(codes: np.ndarray) -> np.ndarray:
    return (3 - codes[::-1]).astype(codes.dtype)


def find_rc_fold(codes: np.ndarray, seed: int = 16, max_mismatch_frac: float = 0.1) -> Optional[int]:
    """Detect a self-revcomp fold: suffix == rc(prefix).

    Returns the fold midpoint (trim position) or None.  Seeds on the last
    ``seed`` bases: finds rc(tail seed) in the head region, then verifies
    the implied palindromic overlap with a mismatch budget.
    """
    n = len(codes)
    if n < 2 * seed:
        return None
    tail = codes[n - seed :]
    probe = _revcomp(tail)
    # search for probe in the first half
    half = n // 2 + seed
    hay = codes[:half]
    if len(hay) < seed:
        return None
    win = np.lib.stride_tricks.sliding_window_view(hay, seed)
    hits = np.flatnonzero((win == probe).all(axis=1))
    if len(hits) == 0:
        return None
    p = int(hits[0])
    # implied arm length: sequence[p:] folds back onto itself
    arm = (n - p) // 2
    a = codes[p : p + arm]
    b = _revcomp(codes[n - arm : n])
    mism = int((a != b).sum())
    if arm >= seed and mism <= max(1, int(arm * max_mismatch_frac)):
        return p + arm  # keep [0, fold)
    return None


def trim_rc_artifact(codes: np.ndarray) -> np.ndarray:
    """Trim the folded-back arm if the sequence is a self-revcomp artifact."""
    fold = find_rc_fold(codes)
    if fold is None:
        return codes
    return codes[:fold]


def is_chimera(seen: np.ndarray, valid: np.ndarray, k: int, min_arm: int = 10) -> bool:
    """Chimera signature over a screening-filter profile of a sequence's
    k-mers: a long fully-seen head arm and a long fully-seen tail arm
    separated by a short unseen junction (isChimera :7674).
    """
    n = len(seen)
    idx = np.flatnonzero(valid)
    if len(idx) < 2 * min_arm + 1:
        return False
    s = seen[idx]
    unseen = np.flatnonzero(~s)
    if len(unseen) == 0 or len(unseen) >= k:
        return False
    lo, hi = unseen[0], unseen[-1]
    if hi - lo + 1 != len(unseen):
        return False  # unseen k-mers are not one contiguous junction
    return lo >= min_arm and (len(s) - hi - 1) >= min_arm


def template_switch_tip(
    seen: np.ndarray, valid: np.ndarray, k: int, min_tip: int = 3
) -> Optional[Tuple[int, int]]:
    """K-mer range of the unassembled tip if the seen-profile matches the
    template-switch signature (isTemplateSwitch :8434 / isTemplateSwitch2
    :8305): one end previously assembled, the other end an unassembled tip
    whose reverse complement may echo the assembled backbone.  The k-mers
    adjacent to the junction (the fold-back loop, up to k of them) are
    excluded from the tip.  Returns None when the profile doesn't match;
    the caller must still check the tip's revcomp against the screen.
    """
    idx = np.flatnonzero(valid)
    n = len(idx)
    if n < min_tip + 2:
        return None
    s = seen[idx]
    if s[-1] and not s[0]:
        # unassembled prefix tip (isTemplateSwitch2; loop slack 2k)
        j = int(np.flatnonzero(~s)[-1]) + 1  # assembled suffix = [j, n)
        tip_end = max(j - 2 * k, 0)
        if tip_end >= min_tip and (~s[:j]).mean() >= 0.5:
            return int(idx[0]), int(idx[tip_end - 1]) + 1
        return None
    if s[0] and not s[-1]:
        # unassembled suffix tip (isTemplateSwitch; loop slack k)
        i = int(np.flatnonzero(~s)[0])  # assembled prefix = [0, i)
        tip_start = min(i + k, n)
        if n - tip_start >= min_tip and (~s[tip_start:]).mean() >= 0.5:
            return int(idx[tip_start]), int(idx[-1]) + 1
    return None


def is_blunt_end_artifact(
    seen: np.ndarray,
    valid: np.ndarray,
    counts: np.ndarray,
    d: int,
    max_depth: int,
) -> bool:
    """Blunt-end artifact signature (isBluntEndArtifact :8535-8585).

    A mostly previously-assembled sequence with a short (< read-pair
    distance) unassembled, lower-coverage stub at one end.  The reference
    additionally verifies the stub is a graph dead end while an assembled
    alternate continuation exists (hasDepth probes) — omitted here, with the
    short-stub requirement making the check conservative.
    """
    idx = np.flatnonzero(valid)
    if len(idx) < 3 or max_depth <= 0:
        return False
    s = seen[idx]
    c = counts[idx]
    n = len(s)
    edge = min(max_depth, n)
    left_cov = c[:edge].min()
    right_cov = c[-edge:].min()

    def med(x):
        return float(np.median(x)) if len(x) else 0.0

    if s[0] and (not s[-1] or left_cov > right_cov):
        i = int(np.flatnonzero(~s)[0]) if not s.all() else n
        if i == n or i < n - d:
            return False
        return med(c[:i]) > med(c[i:])
    if s[-1] and (not s[0] or left_cov < right_cov):
        if s.all():
            return False
        j = int(np.flatnonzero(~s)[-1])
        if j > d:
            return False
        return med(c[j + 1 :]) > med(c[: j + 1])
    return False


def is_low_complexity(codes: np.ndarray, max_frac: float = 0.8) -> bool:
    """Dominated by one base, one 2-mer pattern, or one 3-mer pattern."""
    n = len(codes)
    if n == 0:
        return True
    counts = np.bincount(codes[codes < 4], minlength=4)
    total = max(counts.sum(), 1)
    if counts.max() / total >= max_frac:
        return True
    for p in (2, 3):
        if n < 2 * p:
            continue
        # fraction of positions repeating with period p
        rep = (codes[p:] == codes[:-p]).mean()
        if rep >= max_frac:
            return True
    return False


def extract_non_low_complexity_segments(
    codes: np.ndarray, window: int = 64, max_frac: float = 0.8, min_len: int = 1
) -> List[Tuple[int, int]]:
    """Base ranges whose local windows are not low-complexity
    (trimLowComplexityRegions / extractNonLowComplexitySegments)."""
    n = len(codes)
    if n == 0:
        return []
    bad = np.zeros(n, bool)
    for s in range(0, n, window // 2):
        w = codes[s : s + window]
        if len(w) >= window // 2 and is_low_complexity(w, max_frac):
            bad[s : s + window] = True
    segs = []
    start = None
    for i in range(n):
        if not bad[i]:
            if start is None:
                start = i
        else:
            if start is not None and i - start >= min_len:
                segs.append((start, i))
            start = None
    if start is not None and n - start >= min_len:
        segs.append((start, n))
    return segs
