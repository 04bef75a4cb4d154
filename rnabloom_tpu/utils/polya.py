"""Poly-A tail / poly-T head detection and PAS motif search.

Host-side equivalent of util/PolyATailFinder.java (:55-185): seed-and-extend
scan from the sequence ends tolerating a bounded mismatch fraction, with
ONT and PacBio profiles, plus polyadenylation-signal (AATAAA-family motif)
search upstream of a detected tail.  Operates on 2-bit code arrays
(A=0 C=1 G=2 T=3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

# the 12 hexamer PAS variants recognized by the reference (AATAAA family)
PAS_MOTIFS = [
    "AATAAA", "ATTAAA", "AGTAAA", "TATAAA", "CATAAA", "GATAAA",
    "AATATA", "AATACA", "AATAGA", "AAAAAG", "ACTAAA", "AAGAAA",
]


@dataclass(frozen=True)
class PolyAProfile:
    min_length: int = 8
    max_mismatch_frac: float = 0.25  # ONT default; PacBio uses 0.1
    window: int = 50  # search window from the sequence end
    pas_window: int = 50  # PAS search range upstream of the tail


ONT = PolyAProfile()
PACBIO = PolyAProfile(max_mismatch_frac=0.1)


def _scan_tail(codes: np.ndarray, target: int, profile: PolyAProfile) -> Optional[Tuple[int, int]]:
    """Longest low-mismatch run of ``target`` ending at the 3' end region."""
    n = len(codes)
    lo = max(0, n - profile.window)
    best: Optional[Tuple[int, int]] = None
    # extend from each seed position backwards (greedy single pass from end)
    i = n - 1
    while i >= lo:
        if codes[i] != target:
            i -= 1
            continue
        end = i + 1
        j = i
        mismatches = 0
        best_start = i
        while j >= 0:
            if codes[j] != target:
                mismatches += 1
                if mismatches > max(1, int((end - j) * profile.max_mismatch_frac)):
                    break
            else:
                best_start = j
            j -= 1
        length = end - best_start
        if length >= profile.min_length:
            cand = (best_start, end)
            if best is None or (cand[1] - cand[0]) > (best[1] - best[0]):
                best = cand
        i = best_start - 1
    return best


def find_polya_tail(codes: np.ndarray, profile: PolyAProfile = ONT) -> Optional[Tuple[int, int]]:
    """(start, end) of a poly-A tail near the 3' end, or None."""
    return _scan_tail(codes, 0, profile)


def find_polyt_head(codes: np.ndarray, profile: PolyAProfile = ONT) -> Optional[Tuple[int, int]]:
    """(start, end) of a poly-T head near the 5' end (antisense tail)."""
    rc = 3 - codes[::-1]
    hit = _scan_tail(rc, 0, profile)
    if hit is None:
        return None
    n = len(codes)
    return (n - hit[1], n - hit[0])


def find_pas_positions(
    seq: str, tail_start: int, profile: PolyAProfile = ONT
) -> List[int]:
    """Positions of PAS motifs within the window upstream of the tail."""
    lo = max(0, tail_start - profile.pas_window)
    region = seq[lo:tail_start].upper()
    out = []
    for motif in PAS_MOTIFS:
        idx = region.find(motif)
        while idx >= 0:
            out.append(lo + idx)
            idx = region.find(motif, idx + 1)
    return sorted(set(out))


def orient_long_read(codes: np.ndarray, profile: PolyAProfile = ONT):
    """(oriented_codes, had_tail, flipped): flip poly-T-headed reads onto the
    sense strand; trim nothing (trimming is the caller's policy)."""
    tail = find_polya_tail(codes, profile)
    head = find_polyt_head(codes, profile)
    if head is not None and (tail is None or (head[1] - head[0]) > (tail[1] - tail[0])):
        return (3 - codes[::-1]).astype(codes.dtype), True, True
    return codes, tail is not None, False
