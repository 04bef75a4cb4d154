"""Batched short-read error correction (substitutions + small indels).

Mirrors the reference's coverage-threshold + variant-substitution scheme
(GraphUtils.correctErrorsPE :4051-4182, correctMismatches :3914-3997,
correctErrorHelper :3711-3913):

  * Per read, k-mer coverages are sorted; the threshold walks down from the
    top (minus covFPR false positives allowed) until consecutive sorted
    values drop by ``maxCovGradient`` — vectorized here as an adjacent-gap
    scan over the sorted axis.
  * A single error at base p makes exactly the k-mers covering p drop below
    threshold.  Low-coverage runs are classified (interior run of length k
    -> candidate at run_start + k - 1; runs touching a read end anchor
    one-sided), and candidate edits are evaluated by re-hashing the affected
    window in one device batch: the 3 substitutions at p, deletion of
    1..max_indel bases at p, and single-base insertions before p.  The best
    variant is applied when its min coverage passes ``min_kmer_cov`` and its
    median beats the current window median; indel edits additionally require
    window percent identity >= ``percent_identity`` (the correctErrorHelper
    path-acceptance rule, SeqUtils.getPercentIdentity :164-272) and
    ``max_indel`` > 0.
  * Iterated ``rounds`` times (errors < k apart, and multi-base indels one
    base at a time, resolve across rounds).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import dbg, engine
from ..graph.dbg import GraphConfig, GraphState


@dataclass
class CorrectParams:
    max_cov_gradient: float = 0.5
    cov_fpr: float = 0.01  # fraction of k-mers allowed as false positives
    min_cov_threshold: float = 2.0
    min_kmer_cov: float = 1.0
    rounds: int = 2
    max_indel: int = 1  # -indel: max indel bases repaired per site
    percent_identity: float = 0.90  # -p: min identity of indel-edited windows


@partial(jax.jit, static_argnames=("grad",))
def coverage_thresholds(counts: jax.Array, valid: jax.Array, fp_allowed: jax.Array, grad: float):
    """Per-read dropoff threshold over sorted coverages.

    counts: (B, P) float32 (0 where invalid); valid: (B, P) bool.
    Returns (threshold (B,), found (B,)).  Mirrors the downward scan of
    correctErrorsPE: starting at index n-1-fp_allowed, threshold follows the
    sorted values until covs[i] <= covs[i+1] * grad.
    """
    B, P = counts.shape
    n = jnp.sum(valid.astype(jnp.int32), axis=1)
    # push invalid entries to the front with -inf so the tail is the real data
    key = jnp.where(valid, counts, -jnp.inf)
    s = jnp.sort(key, axis=1)  # ascending; invalid first
    idx = jnp.arange(P)

    start = P - 1 - jnp.minimum(fp_allowed, jnp.maximum(n - 1, 0))
    # gap[i] between sorted i and i+1 (i in [P - n, start - 1])
    nxt = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    in_range = (idx[None, :] < start[:, None]) & (idx[None, :] >= (P - n)[:, None])
    gap = in_range & (s <= nxt * grad) & (nxt > 0)
    found = jnp.any(gap, axis=1)
    # highest gap index -> threshold = s[i+1]
    jstar = jnp.argmax(jnp.where(gap, idx[None, :], -1), axis=1)
    thr_at_gap = jnp.take_along_axis(nxt, jstar[:, None], axis=1)[:, 0]
    thr_start = jnp.take_along_axis(s, jnp.maximum(start, 0)[:, None], axis=1)[:, 0]
    thr = jnp.where(found, thr_at_gap, thr_start)
    return thr, found


def _runs(mask: np.ndarray):
    """(start, end) pairs of True runs in a 1-D bool array."""
    padded = np.concatenate(([False], mask, [False]))
    d = np.diff(padded.astype(np.int8))
    return np.flatnonzero(d == 1), np.flatnonzero(d == -1)


def _batch_runs(mask: np.ndarray):
    """(rows, starts, ends) of True runs per row of a 2-D bool array.

    One vectorized diff over the whole batch replaces the per-row scans —
    stage-2 batches are 8-16k rows and the Python loop was on the critical
    path."""
    B, P = mask.shape
    padded = np.zeros((B, P + 2), np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    rs, ss = np.nonzero(d == 1)
    re, es = np.nonzero(d == -1)
    # starts and ends pair up in order within each row
    return rs, ss, es


def find_candidates(
    counts: np.ndarray, valid: np.ndarray, thr: np.ndarray, found: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Candidate (read, pos1, pos2, interior) error sites from low-cov runs.

    pos2 == -1 for single-substitution runs (length <= k).  Runs of length
    (k, 2k] are two nearby substitutions whose low windows merged
    (correctErrorHelper handles these by re-walking the whole segment;
    here both implied positions are corrected jointly).  ``interior`` marks
    candidates anchored on both sides — the only ones where indel edits are
    well-posed.  Fully vectorized over the batch."""
    B, P = counts.shape
    low = (counts < thr[:, None]) & valid & found[:, None]
    rows_any = low.any(axis=1) & ~(low | ~valid).all(axis=1)
    low &= rows_any[:, None]
    if not low.any():
        z = np.zeros(0, np.int32)
        return z, z, z.copy(), np.zeros(0, bool)
    rs, ss, es = _batch_runs(low)
    # first/last valid k-mer index per row (for edge-touch tests)
    vidx = np.where(valid, np.arange(P)[None, :], P)
    first_v = vidx.min(axis=1)
    vidx = np.where(valid, np.arange(P)[None, :], -1)
    last_v = vidx.max(axis=1)
    run = es - ss
    touches_left = ss <= first_v[rs]
    touches_right = es > last_v[rs]
    # left-edge runs have no length cap (the error is the last low base);
    # interior/right runs longer than 2k are dense error regions, skipped
    keep = ~(touches_left & touches_right) & (touches_left | (run <= 2 * k))
    rs, ss, es = rs[keep], ss[keep], es[keep]
    run, touches_left, touches_right = (
        run[keep], touches_left[keep], touches_right[keep]
    )
    p = np.where(touches_left, es - 1, ss + k - 1)
    q = np.where(~touches_left & (run > k), es - 1, -1)
    inter = ~touches_left & (run <= k) & ~touches_right
    return rs.astype(np.int32), p.astype(np.int32), q.astype(np.int32), inter


@partial(jax.jit, static_argnames=("cfg",))
def _window_scores_jit(graph: GraphState, cfg: GraphConfig, windows: jax.Array):
    counts, valid = dbg.count_step(graph, cfg, windows)
    return _scores_from_counts(counts, valid)


def _window_scores(
    graph, cfg: GraphConfig, windows: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(min_cov, median_cov) over each window row's valid k-mers."""
    if not engine.is_sharded(graph):
        return _window_scores_jit(graph, cfg, windows)
    counts, valid = engine.count_step(graph, cfg, windows)
    return _scores_from_counts(counts, valid)


@partial(jax.jit, static_argnames=("cfg", "grad", "cov_fpr"))
def _ec_stats_jit(
    graph: GraphState, cfg: GraphConfig, codes: jax.Array, grad: float, cov_fpr: float
):
    """Counts + per-read dropoff threshold in ONE device program (each
    separate host readback costs a full tunnel round trip)."""
    counts, valid = dbg.count_step(graph, cfg, codes)
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=1)
    fp_allowed = jnp.round(nvalid * cov_fpr).astype(jnp.int32)
    thr, found = coverage_thresholds(counts, valid, fp_allowed, grad)
    return counts, valid, thr, found


def _ec_stats(graph, cfg: GraphConfig, codes, grad: float, cov_fpr: float):
    if not engine.is_sharded(graph):
        out = _ec_stats_jit(graph, cfg, jnp.asarray(codes), grad, cov_fpr)
        return jax.device_get(out)
    counts_d, valid_d = engine.count_step(graph, cfg, codes)
    counts, valid = jax.device_get((counts_d, valid_d))
    nvalid = valid.sum(axis=1).astype(np.int32)
    fp_allowed = np.round(nvalid * cov_fpr).astype(np.int32)
    thr, found = jax.device_get(
        coverage_thresholds(
            jnp.asarray(counts), jnp.asarray(valid), jnp.asarray(fp_allowed), grad
        )
    )
    return counts, valid, thr, found


@jax.jit
def _scores_from_counts(counts, valid):
    big = jnp.where(valid, counts, jnp.inf)
    mn = jnp.min(big, axis=1)
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    # median over valid entries via sort with +inf padding
    s = jnp.sort(big, axis=1)
    nv = jnp.sum(valid.astype(jnp.int32), axis=1)
    half = jnp.maximum(nv // 2, 0)
    lo_i = jnp.maximum(jnp.where(nv % 2 == 0, half - 1, half), 0)
    med = (
        jnp.take_along_axis(s, lo_i[:, None], axis=1)[:, 0]
        + jnp.take_along_axis(s, half[:, None], axis=1)[:, 0]
    ) / 2.0
    med = jnp.where(nv > 0, med, 0.0)
    return mn, med


def correct_batch(
    graph: GraphState,
    cfg: GraphConfig,
    codes: np.ndarray,
    lengths: np.ndarray,
    params: CorrectParams,
    pair_ids: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Correct substitution and small-indel errors in a batch of reads.

    codes: (B, L) uint8 (4 = pad/N); lengths: (B,) bases per row.
    pair_ids: optional (B,) grouping — rows with the same id share the
    minimum threshold (correctErrorsPE's min(left, right) rule).

    Returns (corrected codes, new lengths, corrected_mask (B,) bool) —
    indel edits change row lengths.
    """
    k = cfg.k
    B, L = codes.shape
    codes = codes.copy()
    lengths = np.asarray(lengths).astype(np.int64).copy()
    changed = np.zeros(B, dtype=bool)

    for _ in range(params.rounds):
        engine._tick("query")
        counts, valid, thr, found = _ec_stats(
            graph, cfg, codes, params.max_cov_gradient, params.cov_fpr
        )
        thr = np.array(thr)  # writable copies (pair sharing mutates)
        found = np.array(found)

        if pair_ids is not None:
            # share min threshold within a pair; found only if sane
            # (vectorized scatter-reductions over pair groups)
            uniq, inv = np.unique(pair_ids, return_inverse=True)
            npid = len(uniq)
            all_found = np.ones(npid, bool)
            np.logical_and.at(all_found, inv, found)
            any_found = np.zeros(npid, bool)
            np.logical_or.at(any_found, inv, found)
            tmin = np.full(npid, np.inf, thr.dtype)
            np.minimum.at(tmin, inv, thr)
            tfound = np.full(npid, np.inf, thr.dtype)
            np.minimum.at(tfound, inv, np.where(found, thr, np.inf))
            tnot = np.full(npid, np.inf, thr.dtype)
            np.minimum.at(tnot, inv, np.where(found, np.inf, thr))
            t_shared = np.where(
                all_found,
                tmin,
                np.where(any_found & (tfound <= tnot), tfound, -1.0),
            ).astype(thr.dtype)
            thr = t_shared[inv]
            found = thr >= params.min_cov_threshold
        else:
            found = found & (thr >= params.min_cov_threshold)

        reads, pos1, pos2, interior = find_candidates(counts, valid, thr, found, k)
        if len(reads) == 0:
            break

        # build variant windows: single-site candidates try the 3 other
        # bases at p, deletions of 1..max_indel bases at p, and single-base
        # insertions before p (interior sites only — indels need anchors on
        # both sides); dual-site candidates (two errors within k) try the
        # 3x3 substitution combinations at (p, q).  One window width
        # (3k-1, spanning both sites) keeps the device kernel shape fixed.
        win_len = 3 * k - 1
        wins, meta, groups = [], [], []
        for b, p, q, inter in zip(reads, pos1, pos2, interior):
            n = int(lengths[b])
            right = q if q >= 0 else p
            w0 = max(p - k + 1, 0)
            w1 = min(right + k, n)
            wlen = w1 - w0
            base_win = np.full(win_len, 4, np.uint8)
            base_win[:wlen] = codes[b, w0:w1]
            rel_p, rel_q = p - w0, (q - w0 if q >= 0 else -1)
            start = len(wins)
            wins.append(base_win.copy())  # current window (comparison row)
            meta.append(("cur", 0, 0))
            cur_p = codes[b, p]
            if q < 0:
                for v in range(4):
                    if v == cur_p:
                        continue
                    wv = base_win.copy()
                    wv[rel_p] = v
                    wins.append(wv)
                    meta.append(("sub", v, 0))
                if inter and params.max_indel > 0:
                    # identity of a d-base indel edit over this window
                    # (SeqUtils.getPercentIdentity acceptance in
                    # correctErrorHelper)
                    for d in range(1, params.max_indel + 1):
                        if (wlen - d) / wlen < params.percent_identity:
                            break
                        if p + d > n:
                            break
                        wv = np.full(win_len, 4, np.uint8)
                        tail = codes[b, p + d : min(w1 + d, n)]
                        wv[:rel_p] = base_win[:rel_p]
                        wv[rel_p : rel_p + len(tail)] = tail
                        wins.append(wv)
                        meta.append(("del", d, 0))
                    if (wlen - 1) / wlen >= params.percent_identity:
                        for v in range(4):
                            wv = base_win.copy()
                            wv[rel_p] = v
                            wv[rel_p + 1 : wlen] = base_win[rel_p : wlen - 1]
                            wins.append(wv)
                            meta.append(("ins", v, 0))
            else:
                cur_q = codes[b, q]
                for v in range(4):
                    if v == cur_p:
                        continue
                    for u in range(4):
                        if u == cur_q:
                            continue
                        wv = base_win.copy()
                        wv[rel_p] = v
                        wv[rel_q] = u
                        wins.append(wv)
                        meta.append(("sub", v, u))
            groups.append((b, p, q, start, len(wins)))

        # pad the row count to a power of two to bound recompilation
        M = len(wins)
        Mp = 1 << max(6, (M - 1).bit_length())
        wins_np = np.full((Mp, win_len), 4, np.uint8)
        wins_np[:M] = np.stack(wins)
        engine._tick("query")
        mn, med = jax.device_get(_window_scores(graph, cfg, jnp.asarray(wins_np)))
        mn = mn[:M]
        med = med[:M]

        applied = False
        indel_rows = set()  # one indel per read per round: later sites shift
        for b, p, q, start, end in groups:
            if b in indel_rows:
                continue
            cur_med = med[start]
            best_j, best_med = -1, cur_med
            for j in range(start + 1, end):
                if mn[j] >= params.min_kmer_cov and med[j] > best_med:
                    best_j, best_med = j, med[j]
            if best_j < 0:
                continue
            kind, v, u = meta[best_j]
            n = int(lengths[b])
            if kind == "sub":
                codes[b, p] = v
                if q >= 0:
                    codes[b, q] = u
            elif kind == "del":
                codes[b, p : n - v] = codes[b, p + v : n]
                codes[b, n - v :] = 4
                lengths[b] = n - v
                indel_rows.add(b)
            else:  # ins
                stop = min(n + 1, L)
                codes[b, p + 1 : stop] = codes[b, p : stop - 1]
                codes[b, p] = v
                lengths[b] = stop
                indel_rows.add(b)
            changed[b] = True
            applied = True
        if not applied:
            break

    return codes, lengths, changed
