"""Differential tests against the scalar reference-semantics oracle.

The oracle (rnabloom_tpu/oracle/refsim.py) replays the reference's decision
points statement-for-statement over an exact graph; build_twin_graphs gives
the TPU pipeline the identical counts.  These tests pin the measured
per-decision agreement rates — the quantified version of the deviations
documented in graph/traverse.py:27-36 — and sanity-check the oracle itself
on hand-built graphs first (an oracle with bugs would vacuously "agree").
"""

import numpy as np
import pytest

from rnabloom_tpu.oracle import divergence as dv, refsim


# ---------------------------------------------------------------------------
# oracle self-consistency (no JAX)
# ---------------------------------------------------------------------------


def _graph_from(seqs, k=5, **kw):
    g = refsim.ExactGraph(k, **kw)
    for s in seqs:
        g.add_seq(s)
    return g


def test_oracle_neighbors_and_counts():
    g = _graph_from(["ACGTAC", "ACGTAC", "ACGTAG"])
    assert g.get_count("ACGTA") == 3.0
    assert refsim.successors(g, "ACGTA") == ["CGTAC", "CGTAG"]
    assert refsim.predecessors(g, "CGTAC") == ["ACGTA"]
    # min_cov filters the minority branch
    assert refsim.successors(g, "ACGTA", min_cov=2.0) == ["CGTAC"]
    # max-cov successor: first in ACGT order wins ties (strict >)
    assert refsim.max_cov_successor(g, "ACGTA", 1.0) == "CGTAC"


def test_oracle_has_depth_static_dfs():
    # path of 6 k-mers: ACGTA -> CGTAC -> GTACG -> TACGG -> ACGGT
    g = _graph_from(["ACGTACGGT"])
    assert refsim.has_depth_right(g, "ACGTA", 1)
    assert refsim.has_depth_right(g, "ACGTA", 4)
    # quirk: an empty successor deque still counts as a level when pushed,
    # so depth 5 (= 4 real successors + one expansion attempt) passes too
    assert refsim.has_depth_right(g, "ACGTA", 5)
    assert not refsim.has_depth_right(g, "ACGTA", 6)
    assert refsim.has_depth_left(g, "ACGGT", 4)
    assert not refsim.has_depth_left(g, "ACGTA", 2)
    # the member variant is trivially true (reference quirk)
    assert refsim.has_depth_member(g, "ACGTA", 500)


def test_oracle_greedy_prefers_high_coverage_path():
    # bubble: shared stem, high-cov branch C, low-cov branch G
    high = "ACGTACGGTCA"
    low = "ACGTAGGGTCA"
    g = _graph_from([high] * 5 + [low])
    cands = refsim.successors(g, "ACGTA")
    assert refsim.greedy_extend_right_once(g, cands, 3) == "CGTAC"
    # bounded greedy follows the whole high branch
    ext = refsim.greedy_extend_right(g, "ACGTA", 3, 6)
    assert g.assemble(["ACGTA"] + ext) == high


def test_oracle_percent_identity_and_median():
    assert refsim.get_percent_identity("ACGT", "ACGT") == 1.0
    assert refsim.get_percent_identity("ACGT", "ACCT") == 0.75
    assert refsim.levenshtein("kitten", "sitting") == 3
    assert refsim.get_median([3.0, 1.0, 2.0]) == 2.0
    assert refsim.get_median([4.0, 1.0, 2.0, 3.0]) == 2.5


def test_oracle_correct_errors_fixes_substitution():
    t = "ACGTACGGTCATGCCATTGACCA"
    reads = [t] * 8 + [t[:10] + "G" + t[11:]]  # one bad copy (A -> G)
    g = _graph_from(reads, k=7)
    bad = reads[-1]
    fixed = refsim.correct_errors_se(bad, g, 3, 1, 0.5, 0.01, 0.9, 1.0)
    assert fixed == t


def test_oracle_represented_basic():
    t = "ACGTACGGTCATGCCATTGACCA"
    g = _graph_from([t] * 3, k=7)
    screen = set(g.get_kmers(t))
    km = g.get_kmers(t)
    assert refsim.represented(km, g, screen, 3, 1, 5, 0.9)
    novel = "TTTTGGGGCCCCAAAATTTTGGGG"
    assert not refsim.represented(
        refsim.ExactGraph(7).get_kmers(novel), g, set(), 3, 1, 5, 0.9
    )


def test_oracle_is_repeat_and_low_complexity():
    assert refsim.is_repeat("AAAAAAAAAA")
    assert refsim.is_repeat("ACACACACACAC")
    assert refsim.is_repeat("ACGACGACGACG")
    assert not refsim.is_repeat("ACGTTGCAATCGGAT")
    assert refsim.is_low_complexity_short("AAAAAAAAAA")
    assert not refsim.is_low_complexity_short("ACGTTGCAATCGGATCCGTA")


def test_oracle_count_kmer_pairs_pe():
    t = "ACGTACGGTCATGCCATTGACCAGGTT"
    g = refsim.ExactGraph(5, read_pair_dist=4, frag_pair_dist=8)
    g.add_seq(t, read_pairs=True)
    g.add_frag_seq(t)
    kmers = g.get_kmers(t)
    left, right = kmers[:12], kmers[12:]
    n_read, n_frag, last = refsim.count_kmer_pairs_pe(g, left, right, 0)
    assert n_read > 0 and n_frag > 0 and last >= 0


# ---------------------------------------------------------------------------
# differential measurement (TPU kernels vs oracle)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rates():
    return dv.measure_all(seed=0, k=17, with_mf8=True)


@pytest.mark.slow
def test_counts_exact(rates):
    assert rates["count_agreement"] == 1.0, rates


@pytest.mark.slow
def test_greedy_extension_parity(rates):
    # lookahead <= 3 expands exhaustively: decisions must be exact
    assert rates["greedy_agreement"] >= 0.99, rates


@pytest.mark.slow
def test_tip_probe_beam_documented_deviation(rates):
    # width-2 beam vs exhaustive DFS: exact except on crafted beam traps
    # (two high-coverage shallow dead ends hiding a low-coverage deep path)
    assert rates["tip_probe_agreement"] >= 0.85, rates
    assert rates["n_probes"] >= 20


@pytest.mark.slow
def test_ec_parity_and_quality(rates):
    by_kind = rates["ec_agreement_by_kind"]
    # exact parity on the reference's bread-and-butter: substitutions and
    # untouched clean reads
    assert by_kind["sub"] == 1.0, rates
    assert by_kind["clean"] == 1.0, rates
    # where outputs diverge (indels), the TPU path must be at least as
    # accurate against the planted truth as the reference semantics
    assert rates["ec_tpu_truth_rate"] >= rates["ec_oracle_truth_rate"], rates


@pytest.mark.slow
def test_represented_screen_parity(rates):
    assert rates["represented_agreement"] >= 0.99, rates


@pytest.mark.slow
def test_mf8_quantization_does_not_flip_decisions(rates):
    assert rates["mf8_count_rel_err"] < 0.05, rates
    assert rates["mf8_greedy_agreement"] >= 0.95, rates
