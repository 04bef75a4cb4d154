"""Poly-A detection + artifact trimming."""

import numpy as np

from rnabloom_tpu.assembly import artifacts
from rnabloom_tpu.utils import polya, seq as sequtils

RNG = np.random.default_rng(8)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def test_polya_tail():
    s = rand_seq(200) + "A" * 25
    codes = sequtils.encode(s)
    hit = polya.find_polya_tail(codes)
    assert hit is not None
    start, end = hit
    assert end == len(s)
    assert start <= 202  # tail found near its true start


def test_polya_tail_with_mismatches():
    s = rand_seq(200) + "AAAAAAAGAAAAAAAACAAAAAAA"
    hit = polya.find_polya_tail(sequtils.encode(s))
    assert hit is not None
    assert hit[1] - hit[0] >= 15


def test_polyt_head_and_orientation():
    s = "T" * 25 + rand_seq(200)
    codes = sequtils.encode(s)
    assert polya.find_polyt_head(codes) is not None
    oriented, had_tail, flipped = polya.orient_long_read(codes)
    assert flipped
    assert sequtils.decode(oriented) == sequtils.revcomp(s)


def test_no_false_polya():
    s = rand_seq(300)
    codes = sequtils.encode(s)
    hit = polya.find_polya_tail(codes)
    if hit is not None:
        assert hit[1] - hit[0] < 12  # only short chance runs


def test_pas_search():
    s = rand_seq(150).replace("AATAAA", "ACGTCG") + "GGAATAAAGG" + "CCT" + "A" * 20
    tail_start = len(s) - 20
    pas = polya.find_pas_positions(s, tail_start)
    assert any(s[p : p + 6] == "AATAAA" for p in pas)


def test_rc_artifact_trim():
    core = rand_seq(150)
    artifact = core + sequtils.revcomp(core[50:])  # fold-back of the tail
    codes = sequtils.encode(artifact)
    trimmed = artifacts.trim_rc_artifact(codes)
    assert len(trimmed) < len(codes)
    assert sequtils.decode(trimmed[:150]) == core

    clean = sequtils.encode(rand_seq(300))
    assert len(artifacts.trim_rc_artifact(clean)) == 300


def test_chimera_profile():
    k = 25
    seen = np.ones(100, bool)
    seen[48:52] = False  # short unseen junction between two seen arms
    valid = np.ones(100, bool)
    assert artifacts.is_chimera(seen, valid, k)
    # long unseen middle = novel sequence, not chimera
    seen2 = np.ones(100, bool)
    seen2[30:70] = False
    assert not artifacts.is_chimera(seen2, valid, k)
    # nothing unseen = represented, not chimera
    assert not artifacts.is_chimera(np.ones(100, bool), valid, k)


def test_low_complexity():
    assert artifacts.is_low_complexity(sequtils.encode("A" * 50))
    assert artifacts.is_low_complexity(sequtils.encode("ATATATATATATATATATAT"))
    assert artifacts.is_low_complexity(sequtils.encode("ACGACGACGACGACGACGACG"))
    assert not artifacts.is_low_complexity(sequtils.encode(rand_seq(100)))


def test_blunt_end_artifact():
    n, d = 100, 40
    valid = np.ones(n, bool)
    # left-assembled with a short low-cov unassembled tail
    seen = np.ones(n, bool)
    seen[85:] = False
    counts = np.full(n, 10.0)
    counts[85:] = 2.0
    assert artifacts.is_blunt_end_artifact(seen, valid, counts, d, 20)
    # long novel tail (> d) is NOT an artifact
    seen2 = np.ones(n, bool)
    seen2[40:] = False
    assert not artifacts.is_blunt_end_artifact(seen2, valid, counts, d, 20)
    # fully assembled: not an artifact
    assert not artifacts.is_blunt_end_artifact(np.ones(n, bool), valid, counts, d, 20)
    # mirrored case (right-assembled, short head stub)
    seen3 = np.ones(n, bool)
    seen3[:12] = False
    counts3 = np.full(n, 10.0)
    counts3[:12] = 2.0
    assert artifacts.is_blunt_end_artifact(seen3, valid, counts3, d, 20)
