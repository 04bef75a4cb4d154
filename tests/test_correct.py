"""Error correction vs synthetic reads with planted substitutions."""

import jax.numpy as jnp
import numpy as np

from rnabloom_tpu.assembly import correct
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg
from rnabloom_tpu.ops import nthash_ref as ref
from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(5)
K = 25


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def encode_batch(seqs, L):
    arr = np.full((len(seqs), L), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = ref.encode(s)
    return arr


def make_graph(transcript, coverage=20):
    cfg = dbg.GraphConfig(
        k=K,
        stranded=False,
        dbgbf=BloomConfig(size_log2=18, num_hash=2),
        cbf=CountingConfig(size_log2=18, num_hash=2, scratch_log2=16),
        pkbf=BloomConfig(size_log2=18, num_hash=2),
    )
    state = dbg.make_graph(cfg)
    # simulate uniform read coverage of the transcript
    reads = []
    for _ in range(coverage):
        for s in range(0, len(transcript) - 100 + 1, 25):
            reads.append(transcript[s : s + 100])
    batch = encode_batch(reads, 100)
    state = dbg.build_step(state, cfg, jnp.asarray(batch))
    return cfg, state


def mutate(read, pos):
    b = "ACGT"[("ACGT".index(read[pos]) + 1) % 4]
    return read[:pos] + b + read[pos + 1 :]


def test_threshold_finding():
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    reads = [t[100:200], mutate(t[100:200], 50)]
    batch = jnp.asarray(encode_batch(reads, 100))
    counts, valid = dbg.count_step(graph, cfg, batch)
    thr, found = correct.coverage_thresholds(
        counts, valid, jnp.asarray([1, 1]), 0.5
    )
    thr = np.asarray(thr)
    found = np.asarray(found)
    assert not found[0]  # clean read: no dropoff
    assert found[1] and thr[1] > 1.0  # mutated read has a coverage gap


def test_interior_substitution_corrected():
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    clean = t[100:200]
    for pos in [50, 30, 70]:
        bad = mutate(clean, pos)
        codes = encode_batch([bad], 100)
        fixed, _, changed = correct.correct_batch(
            graph, cfg, codes, np.array([100]), correct.CorrectParams()
        )
        assert changed[0], f"pos {pos} not corrected"
        assert sequtils.decode(fixed[0, :100]) == clean


def test_edge_substitution_corrected():
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    clean = t[100:200]
    for pos in [5, 94]:
        bad = mutate(clean, pos)
        codes = encode_batch([bad], 100)
        fixed, _, changed = correct.correct_batch(
            graph, cfg, codes, np.array([100]), correct.CorrectParams()
        )
        assert changed[0], f"edge pos {pos} not corrected"
        assert sequtils.decode(fixed[0, :100]) == clean


def test_clean_reads_untouched():
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    reads = [t[i : i + 100] for i in range(0, 300, 50)]
    codes = encode_batch(reads, 100)
    fixed, _, changed = correct.correct_batch(
        graph, cfg, codes, np.full(len(reads), 100), correct.CorrectParams()
    )
    assert not changed.any()
    assert (fixed == codes).all()


def test_two_errors_far_apart():
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    clean = t[100:200]
    bad = mutate(mutate(clean, 20), 80)
    codes = encode_batch([bad], 100)
    fixed, _, changed = correct.correct_batch(
        graph, cfg, codes, np.array([100]), correct.CorrectParams()
    )
    assert changed[0]
    assert sequtils.decode(fixed[0, :100]) == clean


def test_pair_threshold_sharing():
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    left = mutate(t[100:200], 50)
    right = t[300:400]
    codes = encode_batch([left, right], 100)
    fixed, _, changed = correct.correct_batch(
        graph,
        cfg,
        codes,
        np.array([100, 100]),
        correct.CorrectParams(),
        pair_ids=np.array([0, 0]),
    )
    assert changed[0]
    assert sequtils.decode(fixed[0, :100]) == t[100:200]
    assert sequtils.decode(fixed[1, :100]) == right


def test_planted_insertion_corrected():
    """A 1-base insertion error is repaired by the indel path
    (correctErrorHelper, GraphUtils.java:3711-3913)."""
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    clean = t[100:200]
    for pos in [40, 60]:
        bad = clean[:pos] + "A" + clean[pos:]  # 101 bases
        if bad[pos] == clean[pos]:
            bad = clean[:pos] + "C" + clean[pos:]
        codes = encode_batch([bad], 110)
        fixed, new_len, changed = correct.correct_batch(
            graph, cfg, codes, np.array([101]), correct.CorrectParams()
        )
        assert changed[0], f"insertion at {pos} not repaired"
        assert new_len[0] == 100
        assert sequtils.decode(fixed[0, :100]) == clean


def test_planted_deletion_corrected():
    """A 1-base deletion error is repaired by inserting the missing base."""
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    clean = t[100:200]
    for pos in [40, 60]:
        bad = clean[:pos] + clean[pos + 1 :]  # 99 bases
        codes = encode_batch([bad], 110)
        fixed, new_len, changed = correct.correct_batch(
            graph, cfg, codes, np.array([99]), correct.CorrectParams()
        )
        assert changed[0], f"deletion at {pos} not repaired"
        assert new_len[0] == 100
        assert sequtils.decode(fixed[0, :100]) == clean


def test_indel_flags_gate_repair():
    """-indel 0 and -p 1.0 demonstrably disable indel repair."""
    t = rand_seq(500)
    cfg, graph = make_graph(t)
    clean = t[100:200]
    bad = clean[:50] + clean[51:]  # 1-base deletion
    codes = encode_batch([bad], 110)
    for params in (
        correct.CorrectParams(max_indel=0),
        correct.CorrectParams(percent_identity=1.0),
    ):
        fixed, new_len, changed = correct.correct_batch(
            graph, cfg, codes, np.array([99]), params
        )
        assert new_len[0] == 99  # no indel edit applied
