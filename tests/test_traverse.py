"""Frontier-batched traversal vs known synthetic graph structures."""

import jax.numpy as jnp
import numpy as np
import pytest

from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg, traverse
from rnabloom_tpu.ops import nthash_ref as ref
from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(2024)
K = 25


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def encode_batch(seqs, L):
    arr = np.full((len(seqs), L), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = ref.encode(s)
    return jnp.asarray(arr)


def build_graph_from(seqs, copies=1, stranded=False):
    cfg = dbg.GraphConfig(
        k=K,
        stranded=stranded,
        dbgbf=BloomConfig(size_log2=18, num_hash=2),
        cbf=CountingConfig(size_log2=18, num_hash=2, scratch_log2=16),
        pkbf=BloomConfig(size_log2=18, num_hash=2),
    )
    state = dbg.make_graph(cfg)
    L = max(len(s) for s in seqs)
    batch = [s for s, c in zip(seqs, copies if isinstance(copies, list) else [copies] * len(seqs)) for _ in range(c)]
    state = dbg.build_step(state, cfg, encode_batch(batch, L))
    return cfg, state


def extend_from_seed(cfg, graph, seed_seq, wcfg=None, mode="greedy", min_cov=1, bound=400):
    wcfg = wcfg or traverse.WalkConfig(max_len=512)
    seeds = np.asarray([ref.encode(seed_seq[: K])], dtype=np.uint8)
    st = traverse.make_walks(cfg, wcfg, seeds)
    st = traverse.extend_walks(st, graph, cfg, wcfg, min_cov, bound, mode=mode)
    buf, pos, status = traverse.harvest(st)
    return sequtils.decode(buf[0, : pos[0]]), status[0]


@pytest.mark.parametrize("stranded", [False, True])
def test_linear_path_recovered(stranded):
    t = rand_seq(300)
    cfg, graph = build_graph_from([t], copies=2, stranded=stranded)
    out, status = extend_from_seed(cfg, graph, t)
    assert out == t, f"len {len(out)} vs {len(t)}"
    assert status == traverse.DEAD  # ran off the end of the transcript


def test_greedy_picks_high_coverage_branch():
    prefix = rand_seq(100)
    high = prefix + rand_seq(150)
    low = prefix + rand_seq(150)
    cfg, graph = build_graph_from([high, low], copies=[8, 2])
    out, status = extend_from_seed(cfg, graph, prefix)
    assert out == high
    assert status == traverse.DEAD


def test_naive_stops_at_branch():
    prefix = rand_seq(100)
    a = prefix + rand_seq(150)
    b = prefix + rand_seq(150)
    cfg, graph = build_graph_from([a, b], copies=[4, 4])
    out, status = extend_from_seed(cfg, graph, prefix, mode="naive")
    # both branches are deep: the walk must stop at the junction
    assert status == traverse.STOPPED_BRANCH
    assert out == prefix[: len(out)]
    assert len(out) == 100 - 1 + 1 + (0) or len(out) >= K  # stopped at junction
    assert abs(len(out) - 100) <= 1


def test_naive_skips_short_tip():
    trunk = rand_seq(300)
    # a tip: copy of trunk with a mutation near position 150 then dead end
    tip = trunk[:150] + ("A" if trunk[150] != "A" else "C") + trunk[151:154]
    cfg, graph = build_graph_from([trunk, tip], copies=[4, 1])
    out, status = extend_from_seed(cfg, graph, trunk, mode="naive")
    assert out == trunk  # the tip branch must be ignored
    assert status == traverse.DEAD


def test_left_extension_via_revcomp():
    t = rand_seq(300)
    cfg, graph = build_graph_from([t], copies=2)
    # seed with the LAST k bases; extend left = extend right of the revcomp
    seed = sequtils.revcomp(t[-K:])
    wcfg = traverse.WalkConfig(max_len=512, left=True)
    seeds = np.asarray([ref.encode(seed)], dtype=np.uint8)
    st = traverse.make_walks(cfg, wcfg, seeds)
    st = traverse.extend_walks(st, graph, cfg, wcfg, 1, 400)
    buf, pos, status = traverse.harvest(st)
    out = sequtils.revcomp(sequtils.decode(buf[0, : pos[0]]))
    assert out == t


def test_cycle_detection():
    # a sequence that loops back onto itself: unique entry + repeated unit
    unit = rand_seq(60)
    t = rand_seq(80) + unit + unit + unit
    cfg, graph = build_graph_from([t], copies=2)
    wcfg = traverse.WalkConfig(max_len=1024, cycle_window=128)
    out, status = extend_from_seed(cfg, graph, t, wcfg=wcfg, bound=900)
    # walk must terminate (cycle) instead of looping forever
    assert status in (traverse.CYCLE, traverse.DEAD, traverse.FULL)
    assert len(out) <= len(t) + len(unit)


def test_batch_of_walks():
    ts = [rand_seq(250) for _ in range(16)]
    cfg, graph = build_graph_from(ts, copies=2)
    wcfg = traverse.WalkConfig(max_len=400)
    seeds = np.asarray([ref.encode(t[:K]) for t in ts], dtype=np.uint8)
    st = traverse.make_walks(cfg, wcfg, seeds)
    st = traverse.extend_walks(st, graph, cfg, wcfg, 1, 400)
    buf, pos, status = traverse.harvest(st)
    ok = 0
    for i, t in enumerate(ts):
        out = sequtils.decode(buf[i, : pos[i]])
        ok += out == t
    assert ok >= 15  # rare k-mer collisions between random transcripts allowed


def test_lookahead_beyond_three():
    """lookahead > 3 is honored: depth-3 exhaustive + greedy leaf descent
    (round-1 silently capped at 3)."""
    prefix = rand_seq(100)
    high = prefix + rand_seq(150)
    low = prefix + rand_seq(150)
    cfg, graph = build_graph_from([high, low], copies=[8, 2])
    wcfg = traverse.WalkConfig(max_len=512, lookahead=5)
    out, status = extend_from_seed(cfg, graph, prefix, wcfg=wcfg)
    assert out == high
    assert status == traverse.DEAD


def test_back_branch_check_stops_at_merge():
    """naiveExtendRight's back-branch stop (GraphUtils.java:6846-6851): a
    decoy path merging INTO the walk's route stops the checked walk at the
    merge point; the unchecked walk runs through."""
    A = rand_seq(100)
    B = rand_seq(100)
    t = A + B
    decoy = rand_seq(80) + t[100 - K + 1 : 100 + 1]  # merges at position 100
    cfg, graph = build_graph_from([t, decoy], copies=[4, 4])

    unchecked = traverse.WalkConfig(max_len=512)
    out, _ = extend_from_seed(cfg, graph, t[:K], wcfg=unchecked, mode="naive")
    assert len(out) >= 150  # merge is invisible without back checks

    checked = traverse.WalkConfig(max_len=512, check_back_branches=True)
    out2, status2 = extend_from_seed(cfg, graph, t[:K], wcfg=checked, mode="naive")
    assert status2 == traverse.STOPPED_BRANCH
    assert abs(len(out2) - 101) <= 2, f"stopped at {len(out2)}, expected ~101"
