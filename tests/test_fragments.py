"""Fragment assembly from synthetic paired-end reads."""

import jax.numpy as jnp
import numpy as np
import pytest

from rnabloom_tpu.assembly import fragments
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg
from rnabloom_tpu.ops import nthash_ref as ref
from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(77)
K = 25
READ = 100


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def encode_batch(seqs, L):
    arr = np.full((len(seqs), L), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = ref.encode(s)
    return arr


def simulate_pairs(transcript, frag_len, n_pairs):
    """(left_seqs, right_seqs_fragment_oriented, fragment_seqs)"""
    lefts, rights, frags = [], [], []
    for _ in range(n_pairs):
        s = RNG.integers(0, len(transcript) - frag_len + 1)
        frag = transcript[s : s + frag_len]
        lefts.append(frag[:READ])
        rights.append(frag[-READ:])  # already fragment-oriented
        frags.append(frag)
    return lefts, rights, frags


def build_graph(reads_for_cov, d=60):
    cfg = dbg.GraphConfig(
        k=K,
        stranded=False,
        dbgbf=BloomConfig(size_log2=20, num_hash=2),
        cbf=CountingConfig(size_log2=20, num_hash=2, scratch_log2=18),
        pkbf=BloomConfig(size_log2=20, num_hash=2),
        read_pair_distance=d,
    )
    state = dbg.make_graph(cfg, with_rpkbf=True)
    L = max(len(s) for s in reads_for_cov)
    state = dbg.build_step(
        state, cfg, jnp.asarray(encode_batch(reads_for_cov, L)), add_read_pairs=True
    )
    return cfg, state


def test_overlap_search():
    a = ref.encode(rand_seq(80) + "ACGTACGTACGTACGTACGT")
    b = ref.encode("ACGTACGTACGTACGTACGT" + rand_seq(80))
    L = 100
    left = np.full((1, L), 4, np.uint8); left[0, :len(a)] = a
    right = np.full((1, L), 4, np.uint8); right[0, :len(b)] = b
    o = fragments.find_overlaps(left, np.array([100]), right, np.array([100]), 10)
    assert o[0] == 20


def test_overlapping_pair_assembled():
    t = rand_seq(600)
    lefts, rights, frags = simulate_pairs(t, 150, 8)  # 50bp overlap
    cov_reads = lefts + rights
    cfg, graph = build_graph(cov_reads)

    L = READ
    out = fragments.assemble_fragments_batch(
        graph,
        cfg,
        encode_batch(lefts, L),
        np.full(8, READ),
        encode_batch(rights, L),
        np.full(8, READ),
        fragments.FragmentParams(),
    )
    ok = 0
    for f, expect in zip(out, frags):
        if f is not None and sequtils.decode(f.codes) in expect:
            ok += 1
    assert ok >= 7


def test_gapped_pair_bridged():
    t = rand_seq(800)
    # fragment length 260 -> 60bp gap between mates
    lefts, rights, frags = simulate_pairs(t, 260, 8)
    # coverage reads tile the transcript so the gap is walkable
    cov_reads = [t[i : i + READ] for i in range(0, len(t) - READ + 1, 20)] * 2
    cfg, graph = build_graph(cov_reads)

    out = fragments.assemble_fragments_batch(
        graph,
        cfg,
        encode_batch(lefts, READ),
        np.full(8, READ),
        encode_batch(rights, READ),
        np.full(8, READ),
        fragments.FragmentParams(),
    )
    ok = 0
    for f, expect in zip(out, frags):
        if f is None:
            continue
        s = sequtils.decode(f.codes)
        if s in expect and len(s) >= 200:
            ok += 1
    assert ok >= 7


def test_unconnectable_pair_returns_none():
    t1, t2 = rand_seq(300), rand_seq(300)
    lefts = [t1[:READ]]
    rights = [t2[-READ:]]
    cfg, graph = build_graph(lefts + rights)
    out = fragments.assemble_fragments_batch(
        graph,
        cfg,
        encode_batch(lefts, READ),
        np.array([READ]),
        encode_batch(rights, READ),
        np.array([READ]),
        fragments.FragmentParams(),
    )
    assert out[0] is None


def test_pair_break_segments():
    # supported run covering pairs 2..5 with d=10
    sup = np.zeros(20, bool)
    sup[2:6] = True
    segs = fragments.pair_break_segments(sup, 10, 1, 30)
    assert segs == [(2, 16)]
    # two runs separated enough to break
    sup2 = np.zeros(40, bool)
    sup2[0:3] = True
    sup2[25:28] = True
    segs2 = fragments.pair_break_segments(sup2, 5, 1, 45)
    assert segs2 == [(0, 8), (25, 33)]


def test_rescue_unconnected_bridges_with_fragment_graph():
    """A pair whose gap exceeds read-graph coverage connects once the
    bridging sequence is in the graph (rescueUnconnected semantics)."""
    t = rand_seq(400)
    # pair with a 100bp gap between mates (fragment 300bp)
    left = t[:READ]
    right = t[200:300]
    lc = encode_batch([left], READ)
    rc_ = encode_batch([right], READ)
    lens = np.array([READ], np.int32)

    # graph WITHOUT the gap region: connection fails
    cfg, state_bad = build_graph([t[:120], t[260:]])
    params = fragments.FragmentParams(min_overlap=10, bound=300)
    res = fragments.rescue_unconnected(state_bad, cfg, lc, lens, rc_, lens, params)
    assert res[0] is None

    # graph WITH full coverage (as after the fragment-graph rebuild)
    cfg2, state_ok = build_graph([t[i:i+200] for i in range(0, 201, 40)])
    res2 = fragments.rescue_unconnected(state_ok, cfg2, lc, lens, rc_, lens, params)
    assert res2[0] is not None
    assert sequtils.decode(res2[0].codes) in t
    assert res2[0].length >= 290


def test_right_only_connectable_pair():
    """Bidirectional connect (GraphUtils.connect :5092-5325): a gap walkable
    only from the right — a high-coverage decoy branch derails the
    left-to-right greedy walk — still connects via the right-to-left walk."""
    A, G, B = rand_seq(100), rand_seq(60), rand_seq(100)
    t = A + G + B
    decoy = A[-50:] + rand_seq(80)
    # pair k-mers from reads tiling the true transcript (low coverage) and
    # the decoy at much higher coverage
    cov_reads = [t[i : i + READ] for i in range(0, len(t) - READ + 1, 10)] * 2 + [
        decoy[i : i + READ] for i in range(0, len(decoy) - READ + 1, 5)
    ] * 8
    cfg, graph = build_graph(cov_reads)

    out = fragments.assemble_fragments_batch(
        graph,
        cfg,
        encode_batch([A], READ),
        np.array([len(A)], np.int32),
        encode_batch([B], READ),
        np.array([len(B)], np.int32),
        fragments.FragmentParams(),
        error_correct=False,
    )
    assert out[0] is not None, "right-to-left walk should connect this pair"
    s = sequtils.decode(out[0].codes)
    assert s in t and len(s) >= 200


def test_meet_in_middle_connect():
    """Both walks stall mid-gap on opposing decoy branches; the pair still
    connects because the walks share the mid-gap k-mers."""
    A, G, B = rand_seq(100), rand_seq(120), rand_seq(100)
    t = A + G + B
    # decoys: one hijacks the rightward walk past the gap midpoint is fine —
    # the walks only need to OVERLAP somewhere inside the gap
    decoy_r = G[60:90] + rand_seq(80)  # hijacks the leftward walk after mid-gap
    decoy_l = rand_seq(80) + G[30:60]  # hijacks the rightward walk pre-mid... 
    cov_reads = (
        [t[i : i + READ] for i in range(0, len(t) - READ + 1, 10)] * 2
        + [decoy_r[i : i + READ] for i in range(0, len(decoy_r) - READ + 1, 5)] * 8
        + [decoy_l[i : i + READ] for i in range(0, len(decoy_l) - READ + 1, 5)] * 8
    )
    cfg, graph = build_graph(cov_reads)
    out = fragments.assemble_fragments_batch(
        graph,
        cfg,
        encode_batch([A], READ),
        np.array([len(A)], np.int32),
        encode_batch([B], READ),
        np.array([len(B)], np.int32),
        fragments.FragmentParams(),
        error_correct=False,
    )
    assert out[0] is not None
    s = sequtils.decode(out[0].codes)
    assert len(s) >= 150


def test_connect_segments_rejoins_split_read():
    """connect(segments) (GraphUtils.java:4836-4897): quality-split
    segments re-join through the graph, recovering the masked bases."""
    t = rand_seq(400)
    cov_reads = [t[i : i + READ] for i in range(0, len(t) - READ + 1, 20)] * 3
    cfg, graph = build_graph(cov_reads)

    read = t[50:250]  # 200bp read; base 100 is masked (Q0)
    segs = [ref.encode(read[:100]), ref.encode(read[101:])]
    out = fragments.connect_segments_batch(
        graph, cfg, [segs], fragments.FragmentParams()
    )
    joined = sequtils.decode(out[0])
    assert joined == read, f"joined {len(joined)} bases vs read {len(read)}"

    # unjoinable segments fall back to the longest one
    far = [ref.encode(rand_seq(60)), ref.encode(read[101:])]
    out2 = fragments.connect_segments_batch(
        graph, cfg, [far], fragments.FragmentParams()
    )
    assert len(out2[0]) == len(read) - 101
