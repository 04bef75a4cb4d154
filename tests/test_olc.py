"""Internal OLC engine: strand-aware overlaps, graph ops, consensus, uniqueOLC."""

import numpy as np
import pytest

from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(77)
K = 15


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def _batch(reads):
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
        lens[i] = len(r)
    return codes, lens


def _overlaps(reads, params):
    from rnabloom_tpu.olc import overlap as ov

    codes, lens = _batch(reads)
    mins = ov.extract_minimizers(codes, lens, K, params.w)
    return ov.find_overlaps(mins, params), lens


def test_same_strand_overlap_coords():
    from rnabloom_tpu.olc import overlap as ov

    t = rand_seq(900)
    reads = [sequtils.encode(t[:600]), sequtils.encode(t[300:])]
    params = ov.OverlapParams()
    recs, lens = _overlaps(reads, params)
    assert len(recs) == 1
    r = recs[0]
    assert r.strand == 1
    kind = ov.classify(r, int(lens[r.q]), int(lens[r.t]), params)
    assert kind == "dovetail"
    # overlap region is [300, 600) on read 0 and [0, 300) on read 1
    a, b = (r.q_start, r.t_start) if r.q == 0 else (r.t_start, r.q_start)
    assert abs(a - 300) <= 60 and b <= 60


def test_reverse_strand_overlap_detected():
    from rnabloom_tpu.olc import overlap as ov

    t = rand_seq(900)
    reads = [sequtils.encode(t[:600]), sequtils.encode(revcomp(t[300:]))]
    params = ov.OverlapParams()
    recs, lens = _overlaps(reads, params)
    assert len(recs) == 1
    r = recs[0]
    assert r.strand == -1
    assert ov.classify(r, int(lens[r.q]), int(lens[r.t]), params) == "dovetail"


def test_rc_layout_stitches_through_flipped_read():
    """A path through a reverse-complemented read reconstructs the template."""
    from rnabloom_tpu.olc import layout as olc_layout
    from rnabloom_tpu.olc.overlap import OverlapParams

    t = rand_seq(1400)
    reads = [
        sequtils.encode(t[0:600]),
        sequtils.encode(revcomp(t[300:900])),  # middle read flipped
        sequtils.encode(t[600:1400]),
    ]
    unitigs, paths, contained = olc_layout.layout_unitigs(reads, K, OverlapParams())
    best = sequtils.decode(max(unitigs, key=len))
    assert len(best) >= 1200
    assert best in t or revcomp(best) in t


def test_extract_unique_drops_contained_keeps_polya():
    from rnabloom_tpu.olc import layout as olc_layout
    from rnabloom_tpu.olc.overlap import OverlapParams

    t = rand_seq(1000)
    reads = [
        sequtils.encode(t),  # container
        sequtils.encode(t[200:600]),  # contained, no polyA
        sequtils.encode(t[300:700]),  # contained, has polyA flag
    ]
    recs, lens = _overlaps(reads, OverlapParams())
    kept = olc_layout.extract_unique(recs, lens, OverlapParams())
    assert kept == [0]
    kept = olc_layout.extract_unique(
        recs, lens, OverlapParams(), polya_flags=[False, False, True]
    )
    assert kept == [0, 2]


def test_transitive_reduction():
    from rnabloom_tpu.olc import graph as og
    from rnabloom_tpu.olc.overlap import OverlapParams

    t = rand_seq(1200)
    # three reads where 0->1->2 also implies the transitive 0->2
    reads = [
        sequtils.encode(t[0:700]),
        sequtils.encode(t[250:950]),
        sequtils.encode(t[500:1200]),
    ]
    recs, lens = _overlaps(reads, OverlapParams())
    g, contained = og.build_graph(recs, lens, OverlapParams())
    assert not contained
    before = g.num_edges()
    assert before >= 6  # 3 overlaps x 2 (mirror edges)
    removed = g.remove_transitive_edges(fuzz=100)
    assert removed >= 1
    # the chain 0 -> 1 -> 2 must survive
    assert og.vid(1, 0) in g.out_of(og.vid(0, 0))
    assert og.vid(2, 0) in g.out_of(og.vid(1, 0))
    assert og.vid(2, 0) not in g.out_of(og.vid(0, 0))


def test_simple_paths_form_unitig():
    from rnabloom_tpu.olc import graph as og, layout as olc_layout
    from rnabloom_tpu.olc.overlap import OverlapParams

    t = rand_seq(1500)
    reads = [sequtils.encode(t[s : s + 500]) for s in range(0, 1001, 250)]
    recs, lens = _overlaps(reads, OverlapParams())
    g, _ = og.build_graph(recs, lens, OverlapParams())
    g.remove_transitive_edges(fuzz=100)
    paths = g.simple_paths()
    best = max(paths, key=len)
    assert len(best) == len(reads)
    seq = sequtils.decode(olc_layout.stitch_path(best, reads))
    assert seq in t or revcomp(seq) in t
    assert len(seq) >= 1400


def test_consensus_polish_fixes_errors():
    from rnabloom_tpu.olc import consensus as cns
    from rnabloom_tpu.olc import overlap as ov

    t = rand_seq(800)
    unitig = np.array(sequtils.encode(t), np.uint8)
    # corrupt 5 positions of the unitig
    bad = unitig.copy()
    for p in [100, 250, 400, 550, 650]:  # all covered by >= 2 reads
        bad[p] = (bad[p] + 1) % 4
    # clean reads tile the truth; one is reverse-complemented
    reads = [np.array(sequtils.encode(t[s : s + 400]), np.uint8) for s in range(0, 401, 100)]
    reads[2] = np.array(sequtils.encode(revcomp(t[200:600])), np.uint8)

    params = ov.OverlapParams()
    rcodes, rlens = _batch(reads)
    ucodes, ulens = _batch([bad])
    rm = ov.extract_minimizers(rcodes, rlens, K, params.w)
    um = ov.extract_minimizers(ucodes, ulens, K, params.w)
    placements = cns.place_reads(rm, um, rlens, params)
    assert len(placements) == len(reads)
    for p in placements:
        assert p.target == 0
        exp = [0, 100, 200, 300, 400][p.read]
        assert abs(p.start - exp) <= 2
    polished = cns.polish([bad], reads, placements, min_depth=2)[0]
    assert (polished != unitig).sum() == 0  # all five errors fixed


def test_binomial_edge_filter_removes_weak_edge():
    from rnabloom_tpu.olc import graph as og
    from rnabloom_tpu.olc.graph import Edge

    g = og.OverlapGraph(lengths=np.array([1000, 1000, 1000]))
    # edge 0->1: high expected coverage but zero spanning reads -> cut
    g._add_edge(og.vid(0, 0), og.vid(1, 0), Edge(offset=800, ovl=200.0, support=10))
    # edge 1->2: well supported -> kept
    e = Edge(offset=800, ovl=200.0, support=10, weight=20.0)
    g._add_edge(og.vid(1, 0), og.vid(2, 0), e)
    counts = {0: 30.0, 1: 30.0, 2: 30.0}
    # half the reads are shorter than the 200bp overlap: p(span) = 0.5,
    # so 0/30 spanning reads is implausible but 20/30 is fine
    sample = np.concatenate([np.full(250, 100), np.full(250, 600)])
    removed = g.filter_edges_binomial(counts, sample)
    assert removed == 1
    assert og.vid(1, 0) not in g.out_of(og.vid(0, 0))
    assert og.vid(2, 0) in g.out_of(og.vid(1, 0))


def test_binom_cdf_matches_closed_form():
    from rnabloom_tpu.olc.graph import _binom_cdf

    # Binomial(4, 0.5): cdf(2) = (1+4+6)/16
    assert _binom_cdf(2, 4, 0.5) == pytest.approx(11 / 16)
    assert _binom_cdf(4, 4, 0.5) == pytest.approx(1.0)
    assert _binom_cdf(0, 10, 0.9) == pytest.approx(0.1**10, rel=1e-6)


def test_unique_olc_end_to_end():
    from rnabloom_tpu.olc import layout as olc_layout
    from rnabloom_tpu.olc.overlap import OverlapParams

    t1 = rand_seq(1500)
    t2 = rand_seq(1100)
    reads = []
    for t in (t1, t2):
        for _ in range(12):
            s = int(RNG.integers(0, max(len(t) - 600, 1)))
            ln = int(RNG.integers(500, 700))
            frag = t[s : s + ln]
            if RNG.random() < 0.3:
                frag = revcomp(frag)
            reads.append(np.array(sequtils.encode(frag), np.uint8))
    res = olc_layout.unique_olc(
        reads, K, OverlapParams(),
        sample_lengths=np.array([len(r) for r in reads]),
    )
    assert res.n_unique < len(reads)  # containment pruning happened
    assert res.transcripts
    # both transcripts should be substantially reconstructed
    best = {}
    for tx in res.transcripts:
        s = sequtils.decode(tx)
        for name, t in (("t1", t1), ("t2", t2)):
            if s in t or revcomp(s) in t:
                best[name] = max(best.get(name, 0), len(s))
    assert best.get("t1", 0) >= 1000
    assert best.get("t2", 0) >= 700


def test_resolve_junctions_keeps_best_edge():
    from rnabloom_tpu.olc import graph as og
    from rnabloom_tpu.olc.graph import Edge

    g = og.OverlapGraph(lengths=np.array([500, 500, 500]))
    g._add_edge(og.vid(0, 0), og.vid(1, 0), Edge(offset=300, ovl=200.0, support=9))
    g._add_edge(og.vid(0, 0), og.vid(2, 0), Edge(offset=400, ovl=100.0, support=5))
    g._add_edge(og.vid(2, 0), og.vid(1, 0), Edge(offset=450, ovl=50.0, support=2))
    removed = g.resolve_junctions()
    # best out-edge of 0 (ovl 200) survives; the junction rivals are evicted
    assert og.vid(1, 0) in g.out_of(og.vid(0, 0))
    assert og.vid(2, 0) not in g.out_of(og.vid(0, 0))
    assert og.vid(1, 0) not in g.out_of(og.vid(2, 0))
    assert removed == 2


def test_clustered_olc_assembles_separate_transcripts():
    from rnabloom_tpu.olc import layout as olc_layout

    t1, t2 = rand_seq(1200), rand_seq(1200)
    reads = []
    for t in (t1, t2):
        reads += [np.array(sequtils.encode(t[s : s + 500]), np.uint8) for s in range(0, 701, 175)]
    out = olc_layout.ava_clustered_olc(reads, K)
    best = {}
    for s in out:
        d = sequtils.decode(s)
        for name, t in (("t1", t1), ("t2", t2)):
            if d in t or revcomp(d) in t:
                best[name] = max(best.get(name, 0), len(d))
    assert best.get("t1", 0) >= 1100
    assert best.get("t2", 0) >= 1100


def test_trim_split_by_read_depth():
    from rnabloom_tpu.olc import layout as olc_layout

    t = rand_seq(1200)
    # reads cover only [0,500) and [700,1200) at depth >= 2
    reads = []
    for s in (0, 50, 100):
        reads.append(np.array(sequtils.encode(t[s : s + 400]), np.uint8))
    for s in (700, 750, 800):
        reads.append(np.array(sequtils.encode(t[s : s + 400]), np.uint8))
    target = np.array(sequtils.encode(t), np.uint8)
    parts = olc_layout.trim_split_by_read_depth([target], reads, K, min_depth=2, min_len=200)
    assert len(parts) == 2
    a, b = sorted(sequtils.decode(p) for p in (parts[0], parts[1]))
    assert all(p in t for p in (a, b))
    # the uncovered middle [500,700) must be cut out
    assert sum(len(p) for p in (a, b)) < 1150


def test_seeded_unique_olc():
    from rnabloom_tpu.olc import layout as olc_layout

    t = rand_seq(1600)
    reads = []
    for _ in range(20):
        s = int(RNG.integers(0, 1000))
        reads.append(np.array(sequtils.encode(t[s : s + 600]), np.uint8))
    # seeds: a sparse subsample still tiling the transcript
    seeds = [np.array(sequtils.encode(t[s : s + 600]), np.uint8) for s in (0, 400, 800, 1000)]
    res = olc_layout.seeded_unique_olc(
        reads, seeds, K, sample_lengths=np.array([len(r) for r in reads])
    )
    assert res.transcripts
    best = max(res.transcripts, key=len)
    s = sequtils.decode(best)
    assert s in t or revcomp(s) in t
    assert len(s) >= 1200


def test_overlap_layout_consensus_flow():
    """overlapLayoutConsensus / overlapLayoutConsensus2 equivalents: layout +
    N polish rounds reconstruct the source sequence from noisy windows."""
    from rnabloom_tpu.olc import layout as olc_layout
    from rnabloom_tpu.utils import seq as sequtils

    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=900))
    reads = []
    # staggered tiling windows: unambiguous dovetails chain into one unitig
    # (dense random coverage would leave junctions, as in the reference's
    # layoutSimple)
    for s0 in range(0, 500, 100):
        w = list(base[s0 : s0 + 400])
        for j in range(len(w)):
            if rng.random() < 0.005:
                w[j] = rng.choice(list("ACGT"))
        reads.append(sequtils.encode("".join(w)))
    for rounds in (1, 2):
        out = olc_layout.overlap_layout_consensus(reads, 25, polish_rounds=rounds)
        assert out
        best = max(out, key=len)
        assert len(best) >= 500


def test_map_clustered_olc_flow():
    """mapClusteredOLC equivalent: two separate transcripts come out as two
    clusters, each assembled."""
    from rnabloom_tpu.olc import layout as olc_layout
    from rnabloom_tpu.utils import seq as sequtils

    rng = np.random.default_rng(13)
    bases = ["".join(rng.choice(list("ACGT"), size=600)) for _ in range(2)]
    reads = []
    for b in bases:
        for i in range(25):
            s0 = rng.integers(0, 200)
            reads.append(sequtils.encode(b[s0 : s0 + 400]))
    out = olc_layout.map_clustered_olc(reads, 25)
    assert out
    for b in bases:
        assert any(
            sequtils.decode(o) in b or sequtils.revcomp(sequtils.decode(o)) in b
            for o in out
            if len(o) >= 400
        ), "cluster not reconstructed"


def test_bottom_sketch_containment_resemblance():
    """Bottom-sketch MinHash estimators (GraphUtils.java:2787-2977)."""
    import numpy as np

    from rnabloom_tpu.olc import sketch

    rng = np.random.default_rng(13)
    t = rng.integers(0, 4, size=2000).astype(np.uint8)
    a = t[:1500]          # contained in t
    b = t[500:2000]       # 1000bp overlap with a
    c = rng.integers(0, 4, size=1500).astype(np.uint8)  # unrelated

    k = 25
    sk = sketch.bottom_sketches([a, b, c, t], k, s=200)
    full_t = sketch._kmer_hashes(t, k)
    assert sketch.containment(sk[0], full_t) > 0.95   # a fully in t
    assert sketch.containment(sk[2], full_t) < 0.05   # c unrelated

    r_ab = sketch.resemblance(sk[0], sk[1])
    r_ac = sketch.resemblance(sk[0], sk[2])
    assert r_ab > 0.2       # ~1000/2000 Jaccard
    assert r_ac < 0.02

    clusters = sketch.containment_clusters([a, b, c], k, min_containment=0.3)
    by_member = {}
    for ci, cl in enumerate(clusters):
        for m in cl:
            by_member[m] = ci
    assert by_member[0] == by_member[1]   # a and b share a cluster
    assert by_member[2] != by_member[0]   # c is alone


def test_ava_clustered_sketch_mode():
    import numpy as np

    from rnabloom_tpu.olc import layout as olc_layout

    rng = np.random.default_rng(14)
    t1 = rng.integers(0, 4, size=900).astype(np.uint8)
    t2 = rng.integers(0, 4, size=900).astype(np.uint8)
    reads = [t1[i : i + 500] for i in range(0, 401, 100)] + [
        t2[i : i + 500] for i in range(0, 401, 100)
    ]
    out = olc_layout.ava_clustered_olc(reads, 25, sketch_cluster=True)
    assert len(out) >= 2
    # both source transcripts are represented by long assembled pieces
    outs = [o.tobytes() for o in out]
    assert any(len(o) >= 700 for o in out)


def test_layout_backbones():
    """Backbone layout (Layout.java:4060-4309): dovetail chains merge into
    backbones, contained reads drop, isolated reads pass through."""
    import numpy as np

    from rnabloom_tpu.olc import layout as olc_layout

    rng = np.random.default_rng(21)
    t = rng.integers(0, 4, size=1200).astype(np.uint8)
    chain = [t[0:500], t[300:800], t[600:1100]]  # dovetail chain
    contained = t[350:700]  # inside the chain's reads
    isolated = rng.integers(0, 4, size=400).astype(np.uint8)
    out = olc_layout.layout_backbones(chain + [contained, isolated], 25)
    lens = sorted(len(o) for o in out)
    # one long backbone (~1100), the isolated read, no contained read
    assert max(lens) >= 1000, lens
    assert any(len(o) == 400 for o in out)
    assert len(out) <= 3
