"""Long-read correction, subsampling, OLC, and the -long pipeline."""

import glob
import gzip
import os

import numpy as np
import pytest

from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(55)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def add_noise(seq, rate):
    out = []
    for c in seq:
        r = RNG.random()
        if r < rate * 0.5:  # substitution
            out.append("ACGT"[RNG.integers(4)])
        elif r < rate * 0.75:  # deletion
            continue
        else:
            out.append(c)
            if r > 1 - rate * 0.25:  # insertion
                out.append("ACGT"[RNG.integers(4)])
    return "".join(out)


def test_correction_bridges_error_gaps():
    import jax.numpy as jnp

    from rnabloom_tpu.assembly import longreads as lrmod
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg

    t = rand_seq(1000)
    cfg = dbg.GraphConfig(
        k=25, stranded=False,
        dbgbf=BloomConfig(20, 2),
        cbf=CountingConfig(20, 2, 18),
        pkbf=BloomConfig(20, 2),
    )
    state = dbg.make_graph(cfg)
    # clean coverage so the graph holds the truth
    frags = [t[i : i + 200] for i in range(0, 801, 40)] * 3
    arr = np.full((len(frags), 200), 4, np.uint8)
    for i, f in enumerate(frags):
        arr[i, : len(f)] = sequtils.encode(f)
    state = dbg.build_step(state, cfg, jnp.asarray(arr))

    # a noisy read: clean flanks with an error patch in the middle
    noisy = t[100:300] + add_noise(t[300:340], 0.3) + t[340:600]
    segs = lrmod.correct_batch(
        state, cfg, [sequtils.encode(noisy)], lrmod.LongReadParams(min_kmer_cov=2)
    )[0]
    assert len(segs) >= 1
    best = max(segs, key=len)
    # the corrected segment must match the true sequence
    assert sequtils.decode(best) in t
    assert len(best) >= 450


def test_subsampler_keeps_novel_reads():
    from rnabloom_tpu.assembly import longreads as lrmod
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg

    cfg = dbg.GraphConfig(
        k=25, stranded=False,
        dbgbf=BloomConfig(16, 2), cbf=CountingConfig(16, 2, 14), pkbf=BloomConfig(16, 2),
    )
    a, b = rand_seq(400), rand_seq(400)
    reads = [sequtils.encode(a)] * 10 + [sequtils.encode(b)]
    keep = lrmod.subsample_kmer_based(cfg, reads, max_multiplicity=3)
    assert 10 in keep  # the unique read survives
    assert len(keep) <= 5  # redundant copies dropped


def test_overlap_and_layout():
    from rnabloom_tpu.olc import layout as olc_layout

    t = rand_seq(1200)
    # tiling reads with 300bp overlap
    reads = [sequtils.encode(t[s : s + 500]) for s in range(0, 701, 200)]
    # plus one contained read
    reads.append(sequtils.encode(t[250:550]))
    unitigs, paths, contained = olc_layout.layout_unitigs(reads, 15, _op())
    assert len(contained) >= 1
    # the tiling reads merge into one unitig spanning the transcript
    best = max(unitigs, key=len)
    seq = sequtils.decode(best)
    assert len(seq) >= 900
    assert seq in t


def _op():
    from rnabloom_tpu.olc.overlap import OverlapParams

    return OverlapParams()


@pytest.mark.slow
def test_long_pipeline_e2e(tmp_path):
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.io import fastx

    transcripts = [rand_seq(900) + "A" * 15, rand_seq(700)]
    path = os.path.join(str(tmp_path), "long.fa.gz")
    with gzip.open(path, "wt") as f:
        rid = 0
        for t in transcripts:
            for _ in range(25):
                s = RNG.integers(0, max(len(t) - 600, 1))
                e = min(len(t), s + 600 + RNG.integers(0, 200))
                read = add_noise(t[s:e], 0.06)
                if RNG.random() < 0.5:
                    read = sequtils.revcomp(read)
                f.write(f">lr{rid}\n{read}\n")
                rid += 1

    params = pl.PipelineParams(total_mem_bytes=1 << 24, min_transcript_length=200)
    report = pl.assemble_long([path], str(tmp_path / "out"), params)
    assert report.num_fragments > 0
    assert report.num_transcripts > 0
    assembled = [
        s.upper() for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    # each transcript should have a long exact match in some assembly
    rec = 0
    for t in transcripts:
        rc = sequtils.revcomp(t)
        m = 300
        hit = any(
            t[off : off + m] in a or rc[off : off + m] in a
            for a in assembled
            for off in range(0, len(t) - m + 1, 100)
        )
        rec += hit
    assert rec >= 1, "no transcript recovered from long reads"


def test_strobemer_subsampler():
    from rnabloom_tpu.assembly import longreads as lrmod
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg

    cfg = dbg.GraphConfig(
        k=15, stranded=False,
        dbgbf=BloomConfig(16, 2), cbf=CountingConfig(16, 2, 14), pkbf=BloomConfig(16, 2),
    )
    a, b = rand_seq(500), rand_seq(500)
    reads = [sequtils.encode(a)] * 10 + [sequtils.encode(b)]
    keep = lrmod.subsample_strobemer_based(cfg, reads, max_multiplicity=3)
    assert 10 in keep
    assert len(keep) <= 5


def test_minimizer_subsampler_and_minimal_set():
    from rnabloom_tpu.assembly import longreads as lrmod
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg

    cfg = dbg.GraphConfig(
        k=15, stranded=False,
        dbgbf=BloomConfig(16, 2), cbf=CountingConfig(16, 2, 14), pkbf=BloomConfig(16, 2),
    )
    a, b = rand_seq(400), rand_seq(400)
    reads = [sequtils.encode(a)] * 8 + [sequtils.encode(b)]
    keep = lrmod.subsample_minimizer_based(cfg, reads, max_multiplicity=3)
    assert 8 in keep and len(keep) <= 5

    # minimal set: duplicates contribute nothing new
    keep2 = lrmod.minimal_set(cfg, reads)
    assert keep2 == [0, 8] or (8 in keep2 and len(keep2) == 2)


def test_long_pipeline_knobs(tmp_path):
    """-rc/-lrrd/-mw/-son wiring through the long-read pipeline."""
    import gzip

    from rnabloom_tpu.assembly import pipeline
    from rnabloom_tpu.utils import seq as sequtils

    rng = np.random.default_rng(5)
    t = "".join(rng.choice(list("ACGT"), size=800))
    with gzip.open(tmp_path / "lr.fa.gz", "wt") as f:
        for i in range(60):
            s0 = rng.integers(0, 300)
            w = t[s0 : s0 + 500]
            f.write(f">r{i}\n{w}\n")

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 22,
        revcomp_long=True,  # all reads flipped; assembly must still work
        lr_min_depth=2,
        minimizer_window=12,
        sketch_overlap_num=3,
    )
    report = pipeline.assemble_long([str(tmp_path / "lr.fa.gz")], str(tmp_path / "out"), params)
    assert report.num_transcripts >= 1
    out = [
        s for _, s in __import__("rnabloom_tpu.io.fastx", fromlist=["x"]).read_fasta(
            str(tmp_path / "out" / "rnabloom.transcripts.fa")
        )
    ]
    # revcomp-long flips every read, so the assembly matches the rc strand
    rc = sequtils.revcomp(t)
    assert any(s.upper() in rc or s.upper() in t for s in out)


def test_hpc_clustered_olc():
    from rnabloom_tpu.olc import layout as olc_layout
    from rnabloom_tpu.utils import seq as sequtils

    rng = np.random.default_rng(9)
    base = "".join(rng.choice(list("ACGT"), size=600))
    reads = []
    for i in range(20):
        s0 = rng.integers(0, 200)
        reads.append(sequtils.encode(base[s0 : s0 + 400]))
    out = olc_layout.ava_clustered_olc(reads, 25, hpc=True)
    assert len(out) >= 1


@pytest.mark.slow
def test_long_pipeline_resume(tmp_path):
    """LONGREADS.CORRECTED stamp lets a rerun skip stages 1-2
    (RNABloom.java:5818-5825, :6451-6500)."""
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.utils import checkpoint as ckpt

    t = rand_seq(800)
    path = os.path.join(str(tmp_path), "long.fa")
    with open(path, "w") as f:
        for rid in range(20):
            s = RNG.integers(0, 200)
            f.write(f">lr{rid}\n{add_noise(t[s : s + 600], 0.03)}\n")

    out = tmp_path / "out"
    params = pl.PipelineParams(total_mem_bytes=1 << 24, stop_stage=2)
    r1 = pl.assemble_long([path], str(out), params)
    assert r1.num_fragments > 0
    assert ckpt.has_stamp(str(out), ckpt.STAMP_LONGREADS_CORRECTED)

    # rerun resumes from the corrected reads: no stage-1 stats this time
    params2 = pl.PipelineParams(total_mem_bytes=1 << 24)
    r2 = pl.assemble_long([path], str(out), params2)
    assert r2.stage1 is None  # stages 1-2 skipped
    assert r2.num_fragments == r1.num_fragments
    assert ckpt.has_stamp(str(out), ckpt.STAMP_LONGREADS_ASSEMBLED)


@pytest.mark.slow
def test_long_e2e_exact_sequences(tmp_path):
    """6% error including indels: emitted transcripts must be EXACT
    substrings of the truth (no residual frameshifts) — the indel-aware
    consensus polish at work (racon's role, OverlapLayoutConsensus:849)."""
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.io import fastx

    transcripts = [rand_seq(1200), rand_seq(900)]
    path = os.path.join(str(tmp_path), "long6.fa")
    with open(path, "w") as f:
        rid = 0
        for t in transcripts:
            for _ in range(40):
                s = RNG.integers(0, max(len(t) - 600, 1))
                e = min(len(t), s + 600 + RNG.integers(0, 150))
                read = add_noise(t[s:e], 0.06)
                if RNG.random() < 0.5:
                    read = sequtils.revcomp(read)
                f.write(f">lr{rid}\n{read}\n")
                rid += 1

    params = pl.PipelineParams(total_mem_bytes=1 << 24, min_transcript_length=300)
    report = pl.assemble_long([path], str(tmp_path / "out"), params)
    assert report.num_transcripts > 0
    assembled = [
        s.upper()
        for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    exact = 0
    for a in assembled:
        rc = sequtils.revcomp(a)
        exact += any(a in t or rc in t for t in transcripts)
    assert exact >= max(1, int(0.8 * len(assembled))), (
        f"only {exact}/{len(assembled)} emitted transcripts are exact"
    )


@pytest.mark.slow
def test_minimizer_extraction_bounded_memory():
    """100k-read ONT-scale minimizer extraction stays within a bounded RSS.

    The old path padded ALL reads into one dense (n_reads, max_len) matrix
    before hashing — one 8 kb read among 100k short ones allocated
    gigabytes of padding (and 8x that in uint64 hash planes).  The chunked
    extractor (olc/overlap.extract_minimizers_reads) keeps host memory
    proportional to the chunk, not the read count x max length.
    """
    import resource

    from rnabloom_tpu.olc import overlap as ovl

    rng = np.random.default_rng(123)
    reads = [
        rng.integers(0, 4, size=int(n), dtype=np.uint8)
        for n in rng.integers(250, 450, size=100_000)
    ]
    reads.append(rng.integers(0, 4, size=8192, dtype=np.uint8))  # one long read

    mins = ovl.extract_minimizers_reads(reads, 25, 10)
    assert mins.key.size > 1_000_000  # ~2/(w+1) per base over ~35 Mbp
    assert mins.read.max() == len(reads) - 1

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    # dense padding would exceed 100001 * 8192 * (1 + 8 + 8) B ~= 14 GB;
    # chunked extraction keeps the whole process under a few GB
    assert rss_gb < 4.0, f"RSS {rss_gb:.2f} GB — minimizer path not bounded"


def test_long_pipeline_writes_paf(tmp_path):
    """-paf leaves the internal ava overlaps as a PAF artifact that the
    reader round-trips (the reference's `*.ava.paf.gz` interop)."""
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.io import paf as pafmod

    rng = np.random.default_rng(31)
    t = "".join(rng.choice(list("ACGT"), size=900))
    reads = []
    for _ in range(40):
        s = rng.integers(0, 300)
        reads.append(t[s : s + 600])
    path = tmp_path / "lr.fa"
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    params = pl.PipelineParams(
        total_mem_bytes=1 << 24, min_transcript_length=300, write_paf=True
    )
    rep = pl.assemble_long([str(path)], str(tmp_path / "out"), params)
    paf_path = tmp_path / "out" / "rnabloom.ava.paf"
    assert paf_path.exists()
    recs = list(pafmod.read_paf(str(paf_path)))
    assert recs, "no overlaps written"
    for r in recs[:5]:
        assert r.qlen > 0 and r.tlen > 0
        assert 0 <= r.qstart < r.qend <= r.qlen
        assert r.strand in "+-"


def test_pafin_roundtrip_feeds_olc(tmp_path):
    """-pafin: an external ava PAF (here: our own -paf artifact, standing
    in for minimap2) replaces the internal overlapper and still assembles
    the same transcript set — the read-side interop bridge
    (olc/OverlapLayoutConsensus.java:78-106)."""
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.io import paf as pafmod

    rng = np.random.default_rng(32)
    t = "".join(rng.choice(list("ACGT"), size=900))
    reads = []
    for _ in range(40):
        s = rng.integers(0, 300)
        reads.append(t[s : s + 600])
    path = tmp_path / "lr.fa"
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    params = pl.PipelineParams(
        total_mem_bytes=1 << 24, min_transcript_length=300, write_paf=True
    )
    pl.assemble_long([str(path)], str(tmp_path / "a"), params)
    paf_path = str(tmp_path / "a" / "rnabloom.ava.paf")

    # SoA round-trip: write -> read back preserves geometry
    n_corr = sum(1 for _ in open(tmp_path / "a" / "rnabloom.longreads.corrected.long.fa") if _.startswith(">"))
    ov = pafmod.paf_to_overlaps(paf_path, {f"lr.{i}": i for i in range(n_corr)}, 17)
    assert len(ov) > 0
    assert (ov.q_end > ov.q_start).all() and (ov.t_end > ov.t_start).all()
    assert set(np.unique(ov.strand)) <= {-1, 1}

    params2 = pl.PipelineParams(
        total_mem_bytes=1 << 24, min_transcript_length=300, paf_in=paf_path
    )
    rep2 = pl.assemble_long([str(path)], str(tmp_path / "b"), params2)
    assert rep2.num_transcripts > 0
    # same input + equivalent overlap source -> same assembled transcript
    fa = lambda d: sorted(
        l.strip().upper() for l in open(tmp_path / d / "rnabloom.transcripts.fa")
        if not l.startswith(">")
    )
    assert fa("a") == fa("b")


def test_paf_to_overlaps_screens_and_dedup(tmp_path):
    """External PAF records get the internal engine's span/support screens
    (overlap.py:329-334) and symmetric A->B / B->A duplicates collapse to
    one record, so interior depth is not double-counted in extract_unique."""
    from rnabloom_tpu.io import paf as pafmod
    from rnabloom_tpu.olc.overlap import OverlapParams

    k = 17
    lines = [
        # good overlap, both directions (symmetric duplicate, B->A weaker)
        "r0\t600\t0\t400\t+\tr1\t600\t200\t600\t380\t400\t255",
        "r1\t600\t200\t600\t+\tr0\t600\t0\t400\t360\t400\t255",
        # span below min_overlap: screened out
        "r0\t600\t0\t80\t+\tr2\t600\t500\t580\t70\t80\t255",
        # trivial support (num_match < min_shared * k): screened out
        "r1\t600\t0\t300\t+\tr2\t600\t300\t600\t20\t300\t255",
        # self-hit: dropped
        "r2\t600\t0\t600\t+\tr2\t600\t0\t600\t600\t600\t255",
    ]
    path = tmp_path / "ext.paf"
    path.write_text("\n".join(lines) + "\n")
    names = {f"r{i}": i for i in range(3)}

    params = OverlapParams(min_overlap=150, min_shared=4)
    ov = pafmod.paf_to_overlaps(str(path), names, k, params=params)
    assert len(ov) == 1
    # the kept record is the higher-num_match direction (r0 -> r1)
    assert int(ov.q[0]) == 0 and int(ov.t[0]) == 1
    assert int(ov.q_start[0]) == 0 and int(ov.q_end[0]) == 400

    # without params, screens are off but dedup still applies
    ov2 = pafmod.paf_to_overlaps(str(path), names, k)
    assert len(ov2) == 3


_MM2_FIXTURES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "golden", "minimap2_fixtures", "*"))
)


@pytest.mark.slow
@pytest.mark.skipif(
    not _MM2_FIXTURES,
    reason="no vendored minimap2 PAF fixtures committed "
    "(tools/make_minimap2_paf_fixture.sh generates them on any machine with minimap2)",
)
@pytest.mark.parametrize("fixture", _MM2_FIXTURES, ids=os.path.basename)
def test_internal_overlapper_vs_vendored_minimap2(fixture, tmp_path):
    """Drive the SAME reads through (a) the internal minimizer overlapper
    and (b) a vendored real minimap2 ava PAF via -pafin, and assert the
    internal engine's assembly is equivalent-or-better: it must cover
    >= 90% of the minimap2-driven assembly's canonical k-mers (and, when
    the fixture carries a truth.fa, match or beat its truth recall)."""
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.io import fastx
    from rnabloom_tpu.utils import lrsim

    reads = os.path.join(fixture, "reads.fa.gz")
    paf = os.path.join(fixture, "minimap2.ava.paf")
    base = dict(total_mem_bytes=1 << 26, min_transcript_length=200)

    rep_int = pl.assemble_long(
        [reads], str(tmp_path / "internal"), pl.PipelineParams(**base)
    )
    rep_mm2 = pl.assemble_long(
        [reads], str(tmp_path / "mm2"), pl.PipelineParams(**base, paf_in=paf)
    )
    assert rep_int.num_transcripts > 0

    fa = lambda d: [
        s for _, s in fastx.read_fasta(str(tmp_path / d / "rnabloom.transcripts.fa"))
    ]
    internal, mm2 = fa("internal"), fa("mm2")
    if mm2:
        cover = lrsim.evaluate(internal, mm2, cov_frac=0.9)
        assert cover["lr_mean_truth_cov"] >= 0.9, cover

    truth_fa = os.path.join(fixture, "truth.fa")
    if os.path.exists(truth_fa):
        truth = [s for _, s in fastx.read_fasta(truth_fa)]
        m_int = lrsim.evaluate(internal, truth)
        m_mm2 = lrsim.evaluate(mm2, truth)
        assert m_int["lr_recall"] >= m_mm2["lr_recall"], (m_int, m_mm2)
