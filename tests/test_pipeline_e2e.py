"""End-to-end PE assembly on a simulated transcriptome."""

import gzip
import os

import numpy as np
import pytest

from rnabloom_tpu.assembly import pipeline
from rnabloom_tpu.io import fastx
from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(31337)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def write_pe_fastq(transcripts, tmpdir, coverage=30, read_len=100, frag_len=250, n_min=50):
    """Simulate error-free FR paired reads from transcripts."""
    left = os.path.join(tmpdir, "reads_1.fq.gz")
    right = os.path.join(tmpdir, "reads_2.fq.gz")
    q = "I" * read_len
    with gzip.open(left, "wt") as fl, gzip.open(right, "wt") as fr:
        rid = 0
        for t in transcripts:
            n_frags = max(n_min, coverage * len(t) // (2 * read_len))
            for _ in range(n_frags):
                fl_len = min(frag_len, len(t))
                s = RNG.integers(0, len(t) - fl_len + 1)
                frag = t[s : s + fl_len]
                l = frag[:read_len]
                r = sequtils.revcomp(frag[-read_len:])  # FR orientation
                fl.write(f"@r{rid}/1\n{l}\n+\n{q[:len(l)]}\n")
                fr.write(f"@r{rid}/2\n{r}\n+\n{q[:len(r)]}\n")
                rid += 1
    return left, right


@pytest.mark.slow
def test_pe_assembly_recovers_transcripts(tmp_path):
    transcripts = [rand_seq(500) for _ in range(5)]
    left, right = write_pe_fastq(transcripts, str(tmp_path))

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 24, batch_size=256, sample_size=200
    )
    report = pipeline.assemble_pe(left, right, str(tmp_path / "out"), params)

    assert report.num_fragments > 0
    assert report.num_transcripts > 0

    assembled = [
        s for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    # every source transcript should be covered by some assembled sequence
    # (>=90% of its length contained, allowing strand flips)
    recovered = 0
    for t in transcripts:
        rc = sequtils.revcomp(t)
        best = 0
        for a in assembled:
            for probe in (t, rc):
                if probe in a:
                    best = max(best, len(probe))
                    continue
                # longest prefix/suffix containment
                for frac in (0.95, 0.9):
                    m = int(len(probe) * frac)
                    for off in range(0, len(probe) - m + 1, 25):
                        if probe[off : off + m] in a:
                            best = max(best, m)
                            break
        if best >= 0.9 * len(t):
            recovered += 1
    assert recovered >= 4, f"only {recovered}/5 transcripts recovered"


@pytest.mark.slow
def test_se_assembly(tmp_path):
    transcripts = [rand_seq(400) for _ in range(3)]
    path = os.path.join(str(tmp_path), "reads.fq.gz")
    read_len = 100
    q = "I" * read_len
    with gzip.open(path, "wt") as f:
        rid = 0
        for t in transcripts:
            for _ in range(120):
                s = RNG.integers(0, len(t) - read_len + 1)
                f.write(f"@r{rid}\n{t[s:s+read_len]}\n+\n{q}\n")
                rid += 1

    from rnabloom_tpu.assembly import pipeline as pl

    params = pl.PipelineParams(total_mem_bytes=1 << 24, batch_size=256)
    report = pl.assemble_se([path], str(tmp_path / "out"), params)
    assert report.num_fragments > 0
    assert report.num_transcripts > 0
    assembled = [
        s for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    recovered = 0
    for t in transcripts:
        rc = sequtils.revcomp(t)
        m = int(len(t) * 0.8)
        hit = any(
            t[off : off + m] in a or rc[off : off + m] in a
            for a in assembled
            for off in range(0, len(t) - m + 1, 50)
        )
        recovered += hit
    assert recovered >= 2, f"only {recovered}/3 recovered"
    # nr output exists and is non-empty
    nr = list(fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.nr.fa")))
    assert len(nr) >= 1


@pytest.mark.slow
def test_pooled_assembly(tmp_path):
    from rnabloom_tpu.assembly import pipeline as pl

    t_shared = rand_seq(450)
    t_a = rand_seq(450)
    t_b = rand_seq(450)
    la, ra = write_pe_fastq([t_shared, t_a], str(tmp_path), n_min=60)
    os.rename(la, str(tmp_path / "a_1.fq.gz"))
    os.rename(ra, str(tmp_path / "a_2.fq.gz"))
    lb, rb = write_pe_fastq([t_shared, t_b], str(tmp_path), n_min=60)
    os.rename(lb, str(tmp_path / "b_1.fq.gz"))
    os.rename(rb, str(tmp_path / "b_2.fq.gz"))

    pool = tmp_path / "pool.txt"
    pool.write_text(
        f"sampleA {tmp_path}/a_1.fq.gz {tmp_path}/a_2.fq.gz\n"
        f"sampleB {tmp_path}/b_1.fq.gz {tmp_path}/b_2.fq.gz\n"
    )
    params = pl.PipelineParams(total_mem_bytes=1 << 24, batch_size=256, sample_size=100)
    reports = pl.assemble_pool(str(pool), str(tmp_path / "out"), params)
    assert set(reports) == {"sampleA", "sampleB"}
    for name in ("sampleA", "sampleB"):
        assert reports[name].num_transcripts > 0
        fa = tmp_path / "out" / name / "rnabloom.transcripts.fa"
        assert fa.exists()
        seqs = [s for _, s in fastx.read_fasta(str(fa))]
        assert len(seqs) >= 1


@pytest.mark.slow
def test_pe_resume_from_stamps(tmp_path):
    from rnabloom_tpu.assembly import pipeline as pl
    from rnabloom_tpu.utils import checkpoint as ckpt

    transcripts = [rand_seq(450) for _ in range(3)]
    left, right = write_pe_fastq(transcripts, str(tmp_path), n_min=60)
    out = str(tmp_path / "out")
    params = pl.PipelineParams(total_mem_bytes=1 << 24, batch_size=256, sample_size=100)
    r1 = pl.assemble_pe(left, right, out, params, save_graph=True)
    assert r1.num_transcripts > 0
    assert ckpt.has_stamp(out, ckpt.STAMP_FRAGMENTS_DONE)
    assert ckpt.has_stamp(out, ckpt.STAMP_TRANSCRIPTS_DONE)

    # resume: stage 1/2 skipped (num_pairs stays 0), same transcript count
    r2 = pl.assemble_pe(left, right, out, params)
    assert r2.num_pairs == 0
    assert r2.num_fragments == r1.num_fragments
    assert r2.num_transcripts > 0


@pytest.mark.slow
def test_mixed_pe_se_assembly(tmp_path):
    from rnabloom_tpu.assembly import pipeline as pl

    t_pe = rand_seq(450)
    t_se = rand_seq(450)
    left, right = write_pe_fastq([t_pe], str(tmp_path), n_min=80)
    se = str(tmp_path / "se.fq.gz")
    q = "I" * 100
    with gzip.open(se, "wt") as f:
        for i in range(150):
            s = RNG.integers(0, len(t_se) - 100 + 1)
            f.write(f"@se{i}\n{t_se[s:s+100]}\n+\n{q}\n")

    params = pl.PipelineParams(total_mem_bytes=1 << 24, batch_size=256, sample_size=100)
    report = pl.assemble_pe(
        left, right, str(tmp_path / "out"), params, sef_paths=[se]
    )
    assert report.num_transcripts > 0
    # SE reads contribute unconnected fragments (on top of the PE pairs)
    assert report.num_fragments > 80
    assembled = [
        s.upper() for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    # the PE transcript must be recovered; SE-only regions lack fragment-pair
    # support and are dropped by the break check in a PE run — the
    # reference's breakWithFragPairedKmers does the same
    # (RNABloom.java:1857-1880)
    rc = sequtils.revcomp(t_pe)
    m = int(len(t_pe) * 0.7)
    assert any(
        t_pe[off : off + m] in a or rc[off : off + m] in a
        for a in assembled
        for off in range(0, len(t_pe) - m + 1, 50)
    ), "PE transcript not recovered in mixed run"


@pytest.mark.slow
def test_stage_termination_name_and_norr(tmp_path):
    """-stage/-n/-norr wiring: stage 1 stops after the graph (DBG.DONE stamp,
    no transcripts); custom name prefixes output files; -norr skips nr.fa."""
    transcripts = [rand_seq(400) for _ in range(2)]
    left, right = write_pe_fastq(transcripts, str(tmp_path), coverage=10, n_min=30)

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 22, batch_size=128, sample_size=50,
        name="asm", stop_stage=1,
    )
    out1 = tmp_path / "out1"
    report = pipeline.assemble_pe(left, right, str(out1), params)
    assert report.num_transcripts == 0
    assert (out1 / "DBG.DONE").exists()
    assert not (out1 / "asm.transcripts.fa").exists()

    params.stop_stage = 3
    params.no_reduce = True
    out2 = tmp_path / "out2"
    report = pipeline.assemble_pe(left, right, str(out2), params)
    assert (out2 / "asm.transcripts.fa").exists()
    assert (out2 / "asm.report.json").exists()
    assert not (out2 / "asm.transcripts.nr.fa").exists()
    assert report.num_nr == 0


@pytest.mark.slow
def test_fpr_autoresize_rebuilds_undersized_filters(tmp_path):
    """A deliberately tiny filter allocation must be doubled until the FPR
    target is met (the reference's resize/repopulate loop,
    RNABloom.java:7142-7180)."""
    transcripts = [rand_seq(600) for _ in range(3)]
    left, right = write_pe_fastq(transcripts, str(tmp_path), coverage=8, n_min=40)

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 14,  # absurdly small: forces FPR breach
        batch_size=128, sample_size=50, stop_stage=1,
    )
    report = pipeline.assemble_pe(left, right, str(tmp_path / "out"), params)
    worst = max(report.stage1.fprs.values())
    assert worst <= 0.01, f"autosize failed: FPRs {report.stage1.fprs}"


@pytest.mark.slow
def test_option_knobs_pe(tmp_path):
    """-extend/-nofc/-chimera/-artifact/-stratum/-a wiring: the PE pipeline
    runs with all behavioral knobs flipped and still assembles."""
    transcripts = [rand_seq(400) + "A" * 20 for _ in range(2)]
    left, right = write_pe_fastq(transcripts, str(tmp_path), coverage=10, n_min=30)

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 22, batch_size=128, sample_size=50,
        extend_fragments=True, frag_consistency=False,
        keep_artifacts=True, keep_chimeras=True,
        branch_free_stratum="e1", polya_min_len=10,
        lookahead=2, max_tip_length=10, err_corr_iters=1,
        max_cov_gradient=0.4, no_reduce=True,
    )
    report = pipeline.assemble_pe(left, right, str(tmp_path / "out"), params)
    assert report.num_fragments > 0
    assert report.num_transcripts > 0


@pytest.mark.slow
def test_rescue_unconnected_pairs(tmp_path):
    """-rescue wiring (rescueUnconnectedMultiThreaded, RNABloom.java:
    2392-2668): gap pairs that fail to bridge under the tiny initial walk
    bound are retried against the fragment graph with the learned bound and
    connect on the second attempt."""
    import gzip as _gzip

    t = rand_seq(600)
    left = str(tmp_path / "g_1.fq.gz")
    right = str(tmp_path / "g_2.fq.gz")
    read_len = 100
    with _gzip.open(left, "wt") as fl, _gzip.open(right, "wt") as fr:
        rid = 0
        # gap pairs first (fragment 300, inner gap 100): with bound=20 the
        # bridge walk cannot span the gap, so batch 1 leaves them unconnected
        for _ in range(6):
            s = RNG.integers(0, len(t) - 300 + 1)
            l = t[s : s + read_len]
            r = sequtils.revcomp(t[s + 200 : s + 300])
            fl.write(f"@g{rid}/1\n{l}\n+\n{'I' * read_len}\n")
            fr.write(f"@g{rid}/2\n{r}\n+\n{'I' * read_len}\n")
            rid += 1
        # overlap pairs (fragment 150): connect by direct overlap regardless
        # of the bound, fill the length sample, and cover t densely
        for _ in range(300):
            s = RNG.integers(0, len(t) - 150 + 1)
            frag = t[s : s + 150]
            l, r = frag[:read_len], sequtils.revcomp(frag[-read_len:])
            fl.write(f"@o{rid}/1\n{l}\n+\n{'I' * read_len}\n")
            fr.write(f"@o{rid}/2\n{r}\n+\n{'I' * read_len}\n")
            rid += 1

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 24, batch_size=64, sample_size=100,
        bound=20, rescue_unconnected=True, no_reduce=True,
    )
    report = pipeline.assemble_pe(left, right, str(tmp_path / "out"), params)
    assert report.num_rescued >= 1, f"no pairs rescued ({report.num_fragments} fragments)"
    assert report.num_transcripts > 0


@pytest.mark.slow
def test_quality_split_reads_still_connect(tmp_path):
    """A mid-read Q0 base splits the mate into segments; stage 2 re-joins
    them through the graph (connect(segments)) and the pair still yields a
    connected fragment."""
    import gzip as _gzip

    t = rand_seq(500)
    left = str(tmp_path / "q_1.fq.gz")
    right = str(tmp_path / "q_2.fq.gz")
    read_len, frag_len = 100, 250
    with _gzip.open(left, "wt") as fl, _gzip.open(right, "wt") as fr:
        rid = 0
        for _ in range(150):
            s = RNG.integers(0, len(t) - frag_len + 1)
            frag = t[s : s + frag_len]
            l, r = frag[:read_len], sequtils.revcomp(frag[-read_len:])
            lq = list("I" * read_len)
            lq[50] = "!"  # Q0 base mid-read on every left mate
            fl.write(f"@r{rid}/1\n{l}\n+\n{''.join(lq)}\n")
            fr.write(f"@r{rid}/2\n{r}\n+\n{'I' * read_len}\n")
            rid += 1

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 24, batch_size=256, sample_size=100, no_reduce=True
    )
    report = pipeline.assemble_pe(left, right, str(tmp_path / "out"), params)
    # most pairs connect despite every left mate being split at base 50
    assert report.num_fragments >= 0.8 * report.num_pairs, (
        f"{report.num_fragments}/{report.num_pairs} connected"
    )
    assert report.num_transcripts > 0


def _noisy_read(read, rng, sub=0.007, indel=0.001):
    out = []
    for c in read:
        r = rng.random()
        if r < indel * 0.5:
            continue  # deletion
        out.append("ACGT"[rng.integers(4)] if r < sub else c)
        if r > 1 - indel * 0.5:
            out.append("ACGT"[rng.integers(4)])  # insertion
    return "".join(out)


@pytest.mark.slow
def test_pe_assembly_noisy_reads(tmp_path):
    """Realistic noisy short reads (0.7% substitutions + occasional
    1-base indels): the PE pipeline still recovers the transcripts —
    exercising indel-capable EC + segment handling end to end."""
    import gzip as _gzip

    rng = np.random.default_rng(777)
    transcripts = [rand_seq(500) for _ in range(4)]
    left = str(tmp_path / "n_1.fq.gz")
    right = str(tmp_path / "n_2.fq.gz")
    with _gzip.open(left, "wt") as fl, _gzip.open(right, "wt") as fr:
        rid = 0
        for t in transcripts:
            for _ in range(120):
                s = rng.integers(0, len(t) - 250 + 1)
                frag = t[s : s + 250]
                l = _noisy_read(frag[:100], rng)
                r = _noisy_read(sequtils.revcomp(frag[-100:]), rng)
                fl.write(f"@r{rid}/1\n{l}\n+\n{'I' * len(l)}\n")
                fr.write(f"@r{rid}/2\n{r}\n+\n{'I' * len(r)}\n")
                rid += 1

    params = pipeline.PipelineParams(
        total_mem_bytes=1 << 24, batch_size=256, sample_size=200, no_reduce=True
    )
    report = pipeline.assemble_pe(left, right, str(tmp_path / "out"), params)
    assert report.num_fragments >= 0.7 * report.num_pairs, (
        f"only {report.num_fragments}/{report.num_pairs} noisy pairs connected"
    )
    assembled = [
        s.upper()
        for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    recovered = 0
    for t in transcripts:
        rc = sequtils.revcomp(t)
        m = int(len(t) * 0.8)
        hit = any(
            t[off : off + m] in a or rc[off : off + m] in a
            for a in assembled
            for off in range(0, len(t) - m + 1, 50)
        )
        recovered += hit
    assert recovered >= 3, f"only {recovered}/4 noisy transcripts recovered"
