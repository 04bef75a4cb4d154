"""Long-read assembly accuracy against a known truth (VERDICT r4 item 2).

The internal overlap/layout/realign engine replaces minimap2+racon, so its
output quality is pinned here: ONT-like 7%-error cDNA reads from a seeded
transcriptome must reassemble with bounded k-mer recall/support.  The same
simulator+evaluator (utils/lrsim.py) produces the bench's tracked numbers.
"""

import gzip
import os

import numpy as np
import pytest

from rnabloom_tpu.assembly import pipeline as pl
from rnabloom_tpu.io import fastx
from rnabloom_tpu.utils import lrsim


@pytest.mark.slow
def test_long_read_assembly_accuracy(tmp_path):
    rng = np.random.default_rng(42)
    truth = lrsim.simulate_transcriptome(rng, 10, (500, 1500))
    reads = lrsim.simulate_reads(rng, truth, coverage=20, err=0.07)
    path = str(tmp_path / "lr.fa.gz")
    with gzip.open(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")

    params = pl.PipelineParams(total_mem_bytes=1 << 24, min_transcript_length=200)
    report = pl.assemble_long([path], str(tmp_path / "out"), params)
    assert report.num_transcripts > 0
    asm = [
        s for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))
    ]
    m = lrsim.evaluate(asm, truth)
    # floors under the measured values (0.6 / 0.908 / 0.888 at this seed):
    # regressions in correction stitching or consensus polish trip these
    assert m["lr_recall"] >= 0.5, m
    assert m["lr_median_support"] >= 0.85, m
    assert m["lr_mean_truth_cov"] >= 0.8, m


def test_simulator_and_evaluator_sanity():
    rng = np.random.default_rng(7)
    truth = lrsim.simulate_transcriptome(rng, 5, (300, 600))
    # a perfect assembly scores perfectly
    m = lrsim.evaluate(truth, truth)
    assert m["lr_recall"] == 1.0 and m["lr_precision"] == 1.0
    # reverse-complements count as matches (canonical k-mers)
    from rnabloom_tpu.utils import seq as sequtils

    m = lrsim.evaluate([sequtils.revcomp(t) for t in truth], truth)
    assert m["lr_recall"] == 1.0
    # junk scores zero
    junk = ["".join(rng.choice(list("ACGT"), size=400)) for _ in range(3)]
    m = lrsim.evaluate(junk, truth)
    assert m["lr_recall"] == 0.0 and m["lr_precision"] == 0.0
    # the error model produces roughly the requested error rate
    r = lrsim.ont_noise(rng, truth[0], 0.07)
    assert 0.8 * len(truth[0]) < len(r) < 1.2 * len(truth[0])
