"""Native C++ reader vs the Python reference reader."""

import gzip

import numpy as np
import pytest

from rnabloom_tpu.io import fastx, native
from rnabloom_tpu.utils import seq as sequtils

RNG = np.random.default_rng(66)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_fastq_parity_with_python(tmp_path, have_native):
    path = str(tmp_path / "r.fq.gz")
    reads = []
    with gzip.open(path, "wt") as f:
        for i in range(100):
            n = int(RNG.integers(50, 150))
            s = rand_seq(n)
            # random low-quality positions + an occasional N
            q = list(chr(33 + int(x)) for x in RNG.integers(2, 40, n))
            s = list(s)
            if i % 7 == 0:
                s[n // 2] = "N"
            s = "".join(s)
            reads.append((s, "".join(q)))
            f.write(f"@r{i}\n{s}\n+\n{''.join(q)}\n")

    k, min_qual, L = 25, 3, 96
    # python reference: segment + chunk
    expect = []
    for s, q in reads:
        codes = sequtils.encode(s)
        quals = np.frombuffer(q.encode(), np.uint8)
        for seg in sequtils.segment_read(codes, quals, min_qual, k):
            for chunk in sequtils.chunk_segments([seg], L, k - 1):
                expect.append(chunk)

    got = []
    for codes, lens, parsed in native.read_code_batches(path, 32, L, min_qual, k):
        for i in range(codes.shape[0]):
            got.append(codes[i, : lens[i]].copy())
    assert parsed == 100
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        np.testing.assert_array_equal(g, e)


def test_fasta_multiline(tmp_path, have_native):
    path = str(tmp_path / "x.fa")
    s = rand_seq(300)
    with open(path, "w") as f:
        f.write(">a desc\n")
        for i in range(0, 300, 60):
            f.write(s[i : i + 60] + "\n")
        f.write(">b\n" + rand_seq(40) + "\n")
    rows = []
    for codes, lens, parsed in native.read_code_batches(path, 16, 512, 3, 25):
        for i in range(codes.shape[0]):
            rows.append(sequtils.decode(codes[i, : lens[i]]))
    assert rows[0] == s
    assert len(rows) == 2
    assert parsed == 2


def test_python_fallback_path_matches_native(tmp_path, have_native, monkeypatch):
    """stage1.build_graph must produce identical filters via either reader."""
    import gzip

    import jax.numpy as jnp

    from rnabloom_tpu.assembly import stage1
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg
    from rnabloom_tpu.io import native as native_mod

    path = str(tmp_path / "reads.fq.gz")
    with gzip.open(path, "wt") as f:
        for i in range(60):
            s = rand_seq(90)
            q = "".join(chr(33 + int(x)) for x in RNG.integers(2, 40, 90))
            f.write(f"@r{i}\n{s}\n+\n{q}\n")

    cfg = dbg.GraphConfig(
        k=25, stranded=False,
        dbgbf=BloomConfig(16, 2), cbf=CountingConfig(16, 2, 14), pkbf=BloomConfig(16, 2),
        read_pair_distance=30,
    )
    params = stage1.Stage1Params(k=25, max_seq_len=96, batch_size=64)

    s_nat = dbg.make_graph(cfg, with_rpkbf=True)
    s_nat, _ = stage1.build_graph([path], cfg, s_nat, params, add_read_pairs=True)

    monkeypatch.setattr(native_mod, "available", lambda: False)
    s_py = dbg.make_graph(cfg, with_rpkbf=True)
    s_py, _ = stage1.build_graph([path], cfg, s_py, params, add_read_pairs=True)

    np.testing.assert_array_equal(np.asarray(s_nat.cbf), np.asarray(s_py.cbf))
    np.testing.assert_array_equal(np.asarray(s_nat.rpkbf), np.asarray(s_py.rpkbf))


def test_native_pair_feeder_matches_python(tmp_path):
    """The native masked-batch stage-2 feeder yields byte-identical pair
    segments (and multi-segment lists) to the pure-Python path."""
    import gzip

    import rnabloom_tpu.io.native as natmod
    from rnabloom_tpu.assembly import pipeline as pl

    if not natmod.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(9)
    n = 500
    with gzip.open(tmp_path / "l.fq.gz", "wt") as fl, gzip.open(
        tmp_path / "r.fq.gz", "wt"
    ) as fr:
        for i in range(n):
            s1 = "".join(rng.choice(list("ACGT"), 100))
            s2 = "".join(rng.choice(list("ACGT"), 100))
            q1 = "".join(rng.choice(list("I#"), 100, p=[0.95, 0.05]))
            fl.write(f"@r{i}/1\n{s1}\n+\n{q1}\n")
            fr.write(f"@r{i}/2\n{s2}\n+\n{'I' * 100}\n")

    params = pl.PipelineParams(batch_size=128, min_qual=3)
    args = (str(tmp_path / "l.fq.gz"), str(tmp_path / "r.fq.gz"), params, 25, False, True, 128)
    nat = list(pl._iter_pair_batches_native(*args))
    natmod._build_failed, natmod._lib = True, None  # force the Python path
    try:
        py = list(pl._iter_pair_batches(*args))
    finally:
        natmod._build_failed = False

    def rowset(batches):
        out = []
        for lb, ll, rb, rl, _m in batches:
            for i in range(lb.shape[0]):
                if ll[i] > 0 and rl[i] > 0:
                    out.append((lb[i, : ll[i]].tobytes(), rb[i, : rl[i]].tobytes()))
        return sorted(out)

    assert rowset(nat) == rowset(py)
    msn = sorted(s.tobytes() for *_, m in nat for segs in m.values() for s in segs)
    msp = sorted(s.tobytes() for *_, m in py for segs in m.values() for s in segs)
    assert msn == msp
