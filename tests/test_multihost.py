"""Multi-host execution: TWO real jax.distributed CPU processes build the
sharded stage-1 graph and must produce filters bit-identical to a
single-process build over the same input.

This is the multi-controller path that scales to TPU pods (one process per
host, collectives over ICI/DCN); on CPU the collectives ride gloo.  The
subprocesses run rnabloom_tpu.parallel.multihost's __main__ worker.
"""

import gzip
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg
from rnabloom_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_fastq(path: str, n_reads: int, seed: int) -> list:
    rng = np.random.default_rng(seed)
    reads = ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(n_reads)]
    with gzip.open(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return reads


def test_partition_records_balances_and_pairs():
    recs = list(range(10))
    p0 = list(multihost.partition_records(iter(recs), 0, 2))
    p1 = list(multihost.partition_records(iter(recs), 1, 2))
    assert p0 == [0, 2, 4, 6, 8] and p1 == [1, 3, 5, 7, 9]
    # pair alignment: the same rule on left and right files keeps mate i
    # of both files on the same process
    assert sorted(p0 + p1) == recs


def test_byte_ranges_plain_fastq(tmp_path):
    path = str(tmp_path / "r.fq")
    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(101):
            r = "".join(rng.choice(list("ACGT"), size=80))
            f.write(f"@read{i}\n{r}\n+\n{'@' * len(r)}\n")  # '@' quals: hard case
    ranges = multihost.byte_ranges(path, 3)
    assert ranges is not None and len(ranges) == 3
    size = os.path.getsize(path)
    assert ranges[0][0] == 0 and ranges[-1][1] == size
    # contiguous, and each cut lands exactly on a record header
    total = 0
    with open(path, "rb") as f:
        for s, e in ranges:
            assert e >= s
            if s not in (0, size):
                f.seek(s)
                line = f.readline()
                assert line.startswith(b"@read"), line
            total += e - s
    assert total == size


def test_byte_ranges_gzip_returns_none(tmp_path):
    path = str(tmp_path / "r.fq.gz")
    _make_fastq(path, 5, 1)
    assert multihost.byte_ranges(path, 2) is None


@pytest.mark.slow
def test_two_process_build_matches_single(tmp_path):
    """2 jax.distributed CPU processes == 1 process, bit-for-bit filters."""
    left = str(tmp_path / "mh.fq.gz")
    reads = _make_fastq(left, 60, seed=7)
    out = str(tmp_path / "merged.npz")
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("PYTHONWARNINGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rnabloom_tpu.parallel.multihost",
             str(pid), "2", f"127.0.0.1:{port}", out, left],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    got = np.load(out)

    # single-process reference build (same cfg as the worker, exact int32
    # count-min adds are batching-order independent)
    cfg = dbg.GraphConfig(
        k=25,
        stranded=False,
        dbgbf=BloomConfig(size_log2=14, num_hash=2),
        cbf=CountingConfig(size_log2=14, num_hash=2, scratch_log2=16),
        pkbf=BloomConfig(size_log2=14, num_hash=2),
        read_pair_distance=20,
    )
    state = dbg.make_graph(cfg, with_rpkbf=True)
    arr = np.full((64, 128), 4, np.uint8)
    n = 0
    from rnabloom_tpu.utils import seq as sequtils

    for r in reads:
        codes = sequtils.encode(r)
        arr[n, : len(codes)] = codes
        n += 1
        if n == 64:
            state = dbg.build_step(state, cfg, jnp.asarray(arr), add_read_pairs=True)
            arr = np.full((64, 128), 4, np.uint8)
            n = 0
    if n:
        state = dbg.build_step(state, cfg, jnp.asarray(arr), add_read_pairs=True)

    # the worker records ITS process-local read count: exactly half the
    # input (record-modulo balance), not the old whole-file-per-process skew
    assert int(got["reads"]) == len(reads) // 2
    np.testing.assert_array_equal(got["cbf"], np.asarray(state.cbf[:-1]))
    np.testing.assert_array_equal(got["rpkbf"], np.asarray(state.rpkbf[:-1]))


@pytest.mark.slow
def test_two_process_local_merge_matches_single(tmp_path):
    """Local-merge layout (per-process DP builds + one merge collective):
    2 processes must equal a single process bit-for-bit with exact int32
    counters — count-min insertion is commutative addition, so summing
    per-process counters IS the single-process result."""
    left = str(tmp_path / "mh.fq.gz")
    reads = _make_fastq(left, 60, seed=7)
    outs = {}
    for n in (1, 2):
        out = str(tmp_path / f"merged{n}.npz")
        port = _free_port()
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["RNB_MH_MODE"] = "local"
        env.pop("PYTHONWARNINGS", None)
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "rnabloom_tpu.parallel.multihost",
                 str(pid), str(n), f"127.0.0.1:{port}", out, left],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(n)
        ]
        logs = [p.communicate(timeout=600)[0] for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
        outs[n] = np.load(out)

    np.testing.assert_array_equal(outs[2]["cbf"], outs[1]["cbf"])
    np.testing.assert_array_equal(outs[2]["rpkbf"], outs[1]["rpkbf"])
    # and against a direct single-device build (same cfg as the worker)
    cfg = dbg.GraphConfig(
        k=25,
        stranded=False,
        dbgbf=BloomConfig(size_log2=14, num_hash=2),
        cbf=CountingConfig(size_log2=14, num_hash=2, scratch_log2=16),
        pkbf=BloomConfig(size_log2=14, num_hash=2),
        read_pair_distance=20,
    )
    state = dbg.make_graph(cfg, with_rpkbf=True)
    from rnabloom_tpu.utils import seq as sequtils

    arr = np.full((64, 192), 4, np.uint8)
    n = 0
    for r in reads:
        codes = sequtils.encode(r)
        arr[n, : len(codes)] = codes
        n += 1
        if n == 64:
            state = dbg.build_step(state, cfg, jnp.asarray(arr), add_read_pairs=True)
            arr = np.full((64, 192), 4, np.uint8)
            n = 0
    if n:
        state = dbg.build_step(state, cfg, jnp.asarray(arr), add_read_pairs=True)
    np.testing.assert_array_equal(outs[2]["cbf"], np.asarray(state.cbf[:-1]))
    np.testing.assert_array_equal(outs[2]["rpkbf"], np.asarray(state.rpkbf[:-1]))


@pytest.mark.slow
def test_two_process_pe_all_stages_matches_single(tmp_path):
    """Multi-host PE through ALL stages: stage 1 local-merge build, stage 2
    process-local over record-modulo pair slices, stage 3 on process 0
    over the merged stores — transcripts byte-identical to a single-host
    run (pipeline.assemble_pe_multihost via the CLI)."""
    import gzip

    rng = np.random.default_rng(77)
    from rnabloom_tpu.utils import seq as sequtils

    pts = ["".join(rng.choice(list("ACGT"), size=400)) for _ in range(3)]
    left = str(tmp_path / "p_1.fq.gz")
    right = str(tmp_path / "p_2.fq.gz")
    q = "I" * 100
    with gzip.open(left, "wt") as fl, gzip.open(right, "wt") as fr:
        n = 0
        for t in pts:
            for _ in range(80):
                s = rng.integers(0, len(t) - 220 + 1)
                frag = t[s : s + 220]
                fl.write(f"@r{n}/1\n{frag[:100]}\n+\n{q}\n")
                fr.write(f"@r{n}/2\n{sequtils.revcomp(frag[-100:])}\n+\n{q}\n")
                n += 1

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("PYTHONWARNINGS", None)
    port = _free_port()
    base = [sys.executable, "-m", "rnabloom_tpu.cli",
            "-left", left, "-right", right, "-revcomp-right",
            "-mem", "0.02", "-norr"]
    procs = [
        subprocess.Popen(
            base + ["-o", str(tmp_path / "out_mh"),
                    "-coordinator", f"127.0.0.1:{port}",
                    "-nprocs", "2", "-procid", str(pid)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    single = subprocess.run(
        base + ["-o", str(tmp_path / "out_1"), "-sharded", "off"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stderr[-3000:]

    def canon_set(path):
        from rnabloom_tpu.io import fastx

        return sorted(
            min(s.upper(), sequtils.revcomp(s.upper()))
            for _, s in fastx.read_fasta(str(path))
        )

    mh = canon_set(tmp_path / "out_mh" / "rnabloom.transcripts.fa")
    sh = canon_set(tmp_path / "out_1" / "rnabloom.transcripts.fa")
    assert mh and mh == sh


@pytest.mark.slow
def test_two_process_long_reads_all_stages(tmp_path):
    """Multi-host long-read path: local-merge build, process-local windowed
    correction over record-modulo slices, OLC on process 0 over the merged
    corrected FASTA — every emitted transcript must be a substring of a
    truth transcript (or its revcomp) and all truths recovered."""
    from rnabloom_tpu.utils import seq as sequtils

    rng = np.random.default_rng(31)
    truths = ["".join(rng.choice(list("ACGT"), size=m)) for m in (1300, 1000)]
    path = str(tmp_path / "lr.fa")
    with open(path, "w") as f:
        i = 0
        for t in truths:
            for _ in range(50):
                s = rng.integers(0, len(t) - 550 + 1)
                read = list(t[s : s + 550])
                for j in range(len(read)):
                    if rng.random() < 0.005:
                        read[j] = "ACGT"[rng.integers(0, 4)]
                r = "".join(read)
                if rng.random() < 0.5:
                    r = sequtils.revcomp(r)
                f.write(f">lr{i}\n{r}\n")
                i += 1

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("PYTHONWARNINGS", None)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "rnabloom_tpu.cli", "-long", path,
             "-o", str(tmp_path / "out"), "-mem", "0.02",
             "-coordinator", f"127.0.0.1:{port}",
             "-nprocs", "2", "-procid", str(pid)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    from rnabloom_tpu.io import fastx

    out = [s.upper() for _, s in fastx.read_fasta(str(tmp_path / "out" / "rnabloom.transcripts.fa"))]
    assert out, "no transcripts emitted"
    hits = set()
    for s in out:
        hit = next(
            (i for i, t in enumerate(truths) if s in t or s in sequtils.revcomp(t)),
            None,
        )
        assert hit is not None, f"transcript ({len(s)} nt) matches no truth"
        hits.add(hit)
    assert hits == {0, 1}, f"not all truths recovered: {hits}"
