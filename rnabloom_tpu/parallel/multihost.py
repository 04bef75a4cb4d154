"""Multi-host (multi-process) stage-1 execution.

The sharded engine's mesh programs are host-count-agnostic: every filter
shard lives on one device, queries ride all-to-alls over ICI within a
slice and DCN across slices, and the same shard_map programs compile
unchanged under multi-controller JAX.  This module adds what multi-host
needs on top (the generalization of the reference's N threads sharing one
synchronized reader, RNABloom.java:1203-1246, to N processes sharing the
input file set):

  * process-group initialization (``initialize``),
  * input partitioning — record-modulo over every file (pair-alignment
    safe: record i of the left file and record i of the right file land on
    the same process) plus byte-range splitting for plain (seekable) files,
  * a lockstep batch loop (``build_graph_multihost``): every process
    dispatches the SAME sequence of mesh programs — a process whose input
    is exhausted feeds empty batches until a global all-reduce agrees that
    everyone is done (collectives deadlock otherwise),
  * global batch assembly from per-process rows
    (``jax.make_array_from_process_local_data``).

Run one command per host:

    python -m rnabloom_tpu.cli ... -coordinator HOST0:9876 -nprocs 2 -procid $ID

CI exercises the real thing: tests/test_multihost.py launches TWO
jax.distributed CPU processes (gloo collectives) through this module's
``__main__`` worker and asserts the merged filters equal a single-process
build bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the JAX process group; after this, jax.devices() is global."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_records(
    records: Iterator, process_id: int, num_processes: int
) -> Iterator:
    """Record-modulo partition of any record iterator: process p keeps
    records p, p+n, p+2n, ...  Pair-alignment safe — the same rule applied
    to the left and right files keeps mates on the same process — and
    balanced to within one record per file (unlike the old per-FILE
    round-robin, which sent the whole left file to process 0 and the whole
    right file to process 1)."""
    for i, rec in enumerate(records):
        if i % num_processes == process_id:
            yield rec


def byte_ranges(path: str, num_parts: int) -> Optional[List[Tuple[int, int]]]:
    """[start, end) byte ranges splitting a PLAIN FASTQ/FASTA at record
    boundaries, or None when the file is compressed (gzip streams cannot
    seek — callers fall back to record-modulo partitioning).

    FASTQ boundary detection: a line starting with '@' whose third
    successor line starts with '+' (a bare '@' test would false-positive
    on quality lines).  FASTA: a line starting with '>'.
    """
    with open(path, "rb") as f:
        head = f.read(2)
        if head[:2] == b"\x1f\x8b":  # gzip magic
            return None
        is_fastq = head[:1] == b"@"
        f.seek(0, 2)
        size = f.tell()
        cuts = [0]
        for p in range(1, num_parts):
            target = size * p // num_parts
            f.seek(target)
            f.readline()  # skip the partial line
            cut = None
            lines = []
            pos = f.tell()
            positions = [pos]
            while len(lines) < 8:
                line = f.readline()
                if not line:
                    break
                lines.append(line)
                positions.append(f.tell())
            for j, line in enumerate(lines):
                if is_fastq:
                    if line[:1] == b"@" and j + 2 < len(lines) and lines[j + 2][:1] == b"+":
                        cut = positions[j]
                        break
                elif line[:1] == b">":
                    cut = positions[j]
                    break
            cuts.append(cut if cut is not None else size)
        cuts.append(size)
        return [(cuts[i], cuts[i + 1]) for i in range(num_parts)]


def global_batch(mesh, local_codes: np.ndarray):
    """Assemble a mesh-global (B_global, L) batch from this process's rows.

    Each process contributes its local read rows; the result is a jax.Array
    sharded row-wise over the mesh, ready for the sharded build/query
    programs.  With one process this is a plain device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
    if jax.process_count() == 1:
        return jax.device_put(local_codes, sharding)
    return jax.make_array_from_process_local_data(sharding, local_codes)


_ANY_JIT: dict = {}


def _global_any(mesh, flag: bool):
    """Do ANY processes still have input?  One tiny collective per round so
    every process schedules the same number of mesh programs.

    The reducer jit is cached per mesh: a fresh ``jax.jit`` wrapper per
    call is a new Python cache entry that re-traces and re-stages every
    round (~0.2 s each on the CPU proxy — it was 90% of the sharded
    multihost build's wall clock)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    local = np.full((jax.local_device_count(),), 1 if flag else 0, np.int32)
    if jax.process_count() == 1:
        garr = jax.device_put(local, sh)
    else:
        garr = jax.make_array_from_process_local_data(sh, local)
    f = _ANY_JIT.get(mesh)
    if f is None:
        f = jax.jit(jnp.max, out_shardings=NamedSharding(mesh, P()))
        _ANY_JIT[mesh] = f
    return bool(np.asarray(jax.device_get(f(garr))))


def barrier(mesh) -> None:
    """Block until every process reaches this point (one tiny collective —
    used between process-local pipeline phases, e.g. before process 0
    merges the per-process stage-2 stores)."""
    _global_any(mesh, True)


def build_graph_multihost(
    paths: Sequence[str],
    cfg,
    params,
    mesh,
    revcomp_flags: Optional[Sequence[bool]] = None,
    add_read_pairs: bool = False,
):
    """Stage-1 graph build across all processes of the group.

    Every process streams ITS record-modulo slice of every file into local
    row blocks; blocks assemble into mesh-global batches and one sharded
    build step runs per round.  Returns (ShardedGraphState, Stage1Stats
    with per-process local counts).
    """
    import time

    import jax

    from ..assembly import stage1 as s1
    from ..io import fastx, native
    from ..utils import seq as sequtils
    from . import sharded

    t0 = time.time()
    stats = s1.Stage1Stats()
    k = params.k
    pid, n = jax.process_index(), jax.process_count()
    n_dev = mesh.devices.size
    rows_local = max(params.batch_size // max(n, 1), n_dev // max(n, 1))
    L = params.max_seq_len
    if revcomp_flags is None:
        revcomp_flags = [False] * len(paths)

    state = sharded.make_sharded_graph(cfg, mesh, with_rpkbf=add_read_pairs)
    step = sharded.sharded_build_step(mesh, cfg, add_read_pairs=add_read_pairs)
    use_native = native.available()

    def local_segments():
        for path, rc in zip(paths, revcomp_flags):
            if use_native:
                # native parse + segment + 2-bit encode; the input is
                # partitioned by record-aligned BYTE RANGES for plain
                # seekable files (each process touches 1/n of the bytes)
                # and by record-modulo stride for gzip streams
                rng = None
                if n > 1:
                    ranges = byte_ranges(path, n)
                    rng = ranges[pid] if ranges else None
                stride = (pid, n) if (n > 1 and rng is None) else None
                last_parsed = 0
                for codes, lens, parsed in native.read_code_batches(
                    path, 1024, L, params.min_qual, k,
                    byte_range=rng, stride=stride,
                ):
                    stats.num_reads += parsed - last_parsed
                    last_parsed = parsed
                    stats.num_segments += codes.shape[0]
                    stats.num_bases += int(lens.sum())
                    for i in range(codes.shape[0]):
                        seg = codes[i, : lens[i]]
                        yield sequtils.revcomp_codes(seg) if rc else seg
                continue
            reader = partition_records(fastx.read_seqs(path), pid, n)
            for _, seq, qual in reader:
                stats.num_reads += 1
                codes = sequtils.encode(seq)
                quals = (
                    np.frombuffer(qual.encode("ascii"), dtype=np.uint8)
                    if qual is not None
                    else None
                )
                for seg in sequtils.segment_read(codes, quals, params.min_qual, k):
                    if rc:
                        seg = sequtils.revcomp_codes(seg)
                    stats.num_segments += 1
                    stats.num_bases += len(seg)
                    for chunk in sequtils.chunk_segments([seg], L, k - 1):
                        yield chunk

    gen = local_segments()
    pending: List[np.ndarray] = []
    done = False
    salt = 0
    parse_s = step_s = any_s = pack_s = 0.0
    # the liveness check reads a scalar back to the host, and a host
    # readback costs a flat ~25 ms in this runtime even for a completed
    # cpu array — per-round checks were ~90% of the sharded build's wall
    # clock on the 2-process proxy.  Checking every CHECK_EVERY rounds
    # keeps the collective schedule identical across processes (everyone
    # checks at the same round indices) at the cost of up to
    # CHECK_EVERY - 1 empty-batch rounds after global exhaustion (NOT
    # free: a padded step costs the same as a full one, so the interval
    # stays small).
    CHECK_EVERY = 4
    while True:
        tp = time.time()
        while not done and len(pending) < rows_local:
            nxt = next(gen, None)
            if nxt is None:
                done = True
                break
            pending.append(nxt)
        parse_s += time.time() - tp
        have = bool(pending)
        if salt % CHECK_EVERY == 0:
            ta = time.time()
            go = _global_any(mesh, have)
            any_s += time.time() - ta
            if not go:
                break
        ta = time.time()
        batch, _ = sequtils.pack_batch(pending, rows_local, L)
        gb = global_batch(mesh, np.asarray(batch))
        pack_s += time.time() - ta
        pending.clear()
        ts = time.time()
        state = step(state, gb, salt)
        if os.environ.get("RNB_MH_PHASES") == "sync":
            jax.block_until_ready(state.cbf)  # diagnostic: per-round compute
        step_s += time.time() - ts
        stats.num_batches += 1
        salt += 1

    ts = time.time()
    jax.block_until_ready(state.cbf)
    step_s += time.time() - ts
    stats.elapsed_s = time.time() - t0
    if os.environ.get("RNB_MH_PHASES"):
        print(
            f"[mh pid={pid}] parse={parse_s:.2f}s any={any_s:.2f}s "
            f"pack={pack_s:.2f}s step={step_s:.2f}s "
            f"batches={stats.num_batches} total={stats.elapsed_s:.2f}s",
            flush=True,
        )
    stats.fprs = sharded.sharded_fprs(state, cfg)
    return state, stats


def build_graph_local_merge(
    paths: Sequence[str],
    cfg,
    params,
    mesh,
    revcomp_flags: Optional[Sequence[bool]] = None,
    add_read_pairs: bool = False,
):
    """Embarrassingly-parallel multi-host stage 1: every process builds a
    full LOCAL single-device filter set over its input slice (no
    collectives in the loop — the native reader feeds byte-range or
    record-modulo slices), then ONE merge collective combines them:
    count-min counters sum exactly (insertion is commutative addition),
    bit lanes OR.  This is the DP layout for graphs that fit one device's
    memory — the direct TPU-native analog of the reference's N racy
    writer threads over one shared filter (RNABloom.java:1203-1246) with
    the races replaced by a deterministic reduction; the lockstep
    hash-range-sharded loop (build_graph_multihost) remains the layout
    for graphs bigger than one device.

    With exact counters (int32/u16) the merged filters are bit-identical
    to a single-process build.  mf8 cells decode-sum-encode: within one
    quantization step of the single-process result, same as the
    reference's own stochastic counters.

    ``mesh``: 1-D mesh over all processes' devices (1 device per process
    is typical on CPU; on TPU each process contributes its local chips —
    the merge then also leaves every device holding the full filters,
    ready for the replicated walk engine).
    Returns (merged GraphState replicated on every process, Stage1Stats).
    """
    import time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..assembly import stage1 as s1
    from ..graph import dbg
    from ..io import native
    from ..utils import seq as sequtils

    t0 = time.time()
    stats = s1.Stage1Stats()
    k = params.k
    pid, n = jax.process_index(), jax.process_count()
    L = params.max_seq_len
    if revcomp_flags is None:
        revcomp_flags = [False] * len(paths)

    state = dbg.make_graph(cfg, with_rpkbf=add_read_pairs)
    use_native = native.available()
    pending: List[np.ndarray] = []
    salt = 0

    def flush():
        nonlocal state, salt
        if not pending:
            return
        batch, _ = sequtils.pack_batch(pending, params.batch_size, L)
        pending.clear()
        state = dbg.build_step(
            state, cfg, jnp.asarray(batch), add_read_pairs=add_read_pairs,
            salt=np.uint32(salt * n + pid),
        )
        stats.num_batches += 1
        salt += 1

    for path, rc in zip(paths, revcomp_flags):
        if use_native:
            rng = None
            if n > 1:
                ranges = byte_ranges(path, n)
                rng = ranges[pid] if ranges else None
            stride = (pid, n) if (n > 1 and rng is None) else None
            last_parsed = 0
            for codes, lens, parsed in native.read_code_batches(
                path, params.batch_size, L, params.min_qual, k,
                byte_range=rng, stride=stride,
            ):
                stats.num_reads += parsed - last_parsed
                last_parsed = parsed
                stats.num_segments += codes.shape[0]
                stats.num_bases += int(lens.sum())
                for i in range(codes.shape[0]):
                    seg = codes[i, : lens[i]]
                    pending.append(sequtils.revcomp_codes(seg) if rc else seg)
                    if len(pending) >= params.batch_size:
                        flush()
        else:
            from ..io import fastx

            for _, seq, qual in partition_records(fastx.read_seqs(path), pid, n):
                stats.num_reads += 1
                codes = sequtils.encode(seq)
                quals = (
                    np.frombuffer(qual.encode("ascii"), dtype=np.uint8)
                    if qual is not None
                    else None
                )
                for seg in sequtils.segment_read(codes, quals, params.min_qual, k):
                    if rc:
                        seg = sequtils.revcomp_codes(seg)
                    stats.num_segments += 1
                    stats.num_bases += len(seg)
                    for chunk in sequtils.chunk_segments([seg], L, k - 1):
                        pending.append(chunk)
                        if len(pending) >= params.batch_size:
                            flush()
    flush()
    jax.block_until_ready(state.cbf)

    # ---- one merge collective over the process group ----------------------
    row_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    rep_sh = NamedSharding(mesh, P())
    n_dev = mesh.devices.size
    per_proc = n_dev // max(n, 1)

    def merged(arr, kind: str):
        if arr is None:
            return None
        host = np.asarray(arr)
        # every local device contributes a row; extra rows are neutral so
        # the reduction ignores them (device counts per process may exceed 1)
        local_rows = np.zeros((per_proc,) + host.shape, host.dtype)
        local_rows[0] = host
        if jax.process_count() == 1:
            garr = jax.device_put(local_rows, row_sh)
        else:
            garr = jax.make_array_from_process_local_data(row_sh, local_rows)
        if kind == "or":
            f = jax.jit(lambda x: jnp.max(x, axis=0), out_shardings=rep_sh)
        elif kind == "sum":
            f = jax.jit(
                lambda x: jnp.sum(x, axis=0).astype(host.dtype),
                out_shardings=rep_sh,
            )
        elif kind == "sum_u16":
            f = jax.jit(
                lambda x: jnp.minimum(
                    jnp.sum(x.astype(jnp.int32), axis=0), 65535
                ).astype(jnp.uint16),
                out_shardings=rep_sh,
            )
        else:  # mf8: decode-sum-encode (within one quantization step)
            from ..ops import minifloat

            f = jax.jit(
                lambda x: minifloat.encode(jnp.sum(minifloat.decode(x), axis=0)),
                out_shardings=rep_sh,
            )
        return f(garr)

    cnt_kind = {"int32": "sum", "u16": "sum_u16", "mf8": "sum_mf8"}[cfg.cbf.dtype]
    state = dbg.GraphState(
        dbgbf=merged(state.dbgbf, "or"),
        cbf=merged(state.cbf, cnt_kind),
        rpkbf=merged(state.rpkbf, "or"),
        fpkbf=merged(state.fpkbf, "or"),
    )
    stats.elapsed_s = time.time() - t0
    stats.fprs = dbg.fprs(state, cfg)
    return state, stats


def _worker_main(argv: Sequence[str]) -> None:
    """Subprocess entry for the multi-host CI test:

        python -m rnabloom_tpu.parallel.multihost \
            PROCID NPROCS COORD OUT_NPZ FASTQ [FASTQ...]

    Builds the sharded stage-1 graph over this process's input slice on
    the global mesh; process 0 writes the merged filter arrays to OUT_NPZ.
    """
    pid, n, coord, out = int(argv[0]), int(argv[1]), argv[2], argv[3]
    paths = list(argv[4:])
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:  # persistent compile cache: repeat scaling runs measure execution
        from ..cli import _enable_compilation_cache

        _enable_compilation_cache()
    except Exception:
        pass
    import jax

    jax.config.update("jax_platforms", "cpu")
    initialize(coord, n, pid)

    from jax.sharding import Mesh

    from ..assembly import stage1 as s1
    from ..bloom.filters import BloomConfig, CountingConfig
    from ..graph import dbg

    # filter/batch geometry is env-overridable so the bench can run this
    # same worker at measurement scale (RNB_MH_LOG2 / RNB_MH_BATCH)
    log2 = int(os.environ.get("RNB_MH_LOG2", "14"))
    batch = int(os.environ.get("RNB_MH_BATCH", "64"))
    cfg = dbg.GraphConfig(
        k=25,
        stranded=False,
        dbgbf=BloomConfig(size_log2=log2, num_hash=2),
        cbf=CountingConfig(size_log2=log2, num_hash=2, scratch_log2=max(log2, 16)),
        pkbf=BloomConfig(size_log2=log2, num_hash=2),
        read_pair_distance=20,
    )
    params = s1.Stage1Params(k=25, batch_size=batch, max_seq_len=192)
    mesh = Mesh(np.array(jax.devices()), ("d",))

    # build-loop-only CPU seconds (startup/imports excluded): on a proxy
    # box with one core per simulated host and none spare, wall clock
    # includes scheduler steal; the CPU delta is the scaling truth
    import resource

    def _cpu() -> float:
        ru = resource.getrusage(resource.RUSAGE_SELF)
        return ru.ru_utime + ru.ru_stime

    cpu0 = _cpu()
    if os.environ.get("RNB_MH_MODE", "sharded") == "local":
        # local DP builds + one merge collective (graphs that fit one device)
        state, stats = build_graph_local_merge(
            paths, cfg, params, mesh, add_read_pairs=True
        )
        np.save(f"{out}.cpu{pid}.npy", np.float64(_cpu() - cpu0))
        cbf = np.asarray(jax.device_get(state.cbf))
        rpk = np.asarray(jax.device_get(state.rpkbf))
        if pid == 0:
            np.savez(
                out, cbf=cbf[:-1], rpkbf=rpk[:-1],
                reads=stats.num_reads, elapsed_s=stats.elapsed_s,
            )
        return
    state, stats = build_graph_multihost(
        paths, cfg, params, mesh, add_read_pairs=True
    )
    np.save(f"{out}.cpu{pid}.npy", np.float64(_cpu() - cpu0))

    # replicate the global filter arrays so every process can read them
    # (device_get on a partially-addressable array is not allowed)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    cbf = np.asarray(jax.device_get(rep(state.cbf)))
    rpk = np.asarray(jax.device_get(rep(state.rpkbf)))
    if pid == 0:
        nsh = cbf.shape[0]
        np.savez(
            out,
            cbf=np.concatenate([cbf[i, :-1] for i in range(nsh)]),
            rpkbf=np.concatenate([rpk[i, :-1] for i in range(nsh)]),
            reads=stats.num_reads,
            elapsed_s=stats.elapsed_s,  # build-loop wall time (scaling runs)
        )


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess
    import sys

    _worker_main(sys.argv[1:])
