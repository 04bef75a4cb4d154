"""End-to-end short-read assembly pipelines (bulk PE / SE).

Orchestrates the three stages exactly as the reference driver does
(RNABloom.main :5830-7533 for the PE path):

  Stage 0  read-length sampling -> read-pair distance, tip length
           (setReadLengthBasedParams :1011-1033)
  Stage 1  graph build: cbf counters + read-paired-k-mer keys
           (populateGraph2 :1290-1346)
  Stage 2  fragment assembly in batches; fragment-length quartiles from the
           first sample set the fragment pair distance
           (Q1 - k - minNumKmerPairs) and walk bound (Q3 + 1.5 IQR)
           (assembleFragmentsMultiThreaded :4465-4663)
  Stage 2b fragment-graph rebuild: fresh counters + fpkbf from fragments
           (populateGraphFromFragments :1541)
  Stage 3  transcript extension per coverage stratum E5..E0, screening BF,
           length-split FASTA output (assembleTranscriptsMultiThreaded
           :4886, TranscriptWriter :1614-1780)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bloom.filters import BloomConfig, CountingConfig, make_bloom
from ..graph import dbg, engine
from ..io import fastx
from ..utils import polya, seq as sequtils
from ..utils.timer import Timer
from . import correct, fragments as fragmod, fragstore, stage1, transcripts as txmod


@dataclass
class PipelineParams:
    k: int = 25
    stranded: bool = False
    min_qual: int = 3
    min_avg_qual: int = 0  # -Q/qual-avg: whole-read average quality gate
    total_mem_bytes: int = 1 << 30
    num_hash: int = 2
    batch_size: int = 8192  # read pairs per stage-2 batch (amortizes the
    # host<->device round-trip latency; each readback costs a full tunnel RTT)
    stage3_batch: int = 2048  # fragments per stage-3 batch
    sample_size: int = 1000
    min_num_kmer_pairs: int = 10
    min_overlap: int = 10
    bound: int = 500
    min_transcript_length: int = 200
    max_walk_len: int = 4096
    min_fragment_cov: float = 0.0
    max_edge_clip: int = 0  # >0 enables blunt-end artifact screening
    template_switch_filter: bool = False  # -ts: template-switch screening
    write_uracil: bool = False  # -u: transcripts as RNA (T -> U)
    expected_num_kmers: int = 0  # -nk: exact filter sizing at 1% FPR
    max_fpr: float = 0.01  # -fpr: resize + rebuild filters above this
    name: str = "rnabloom"  # -n: assembly name (output file prefix)
    header_prefix: str = ""  # -prefix: FASTA header name prefix
    no_reduce: bool = False  # -norr: skip redundancy reduction (no nr.fa)
    stop_stage: int = 3  # -stage: terminate after this stage (1..3)
    min_kmer_cov: float = 1.0  # -c: minimum k-mer coverage
    err_corr_iters: int = 2  # -e: error-correction iterations per read
    max_cov_gradient: float = 0.5  # -grad: EC coverage-dropoff gradient
    max_indel: int = 1  # -indel: max indel size collapsed in comparisons
    percent_identity: float = 0.90  # -p: min identity of collapsed seqs
    lookahead: int = 3  # -lookahead: traversal lookahead depth
    max_tip_length: int = -1  # -tiplength: -1 = auto (median read len - k)
    extend_fragments: bool = False  # -extend: naive-extend stage-2 fragments
    frag_consistency: bool = True  # -nofc turns off frag-pair break checks
    keep_artifacts: bool = False  # -artifact: keep sequencing artifacts
    keep_chimeras: bool = False  # -chimera: keep potential chimeras
    branch_free_stratum: str = "e0"  # -stratum: branch-free extension gate
    polya_min_len: int = 0  # -a: prioritize poly-A transcripts (min tail)
    # long-read knobs (0 = internal default)
    revcomp_long: bool = False  # -rc: reverse-complement long reads
    lr_min_depth: int = 0  # -lrrd: min read depth in the OLC stage
    lr_overlap_prop: float = 0.0  # -lrop: min matching-base proportion
    minimizer_size: int = 0  # -m: OLC minimizer k
    minimizer_window: int = 0  # -mw: OLC minimizer window
    sketch_overlap_prop: float = 0.0  # -sop
    sketch_overlap_num: int = 0  # -son
    hpc: bool = False  # -hpc: HPC minimizers in clustered OLC
    write_paf: bool = False  # -paf: write the ava overlaps as PAF
    paf_in: str = ""  # -pafin: external ava PAF replaces the internal overlapper
    # per-filter overrides, 0 = inherit (-sh/-dh/-ch/-ph, -sm/-dm/-cm/-pm)
    sbf_hash: int = 0
    dbgbf_hash: int = 0
    cbf_hash: int = 0
    pkbf_hash: int = 0
    sbf_mem_bytes: int = 0
    dbgbf_mem_bytes: int = 0
    cbf_mem_bytes: int = 0
    pkbf_mem_bytes: int = 0
    sharded: str = "auto"  # -sharded {auto,on,off}: mesh scale-out policy
    # -cnt {mf8,u16,int32}: counter cell width.  mf8 = the reference's
    # 1 B/cell MiniFloat (util/MiniFloat.java) so -mem buys the same cell
    # count as the Java build; u16/int32 trade cells for exact counts
    counter: str = "mf8"
    # -rescue: retry unconnected read pairs against the stage-2b fragment
    # graph (rescueUnconnectedMultiThreaded, RNABloom.java:2392-2668 — the
    # reference keeps the worker available but unwired; here it is opt-in)
    rescue_unconnected: bool = False
    verbose: bool = False

    def graph_config_overrides(self) -> dict:
        return dict(
            dbgbf_hash=self.dbgbf_hash,
            cbf_hash=self.cbf_hash,
            pkbf_hash=self.pkbf_hash,
            dbgbf_mem_bytes=self.dbgbf_mem_bytes,
            cbf_mem_bytes=self.cbf_mem_bytes,
            pkbf_mem_bytes=self.pkbf_mem_bytes,
            counter=self.counter,
        )

    def correct_params(self) -> "correct.CorrectParams":
        return correct.CorrectParams(
            max_cov_gradient=self.max_cov_gradient,
            min_kmer_cov=self.min_kmer_cov,
            rounds=self.err_corr_iters,
            max_indel=self.max_indel,
            percent_identity=self.percent_identity,
        )


def _mesh_for(params: PipelineParams):
    """Device mesh for this run: all visible devices when >1 (policy
    "auto"), forced by "on", disabled by "off".  The filters shard by hash
    range across the mesh and every build/query/walk runs as one mesh
    program — the TPU-native scale-out replacing the reference's
    shared-memory thread pool (SURVEY.md section 2.9)."""
    if params.sharded == "off":
        return None
    mesh = engine.make_mesh_if_multi()
    if mesh is None and params.sharded == "on":
        raise RuntimeError("-sharded on requires >1 JAX device")
    return mesh


# coverage strata, lowest first (RNABloom.java:150-158: 01 < e0 < .. < e5)
_STRATA = ("01", "e0", "e1", "e2", "e3", "e4", "e5")


def _stratum_rank(s: str) -> int:
    return _STRATA.index(s)


def _fragment_stratum(min_cov: float) -> str:
    if min_cov <= 1:
        return "01"
    return f"e{min(fragmod.coverage_order_of_magnitude(min_cov), 5)}"


@dataclass
class PipelineReport:
    stage1: Optional[stage1.Stage1Stats] = None
    num_pairs: int = 0
    num_fragments: int = 0
    num_rescued: int = 0  # -rescue: pairs connected on the second attempt
    num_transcripts: int = 0
    num_short: int = 0
    num_nr: int = 0
    fragment_pair_distance: int = -1
    elapsed_s: float = 0.0
    # device-dispatch accounting per stage (engine.dispatch_counts deltas):
    # on the tunneled axon backend each dispatch costs a ~200 ms round trip,
    # so dispatches/batch is the stage-2/3 latency budget tracked by bench.py
    stage2_dispatches: dict = field(default_factory=dict)
    stage3_dispatches: dict = field(default_factory=dict)
    stage2_batches: int = 0
    stage2_s: float = 0.0  # wall clock of the fragment loop
    stage3_s: float = 0.0  # wall clock of rebuild + transcript assembly


def _avg_qual_ok(qual: Optional[str], min_avg: int) -> bool:
    """Whole-read average base quality gate (-Q/qual-avg,
    FastqFilteredReader's min-avg-qual check)."""
    if qual is None or not qual:
        return True
    q = np.frombuffer(qual.encode("ascii"), np.uint8)
    return float(q.mean()) - 33.0 >= min_avg


def _segments_of(
    seq: str, qual: Optional[str], min_qual: int, k: int, L: int, revcomp: bool
) -> List[np.ndarray]:
    """Quality-split segments of one read, in fragment orientation."""
    codes = sequtils.encode(seq)[:L]
    quals = (
        np.frombuffer(qual.encode("ascii"), np.uint8)[: len(codes)]
        if qual
        else None
    )
    segs = sequtils.segment_read(codes, quals, min_qual, k)
    if revcomp:
        segs = [sequtils.revcomp_codes(s) for s in reversed(segs)]
    return segs


def _best_segments(
    codes: np.ndarray, lens: np.ndarray, k: int, rc: bool
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Per-row longest quality segment from MASKED rows (bad bases = 4).

    Vectorized over the batch: segments are the runs of codes < 4; the
    longest (>= k) lands left-aligned in the output buffer, and rows with
    several segments report them all for connect(segments) re-joining.
    With ``rc`` the whole row is reverse-complemented first — segments
    flip into fragment orientation and reverse order in one shot."""
    from .correct import _batch_runs
    from .fragments import revcomp_rows

    B, L = codes.shape
    if rc:
        codes = revcomp_rows(codes, np.asarray(lens, np.int64))
    inlen = np.arange(L)[None, :] < np.asarray(lens)[:, None]
    good = (codes < 4) & inlen
    out = np.full((B, L), 4, np.uint8)
    outlen = np.zeros(B, np.int32)
    multi: dict = {}
    if not good.any():
        return out, outlen, multi
    rs, ss, es = _batch_runs(good)
    rl = es - ss
    keep = rl >= k
    rs, ss, es, rl = rs[keep], ss[keep], es[keep], rl[keep]
    if len(rs) == 0:
        return out, outlen, multi
    best_len = np.zeros(B, np.int64)
    np.maximum.at(best_len, rs, rl)
    cand = np.flatnonzero(rl == best_len[rs])
    first = np.ones(len(cand), bool)
    first[1:] = rs[cand][1:] != rs[cand][:-1]  # runs are emitted row-major
    sel = cand[first]
    rows, s0, ln = rs[sel], ss[sel], rl[sel]
    idx = np.minimum(s0[:, None] + np.arange(L)[None, :], L - 1)
    gathered = np.take_along_axis(codes[rows], idx, axis=1)
    m = np.arange(L)[None, :] < ln[:, None]
    out[rows] = np.where(m, gathered, np.uint8(4))
    outlen[rows] = ln
    cnt = np.bincount(rs, minlength=B)
    for b in np.flatnonzero(cnt > 1):
        sel_b = rs == b
        multi[int(b)] = [
            codes[b, a:z] for a, z in zip(ss[sel_b], es[sel_b])
        ]
    return out, outlen, multi


def _iter_pair_batches_native(
    left_path: str,
    right_path: str,
    params: PipelineParams,
    k: int,
    revcomp_left: bool,
    revcomp_right: bool,
    L: int,
    stride=None,
):
    """Native-reader stage-2 feeder: the C++ parser masks low-quality
    bases to 4 and the segment selection is vectorized — no per-read
    Python on the critical path (the stage the JVM throws its threads at,
    RNABloom.java:4465-4663)."""
    from ..io import native

    B = params.batch_size
    gl = native.read_masked_batches(left_path, B, L, params.min_qual, stride=stride)
    gr = native.read_masked_batches(right_path, B, L, params.min_qual, stride=stride)
    for (lb0, ll0, lq), (rb0, rl0, rq) in zip(gl, gr):
        n = min(lb0.shape[0], rb0.shape[0])
        lb0, ll0, rb0, rl0 = lb0[:n], ll0[:n].copy(), rb0[:n], rl0[:n].copy()
        if params.min_avg_qual > 0:
            bad = (lq[:n] < params.min_avg_qual) | (rq[:n] < params.min_avg_qual)
            ll0[bad] = 0
            rl0[bad] = 0
        lbuf, llen, lmulti = _best_segments(lb0, ll0, k, revcomp_left)
        rbuf, rlen, rmulti = _best_segments(rb0, rl0, k, revcomp_right)
        # a pair needs a usable segment on BOTH sides
        none = (llen == 0) | (rlen == 0)
        llen[none] = 0
        rlen[none] = 0
        multi = {("l", b): segs for b, segs in lmulti.items() if not none[b]}
        multi.update(
            (("r", b), segs) for b, segs in rmulti.items() if not none[b]
        )
        if n < B:  # keep the (B, L) shape: new shapes recompile kernels
            pad = B - n
            lbuf = np.concatenate([lbuf, np.full((pad, L), 4, np.uint8)])
            rbuf = np.concatenate([rbuf, np.full((pad, L), 4, np.uint8)])
            llen = np.concatenate([llen, np.zeros(pad, np.int32)])
            rlen = np.concatenate([rlen, np.zeros(pad, np.int32)])
        yield lbuf, llen, rbuf, rlen, multi


def _prefetch(gen, depth: int = 2):
    """Run a generator on a background thread with a bounded queue —
    host parsing/segmenting of batch i+1 overlaps device compute of batch
    i (the reference gets this overlap from its reader/worker threads,
    RNABloom.java:1203-1238)."""
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
    END = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
            q.put(END)
        except BaseException as e:  # surfaced on the consumer side
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _iter_pair_batches(
    left_path: str,
    right_path: str,
    params: PipelineParams,
    k: int,
    revcomp_left: bool,
    revcomp_right: bool,
    L: int,
    stride=None,
):
    """Yield (left_codes, left_len, right_codes, right_len, multi) batches.

    The right mate is flipped into fragment orientation (the reference's
    FR convention: fragment = left .. rc(right) unless flags say otherwise).
    Reads are quality-segmented exactly as in stage 1 (the reference's
    FastqFilteredReader feeds PairedReadSegments to stage 2); a read with
    one segment contributes that segment, and a multi-segment read's
    longest segment goes in the buffer while ``multi`` records
    (side, row) -> all segments for connect(segments) re-joining.
    """
    from ..io import native

    if native.available():
        yield from _prefetch(
            _iter_pair_batches_native(
                left_path, right_path, params, k, revcomp_left, revcomp_right, L,
                stride=stride,
            )
        )
        return
    B = params.batch_size
    lbuf = np.full((B, L), 4, np.uint8)
    rbuf = np.full((B, L), 4, np.uint8)
    llen = np.zeros(B, np.int32)
    rlen = np.zeros(B, np.int32)
    multi: dict = {}
    n = 0
    for rec_i, ((ln, ls, lq), (rn, rs, rq)) in enumerate(
        fastx.read_paired(left_path, right_path)
    ):
        if stride is not None and rec_i % stride[1] != stride[0]:
            continue
        if params.min_avg_qual > 0 and not (
            _avg_qual_ok(lq, params.min_avg_qual) and _avg_qual_ok(rq, params.min_avg_qual)
        ):
            continue
        lsegs = _segments_of(ls, lq, params.min_qual, k, L, revcomp_left)
        rsegs = _segments_of(rs, rq, params.min_qual, k, L, revcomp_right)
        if not lsegs or not rsegs:
            continue
        lbest = max(lsegs, key=len)
        rbest = max(rsegs, key=len)
        lbuf[n, : len(lbest)] = lbest
        llen[n] = len(lbest)
        rbuf[n, : len(rbest)] = rbest
        rlen[n] = len(rbest)
        if len(lsegs) > 1:
            multi[("l", n)] = lsegs
        if len(rsegs) > 1:
            multi[("r", n)] = rsegs
        n += 1
        if n == B:
            yield lbuf, llen, rbuf, rlen, multi
            lbuf = np.full((B, L), 4, np.uint8)
            rbuf = np.full((B, L), 4, np.uint8)
            llen = np.zeros(B, np.int32)
            rlen = np.zeros(B, np.int32)
            multi = {}
            n = 0
    if n:
        # keep the full (B, L) shape — a different batch size would trigger
        # fresh TPU compilations of every downstream kernel
        yield lbuf, llen, rbuf, rlen, multi


def _connect_multi_segments(
    state: dbg.GraphState,
    cfg: dbg.GraphConfig,
    lbuf: np.ndarray,
    llen: np.ndarray,
    rbuf: np.ndarray,
    rlen: np.ndarray,
    multi: dict,
    fparams: "fragmod.FragmentParams",
) -> None:
    """Re-join quality-split mates through the graph before pairing
    (connect(segments), GraphUtils.java:4836-4897).  Buffers are updated
    in place when the joined sequence beats the longest-segment fallback."""
    if not multi:
        return
    keys = sorted(multi.keys())
    joined = fragmod.connect_segments_batch(
        state, cfg, [multi[key] for key in keys], fparams
    )
    L = lbuf.shape[1]
    for key, seq in zip(keys, joined):
        side, row = key
        n = min(len(seq), L)
        buf, lens = (lbuf, llen) if side == "l" else (rbuf, rlen)
        if n > lens[row]:
            buf[row, :n] = seq[:n]
            buf[row, n:] = 4
            lens[row] = n


def _ingest_se_fragments(
    state: dbg.GraphState,
    cfg: dbg.GraphConfig,
    sef_paths: Sequence[str],
    ser_paths: Sequence[str],
    read_L: int,
    params: PipelineParams,
    store: "fragstore.FragmentStore",
    frag_lengths: List[int],
    report: "PipelineReport",
    fparams: Optional["fragmod.FragmentParams"] = None,
) -> None:
    """Unpaired reads (-sef/-ser) become error-corrected unconnected
    fragments (SingleEndReadExtractor, RNABloom.java:1935-2036).  The same
    quality machinery as paired batches applies: the -Q average-quality
    gate, per-base quality segmenting with graph re-join of split reads
    (connect(segments), GraphUtils.java:4836-4897), and the
    low-complexity gate (RNABloom.java:1983)."""
    k = cfg.k
    ecp = params.correct_params()
    if fparams is None:
        fparams = fragmod.FragmentParams(
            min_overlap=params.min_overlap, bound=params.bound,
            lookahead=params.lookahead, ec_params=ecp,
        )
    for path, rc in [(p, False) for p in sef_paths] + [(p, True) for p in ser_paths]:
        buf = np.full((params.batch_size, read_L), 4, np.uint8)
        lens = np.zeros(params.batch_size, np.int32)
        multi: dict = {}
        n = 0

        def flush_se(n):
            if n == 0:
                return
            # re-join quality-split segments through the graph before EC
            if multi:
                keys = sorted(multi.keys())
                joined = fragmod.connect_segments_batch(
                    state, cfg, [multi[key] for key in keys], fparams
                )
                for key, seqj in zip(keys, joined):
                    m = min(len(seqj), read_L)
                    if m > lens[key]:
                        buf[key, :m] = seqj[:m]
                        buf[key, m:] = 4
                        lens[key] = m
                multi.clear()
            fixed, flens, _ = correct.correct_batch(state, cfg, buf[:n], lens[:n], ecp)
            counts_d, valid_d = engine.count_step(state, cfg, fixed)
            counts_np = np.asarray(counts_d)
            valid_np = np.asarray(valid_d)
            for i in range(n):
                nk = int(flens[i]) - k + 1
                v = valid_np[i, :nk]
                if nk <= 0 or not v.any():
                    continue
                mc = float(counts_np[i, :nk][v].min())
                _store_fragment(
                    store,
                    fragmod.Fragment(
                        codes=fixed[i, : flens[i]].copy(), min_cov=mc,
                        length=int(flens[i]), connected=False,
                    ),
                    params,
                )
                frag_lengths.append(int(flens[i]))

        from . import artifacts

        for _, rs, rq in fastx.read_seqs(path):
            if params.min_avg_qual > 0 and not _avg_qual_ok(rq, params.min_avg_qual):
                continue
            segs = _segments_of(rs, rq, params.min_qual, k, read_L, rc)
            segs = [s for s in segs if len(s) >= k]
            if not segs:
                continue
            best = max(segs, key=len)
            # low-complexity unpaired reads are skipped (the reference's
            # SingleEndReadExtractor isLowComplexityShort gate,
            # RNABloom.java:1983)
            if artifacts.is_low_complexity_short(best):
                continue
            buf[n, : len(best)] = best
            buf[n, len(best) :] = 4
            lens[n] = len(best)
            if len(segs) > 1:
                multi[n] = segs
            n += 1
            report.num_pairs += 1
            if n == params.batch_size:
                flush_se(n)
                n = 0
        flush_se(n)


def _run_stage3(
    state: dbg.GraphState,
    cfg: dbg.GraphConfig,
    store: "fragstore.FragmentStore",
    outdir: str,
    params: PipelineParams,
    report: "PipelineReport",
) -> None:
    """Shared stage-3: stratified transcript assembly + nr reduction.

    Fragments stream from the stratified store in the reference's priority
    order (E5..E0, long/short/unconnected, polyA first when prioritized) in
    fixed-size batches — host memory stays bounded w.r.t. input size
    (assembleTranscriptsMultiThreaded, RNABloom.java:4886-4954)."""
    from ..bloom.filters import pow2_size

    sbf_log2 = (
        pow2_size(params.sbf_mem_bytes).bit_length() - 1
        if params.sbf_mem_bytes > 0
        else cfg.pkbf.size_log2
    )
    from ..bloom.filters import merge_default

    scfg = BloomConfig(
        sbf_log2, params.sbf_hash or cfg.pkbf.num_hash, merge=merge_default()
    )
    screen = make_bloom(scfg)
    tparams = txmod.TranscriptParams(
        min_transcript_length=params.min_transcript_length,
        max_walk_len=params.max_walk_len,
        # -a > 0 disables the blunt-end clip screen (RNABloom.java:1820)
        max_edge_clip=0 if params.polya_min_len > 0 else params.max_edge_clip,
        template_switch_filter=params.template_switch_filter,
        max_indel=params.max_indel,
        percent_identity=params.percent_identity,
        lookahead=params.lookahead,
        tip_probe_depth=(
            min(params.max_tip_length, cfg.k - 1)
            if params.max_tip_length >= 0
            else 8
        ),
        # -tiplength also bounds the screen's forgivable edge clip
        # (represented()'s maxEdgeClipLength = maxTipLength); -1 = auto
        screen_max_edge_clip=params.max_tip_length,
        keep_chimeras=params.keep_chimeras,
        keep_artifacts=params.keep_artifacts,
        frag_consistency=params.frag_consistency,
    )
    # -stratum: fragments in strata below the threshold extend only when
    # branch-free (RNABloom.java:4912-4954)
    _d0 = engine.dispatch_counts()
    thr_rank = _stratum_rank(params.branch_free_stratum)
    frag_L = int(min(max(store.max_len, cfg.k), params.max_walk_len))
    tx_path = os.path.join(outdir, f"{params.name}.transcripts.fa")
    short_path = os.path.join(outdir, f"{params.name}.transcripts.short.fa")
    from ..io.seqstore import SeqStore

    n_tx = 0
    # emitted transcripts spool to a disk-backed 2-bit store for the nr
    # pass instead of accumulating in host RAM (streamed analog of
    # generateNonRedundantTranscripts re-reading transcripts.fa,
    # RNABloom.java:5676)
    emitted = SeqStore(os.path.join(outdir, f".{params.name}.nr_input.2bit"))
    with fastx.FastaWriter(tx_path, uracil=params.write_uracil) as wtx, fastx.FastaWriter(
        short_path, uracil=params.write_uracil
    ) as wsh:
        for sel, sel_len, covs, _conn in store.iter_batches(
            params.stage3_batch, width=frag_L
        ):
            sel_bf = np.array(
                [
                    l > 0 and _stratum_rank(_fragment_stratum(c)) < thr_rank
                    for c, l in zip(covs, sel_len)
                ],
                bool,
            )
            txs, shorts, screen = txmod.assemble_transcripts_batch(
                state, cfg, screen, scfg, sel, sel_len, tparams,
                require_branch_free=sel_bf if sel_bf.any() else None,
            )
            for t in txs:
                # -a: a poly-T-headed transcript is flipped into poly-A-tail
                # orientation before annotation (TranscriptWriter
                # RNABloom.java:1652-1676)
                if params.polya_min_len > 0 and not params.stranded:
                    if polya.find_polya_tail(t.codes) is None and (
                        polya.find_polyt_head(t.codes) is not None
                    ):
                        t.codes = sequtils.revcomp_codes(t.codes)
                seq = sequtils.decode(t.codes)
                comment = f"l={t.length}"
                # poly-A annotation: PAS positions in the header, tail
                # lowercase-masked (TranscriptWriter :1752-1766)
                tail = polya.find_polya_tail(t.codes)
                if tail is not None:
                    pas = polya.find_pas_positions(seq, tail[0])
                    if pas:
                        comment += " pas=" + ",".join(map(str, pas))
                    seq = seq[: tail[0]] + seq[tail[0] :].lower()
                wtx.write(f"{params.header_prefix}{params.name}.{n_tx}", seq, comment)
                emitted.append(t.codes)
                n_tx += 1
                report.num_transcripts += 1
            for t in shorts:
                wsh.write(f"{params.header_prefix}{params.name}.s{report.num_short}", sequtils.decode(t.codes))
                report.num_short += 1

    # nr reduction via the internal overlap layout (the reference runs
    # minimap2 ava + Layout.extractSimplePaths over the transcripts,
    # OverlapLayoutConsensus.overlapLayout :878, generateNonRedundant
    # Transcripts RNABloom.java:5676): contained transcripts are dropped
    # and unambiguously dovetailing ones merge into unitigs.
    if len(emitted) and not params.no_reduce:
        from ..olc import layout as olc_layout, overlap as olc_overlap

        op = olc_overlap.OverlapParams(
            min_overlap=max(params.min_transcript_length // 2, 100)
        )
        nr_seqs, _, _ = olc_layout.layout_unitigs(emitted, cfg.k, op)
        nr_path = os.path.join(outdir, f"{params.name}.transcripts.nr.fa")
        with fastx.FastaWriter(nr_path, uracil=params.write_uracil) as wnr:
            for j, s in enumerate(nr_seqs):
                wnr.write(f"{params.header_prefix}{params.name}.nr.{j}", sequtils.decode(s), f"l={len(s)}")
        report.num_nr = len(nr_seqs)
    emitted.close(delete=True)
    _d1 = engine.dispatch_counts()
    report.stage3_dispatches = {k: _d1[k] - _d0[k] for k in _d1}


def assemble_se(
    se_paths: Sequence[str],
    outdir: str,
    params: PipelineParams,
    revcomp_flags: Optional[Sequence[bool]] = None,
) -> "PipelineReport":
    """Single-end assembly (-sef/-ser): corrected reads become unconnected
    fragments; transcripts extend with read-pair support only
    (SingleEndReadExtractor :1935-2036, extendSE :6454)."""
    t0 = time.time()
    os.makedirs(outdir, exist_ok=True)
    report = PipelineReport()
    k = params.k
    if revcomp_flags is None:
        revcomp_flags = [False] * len(se_paths)

    lengths = stage1.sample_read_lengths(se_paths, params.sample_size)
    d_read, max_tip = stage1.read_length_params(lengths, k, params.min_num_kmer_pairs)
    if params.max_tip_length >= 0:  # -tiplength overrides the auto value
        max_tip = params.max_tip_length
    read_L = int(max(lengths.max(initial=150), k + d_read + 1))

    cfg = stage1.default_graph_config(
        k, params.stranded, params.total_mem_bytes, params.num_hash, d_read,
        expected_num_kmers=params.expected_num_kmers,
        **params.graph_config_overrides(),
    )
    s1p = stage1.Stage1Params(
        k=k, stranded=params.stranded, min_qual=params.min_qual,
        max_seq_len=max(read_L, 2 * k),
    )
    state, s1_stats, cfg = stage1.build_graph_autosized(
        se_paths, cfg, s1p, max_fpr=params.max_fpr, mesh=_mesh_for(params),
        revcomp_flags=revcomp_flags, add_read_pairs=True,
    )
    report.stage1 = s1_stats
    if params.stop_stage <= 1:
        report.elapsed_s = time.time() - t0
        return report

    # stage 2: the same quality-gated ingest as the mixed -sef/-ser path
    # (-Q gate, quality segmenting + connect(segments), low-complexity
    # gate, real min-cov stratification) — standalone SE invocations must
    # not silently skip the quality machinery (RNABloom.java:1935-2036)
    store = _new_fragment_store(outdir, params)
    frag_lengths: List[int] = []
    _ingest_se_fragments(
        state, cfg,
        [p for p, rc in zip(se_paths, revcomp_flags) if not rc],
        [p for p, rc in zip(se_paths, revcomp_flags) if rc],
        read_L, params, store, frag_lengths, report,
    )
    store.close()
    report.num_fragments = store.count
    if store.count == 0:
        report.elapsed_s = time.time() - t0
        return report

    # stage 2b: rebuild counters from corrected reads (no fpkbf), streaming
    state = engine.fresh_rebuild_state(state, cfg, with_fpkbf=False)
    for bi, (codes, _l, _c, _conn) in enumerate(store.iter_batches(1024, width=read_L)):
        state = engine.build_step(state, cfg, codes, salt=bi)

    _run_stage3(state, cfg, store, outdir, params, report)
    report.elapsed_s = time.time() - t0
    return report



def assemble_pe_multihost(
    left_path: str,
    right_path: str,
    outdir: str,
    params: PipelineParams,
    revcomp_left: bool = False,
    revcomp_right: bool = True,
) -> "PipelineReport":
    """Multi-host PE assembly (requires an initialized jax.distributed
    group, CLI: -coordinator/-nprocs/-procid with PE inputs).

    Layout: stage 1 builds with the local-merge layout (every process ends
    holding the FULL merged filters — parallel/multihost.py), stage 2 is
    embarrassingly parallel — each process runs the fragment loop over its
    record-modulo pair slice against its local filters, writing its own
    stratified store — and stage 3 runs single-host on process 0 over the
    merged stores.  This generalizes the reference's reader-sharing thread
    pool (RNABloom.java:1203-1246, :4465-4663) to processes: the graph
    replaces the shared heap, record-modulo replaces the synchronized
    reader, and the store merge replaces the writer queue.

    The fragment-length sample (walk bound, pair distance) learns per
    process from its own slice — the same order-dependence the reference's
    thread scheduling has; the stage-3 pair distance is derived from the
    POOLED lengths, matching the reference's global learning point.
    """
    import jax
    from jax.sharding import Mesh

    from ..parallel import multihost
    from ..utils import checkpoint as ckpt

    t0 = time.time()
    report = PipelineReport()
    k = params.k
    pid, n = jax.process_index(), jax.process_count()
    os.makedirs(outdir, exist_ok=True)

    lengths = stage1.sample_read_lengths([left_path, right_path], params.sample_size)
    d_read, max_tip = stage1.read_length_params(lengths, k, params.min_num_kmer_pairs)
    if params.max_tip_length >= 0:
        max_tip = params.max_tip_length
    read_L = int(max(lengths.max(initial=150), k + d_read + 1))
    cfg = stage1.default_graph_config(
        k, params.stranded, params.total_mem_bytes, params.num_hash, d_read,
        expected_num_kmers=params.expected_num_kmers,
        **params.graph_config_overrides(),
    )
    s1p = stage1.Stage1Params(
        k=k, stranded=params.stranded, min_qual=params.min_qual,
        max_seq_len=max(read_L, 2 * k),
    )
    mesh = Mesh(np.array(jax.devices()), ("d",))
    gstate, s1_stats = multihost.build_graph_local_merge(
        [left_path, right_path], cfg, s1p, mesh,
        revcomp_flags=[revcomp_left, revcomp_right], add_read_pairs=True,
    )
    report.stage1 = s1_stats
    # materialize the replicated filters as plain LOCAL single-device
    # arrays: stage 2 is process-local (multi-controller jax would other-
    # wise require every process to dispatch identical programs)
    local_state = dbg.GraphState(
        *(
            None if a is None else jnp.asarray(np.asarray(jax.device_get(a)))
            for a in (gstate.dbgbf, gstate.cbf, gstate.rpkbf, gstate.fpkbf)
        )
    )
    if pid == 0:
        ckpt.touch_stamp(outdir, ckpt.STAMP_DBG_DONE)
    if params.stop_stage <= 1:
        report.elapsed_s = time.time() - t0
        return report

    # ---- stage 2: process-local fragment assembly over the pair slice
    fparams = fragmod.FragmentParams(
        min_overlap=params.min_overlap, bound=params.bound,
        lookahead=params.lookahead, extend_fragments=params.extend_fragments,
        ec_params=params.correct_params(),
    )
    pdir = os.path.join(outdir, f"mh_p{pid}")
    store = _new_fragment_store(pdir, params)
    frag_lengths: List[int] = []
    _stage2_pair_loop(
        local_state, cfg, left_path, right_path, params, revcomp_left,
        revcomp_right, read_L, fparams, store, report, frag_lengths,
        stride=(pid, n),
    )
    store.close()
    # every store must be closed before process 0 merges
    multihost.barrier(mesh)
    if pid != 0:
        report.elapsed_s = time.time() - t0
        return report

    merged = fragstore.merge_stores(
        outdir, [os.path.join(outdir, f"mh_p{i}") for i in range(n)]
    )
    if merged is None or merged.count == 0:
        report.elapsed_s = time.time() - t0
        return report
    report.num_fragments = merged.count
    ckpt.touch_stamp(outdir, ckpt.STAMP_FRAGMENTS_DONE)
    if params.stop_stage <= 2:
        report.elapsed_s = time.time() - t0
        return report

    # stage-3 pair distance from the POOLED fragment lengths
    all_lengths = np.fromiter(merged.iter_lengths(), np.int64)
    q1, _, q3 = sequtils.quartiles(all_lengths)
    d_frag = max(1, int(q1) - k - params.min_num_kmer_pairs)
    report.fragment_pair_distance = d_frag
    cfg = dbg.GraphConfig(
        k=cfg.k, stranded=cfg.stranded, dbgbf=cfg.dbgbf, cbf=cfg.cbf,
        pkbf=cfg.pkbf, read_pair_distance=cfg.read_pair_distance,
        fragment_pair_distance=d_frag, exact_counts=cfg.exact_counts,
    )
    _finish_pe_stage3(local_state, cfg, merged, outdir, params, report)
    report.elapsed_s = time.time() - t0
    with open(os.path.join(outdir, f"{params.name}.report.json"), "w") as f:
        json.dump(
            {
                "num_pairs": report.num_pairs,
                "num_fragments": report.num_fragments,
                "num_transcripts": report.num_transcripts,
                "num_short": report.num_short,
                "fragment_pair_distance": report.fragment_pair_distance,
                "elapsed_s": report.elapsed_s,
            },
            f,
        )
    return report



def assemble_long_multihost(
    long_paths: Sequence[str],
    outdir: str,
    params: PipelineParams,
    lr_min_cov: float = 2.0,
    subsample_spec: str = "",
) -> "PipelineReport":
    """Multi-host long-read assembly (requires an initialized
    jax.distributed group; CLI -coordinator/-nprocs/-procid with -long).

    Stage 1 builds with the local-merge layout (every process holds the
    full merged filters); stage 2's windowed correction is process-local
    over record-modulo read slices, each process writing part FASTAs; the
    OLC stage then runs on process 0 through ``assemble_long``'s resume
    path over the merged corrected FASTA (LONGREADS.CORRECTED stamp) —
    the multi-process generalization of the reference's correction
    worker pool + writer (RNABloom.java:3948-4046).
    """
    import jax
    from jax.sharding import Mesh

    from ..parallel import multihost
    from ..utils import checkpoint as ckpt
    from . import longreads as lrmod

    t0 = time.time()
    report = PipelineReport()
    k = params.k
    pid, n = jax.process_index(), jax.process_count()
    os.makedirs(outdir, exist_ok=True)

    cfg = stage1.default_graph_config(
        k, params.stranded, params.total_mem_bytes, params.num_hash, -1,
        with_pkbf=True, expected_num_kmers=params.expected_num_kmers,
        **params.graph_config_overrides(),
    )
    s1p = stage1.Stage1Params(
        k=k, stranded=params.stranded, min_qual=params.min_qual, max_seq_len=512
    )
    mesh = Mesh(np.array(jax.devices()), ("d",))
    gstate, s1_stats = multihost.build_graph_local_merge(
        long_paths, cfg, s1p, mesh
    )
    report.stage1 = s1_stats
    local_state = dbg.GraphState(
        *(
            None if a is None else jnp.asarray(np.asarray(jax.device_get(a)))
            for a in (gstate.dbgbf, gstate.cbf, gstate.rpkbf, gstate.fpkbf)
        )
    )
    if params.stop_stage <= 1:
        if pid == 0:
            ckpt.touch_stamp(outdir, ckpt.STAMP_DBG_DONE)
        report.elapsed_s = time.time() - t0
        return report

    # ---- stage 2: windowed correction over this process's read slice
    lrp = lrmod.LongReadParams(
        min_kmer_cov=lr_min_cov,
        min_seq_len=min(200, params.min_transcript_length),
    )
    part = os.path.join(outdir, f".mh_lr_p{pid}")
    chunk: List[np.ndarray] = []
    n_long = 0
    with fastx.FastaWriter(part + ".long.fa") as w, fastx.FastaWriter(
        part + ".short.fa"
    ) as wsh, fastx.FastaWriter(part + ".repeats.fa") as wrep:

        def flush_chunk():
            nonlocal n_long
            res = lrmod.correct_long_reads(local_state, cfg, chunk, lrp)
            # local numbering + polya in the comment; process 0 renumbers
            for c, fl in zip(res.long, res.polya):
                tag = " polya" if fl else ""
                w.write(f"p{pid}.{n_long}", sequtils.decode(c), f"l={len(c)}{tag}")
                n_long += 1
            for c, fl in zip(res.short, res.short_polya):
                tag = " polya" if fl else ""
                wsh.write(f"p{pid}.s", sequtils.decode(c), f"l={len(c)}{tag}")
            for c in res.repeats:
                wrep.write(f"p{pid}.r", sequtils.decode(c), f"l={len(c)}")
            chunk.clear()

        for path in long_paths:
            for _, s, _ in multihost.partition_records(
                fastx.read_seqs(path), pid, n
            ):
                codes = sequtils.encode(s)
                if params.revcomp_long:
                    codes = sequtils.revcomp_codes(codes)
                if len(codes) >= k:
                    chunk.append(codes)
                    report.num_pairs += 1
                if len(chunk) >= 4096:
                    flush_chunk()
        if chunk:
            flush_chunk()

    multihost.barrier(mesh)  # all parts written
    if pid != 0:
        report.elapsed_s = time.time() - t0
        return report

    # ---- merge parts with global numbering into the canonical layout
    # assemble_long's resume path expects (crash-after-correction files)
    prefix = os.path.join(outdir, f"{params.name}.longreads.corrected")
    lengths: List[int] = []
    with fastx.FastaWriter(prefix + ".long.fa") as w, fastx.FastaWriter(
        prefix + ".short.fa"
    ) as wsh, fastx.FastaWriter(prefix + ".repeats.fa") as wrep, open(
        prefix + ".polya.txt", "w"
    ) as wpa:
        n_long = n_short = n_rep = 0
        for p_i in range(n):
            pfx = os.path.join(outdir, f".mh_lr_p{p_i}")
            for header, seq in fastx.read_fasta(pfx + ".long.fa", full_header=True):
                tag = " polya" if "polya" in header else ""
                name = f"lr.{n_long}"
                w.write(name, seq, f"l={len(seq)}{tag}")
                if tag:
                    wpa.write(name + "\n")
                lengths.append(len(seq))
                n_long += 1
            for header, seq in fastx.read_fasta(pfx + ".short.fa", full_header=True):
                name = f"lr.s{n_short}"
                wsh.write(name, seq, f"l={len(seq)}")
                if "polya" in header:
                    wpa.write(name + "\n")
                n_short += 1
            for _, seq in fastx.read_fasta(pfx + ".repeats.fa"):
                wrep.write(f"lr.r{n_rep}", seq, f"l={len(seq)}")
                n_rep += 1
            for suffix in (".long.fa", ".short.fa", ".repeats.fa"):
                os.remove(pfx + suffix)
    with open(prefix + ".long.lengths.txt", "w") as f:
        f.write("\n".join(str(x) for x in lengths))
    ckpt.touch_stamp(outdir, ckpt.STAMP_DBG_DONE)
    ckpt.touch_stamp(outdir, ckpt.STAMP_LONGREADS_CORRECTED)

    # ---- stage 3 on process 0 via the resume path
    rep = assemble_long(
        long_paths, outdir, params, lr_min_cov=lr_min_cov,
        subsample_spec=subsample_spec,
    )
    rep.stage1 = s1_stats
    rep.num_pairs = report.num_pairs
    rep.elapsed_s = time.time() - t0
    return rep


def merge_pool(outdir: str, sample_names: Sequence[str], params: PipelineParams) -> int:
    """-mergepool: concatenate per-sample nr assemblies and reduce redundancy
    into one merged FASTA (mergePooledAssemblies, RNABloom.java:5473)."""
    from ..io.seqstore import SeqStore

    seqs = SeqStore(os.path.join(outdir, f".{params.name}.merge_input.2bit"))
    for name in sample_names:
        for fname in (f"{params.name}.transcripts.nr.fa", f"{params.name}.transcripts.fa"):
            path = os.path.join(outdir, name, fname)
            if os.path.exists(path):
                for _, s in fastx.read_fasta(path):
                    seqs.append(sequtils.encode(s.upper()))
                break
    if not len(seqs):
        seqs.close(delete=True)
        return 0
    from ..olc import layout as olc_layout, overlap as olc_overlap

    op = olc_overlap.OverlapParams(
        min_overlap=max(params.min_transcript_length // 2, 100)
    )
    merged_seqs, _, _ = olc_layout.layout_unitigs(seqs, params.k, op)
    seqs.close(delete=True)
    merged = os.path.join(outdir, f"{params.name}.transcripts.merged.fa")
    with fastx.FastaWriter(merged, uracil=params.write_uracil) as w:
        for j, s in enumerate(merged_seqs):
            w.write(f"{params.header_prefix}{params.name}.merged.{j}", sequtils.decode(s), f"l={len(s)}")
    return len(merged_seqs)


def parse_pool_list(path: str) -> List[Tuple[str, str, str, Tuple[str, ...], Tuple[str, ...]]]:
    """Parse a -pool READSLIST (getPooledReadPaths, RNABloom.java:5066-5224).

    Lines are '<name> <left> <right> [sef] [ser]'; a header line starting
    with '#' may name the columns (any order of left/right/sef/ser after
    name).  sef/ser cells may hold comma-separated lists or '-' for none.
    Returns (name, left, right, sef_paths, ser_paths) tuples.
    """
    out = []
    columns = ["name", "left", "right", "sef", "ser"]
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                # optional header row names the columns (RNABloom.java:5092)
                hdr = line.lstrip("#").split()
                if hdr and all(h in ("name", "left", "right", "sef", "ser") for h in hdr):
                    columns = hdr
                continue
            parts = line.split()
            if len(parts) < 3:
                raise ValueError(f"pool list line needs '<name> <left> <right>': {line!r}")
            row = dict(zip(columns, parts))
            if not {"name", "left", "right"} <= row.keys():
                raise ValueError(f"pool list line missing name/left/right: {line!r}")

            def paths(cell: Optional[str]) -> Tuple[str, ...]:
                if not cell or cell == "-":
                    return ()
                return tuple(p for p in cell.split(",") if p)

            out.append(
                (row["name"], row["left"], row["right"], paths(row.get("sef")), paths(row.get("ser")))
            )
    return out


def assemble_pool(
    readslist_path: str,
    outdir: str,
    params: PipelineParams,
    revcomp_left: bool = False,
    revcomp_right: bool = True,
) -> dict:
    """Pooled multi-sample assembly (-pool): ONE shared graph built from all
    samples' reads, then per-sample fragment + transcript stages into
    {outdir}/{sample}/ (RNABloom.main :7203-7322).  Samples are processed in
    sorted name order, as the reference does."""
    t0 = time.time()
    os.makedirs(outdir, exist_ok=True)
    samples = sorted(parse_pool_list(readslist_path))
    k = params.k

    all_paths = [p for _, l, r, sef, ser in samples for p in (l, r) + sef + ser]
    lengths = stage1.sample_read_lengths(all_paths, params.sample_size)
    d_read, _ = stage1.read_length_params(lengths, k, params.min_num_kmer_pairs)
    read_L = int(max(lengths.max(initial=150), k + d_read + 1))

    cfg = stage1.default_graph_config(
        k, params.stranded, params.total_mem_bytes, params.num_hash, d_read,
        expected_num_kmers=params.expected_num_kmers,
        **params.graph_config_overrides(),
    )
    s1p = stage1.Stage1Params(
        k=k, stranded=params.stranded, min_qual=params.min_qual,
        max_seq_len=max(read_L, 2 * k),
    )
    flags = []
    paths = []
    for _, l, r, sef, ser in samples:
        paths += [l, r] + list(sef) + list(ser)
        flags += [revcomp_left, revcomp_right] + [False] * len(sef) + [True] * len(ser)
    shared, s1_stats, cfg = stage1.build_graph_autosized(
        paths, cfg, s1p, max_fpr=params.max_fpr, mesh=_mesh_for(params),
        revcomp_flags=flags, add_read_pairs=True,
    )

    reports = {}
    if params.stop_stage <= 1:
        return reports
    fparams = fragmod.FragmentParams(
        min_overlap=params.min_overlap, bound=params.bound,
        lookahead=params.lookahead, extend_fragments=params.extend_fragments,
        ec_params=params.correct_params(),
    )
    for name, left, right, sef, ser in samples:
        sample_dir = os.path.join(outdir, name)
        os.makedirs(sample_dir, exist_ok=True)
        report = PipelineReport()
        report.stage1 = s1_stats

        store = _new_fragment_store(sample_dir, params)
        frag_lengths: List[int] = []
        for lb, ll, rb, rl, multi in _iter_pair_batches(
            left, right, params, k, revcomp_left, revcomp_right, read_L
        ):
            report.num_pairs += lb.shape[0]
            _connect_multi_segments(shared, cfg, lb, ll, rb, rl, multi, fparams)
            outs = fragmod.assemble_fragments_batch(shared, cfg, lb, ll, rb, rl, fparams)
            for f in outs:
                if f is not None:
                    _store_fragment(store, f, params)
                    frag_lengths.append(f.length)
        if sef or ser:
            _ingest_se_fragments(
                shared, cfg, sef, ser, read_L, params,
                store, frag_lengths, report,
            )
        store.close()
        report.num_fragments = store.count
        if store.count == 0 or params.stop_stage <= 2:
            report.elapsed_s = time.time() - t0
            reports[name] = report
            continue

        q1, _, q3 = sequtils.quartiles(np.asarray(frag_lengths))
        d_frag = max(1, int(q1) - k - params.min_num_kmer_pairs)
        report.fragment_pair_distance = d_frag
        sample_cfg = dbg.GraphConfig(
            k=cfg.k, stranded=cfg.stranded, dbgbf=cfg.dbgbf, cbf=cfg.cbf,
            pkbf=cfg.pkbf, read_pair_distance=cfg.read_pair_distance,
            fragment_pair_distance=d_frag, exact_counts=cfg.exact_counts,
        )
        # per-sample fragment graph: fresh counters + fpkbf; the pooled
        # rpkbf is shared across samples (copied — the rebuild step donates
        # its input buffers, and the shared lanes must survive for later
        # samples)
        frag_L = int(min(max(store.max_len, 2 * k), params.max_walk_len))
        sample_state = engine.fresh_rebuild_state(
            shared, sample_cfg, copy_rpkbf=True
        )
        add_pairs = frag_L - k + 1 > d_frag
        for bi, (codes, _l, _c, _conn) in enumerate(
            store.iter_batches(1024, width=frag_L)
        ):
            sample_state = engine.rebuild_step(
                sample_state, sample_cfg, codes, add_frag_pairs=add_pairs, salt=bi
            )

        _run_stage3(sample_state, sample_cfg, store, sample_dir, params, report)
        report.elapsed_s = time.time() - t0
        reports[name] = report

    return reports


def assemble_long(
    long_paths: Sequence[str],
    outdir: str,
    params: PipelineParams,
    lr_min_cov: float = 2.0,
    subsample_multiplicity: int = 0,
    subsample_spec: str = "",
    force: bool = False,
) -> "PipelineReport":
    """Long-read (ONT/PacBio cDNA) assembly (-long path).

    Stages mirror RNABloom.main :7323-7470: graph build over long reads,
    windowed correction (LongReadCorrectionWorker), optional k-mer-based
    subsampling, then overlap-layout with the internal minimizer engine in
    place of the external minimap2/racon pipeline (uniqueOLC,
    olc/OverlapLayoutConsensus.java:1129-1228).

    Resume protocol (RNABloom.java:5818-5825, :6451-6500): a rerun with the
    LONGREADS.CORRECTED stamp present reloads the corrected reads and jumps
    straight to the OLC stage; LONGREADS.ASSEMBLED marks completion.
    """
    from ..olc import layout as olc_layout, overlap as olc_overlap
    from ..utils import checkpoint as ckpt
    from . import longreads as lrmod

    t0 = time.time()
    os.makedirs(outdir, exist_ok=True)
    if force:
        ckpt.clear_stamps(outdir)
    report = PipelineReport()
    k = params.k
    # corrected-read file layout mirrors the reference (RNABloom.java:
    # 7324-7329): .long feeds the OLC stage; .short/.repeats are preserved
    # outputs; polyA read names and sampled long-read lengths ride along.
    corrected_prefix = os.path.join(outdir, f"{params.name}.longreads.corrected")
    corrected_path = corrected_prefix + ".long.fa"
    short_path_lr = corrected_prefix + ".short.fa"
    repeats_path = corrected_prefix + ".repeats.fa"
    polya_names_path = corrected_prefix + ".polya.txt"
    sample_lengths_path = corrected_prefix + ".long.lengths.txt"

    from ..io.seqstore import SeqStore

    # disk-backed corrected-read store: host RAM stays bounded no matter
    # how many reads are corrected (VERDICT r2/r3: the reference streams
    # through a writer worker, RNABloom.java:3490-3635; a Python list of
    # decoded arrays is 4-40x the input size)
    corrected = SeqStore(corrected_prefix + ".2bit")
    polya_flags: List[bool] = []
    resumed = (
        not force
        and ckpt.has_stamp(outdir, ckpt.STAMP_LONGREADS_CORRECTED)
        and os.path.exists(corrected_path)
    )
    cfg = stage1.default_graph_config(
        k, params.stranded, params.total_mem_bytes, params.num_hash, -1,
        with_pkbf=True, expected_num_kmers=params.expected_num_kmers,
        **params.graph_config_overrides(),
    )
    if resumed:
        # crash after correction: skip graph build + correction entirely;
        # the FASTA streams straight into the disk-backed store
        for header, seq in fastx.read_fasta(corrected_path, full_header=True):
            corrected.append(sequtils.encode(seq.upper()))
            polya_flags.append("polya" in header)
        report.num_fragments = len(corrected)
        if not corrected or params.stop_stage <= 2:
            report.elapsed_s = time.time() - t0
            return report
    else:
        s1p = stage1.Stage1Params(
            k=k, stranded=params.stranded, min_qual=params.min_qual, max_seq_len=512
        )
        state, s1_stats, cfg = stage1.build_graph_autosized(
            long_paths, cfg, s1p, max_fpr=params.max_fpr, mesh=_mesh_for(params)
        )
        report.stage1 = s1_stats
        ckpt.touch_stamp(outdir, ckpt.STAMP_DBG_DONE)
        if params.stop_stage <= 1:
            report.elapsed_s = time.time() - t0
            return report

        # stage 2: correction — raw reads stream from disk in bounded
        # chunks and corrected reads stream straight to the stratified
        # output FASTAs (the reference's reader -> workers -> writer queue,
        # RNABloom.java:3948-4046, CorrectedLongReadsWriterWorker2)
        # length threshold = min(minOverlap, minTranscriptLength)
        # (RNABloom.java:7344 lenThreshold)
        lrp = lrmod.LongReadParams(
            min_kmer_cov=lr_min_cov,
            min_seq_len=min(200, params.min_transcript_length),
        )
        chunk: List[np.ndarray] = []
        n_short = n_rep = 0
        with fastx.FastaWriter(corrected_path) as w, fastx.FastaWriter(
            short_path_lr
        ) as wsh, fastx.FastaWriter(repeats_path) as wrep, open(
            polya_names_path, "w"
        ) as wpa:

            def flush_chunk():
                nonlocal n_short, n_rep
                res = lrmod.correct_long_reads(state, cfg, chunk, lrp)
                for c, fl in zip(res.long, res.polya):
                    name = f"lr.{len(corrected)}"
                    tag = " polya" if fl else ""
                    w.write(name, sequtils.decode(c), f"l={len(c)}{tag}")
                    if fl:
                        wpa.write(name + "\n")
                    corrected.append(c)
                    polya_flags.append(fl)
                for c, fl in zip(res.short, res.short_polya):
                    name = f"lr.s{n_short}"
                    wsh.write(name, sequtils.decode(c), f"l={len(c)}")
                    if fl:
                        wpa.write(name + "\n")
                    n_short += 1
                for c in res.repeats:
                    wrep.write(f"lr.r{n_rep}", sequtils.decode(c), f"l={len(c)}")
                    n_rep += 1
                chunk.clear()

            for path in long_paths:
                for _, s, _ in fastx.read_seqs(path):
                    codes = sequtils.encode(s)
                    if params.revcomp_long:  # -rc (RNABloom.java optRevCompLong)
                        codes = sequtils.revcomp_codes(codes)
                    if len(codes) >= k:
                        chunk.append(codes)
                        report.num_pairs += 1
                    if len(chunk) >= 4096:
                        flush_chunk()
            if chunk:
                flush_chunk()
        report.num_fragments = len(corrected)
        with open(sample_lengths_path, "w") as f:
            f.write("\n".join(str(n) for n in corrected.lengths))
        ckpt.touch_stamp(outdir, ckpt.STAMP_LONGREADS_CORRECTED)
        if not len(corrected) or params.stop_stage <= 2:
            report.elapsed_s = time.time() - t0
            return report

    sample_lengths = corrected.lengths.astype(np.int64)

    seed_indices = None
    if subsample_spec:
        # -lrsub (RNABloom.java:6335-6339): "depth,s,size,window" selects
        # strobemer-novelty subsampling; "depth,k,size" selects k-mer pairs.
        # Seeds feed uniqueOLC's unitig construction while ALL corrected
        # reads are still mapped for polish and counts (RNABloom.java:7424).
        parts = [int(x) for x in subsample_spec.split(",")]
        if len(parts) == 4:
            depth, s, _size, window = parts
            seed_indices = lrmod.subsample_strobemer_based(
                cfg, corrected, max_multiplicity=depth, w_min=s, w_max=window
            )
        elif len(parts) == 3:
            depth = parts[0]
            seed_indices = lrmod.subsample_kmer_based(cfg, corrected, depth)
        else:
            raise ValueError(f"bad -lrsub spec: {subsample_spec!r}")
    elif subsample_multiplicity > 0:
        seed_indices = lrmod.subsample_kmer_based(cfg, corrected, subsample_multiplicity)

    # stage 3: internal uniqueOLC (unique reads -> unitigs -> pileup
    # polish -> binomial-filtered greedy layout)
    op = olc_overlap.OverlapParams(
        min_match_prop=params.lr_overlap_prop,
        min_shared_frac=params.sketch_overlap_prop,
    )
    if params.minimizer_window > 0:
        op.w = params.minimizer_window
    if params.sketch_overlap_num > 0:
        op.min_shared = params.sketch_overlap_num
    if params.write_paf and corrected:
        # -paf: the reference's OLC stage leaves `*.ava.paf.gz` behind
        # (olc/OverlapLayoutConsensus.java:78-106); emit the internal
        # engine's all-vs-all overlaps in the same format for interop
        from ..io import paf as pafmod
        from ..olc import overlap as olc_overlap_mod

        mk = params.minimizer_size or k
        mins = olc_overlap_mod.extract_minimizers_reads(corrected, mk, op.w)
        ov = olc_overlap_mod.find_overlaps(mins, op)
        pafmod.write_paf(
            os.path.join(outdir, f"{params.name}.ava.paf"),
            pafmod.overlaps_to_paf(ov, mins.lengths, mk),
        )

    ext_ov = None
    if params.paf_in:
        # -pafin: an external all-vs-all PAF over the corrected reads
        # (named lr.<i>, the names this pipeline writes) replaces the
        # internal minimizer engine for unique extraction — the interop
        # inverse of -paf (reference overlap source:
        # olc/OverlapLayoutConsensus.java:78-106)
        from ..io import paf as pafmod2

        ext_ov = pafmod2.paf_to_overlaps(
            params.paf_in,
            {f"lr.{i}": i for i in range(len(corrected))},
            params.minimizer_size or k,
            min_identity=params.lr_overlap_prop,
            params=op,  # same span/support screens as the internal engine
        )
    res = olc_layout.unique_olc(
        corrected,
        params.minimizer_size or k,  # -m: OLC minimizer size
        op,
        polya_flags=polya_flags,
        sample_lengths=sample_lengths,
        min_seq_depth=params.lr_min_depth or max(int(lr_min_cov), 1),
        polya_finder=lambda codes: polya.find_polya_tail(codes) is not None,
        seed_indices=seed_indices,
        external_overlaps=ext_ov,
    )
    assembled = res.transcripts
    tx_counts = res.counts

    # redundancy reduction + length split
    from ..bloom.filters import merge_default

    scfg = BloomConfig(cfg.pkbf.size_log2, cfg.pkbf.num_hash, merge=merge_default())
    tparams = txmod.TranscriptParams(
        min_transcript_length=params.min_transcript_length
    )
    keep = txmod.reduce_redundancy(cfg, scfg, assembled, tparams)
    tx_path = os.path.join(outdir, f"{params.name}.transcripts.fa")
    short_path = os.path.join(outdir, f"{params.name}.transcripts.short.fa")
    with fastx.FastaWriter(tx_path, uracil=params.write_uracil) as wtx, fastx.FastaWriter(
        short_path, uracil=params.write_uracil
    ) as wsh:
        for j, i in enumerate(keep):
            seq = sequtils.decode(assembled[i])
            comment = f"l={len(seq)} c={tx_counts[i]:.2f}"
            if len(seq) >= params.min_transcript_length:
                wtx.write(f"{params.header_prefix}{params.name}.{report.num_transcripts}", seq, comment)
                report.num_transcripts += 1
            else:
                wsh.write(f"{params.header_prefix}{params.name}.s{report.num_short}", seq)
                report.num_short += 1

    ckpt.touch_stamp(outdir, ckpt.STAMP_LONGREADS_ASSEMBLED)
    corrected.close(delete=True)  # 2-bit cache of the corrected FASTA
    report.elapsed_s = time.time() - t0
    return report


def _finish_pe_stage3(
    state: dbg.GraphState,
    cfg: dbg.GraphConfig,
    store: "fragstore.FragmentStore",
    outdir: str,
    params: PipelineParams,
    report: "PipelineReport",
    ref_paths: Sequence[str] = (),
) -> None:
    """Stage 2b (fragment-graph rebuild) + stage 3 for the PE path.

    Both passes stream fragments from the stratified store in fixed-size
    batches — the reference's bounded-queue + strata-file flow
    (RNABloom.java:4214-4301, :4886) — instead of materializing one dense
    matrix.  ``ref_paths``: reference transcript FASTAs whose k-mers and
    fragment pairs augment the fragment graph (-ref,
    populateGraphFromFragments refFastas branch, RNABloom.java:1553-1560)."""
    from ..utils import checkpoint as ckpt

    k = cfg.k
    d_frag = cfg.fragment_pair_distance
    frag_L = int(min(max(store.max_len, 2 * k), params.max_walk_len))
    state = engine.fresh_rebuild_state(state, cfg)
    add_pairs = frag_L - k + 1 > d_frag
    nbatch = 0
    for codes, _lens, _covs, _conn in store.iter_batches(1024, width=frag_L):
        state = engine.rebuild_step(state, cfg, codes, add_frag_pairs=add_pairs, salt=nbatch)
        nbatch += 1

    # -ref augmentation: add reference transcript k-mers + fragment pairs
    for rp in ref_paths:
        for _, rseq in fastx.read_fasta(rp):
            codes_r = sequtils.encode(rseq.upper())
            if len(codes_r) < k:
                continue
            for s0 in range(0, len(codes_r), params.max_walk_len - k + 1):
                chunk_np = np.full((1, params.max_walk_len), 4, np.uint8)
                piece = codes_r[s0 : s0 + params.max_walk_len]
                chunk_np[0, : len(piece)] = piece
                state = engine.rebuild_step(
                    state, cfg, chunk_np,
                    add_frag_pairs=params.max_walk_len - k + 1 > d_frag,
                    salt=nbatch,
                )
                nbatch += 1

    _run_stage3(state, cfg, store, outdir, params, report)
    ckpt.touch_stamp(outdir, ckpt.STAMP_TRANSCRIPTS_DONE)
    ckpt.touch_stamp(outdir, ckpt.STAMP_TRANSCRIPTS_NR_DONE)


def _new_fragment_store(outdir: str, params: PipelineParams) -> "fragstore.FragmentStore":
    return fragstore.FragmentStore(
        outdir,
        long_threshold=params.min_transcript_length,
        polya_priority=params.polya_min_len > 0,
    )


def _store_fragment(
    store: "fragstore.FragmentStore", f: "fragmod.Fragment", params: PipelineParams
) -> None:
    pa = (
        params.polya_min_len > 0
        and polya.find_polya_tail(f.codes) is not None
    )
    store.add(f.codes, f.min_cov, f.connected, polya=pa)



def _stage2_pair_loop(
    state,
    cfg: dbg.GraphConfig,
    left_path: str,
    right_path: str,
    params: PipelineParams,
    revcomp_left: bool,
    revcomp_right: bool,
    read_L: int,
    fparams: "fragmod.FragmentParams",
    store: "fragstore.FragmentStore",
    report: "PipelineReport",
    frag_lengths: List[int],
    stride=None,
    rescue_spill: Optional[list] = None,
) -> int:
    """The stage-2 fragment loop over (a slice of) the pair stream.

    Returns the learned fragment pair distance (-1 when the sample never
    filled — the caller derives it from all lengths).  ``stride``
    (process_id, num_processes) restricts to a record-modulo slice for
    multi-host stage 2 (mate-alignment safe on paired files); the
    fragment-length sample then learns per process, mirroring the
    reference's thread-order-dependent sampling
    (RNABloom.java:4534-4568)."""
    k = cfg.k
    learned = False
    d_frag = -1
    _d0 = engine.dispatch_counts()
    for lb, ll, rb, rl, multi in _iter_pair_batches(
        left_path, right_path, params, k, revcomp_left, revcomp_right, read_L,
        stride=stride,
    ):
        report.num_pairs += int((ll > 0).sum())
        _connect_multi_segments(state, cfg, lb, ll, rb, rl, multi, fparams)
        outs = fragmod.assemble_fragments_batch(state, cfg, lb, ll, rb, rl, fparams)
        for i, f in enumerate(outs):
            if f is not None and f.min_cov >= params.min_fragment_cov:
                _store_fragment(store, f, params)
                frag_lengths.append(f.length)
            elif (
                rescue_spill is not None
                and f is None
                and ll[i] >= k
                and rl[i] >= k
                and len(rescue_spill) < _RESCUE_SPILL_CAP
            ):
                rescue_spill.append(
                    (lb[i, : ll[i]].copy(), rb[i, : rl[i]].copy())
                )
        report.stage2_batches += 1
        if not learned and len(frag_lengths) >= params.sample_size:
            # the reference learns BOTH the fragment pair distance (sample
            # Q1 - k - minNumKmerPairs) and the walk bound from the first
            # sampleSize fragments' quartiles, then continues with the new
            # bound — sampled fragments are kept as assembled
            # (RNABloom.java:4534-4568)
            learned = True
            q1, _, q3 = sequtils.quartiles(np.asarray(frag_lengths))
            fparams.bound = int(q3 + (q3 - q1) * 3 // 2)
            d_frag = max(1, int(q1) - k - params.min_num_kmer_pairs)
    _d1 = engine.dispatch_counts()
    report.stage2_dispatches = {k2: _d1[k2] - _d0[k2] for k2 in _d1}
    return d_frag


# -rescue holds unconnected pairs in host RAM for the second attempt; the
# cap bounds RSS (~2 * read_L bytes/pair).  Beyond it, pairs stay dropped —
# the reference's file-spill variant isn't needed at assembly scale here.
_RESCUE_SPILL_CAP = 200_000


def _rescue_unconnected_pass(
    state,
    cfg: dbg.GraphConfig,
    spill: list,
    read_L: int,
    params: PipelineParams,
    fparams: "fragmod.FragmentParams",
    store: "fragstore.FragmentStore",
    frag_lengths: List[int],
    report: "PipelineReport",
) -> None:
    """Second connection attempt for unconnected read pairs (-rescue).

    Mirrors rescueUnconnectedMultiThreaded (RNABloom.java:2392-2668): build
    the stage-2b fragment graph (fragment counters + fpkbf over the stored
    fragments, read-pair keys kept), re-correct the spilled pairs against
    the *read* graph, then retry overlap / bridge / pair-validation against
    the fragment graph whose k-mers may span gaps raw reads could not.
    Rescued fragments join the store before the final stage-2b rebuild, so
    they also contribute paired k-mers to stage 3."""
    k = cfg.k
    if not spill or store.count == 0:
        return
    store.flush()
    frag_L = int(min(max(store.max_len, 2 * k), params.max_walk_len))
    rescue_graph = engine.fresh_rebuild_state(state, cfg, copy_rpkbf=True)
    add_pairs = frag_L - k + 1 > cfg.fragment_pair_distance
    for nb, (codes, _l, _c, _conn) in enumerate(
        store.iter_batches(1024, width=frag_L)
    ):
        rescue_graph = engine.rebuild_step(
            rescue_graph, cfg, codes, add_frag_pairs=add_pairs, salt=nb
        )

    B = max(64, min(params.batch_size, 1 << (len(spill) - 1).bit_length()))
    for s0 in range(0, len(spill), B):
        chunk = spill[s0 : s0 + B]
        lb = np.full((B, read_L), 4, np.uint8)
        rb = np.full((B, read_L), 4, np.uint8)
        ll = np.zeros(B, np.int32)
        rl = np.zeros(B, np.int32)
        for i, (lc, rc_) in enumerate(chunk):
            ll[i] = min(len(lc), read_L)
            rl[i] = min(len(rc_), read_L)
            lb[i, : ll[i]] = lc[: ll[i]]
            rb[i, : rl[i]] = rc_[: rl[i]]
        # pairs were not corrected on the failed first attempt (EC output is
        # discarded with the pair): correct once against the read graph, as
        # the reference's rescue worker reads already-corrected pairs
        both = np.concatenate([lb, rb], axis=0)
        both_len = np.concatenate([ll, rl])
        pair_ids = np.concatenate([np.arange(B), np.arange(B)])
        both, both_len, _ = correct.correct_batch(
            state, cfg, both, both_len, fparams.ec_params, pair_ids
        )
        lb, rb = both[:B], both[B:]
        ll, rl = both_len[:B], both_len[B:]
        outs = fragmod.rescue_unconnected(
            rescue_graph, cfg, lb, ll, rb, rl, fparams
        )
        for i, f in enumerate(outs):
            if (
                i < len(chunk)
                and f is not None
                and f.min_cov >= params.min_fragment_cov
            ):
                _store_fragment(store, f, params)
                frag_lengths.append(f.length)
                report.num_rescued += 1
    del rescue_graph


def assemble_pe(
    left_path: str,
    right_path: str,
    outdir: str,
    params: PipelineParams,
    revcomp_left: bool = False,
    revcomp_right: bool = True,
    save_graph: bool = False,
    force: bool = False,
    sef_paths: Sequence[str] = (),
    ser_paths: Sequence[str] = (),
    ref_paths: Sequence[str] = (),
) -> PipelineReport:
    """Bulk paired-end assembly -> {outdir}/rnabloom.transcripts.fa.

    With ``save_graph`` the stage-1 filters are checkpointed and reruns
    resume from stage stamps (the reference's -savebf + stamp protocol,
    RNABloom.java:7060-7080); ``force`` ignores existing stamps.
    ``sef_paths``/``ser_paths`` mix unpaired reads into the run: they join
    the stage-1 graph and contribute error-corrected unconnected fragments
    (the reference's -sef/-ser alongside -left/-right,
    SingleEndReadExtractor :1935-2036).
    """
    from ..utils import checkpoint as ckpt

    t0 = time.time()
    os.makedirs(outdir, exist_ok=True)
    if force:
        ckpt.clear_stamps(outdir)
    ckpt.touch_stamp(outdir, ckpt.STAMP_STARTED)
    graph_prefix = os.path.join(outdir, f"{params.name}.graph")
    report = PipelineReport()
    timer = Timer(quiet=not params.verbose)
    k = params.k

    # resume: stage 1 + 2 complete with a saved graph -> jump to stage 3
    if (
        not force
        and ckpt.has_stamp(outdir, ckpt.STAMP_FRAGMENTS_DONE)
        and os.path.exists(graph_prefix + ".graph.json")
    ):
        store = fragstore.FragmentStore.open(outdir)
        if store is not None and store.count > 0:
            state, cfg = ckpt.load_graph(graph_prefix)
            mesh = _mesh_for(params)
            if mesh is not None:
                state = engine.from_host_state(state, cfg, mesh)
            report.num_fragments = store.count
            report.fragment_pair_distance = cfg.fragment_pair_distance
            _finish_pe_stage3(state, cfg, store, outdir, params, report)
            report.elapsed_s = time.time() - t0
            return report

    # ---- stage 0: read length params (quartiles persisted to .readstats so
    # reruns skip the sampling pass, RNABloom.java:2669-2714)
    readstats_path = os.path.join(outdir, f"{params.name}.readstats")
    lengths = None
    nk_hint = 0
    if not force and os.path.exists(readstats_path):
        try:
            with open(readstats_path) as fh:
                rs = json.load(fh)
            lengths = np.asarray(rs["lengths"], np.int64)
            nk_hint = int(rs.get("distinct_kmers", 0))
        except (json.JSONDecodeError, KeyError):
            lengths = None
    if lengths is None:
        lengths = stage1.sample_read_lengths(
            [left_path, right_path], params.sample_size
        )
        with open(readstats_path, "w") as fh:
            q = sequtils.quartiles(lengths) if len(lengths) else (0, 0, 0)
            json.dump(
                {"lengths": [int(x) for x in lengths], "quartiles": list(map(int, q))},
                fh,
            )
    d_read, max_tip = stage1.read_length_params(lengths, k, params.min_num_kmer_pairs)
    if params.max_tip_length >= 0:  # -tiplength overrides the auto value
        max_tip = params.max_tip_length
    read_L = int(max(lengths.max(initial=150), k + d_read + 1))

    # a rerun sizes filters from the previous run's distinct-k-mer estimate
    # (the persisted ntCard-F0 stand-in), skipping FPR-resize rebuild passes
    cfg = stage1.default_graph_config(
        k, params.stranded, params.total_mem_bytes, params.num_hash, d_read,
        expected_num_kmers=params.expected_num_kmers or nk_hint,
        **params.graph_config_overrides(),
    )

    if params.verbose:
        # memory plan table (RNABloom.java:5769-5784)
        cbf_mb = (cfg.cbf.size * cfg.cbf.cell_bytes) >> 20
        pk_mb = (cfg.pkbf.size * 1) >> 20 if cfg.pkbf else 0
        print(
            f"Mem plan: cbf {cbf_mb} MB (2^{cfg.cbf.size_log2} x "
            f"{cfg.cbf.cell_bytes} B {cfg.cbf.dtype}), "
            f"rpkbf {pk_mb} MB, fpkbf {pk_mb} MB, sbf {pk_mb} MB; "
            f"k={k} d_read={d_read} hash={cfg.cbf.num_hash}",
            flush=True,
        )

    # ---- stage 1: graph build (right mates revcomp'd onto forward strand)
    timer.start("stage 1: de Bruijn graph construction")
    mesh = _mesh_for(params)
    s1p = stage1.Stage1Params(
        k=k, stranded=params.stranded, min_qual=params.min_qual,
        max_seq_len=max(read_L, 2 * k),
    )
    state, s1_stats, cfg = stage1.build_graph_autosized(
        [left_path, right_path] + list(sef_paths) + list(ser_paths), cfg, s1p,
        max_fpr=params.max_fpr, mesh=mesh,
        revcomp_flags=[revcomp_left, revcomp_right]
        + [False] * len(sef_paths)
        + [True] * len(ser_paths),
        add_read_pairs=True,
    )
    s1_stats.read_pair_distance = d_read
    s1_stats.max_tip_length = max_tip
    report.stage1 = s1_stats
    if s1_stats.distinct_kmers_est > 0:
        try:  # persist for rerun filter sizing
            with open(readstats_path) as fh:
                rs = json.load(fh)
            rs["distinct_kmers"] = s1_stats.distinct_kmers_est
            with open(readstats_path, "w") as fh:
                json.dump(rs, fh)
        except (json.JSONDecodeError, OSError):
            pass
    timer.done(
        "graph built",
        f"{s1_stats.num_segments} segments, FPRs {s1_stats.fprs}",
    )
    from ..utils import checkpoint as ckpt

    ckpt.touch_stamp(outdir, ckpt.STAMP_DBG_DONE)
    if params.stop_stage <= 1:  # -stage 1: graph only (RNABloom.java:6447-6500)
        if save_graph:
            ckpt.save_graph(graph_prefix, engine.to_host_state(state, cfg), cfg)
        report.elapsed_s = time.time() - t0
        return report

    # ---- stage 2: fragments
    timer.start("stage 2: fragment assembly")
    _t_s2 = time.time()
    fparams = fragmod.FragmentParams(
        min_overlap=params.min_overlap, bound=params.bound,
        lookahead=params.lookahead, extend_fragments=params.extend_fragments,
        ec_params=params.correct_params(),
    )
    store = _new_fragment_store(outdir, params)
    frag_lengths: List[int] = []
    rescue_spill: Optional[list] = [] if params.rescue_unconnected else None
    d_frag = _stage2_pair_loop(
        state, cfg, left_path, right_path, params, revcomp_left,
        revcomp_right, read_L, fparams, store, report, frag_lengths,
        rescue_spill=rescue_spill,
    )
    report.num_fragments = store.count
    if store.count == 0:
        store.close()
        report.elapsed_s = time.time() - t0
        return report

    if d_frag < 0:  # input smaller than the sample: use all lengths
        q1, _, q3 = sequtils.quartiles(np.asarray(frag_lengths))
        d_frag = max(1, int(q1) - k - params.min_num_kmer_pairs)
    report.fragment_pair_distance = d_frag
    cfg = dbg.GraphConfig(
        k=cfg.k, stranded=cfg.stranded, dbgbf=cfg.dbgbf, cbf=cfg.cbf,
        pkbf=cfg.pkbf, read_pair_distance=cfg.read_pair_distance,
        fragment_pair_distance=d_frag, exact_counts=cfg.exact_counts,
    )

    # mixed input: unpaired reads become error-corrected unconnected fragments
    if sef_paths or ser_paths:
        _ingest_se_fragments(
            state, cfg, sef_paths, ser_paths, read_L, params,
            store, frag_lengths, report,
        )
        report.num_fragments = store.count

    if rescue_spill:
        _rescue_unconnected_pass(
            state, cfg, rescue_spill, read_L, params, fparams, store,
            frag_lengths, report,
        )
        report.num_fragments = store.count

    store.close()
    report.stage2_s = time.time() - _t_s2
    timer.done("fragments assembled", f"{store.count}/{report.num_pairs} pairs connected")
    if save_graph:
        ckpt.save_graph(graph_prefix, engine.to_host_state(state, cfg), cfg)
        ckpt.update_fragment_distance(graph_prefix, d_frag)
    ckpt.touch_stamp(outdir, ckpt.STAMP_FRAGMENTS_DONE)
    if params.stop_stage <= 2:  # -stage 2: stop after fragment assembly
        report.elapsed_s = time.time() - t0
        return report

    timer.start("stage 3: transcript assembly")
    _t_s3 = time.time()
    _finish_pe_stage3(state, cfg, store, outdir, params, report, ref_paths=ref_paths)
    report.stage3_s = time.time() - _t_s3
    timer.done("transcripts assembled", f"{report.num_transcripts} transcripts, {report.num_nr} nr")
    report.elapsed_s = time.time() - t0
    with open(os.path.join(outdir, f"{params.name}.report.json"), "w") as f:
        json.dump(
            {
                "num_pairs": report.num_pairs,
                "num_fragments": report.num_fragments,
                "num_transcripts": report.num_transcripts,
                "num_short": report.num_short,
                "fragment_pair_distance": report.fragment_pair_distance,
                "elapsed_s": report.elapsed_s,
            },
            f,
        )
    return report
