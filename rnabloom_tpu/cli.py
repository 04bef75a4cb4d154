"""Command-line driver — the reference's CLI surface, TPU-native backend.

Mirrors the option names of the reference driver (RNABloom.java:5839-6410)
for the paths implemented so far; unimplemented options are declared and
rejected with a clear message rather than silently ignored.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rnabloom-tpu",
        description="TPU-native reference-free transcriptome assembly",
    )
    p.add_argument("-left", "--left", help="left read file (FASTQ/FASTA, gz ok)")
    p.add_argument("-right", "--right", help="right read file")
    p.add_argument("-sef", "--sef", help="single-end forward reads", nargs="*")
    p.add_argument("-ser", "--ser", help="single-end reverse reads", nargs="*")
    p.add_argument("-long", "--long", dest="long_reads", nargs="*", help="long reads (ONT)")
    p.add_argument("-pool", "--pool", help="pooled multi-sample READSLIST file")
    p.add_argument("-ref", "--ref", nargs="*", help="reference transcripts to augment the graph")
    p.add_argument("-o", "--outdir", default="rnabloom_out", help="output directory")
    p.add_argument("-k", "--kmer", default="25", help="k-mer size, list, or range e.g. '25,26,30-50:5' [25]")
    p.add_argument("-q", "--qual", type=int, default=3, help="min base quality [3]")
    p.add_argument("-Q", "--qual-avg", dest="qual_avg", type=int, default=0, help="min average read quality [0]")
    p.add_argument("-stranded", "--stranded", action="store_true", help="strand-specific reads")
    p.add_argument("-revcomp-left", action="store_true", help="reverse-complement left reads")
    p.add_argument(
        "-revcomp-right", action="store_true", default=True,
        help="reverse-complement right reads [true]",
    )
    p.add_argument("-mem", "--mem", type=float, default=1.0, help="Bloom memory budget (GB) [1]")
    p.add_argument("-length", "--length", type=int, default=200, help="min transcript length [200]")
    p.add_argument("-overlap", "--overlap", type=int, default=10, help="min read overlap [10]")
    p.add_argument("-bound", "--bound", type=int, default=500, help="max gap walk length [500]")
    p.add_argument("-pair", "--pair", type=int, default=10, help="min k-mer pairs [10]")
    p.add_argument("-hash", "--hash", type=int, default=2, help="hash functions per filter [2]")
    p.add_argument("-sh", "--sbf-hash", dest="sbf_hash", type=int, default=0,
                   help="hash functions for the screening Bloom filter [=hash]")
    p.add_argument("-dh", "--dbgbf-hash", dest="dbgbf_hash", type=int, default=0,
                   help="hash functions for the de Bruijn graph Bloom filter [=hash]")
    p.add_argument("-ch", "--cbf-hash", dest="cbf_hash", type=int, default=0,
                   help="hash functions for the k-mer counting filter [=hash]")
    p.add_argument("-ph", "--pkbf-hash", dest="pkbf_hash", type=int, default=0,
                   help="hash functions for the paired-k-mers Bloom filter [=hash]")
    p.add_argument("-sm", "--sbf-mem", dest="sbf_mem", type=float, default=0,
                   help="memory (GB) for the screening Bloom filter [auto]")
    p.add_argument("-dm", "--dbgbf-mem", dest="dbgbf_mem", type=float, default=0,
                   help="memory (GB) for the de Bruijn graph Bloom filter [auto]")
    p.add_argument("-cm", "--cbf-mem", dest="cbf_mem", type=float, default=0,
                   help="memory (GB) for the k-mer counting filter [auto]")
    p.add_argument("-pm", "--pkbf-mem", dest="pkbf_mem", type=float, default=0,
                   help="memory (GB) for the paired-k-mers Bloom filter [auto]")
    p.add_argument("-batch", "--batch", type=int, default=8192, help="stage-2 pair batch size")
    p.add_argument("-paf", "--paf", action="store_true",
                   help="long reads: also write the all-vs-all overlaps as PAF")
    p.add_argument("-pafin", "--pafin", default="",
                   help="long reads: use this external all-vs-all PAF (reads "
                        "named lr.<i>) instead of the internal overlapper")
    p.add_argument("-cnt", "--counter", choices=("mf8", "u16", "int32"), default="mf8",
                   help="counter cell width: mf8 = 1 B/cell MiniFloat (reference "
                        "memory parity), u16/int32 = exact counters [mf8]")
    p.add_argument("-t", "--threads", type=int, default=2, help="(accepted for compat; unused)")
    p.add_argument("-lrpb", "--lrpb", action="store_true", help="long reads are PacBio (preset k=35)")
    p.add_argument("-sensitive", "--sensitive", action="store_true", help="sensitive preset (lower thresholds)")
    p.add_argument("-mergepool", "--mergepool", action="store_true", help="merge pooled per-sample assemblies")
    p.add_argument("-savebf", "--savebf", action="store_true", help="save graph Bloom filters for resume")
    p.add_argument("-f", "--force", action="store_true", help="overwrite (ignore stage stamps)")
    p.add_argument("-maxclip", "--max-edge-clip", dest="max_edge_clip", type=int, default=0,
                   help="max end clip for blunt-end artifact screening (0 = off)")
    p.add_argument("-ts", "--template-switch", dest="template_switch", action="store_true",
                   help="screen template-switch artifacts (stranded mode)")
    p.add_argument("-sharded", "--sharded", choices=("auto", "on", "off"), default="auto",
                   help="multi-chip mesh scale-out: shard filters by hash range "
                        "across all visible devices (auto = when >1 device)")
    p.add_argument("-coordinator", "--coordinator", default="",
                   help="multi-host: coordinator address HOST:PORT (jax.distributed)")
    p.add_argument("-nprocs", "--nprocs", type=int, default=1,
                   help="multi-host: total number of processes")
    p.add_argument("-mhlayout", "--mh-layout", dest="mh_layout",
                   choices=("auto", "local", "sharded"), default="auto",
                   help="multi-host graph layout: local = per-process DP "
                        "builds + one merge collective (graph fits one "
                        "device; near-ideal scaling); sharded = lockstep "
                        "hash-range mesh programs (bigger graphs)")
    p.add_argument("-procid", "--procid", type=int, default=0,
                   help="multi-host: this process's id [0]")
    p.add_argument("-u", "--uracil", action="store_true",
                   help="write transcripts as RNA (U instead of T)")
    p.add_argument("-nk", "--nk", type=int, default=0,
                   help="expected number of distinct k-mers (sizes filters at 1%% FPR)")
    p.add_argument("-hist", "--hist", default="",
                   help="ntCard-format .hist file: sizes filters from its F0")
    p.add_argument("-lrsub", "--lrsub", default="",
                   help="subsample long reads: 'depth,s,size,window' (strobemers) or 'depth,k,size' (k-mers)")
    p.add_argument("-rc", "--revcomp-long", dest="revcomp_long", action="store_true",
                   help="reverse-complement long reads")
    p.add_argument("-lrop", "--lrop", type=float, default=0.0,
                   help="min matching-base proportion in long-read overlaps (identity proxy) [off]")
    p.add_argument("-lrrd", "--lrrd", type=int, default=0,
                   help="min read depth for long-read assembly [auto]")
    p.add_argument("-m", "--minimizer", dest="minimizer", type=int, default=0,
                   help="OLC minimizer size [=k]")
    p.add_argument("-mw", "--minimizer-window", dest="minimizer_window", type=int, default=0,
                   help="OLC minimizer window size [10]")
    p.add_argument("-sop", "--sketch-overlap-proportion", dest="sop", type=float, default=0.0,
                   help="min proportion of sketch overlap minimizers [off]")
    p.add_argument("-son", "--sketch-overlap-number", dest="son", type=int, default=0,
                   help="min number of sketch overlap minimizers [4]")
    p.add_argument("-hpc", "--hpc", action="store_true",
                   help="homopolymer-compressed minimizers in long-read clustering")
    p.add_argument("-mmopt", "--mmopt", default="",
                   help="(accepted for compat; the internal overlapper replaces minimap2)")
    p.add_argument("-c", "--mincov", type=float, default=1,
                   help="minimum k-mer coverage [1]")
    p.add_argument("-e", "--errcorritr", type=int, default=2,
                   help="error-correction iterations per read [2]")
    p.add_argument("-grad", "--maxcovgrad", type=float, default=0.50,
                   help="max k-mer coverage gradient for error correction [0.50]")
    p.add_argument("-indel", "--indel", type=int, default=1,
                   help="max size of indels to be collapsed [1]")
    p.add_argument("-p", "--percent", type=float, default=0.90,
                   help="min percent identity of sequences to be collapsed [0.90]")
    p.add_argument("-lookahead", "--lookahead", type=int, default=3,
                   help="k-mers to look ahead during graph traversal [3]")
    p.add_argument("-tiplength", "--tiplength", type=int, default=-1,
                   help="max number of bases in a tip [auto]")
    p.add_argument("-extend", "--extend", action="store_true",
                   help="extend fragments outward during fragment reconstruction")
    p.add_argument("-rescue", "--rescue", action="store_true",
                   help="retry unconnected read pairs against the fragment graph")
    p.add_argument("-nofc", "--nofc", action="store_true",
                   help="turn off assembly consistency with fragment paired k-mers")
    p.add_argument("-artifact", "--artifact", action="store_true",
                   help="keep potential sequencing artifacts")
    p.add_argument("-chimera", "--chimera", action="store_true",
                   help="keep potential chimeras")
    p.add_argument("-stratum", "--stratum", default="e0",
                   choices=("01", "e0", "e1", "e2", "e3", "e4", "e5"),
                   help="fragments below this stratum extend only if branch-free [e0]")
    p.add_argument("-a", "--polya", type=int, default=0,
                   help="prioritize poly-A transcripts with tails of this min length [0]")
    p.add_argument("-n", "--name", default="rnabloom",
                   help="assembly name (output file prefix) [rnabloom]")
    p.add_argument("-prefix", "--prefix", default="",
                   help="name prefix in FASTA headers for assembled transcripts")
    p.add_argument("-norr", "--norr", action="store_true",
                   help="skip redundancy reduction (no transcripts.nr.fa)")
    p.add_argument("-stage", "--stage", type=int, default=3, choices=(1, 2, 3),
                   help="assembly termination stage: 1=graph, 2=fragments/correction, 3=transcripts [3]")
    p.add_argument("-fpr", "--fpr", type=float, default=0.01,
                   help="max allowable Bloom filter FPR; breach resizes + rebuilds [0.01]")
    p.add_argument("-sample", "--sample", type=int, default=1000,
                   help="sample size for read/fragment length estimation [1000]")
    p.add_argument("-ntcard", "--ntcard", action="store_true",
                   help="estimate distinct k-mers with the internal sketch for exact filter sizing")
    p.add_argument("-debug", "--debug", action="store_true", help="print debugging information")
    p.add_argument("--profile", metavar="DIR", help="capture a JAX profiler trace into DIR")
    p.add_argument("-v", "--version", action="version", version="rnabloom-tpu 0.1.0")
    return p


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first-run compiles of the stage
    kernels take minutes on the TPU toolchain; later runs reuse them."""
    import os

    import jax

    cache_dir = os.environ.get(
        "RNABLOOM_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rnabloom-tpu", "jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only


def _expand_at(paths):
    """`@file` list indirection (RNABloom.java:5786-5792): an input given
    as @list.txt expands to the non-empty lines of list.txt."""
    if paths is None:
        return None
    single = isinstance(paths, str)
    out = []
    for p in [paths] if single else paths:
        if p and p.startswith("@"):
            with open(p[1:]) as f:
                out.extend(ln.strip() for ln in f if ln.strip())
        else:
            out.append(p)
    if single:
        if len(out) != 1:
            raise SystemExit("@list for a single-file option must contain exactly one path")
        return out[0]
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    for attr in ("left", "right", "sef", "ser", "long_reads"):
        setattr(args, attr, _expand_at(getattr(args, attr)))
    # honor an explicit JAX_PLATFORMS request: plugin platforms (e.g. the
    # tunneled axon TPU) register themselves regardless of the env var —
    # without this a user asking for cpu still lands on the plugin, and a
    # multi-process group fighting over one tunneled chip deadlocks in the
    # first collective
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if args.coordinator:
        from rnabloom_tpu.parallel import multihost

        multihost.initialize(args.coordinator, args.nprocs, args.procid)
    _enable_compilation_cache()

    from .assembly import pipeline
    from .utils import kselect

    k_values = kselect.parse_k_spec(str(args.kmer))
    if len(k_values) > 1:
        probe_paths = (
            list(args.long_reads or []) or [p for p in (args.left, args.right) if p]
            or list(args.sef or []) + list(args.ser or [])
        )
        k = kselect.select_k(probe_paths, k_values)
        print(f"selected k={k} from {k_values}")
    else:
        k = k_values[0]
    if args.long_reads and args.lrpb and str(args.kmer) == "25":
        k = 35  # PacBio preset (RNABloom.java:6317-6332)

    params = pipeline.PipelineParams(
        k=k,
        stranded=args.stranded,
        min_qual=args.qual,
        min_avg_qual=args.qual_avg,
        total_mem_bytes=int(args.mem * (1 << 30)),
        num_hash=args.hash,
        batch_size=args.batch,
        min_num_kmer_pairs=args.pair,
        min_overlap=args.overlap,
        bound=args.bound,
        min_transcript_length=args.length,
        max_edge_clip=args.max_edge_clip,
        template_switch_filter=args.template_switch,
        sharded=args.sharded,
        write_uracil=args.uracil,
        expected_num_kmers=args.nk,
        max_fpr=args.fpr,
        name=args.name,
        header_prefix=args.prefix,
        no_reduce=args.norr and not args.mergepool,  # -mergepool overrides -norr
        stop_stage=args.stage,
        sample_size=args.sample,
        min_kmer_cov=args.mincov,
        err_corr_iters=args.errcorritr,
        max_cov_gradient=args.maxcovgrad,
        max_indel=args.indel,
        percent_identity=args.percent,
        lookahead=args.lookahead,
        max_tip_length=args.tiplength,
        extend_fragments=args.extend,
        rescue_unconnected=args.rescue,
        frag_consistency=not args.nofc,
        keep_artifacts=args.artifact,
        keep_chimeras=args.chimera,
        branch_free_stratum=args.stratum,
        polya_min_len=args.polya,
        sbf_hash=args.sbf_hash,
        dbgbf_hash=args.dbgbf_hash,
        cbf_hash=args.cbf_hash,
        pkbf_hash=args.pkbf_hash,
        sbf_mem_bytes=int(args.sbf_mem * (1 << 30)),
        dbgbf_mem_bytes=int(args.dbgbf_mem * (1 << 30)),
        cbf_mem_bytes=int(args.cbf_mem * (1 << 30)),
        pkbf_mem_bytes=int(args.pkbf_mem * (1 << 30)),
        revcomp_long=args.revcomp_long,
        lr_min_depth=args.lrrd,
        lr_overlap_prop=args.lrop,
        minimizer_size=args.minimizer,
        minimizer_window=args.minimizer_window,
        sketch_overlap_prop=args.sop,
        sketch_overlap_num=args.son,
        hpc=args.hpc,
        counter=args.counter,
        write_paf=args.paf,
        paf_in=args.pafin,
    )
    if args.mmopt:
        print("note: -mmopt ignored (internal overlapper replaces minimap2)",
              file=sys.stderr)
    if not args.nk and args.hist:
        params.expected_num_kmers = kselect.NTCardHistogram(args.hist).num_unique
    elif not args.nk and args.ntcard:
        # -ntcard: internal distinct-k-mer sketch in place of the external
        # counter (RNABloom.java:5745-5767 execs `ntcard`)
        probe = (
            list(args.long_reads or [])
            or [p for p in (args.left, args.right) if p]
            or list(args.sef or []) + list(args.ser or [])
        )
        params.expected_num_kmers = kselect.estimate_num_unique_kmers(probe, k)
    params.verbose = True
    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    if args.sensitive:
        # -sensitive meta-flag (RNABloom.java:7033-7038): lower stringency
        params.min_num_kmer_pairs = max(1, args.pair // 2)
        params.min_overlap = max(5, args.overlap // 2)
    if args.pool:
        reports = pipeline.assemble_pool(args.pool, args.outdir, params)
        if args.mergepool:
            pipeline.merge_pool(args.outdir, sorted(reports), params)
        print(json.dumps({
            name: {"pairs": r.num_pairs, "fragments": r.num_fragments,
                   "transcripts": r.num_transcripts}
            for name, r in reports.items()
        }))
        return 0
    if args.coordinator and args.nprocs > 1:
        # multi-host: the stage-1 graph build is data-parallel across the
        # process group (one sharded mesh program, record-modulo input
        # partitioning); later stages run on process 0 against the saved
        # graph.  See parallel/multihost.py.
        import jax
        import numpy as np

        from rnabloom_tpu.assembly import stage1 as s1mod
        from rnabloom_tpu.parallel import multihost, sharded
        from rnabloom_tpu.utils import checkpoint as ckpt

        # PE inputs with the local layout run ALL stages: stage 2 is
        # process-local over record-modulo pair slices against each
        # process's full merged filters; stage 3 runs on process 0 over
        # the merged fragment stores (pipeline.assemble_pe_multihost)
        if (
            args.long_reads and args.stage >= 2
            and args.mh_layout in ("auto", "local")
        ):
            report = pipeline.assemble_long_multihost(
                args.long_reads, args.outdir, params, subsample_spec=args.lrsub
            )
            import jax as _jax

            if _jax.process_index() == 0:
                print(json.dumps({
                    "reads_local": report.num_pairs,
                    "corrected": report.num_fragments,
                    "transcripts": report.num_transcripts,
                    "elapsed_s": round(report.elapsed_s, 2),
                }))
            return 0
        if (
            args.left and args.right and not args.long_reads
            and args.stage >= 2 and args.mh_layout in ("auto", "local")
        ):
            report = pipeline.assemble_pe_multihost(
                args.left, args.right, args.outdir, params,
                revcomp_left=args.revcomp_left,
                revcomp_right=args.revcomp_right,
            )
            import jax as _jax

            if _jax.process_index() == 0:
                print(json.dumps({
                    "pairs": report.num_pairs,
                    "fragments": report.num_fragments,
                    "transcripts": report.num_transcripts,
                    "elapsed_s": round(report.elapsed_s, 2),
                }))
            return 0
        if args.stage != 1:
            print(
                "note: multi-host with this input/layout runs stage 1 "
                "across the group; run stages 2-3 single-host from the "
                "saved graph (-savebf implied)",
                file=sys.stderr,
            )
        paths = (
            list(args.long_reads or [])
            or [p for p in (args.left, args.right) if p]
        )
        lengths = s1mod.sample_read_lengths(paths, params.sample_size)
        d_read, _ = s1mod.read_length_params(lengths, params.k, params.min_num_kmer_pairs)
        cfg = s1mod.default_graph_config(
            params.k, params.stranded, params.total_mem_bytes, params.num_hash,
            d_read, expected_num_kmers=params.expected_num_kmers,
            counter=params.counter,
        )
        s1p = s1mod.Stage1Params(
            k=params.k, stranded=params.stranded, min_qual=params.min_qual,
            max_seq_len=int(max(lengths.max(initial=150), 2 * params.k)),
        )
        mesh = sharded.make_mesh(len(jax.devices()))
        flags = [args.revcomp_left, args.revcomp_right][: len(paths)]
        # layout policy (-mhlayout): "local" = per-process DP builds + one
        # merge collective, ~ideal scaling, graph must fit one device
        # (measured 99% 2-process efficiency on the CPU proxy); "sharded"
        # = lockstep hash-range mesh programs for graphs larger than one
        # device (collectives every round).  auto = local, since -mem
        # graphs are sized to fit.
        if args.mh_layout in ("auto", "local"):
            state, stats = multihost.build_graph_local_merge(
                paths, cfg, s1p, mesh, revcomp_flags=flags, add_read_pairs=True
            )
            host = jax.tree.map(
                lambda x: None if x is None else jax.device_get(x), state,
                is_leaf=lambda x: x is None,
            )
        else:
            state, stats = multihost.build_graph_multihost(
                paths, cfg, s1p, mesh, revcomp_flags=flags, add_read_pairs=True
            )
            from rnabloom_tpu.graph import engine as eng

            host = eng.to_host_state(eng.MeshGraph(mesh=mesh, state=state), cfg)
        if jax.process_index() == 0:
            import os as _os

            _os.makedirs(args.outdir, exist_ok=True)
            ckpt.save_graph(_os.path.join(args.outdir, f"{args.name}.graph"), host, cfg)
            ckpt.touch_stamp(args.outdir, ckpt.STAMP_DBG_DONE)
            print(json.dumps({"stage": 1, "reads_local": stats.num_reads,
                              "fprs": stats.fprs}))
        return 0
    if args.long_reads:
        report = pipeline.assemble_long(
            args.long_reads, args.outdir, params, subsample_spec=args.lrsub,
            force=args.force,
        )
    elif args.left and args.right:
        report = pipeline.assemble_pe(
            args.left, args.right, args.outdir, params,
            revcomp_left=args.revcomp_left, revcomp_right=args.revcomp_right,
            save_graph=args.savebf, force=args.force,
            sef_paths=args.sef or [], ser_paths=args.ser or [],
            ref_paths=args.ref or [],
        )
    elif args.sef or args.ser:
        paths = list(args.sef or []) + list(args.ser or [])
        flags = [False] * len(args.sef or []) + [True] * len(args.ser or [])
        report = pipeline.assemble_se(paths, args.outdir, params, revcomp_flags=flags)
    else:
        print("error: provide -left/-right (PE) or -sef/-ser (SE)", file=sys.stderr)
        return 2
    if args.profile:
        import jax

        jax.profiler.stop_trace()
    print(
        json.dumps(
            {
                "pairs": report.num_pairs,
                "fragments": report.num_fragments,
                "transcripts": report.num_transcripts,
                "short": report.num_short,
                "elapsed_s": round(report.elapsed_s, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
