"""Assembly throughput benchmarks on the real chip.

Prints a cumulative JSON result line after EVERY phase (the last line is
always the most complete result) and mirrors it to ``BENCH_partial.json``,
so a run killed by any outer timeout still reports the phases that DID
finish.  The primary metric is stage-1 reads/s/chip for the k-mer
insert+query inner loop (hash every k-mer of a batch, insert into
dbgbf+cbf+rpkbf) on synthetic 150 bp reads at k=25 — the reference's
stage-1 hot loop (RNABloom.java:760-905) — measured in the SHIPPING
configuration (1-byte mf8 MiniFloat counters, the default of
stage1.default_graph_config).  ``extra`` carries secondary metrics:
end-to-end PE stage-2+3 throughput (pairs/s) and the sharded-step scaling
proxy on a virtual 8-device CPU mesh.

Resilience model (the tunneled TPU backend intermittently wedges: the
client blocks forever in tcp_recvmsg with frozen CPU time):
  * every phase runs in its own subprocess with a hard per-attempt timeout
    and bounded retries;
  * a watchdog polls the child's CPU seconds; a child whose CPU time is
    frozen past a threshold is killed instead of waiting out the timeout.
    CRITICAL calibration: a SERVER-SIDE XLA compile through the tunnel
    also freezes client CPU — for minutes on a degraded tunnel — and the
    compile only enters the persistent cache if allowed to finish, so the
    stage-2/3 phases (big kernel zoo) use a long threshold
    (FROZEN_COMPILE_S) while cache-warm phases use the short one;
  * a global deadline bounds the whole run well under the driver's cap;
  * phases run cheapest-first (stage-1, sharded-CPU, then stage-2/3) so an
    expensive phase can only truncate the report, never blank it;
  * all attempts share the persistent XLA compile cache, so a killed cold
    attempt's finished compiles are not lost — the retry resumes from them.

Correctness gate: before timing, batches are inserted through BOTH the
sort-merge MXU-sweep path (ops/histmerge.py) and the plain scatter engine
for every op the pipelines dispatch ("set" bits, "add" int32, "add_u16",
"add_mf8") and the tables must be bit-identical ON THE REAL CHIP — CI pins
JAX_PLATFORMS=cpu, so a Pallas miscompile could otherwise ship behind
green tests.  (mf8 is gated in its exact-count regime: the sweep's
uniform-row peel legally splits one heavy-cell increment into two
stochastically-rounded steps, which is not bit-identical to one combined
step once counts quantize; int32/u16/set are gated under adversarial
heavy duplicates as well.)

vs_baseline: the reference's multi-thread Java baseline is NOT runnable in
this environment (no JRE) and has never been measured here; BASELINE.md
records no published numbers either.  The denominator is the driver target
of 10x an ESTIMATED 4-thread Java rate (~4 MH/s of k-mer insertions = 32k
reads/s at 126 k-mers/read), i.e. baseline_reads_per_s = 320_000 — the
JSON labels it "estimated" so it cannot be mistaken for a measurement.
"""

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_READS_PER_S = 320_000.0
BASELINE_LABEL = "estimated-320k-reads-per-s (10x est. 4-thread Java; no JRE here to measure)"
HERE = os.path.dirname(os.path.abspath(__file__))
DEADLINE_S = float(os.environ.get("RNB_BENCH_DEADLINE_S", 2700))  # 45 min
# (raised from 35 min in r5: the long-read accuracy + parity phases add
# ~8 min; every phase still emits cumulative partial results, so an outer
# kill at any point loses only the not-yet-run phases)
ATTEMPT_TIMEOUT_S = 400.0
# Frozen-CPU stall detector.  Two distinct stalls look identical from the
# client (blocked in tcp_recvmsg, CPU frozen): a genuine tunnel wedge
# (never returns) and a SERVER-SIDE XLA compile (returns after minutes —
# observed up to ~7 min on a degraded tunnel; the compile only enters the
# persistent cache if allowed to finish, so killing early livelocks).
# Phases whose compiles are known-cached use the short threshold; the
# stage-2/3 phases (big kernel zoo) use the long one.
FROZEN_S = 150.0
FROZEN_COMPILE_S = 450.0
POLL_S = 10.0


_STAGE1_CODE = r"""
import json, time
import numpy as np
from rnabloom_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()
import jax
import jax.numpy as jnp
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg

out = {}


def gate_merge_vs_scatter():
    # Bit-exactness of sweep-merge vs scatter inserts for every op the
    # pipelines dispatch: set (uint8 bits), add (int32), add_u16, add_mf8.
    from rnabloom_tpu.bloom import filters
    from rnabloom_tpu.ops.u64 import U64

    rng = np.random.default_rng(11)
    n = 1 << 16

    def mkhash(heavy: bool):
        lo = rng.integers(0, 1 << 32, size=(n, 2), dtype=np.uint64).astype(np.uint32)
        hi = rng.integers(0, 1 << 32, size=(n, 2), dtype=np.uint64).astype(np.uint32)
        if heavy:
            # adversarial duplicate mass: ~1/4 of lanes collapse onto 7 hot
            # keys, exercising the sweep's uniform-row peel path
            hot = rng.integers(0, n, size=7)
            pick = rng.random(n) < 0.25
            sel = hot[rng.integers(0, 7, size=n)]
            lo[pick] = lo[sel[pick]]
            hi[pick] = hi[sel[pick]]
        return U64(jnp.asarray(lo), jnp.asarray(hi))

    valid = jnp.asarray(rng.random(n) < 0.9)

    def check(dtype, heavy, salt=5):
        h = mkhash(heavy)
        cm = CountingConfig(size_log2=20, num_hash=2, merge=True, dtype=dtype)
        cs = CountingConfig(size_log2=20, num_hash=2, dtype=dtype)
        a = filters.counting_increment_cm(filters.make_counting(cm), cm, h, valid, salt=salt)
        b = filters.counting_increment_cm(filters.make_counting(cs), cs, h, valid, salt=salt)
        a = np.asarray(a[: cm.size]); b = np.asarray(b[: cs.size])
        if not np.array_equal(a, b):
            raise AssertionError(
                f"{dtype} merge-insert counters diverge from scatter on "
                f"{int((a != b).sum())} cells (heavy={heavy})"
            )

    check("int32", heavy=False)
    check("int32", heavy=True)
    check("u16", heavy=True)   # saturating add is split-associative: exact
    check("mf8", heavy=False)  # exact-count regime (see module docstring)

    h = mkhash(heavy=True)
    bm = BloomConfig(size_log2=20, num_hash=2, merge=True)
    bs = BloomConfig(size_log2=20, num_hash=2)
    a = filters.bloom_add(filters.make_bloom(bm), bm, h, valid)
    b = filters.bloom_add(filters.make_bloom(bs), bs, h, valid)
    if not np.array_equal(np.asarray(a[: bm.size]), np.asarray(b[: bs.size])):
        raise AssertionError("merge-insert bloom lanes diverge from scatter")


read_len, k, batch = 150, 25, 16384
merge = jax.default_backend() == "tpu"
if merge:
    gate_merge_vs_scatter()
    out["merge_exactness_gate"] = "passed (set, add, add_u16, add_mf8)"
# the SHIPPING config: 1-byte mf8 counters (stage1.default_graph_config
# default) — the headline number is the number users get
counter = "mf8"
cfg = dbg.GraphConfig(
    k=k,
    stranded=False,
    dbgbf=BloomConfig(size_log2=30, num_hash=2, merge=merge),  # 1 Gi lanes
    cbf=CountingConfig(
        size_log2=28, num_hash=2, scratch_log2=22,
        blocked=False, merge=merge, dtype=counter,
    ),
    pkbf=BloomConfig(size_log2=28, num_hash=2, merge=merge),
    read_pair_distance=90,
)
out["counter_dtype"] = counter
state = dbg.make_graph(cfg, with_rpkbf=True)
rng = np.random.default_rng(0)
batches = [
    jnp.asarray(rng.integers(0, 4, size=(batch, read_len), dtype=np.uint8))
    for _ in range(8)
]


def nonzero_cells(c):
    return float(jnp.sum((c[:-1] != 0).astype(jnp.float32)))


# warmup / compile
state = dbg.build_step(state, cfg, batches[0], add_read_pairs=True, salt=0)
nonzero_cells(state.cbf)  # also compiles the readback

# timed region ends with a device reduction + host readback so that any
# runtime-side async completion cannot flatter the number
t0 = time.time()
iters = 64
for i in range(iters):
    state = dbg.build_step(
        state, cfg, batches[i % len(batches)], add_read_pairs=True, salt=i
    )
popcount = nonzero_cells(state.cbf)
dt = time.time() - t0
assert popcount > 1e6, "graph build produced an implausibly empty filter"
out["reads_per_s"] = batch * iters / dt

# secondary: the exact-int32 configuration (-cnt int32), same geometry —
# the clean A/B of the 1-byte shipping counters vs 4-byte exact cells
del state
cfg_i = dbg.GraphConfig(
    k=k, stranded=False, dbgbf=cfg.dbgbf,
    cbf=CountingConfig(
        size_log2=28, num_hash=2, scratch_log2=22,
        blocked=not merge, merge=merge, dtype="int32",
    ),
    pkbf=cfg.pkbf, read_pair_distance=90,
)
state = dbg.make_graph(cfg_i, with_rpkbf=True)
state = dbg.build_step(state, cfg_i, batches[0], add_read_pairs=True, salt=0)
nonzero_cells(state.cbf)
t0 = time.time()
iters_i = 32
for i in range(iters_i):
    state = dbg.build_step(
        state, cfg_i, batches[i % len(batches)], add_read_pairs=True, salt=i
    )
nonzero_cells(state.cbf)
out["int32_reads_per_s"] = round(batch * iters_i / (time.time() - t0), 1)

# ---- roofline: stage-1's merge-sweep work decomposes into (a) u32 sorts of
# the per-filter cell-index streams and (b) one linear read+write pass over
# each table.  Both primitive rates are measured on THIS chip, so the bound
# is the chip's own speed of light for this algorithm, not a datasheet
# number; pct_of_roofline anchors "fast" (SURVEY.md section 3.2).
del state
n_occ = batch * (read_len - k + 1)
n_pairs = batch * max(read_len - k + 1 - 90, 0)
stream_elems = [2 * n_occ, 2 * n_occ, 2 * n_pairs]  # dbgbf, cbf, rpkbf


def sync(x):
    # block_until_ready does NOT synchronize on the tunneled backend; a
    # device reduction + host readback is the only reliable fence
    return float(jnp.sum(x[::65537].astype(jnp.float32)))


def chained(fn, x0, reps):
    t0 = time.time()
    z = x0
    for _ in range(reps):
        z = fn(z)
    sync(z)
    return time.time() - t0


reps = 16
probe = jnp.asarray(rng.integers(0, 1 << 30, size=(max(stream_elems),), dtype=np.uint32))
sortf = jax.jit(jnp.sort)
sync(sortf(probe))
sort_ns = (chained(sortf, probe, reps) - chained(sortf, probe, 0)) / reps / probe.shape[0] * 1e9
sort_s = sum(stream_elems) * sort_ns * 1e-9

copy_buf = jnp.zeros(1 << 30, jnp.uint8)
copyf = jax.jit(lambda x: x + np.uint8(1))
sync(copyf(copy_buf))
dt_copy = (chained(copyf, copy_buf, reps) - chained(copyf, copy_buf, 0)) / reps
bw = 2 * copy_buf.shape[0] / dt_copy  # read+write bytes/s
tbl_bytes = cfg.dbgbf.size + cfg.cbf.size * cfg.cbf.cell_bytes + cfg.pkbf.size
sweep_s = 2 * tbl_bytes / bw
bound_reads = batch / (sort_s + sweep_s)
out["stage1_roofline"] = {
    "sort_ns_per_elem": round(sort_ns, 3),
    "stream_sort_s": round(sort_s, 5),
    "copy_bw_gb_s": round(bw / 1e9, 1),
    "table_sweep_bytes": 2 * tbl_bytes,
    "table_sweep_s": round(sweep_s, 5),
    "bound_reads_per_s": round(bound_reads, 1),
    "pct_of_roofline": round(100.0 * out["reads_per_s"] / bound_reads, 1),
}
print(json.dumps(out))
"""


_STAGE23_COMMON = r"""
import gzip, json, os, shutil, time
import numpy as np
from rnabloom_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()
from rnabloom_tpu.assembly import pipeline as pl
from rnabloom_tpu.utils import seq as sequtils

# graduated sizing: the tunneled backend's wedge probability grows with
# the dispatch count, so when the full 8192-pair set cannot complete the
# driver retries a smaller set (RNB_S23_PAIRS) — pairs/s is size-valid
# and a labeled smaller number beats a blank
PAIRS = int(os.environ.get("RNB_S23_PAIRS", "8192"))
TMP = f"/tmp/rb_bench_s23_{PAIRS}"
DATA_PARAMS = {"transcripts": 8, "tlen": 800, "per": PAIRS // 8, "rlen": 150, "v": 2}
MARKER = f"{TMP}/DATA_OK.json"

def data_ok():
    try:
        with open(MARKER) as f:
            return json.load(f) == DATA_PARAMS
    except Exception:
        return False

def make_data():
    # atomic: write into the dir, marker (encoding generator params) last;
    # a partial kill leaves no marker and the next attempt regenerates
    shutil.rmtree(TMP, ignore_errors=True)
    rng = np.random.default_rng(3)
    os.makedirs(TMP, exist_ok=True)
    P = DATA_PARAMS
    transcripts = ["".join(rng.choice(list("ACGT"), size=P["tlen"])) for _ in range(P["transcripts"])]
    q = "I" * P["rlen"]
    n = 0
    with gzip.open(f"{TMP}/b_1.fq.gz", "wt") as fl, gzip.open(
        f"{TMP}/b_2.fq.gz", "wt"
    ) as fr:
        for t in transcripts:
            for _ in range(P["per"]):
                s = rng.integers(0, len(t) - 2 * P["rlen"] + 1)
                frag = t[s : s + 2 * P["rlen"]]
                fl.write(f"@r{n}/1\n{frag[:P['rlen']]}\n+\n{q}\n")
                fr.write(f"@r{n}/2\n{sequtils.revcomp(frag[-P['rlen']:])}\n+\n{q}\n")
                n += 1
    with open(MARKER, "w") as f:
        json.dump(DATA_PARAMS, f)

def run(out):
    shutil.rmtree(out, ignore_errors=True)
    params = pl.PipelineParams(total_mem_bytes=1 << 26, sample_size=500, no_reduce=True)
    return pl.assemble_pe(f"{TMP}/b_1.fq.gz", f"{TMP}/b_2.fq.gz", out, params)
"""

_STAGE23_TIMED_CODE = _STAGE23_COMMON + r"""
if not data_ok():
    make_data()
t0 = time.time()
report = run(f"{TMP}/out")
dt = time.time() - t0
assert report.num_transcripts > 0
# the metric times stages 2+3 (stage 1 has its own headline number);
# e2e wall clock rides along for context
s23 = (report.stage2_s + report.stage3_s) or dt
extra = {
    "stage23_pairs_per_s": round(report.num_pairs / s23, 1),
    "stage23_s": round(s23, 1),
    "e2e_s": round(dt, 1),
}
n_disp = 0
for k in ("stage2_dispatches", "stage3_dispatches", "stage2_batches"):
    v = getattr(report, k, None)
    if v:
        extra[k] = v
        if k.endswith("dispatches"):
            n_disp += sum(v.values())

# tunnel-RTT decomposition (VERDICT r4 item 4): every device dispatch that
# the host reads back pays one tunnel round trip; pinging a trivial jitted
# program measures that floor on THIS connection, and subtracting
# dispatches * RTT from the stage wall clock bounds the device+host-python
# share — the number that predicts local (untunneled) hardware
import jax, jax.numpy as jnp
ping = jax.jit(lambda x: x + 1)
z = jnp.zeros((), jnp.int32)
float(ping(z))  # compile
rtts = []
for _ in range(10):
    t1 = time.time()
    float(ping(z))
    rtts.append(time.time() - t1)
rtt = sorted(rtts)[len(rtts) // 2]
extra["tunnel_rtt_ms"] = round(rtt * 1e3, 1)
extra["stage23_rtt_overhead_s"] = round(n_disp * rtt, 1)
extra["stage23_device_plus_host_s"] = round(max(s23 - n_disp * rtt, 0.0), 1)
extra["stage23_pairs_per_s_untunneled_est"] = round(
    report.num_pairs / max(s23 - n_disp * rtt, 1e-6), 1
)
print(json.dumps(extra))
"""


_SHARDED_CODE = r"""
import json, os, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg, traverse
from rnabloom_tpu.parallel import sharded

cfg = dbg.GraphConfig(
    k=25, stranded=False, dbgbf=BloomConfig(24, 2),
    cbf=CountingConfig(24, 2, scratch_log2=20, blocked=True),
    pkbf=BloomConfig(24, 2), read_pair_distance=90,
)
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(4096, 150), dtype=np.uint8))

mesh = sharded.make_mesh(8)
step = sharded.sharded_build_step(mesh, cfg, add_read_pairs=True)
st = sharded.make_sharded_graph(cfg, mesh, with_rpkbf=True)
st = step(st, codes)  # compile
jax.block_until_ready(st.cbf)
t0 = time.time()
for i in range(8):
    st = step(st, codes, i)
jax.block_until_ready(st.cbf)
dt8 = time.time() - t0

s1 = dbg.make_graph(cfg, with_rpkbf=True)
s1 = dbg.build_step(s1, cfg, codes, add_read_pairs=True)
jax.block_until_ready(s1.cbf)
t0 = time.time()
for i in range(8):
    s1 = dbg.build_step(s1, cfg, codes, add_read_pairs=True, salt=i)
jax.block_until_ready(s1.cbf)
dt1 = time.time() - t0

# walk engine: 512 greedy walks, bound 200, over the sharded vs single graph
# (VERDICT r2 item 9: is the sharded walk engine viable for stage 3?).
# Walks traverse a graph built from READS OF ONE TRANSCRIPT with seeds cut
# from the same transcript, so every lane really walks ~200 hops — random
# seeds (r1-r4) died on lookup and measured only fixed program overhead.
tseq = rng.integers(0, 4, size=2000, dtype=np.uint8)
wreads = jnp.asarray(
    np.stack([tseq[s : s + 150] for s in rng.integers(0, 1850, size=4096)])
)
stw = sharded.make_sharded_graph(cfg, mesh, with_rpkbf=True)
stw = step(stw, wreads)
jax.block_until_ready(stw.cbf)
s1w = dbg.make_graph(cfg, with_rpkbf=True)
s1w = dbg.build_step(s1w, cfg, wreads, add_read_pairs=True)
wcfg = traverse.WalkConfig(max_len=256, lookahead=3)
seeds = np.stack([tseq[s : s + 25] for s in rng.integers(0, 1975, size=512)])
ws = traverse.make_walks(cfg, wcfg, seeds)
run8 = sharded.sharded_extend_walks(mesh, cfg, wcfg, "greedy", True, False)
out = run8(ws, stw, 1.0, 200); jax.block_until_ready(out.pos)
t0 = time.time()
out = run8(traverse.make_walks(cfg, wcfg, seeds), stw, 1.0, 200)
jax.block_until_ready(out.pos)
wdt8 = time.time() - t0
ws1 = traverse.extend_walks(traverse.make_walks(cfg, wcfg, seeds), s1w, cfg, wcfg, 1.0, 200)
jax.block_until_ready(ws1.pos)
t0 = time.time()
ws1 = traverse.extend_walks(traverse.make_walks(cfg, wcfg, seeds), s1w, cfg, wcfg, 1.0, 200)
jax.block_until_ready(ws1.pos)
wdt1 = time.time() - t0
assert float(jnp.mean(ws1.pos)) > 100, "bench walks died early; seeds invalid"

# group-replicated engine (filters sharded R ways, replicated N/R ways):
# the middle point for graphs too large to replicate — per-device cells
# = size/R, walk collectives span only the R-device group
gout = {}
for r_grp in (2, 4):
    gmesh = sharded.make_group_mesh(r_grp, 8)
    gst = sharded.group_state(gmesh, stw, cfg)
    grun = sharded.grouped_extend_walks(gmesh, cfg, wcfg, "greedy", True, False)
    og = grun(traverse.make_walks(cfg, wcfg, seeds), gst, 1.0, 200)
    jax.block_until_ready(og.pos)
    t0 = time.time()
    og = grun(traverse.make_walks(cfg, wcfg, seeds), gst, 1.0, 200)
    jax.block_until_ready(og.pos)
    gout[f"grouped{r_grp}_cpu_walk_lanes_per_s"] = round(512 / (time.time() - t0), 1)

# replicated walk engine (engine.extend_walks default on a mesh): one
# all-gather of the filters, then collective-free DP supersteps
from rnabloom_tpu.graph import engine as geng
mg = geng.MeshGraph(mesh=mesh, state=stw)
wsr = geng.extend_walks(traverse.make_walks(cfg, wcfg, seeds), mg, cfg, wcfg, 1.0, 200)
jax.block_until_ready(wsr.pos)
t0 = time.time()
wsr = geng.extend_walks(traverse.make_walks(cfg, wcfg, seeds), mg, cfg, wcfg, 1.0, 200)
jax.block_until_ready(wsr.pos)
wdtr = time.time() - t0
# trace-time collective accounting (VERDICT r2 item 9): collectives per
# routing round / walk superstep and per-shard payload bytes — the numbers
# that decide sharded vs replicated graphs for multi-chip stage 3
# fresh closures: eval_shape on the already-compiled step would hit the
# jit trace cache and never re-run the accounting hooks
with sharded.comm_accounting() as comm_build:
    jax.eval_shape(sharded.sharded_build_step(mesh, cfg, add_read_pairs=True), st, codes)
with sharded.comm_accounting() as comm_walk:
    # 256 lanes (not 512): a distinct aval forces a retrace past any
    # module-level jit cache inside the walk factory
    jax.eval_shape(
        sharded.sharded_extend_walks(mesh, cfg, wcfg, "greedy", True, False),
        traverse.make_walks(cfg, wcfg, seeds[:256]), st, 1.0, 200,
    )
print(json.dumps({
    "sharded8_cpu_reads_per_s": round(4096 * 8 / dt8, 1),
    "single_cpu_reads_per_s": round(4096 * 8 / dt1, 1),
    "sharded8_cpu_walk_lanes_per_s": round(512 / wdt8, 1),
    "replicated8_cpu_walk_lanes_per_s": round(512 / wdtr, 1),
    "single_cpu_walk_lanes_per_s": round(512 / wdt1, 1),
    **gout,
    "build_step_comm": comm_build,
    "walk_superstep_comm": comm_walk,
}))
"""


_MULTIHOST_CODE = r"""
import json, os, socket, subprocess, sys, tempfile
import numpy as np

# 2-process CPU-proxy scaling efficiency for the multi-host stage-1 build
# (BASELINE.md target: >=80% at 2 hosts).  The same lockstep worker runs
# with 1 process then 2 gloo processes over one plain FASTQ (byte-range
# partitioned); efficiency = T1 / (2 * T2) of the second (compile-warm)
# run of each.  No multi-host hardware exists here, so CPU gloo is the
# proxy; the mesh programs are identical on TPU pods.

HERE = os.getcwd()  # phase subprocesses run with cwd = repo root
TMP = tempfile.mkdtemp(prefix="rb_mh_")
fq = os.path.join(TMP, "mh.fq")
rng = np.random.default_rng(5)
base = ["".join(rng.choice(list("ACGT"), size=150)) for _ in range(4000)]
with open(fq, "w") as f:
    for i in range(60000):  # big enough that per-run fixed costs amortize
        f.write(f"@r{i}\n{base[i % 4000]}\n+\n{'I' * 150}\n")


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_group(n, mode="sharded"):
    out = os.path.join(TMP, f"out{n}{mode}.npz")
    port = free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        # batch 8192 = the shipping pipeline default (PipelineParams
        # .batch_size); collectives amortize per round, so measuring at
        # quarter-size batches understated 2-process efficiency
        RNB_MH_LOG2="20", RNB_MH_BATCH="8192", RNB_MH_MODE=mode,
    )
    # pin each process to its own core so every simulated "host" has
    # constant resources — single-process XLA-CPU already uses all cores,
    # which would otherwise hide the parallelism being measured
    ncores = os.cpu_count() or 1
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(pid % ncores),
             sys.executable, "-m", "rnabloom_tpu.parallel.multihost",
             str(pid), str(n), f"127.0.0.1:{port}", out, fq],
            cwd=HERE, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(n)
    ]
    logs = [p.communicate(timeout=500)[0] for p in procs]
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(f"worker rc={p.returncode}: {log[-500:]}")
    d = np.load(out)
    cpu = sum(
        float(np.load(f"{out}.cpu{pid}.npy")) for pid in range(n)
    )
    return float(d["elapsed_s"]), cpu


# two layouts (parallel/multihost.py): "local" = per-process DP builds +
# one merge collective (graphs that fit one device; the shipping default
# for this proxy scale), "sharded" = lockstep hash-range mesh programs
# (graphs larger than one device; pays collectives every round)
out = {}
for mode in ("local", "sharded"):
    run_group(1, mode)  # compile-warm the persistent cache
    # best-of-2 timed runs: the 2-core proxy is noisy under background load
    t1, c1 = min(run_group(1, mode), run_group(1, mode))
    run_group(2, mode)
    t2, c2 = min(run_group(2, mode), run_group(2, mode))
    out[f"multihost_{mode}_t1_s"] = round(t1, 2)
    out[f"multihost_{mode}_t2_s"] = round(t2, 2)
    # wall-clock efficiency: every core is a simulated host, so the OS and
    # this harness steal only from the n=2 run — a floor, not the truth
    out[f"multihost_{mode}_efficiency_2proc"] = round(t1 / (2 * t2), 3)
    # CPU-time efficiency: total CPU seconds to do the same work — the
    # scheduler-independent algorithmic scaling number
    out[f"multihost_{mode}_cpu_efficiency_2proc"] = round(c1 / c2, 3)
out["multihost_efficiency_2proc"] = out["multihost_local_efficiency_2proc"]
print(json.dumps(out))
"""


_LONGREAD_ACC_CODE = r"""
import gzip, json, os, tempfile, time
import numpy as np
from rnabloom_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()
from rnabloom_tpu.assembly import pipeline as pl
from rnabloom_tpu.io import fastx
from rnabloom_tpu.utils import lrsim

# tracked long-read assembly quality (VERDICT r4 item 2): ONT-like 7%-error
# cDNA reads from a seeded 20-transcript truth, assembled by the internal
# overlap/layout/realign engine (the minimap2/racon replacement), scored by
# canonical-31-mer recall / support
rng = np.random.default_rng(1234)
truth = lrsim.simulate_transcriptome(rng, 20, (500, 2000))
reads = lrsim.simulate_reads(rng, truth, coverage=20, err=0.07)
TMP = tempfile.mkdtemp(prefix="rb_lracc_")
path = os.path.join(TMP, "lr.fa.gz")
with gzip.open(path, "wt") as f:
    for i, r in enumerate(reads):
        f.write(f">r{i}\n{r}\n")
params = pl.PipelineParams(total_mem_bytes=1 << 26, min_transcript_length=200)
t0 = time.time()
report = pl.assemble_long([path], os.path.join(TMP, "out"), params)
asm = [s for _, s in fastx.read_fasta(os.path.join(TMP, "out", "rnabloom.transcripts.fa"))]
out = lrsim.evaluate(asm, truth)
out["lr_n_reads"] = len(reads)
out["lr_e2e_s"] = round(time.time() - t0, 1)
print(json.dumps(out))
"""


_PARITY_CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"  # tiny fixtures: tunnel RTTs would dominate
import json
from rnabloom_tpu.oracle import divergence
out = divergence.measure_all(seed=0, k=17, with_mf8=True)
print(json.dumps({"parity_divergence": out}))
"""


def _cpu_seconds(pid: int):
    """utime+stime of one process in seconds, or None if unreadable."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            rest = f.read().rsplit(") ", 1)[1].split()
        return (int(rest[11]) + int(rest[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return None


def _run_attempt(code: str, timeout_s: float, frozen_s: float) -> dict:
    """One subprocess attempt with a frozen-CPU wedge watchdog.

    Returns {"ok": parsed} or {"err": reason}.  Kills ONLY the exact
    process group it started (never by pattern)."""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=HERE, start_new_session=True,
    )
    start = time.time()
    last_cpu, last_cpu_change = -1.0, time.time()
    reason = None
    while True:
        try:
            proc.wait(timeout=POLL_S)
            break
        except subprocess.TimeoutExpired:
            pass
        now = time.time()
        cpu = _cpu_seconds(proc.pid)
        if cpu is not None and cpu > last_cpu + 0.05:
            last_cpu, last_cpu_change = cpu, now
        if now - start > timeout_s:
            reason = f"timeout after {timeout_s:.0f}s"
        elif now - last_cpu_change > frozen_s:
            reason = (
                f"stalled: CPU frozen at {max(last_cpu, 0):.0f}s for "
                f"{now - last_cpu_change:.0f}s (tunnel wedge, or a "
                f"server-side compile longer than the threshold)"
            )
        if reason:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            return {"err": reason}
    out, err = proc.communicate()
    if proc.returncode != 0:
        return {"err": f"rc={proc.returncode}: " + (err or out)[-400:]}
    try:
        return {"ok": json.loads(out.strip().split("\n")[-1])}
    except (json.JSONDecodeError, IndexError):
        return {"err": f"unparseable output: {out[-300:]!r}"}


class Deadline:
    def __init__(self, total_s: float):
        self.t_end = time.time() + total_s

    def remaining(self) -> float:
        return self.t_end - time.time()


def _run_phase(
    name: str,
    code: str,
    deadline: Deadline,
    attempts: int,
    attempt_s: float = ATTEMPT_TIMEOUT_S,
    frozen_s: float = FROZEN_S,
) -> dict:
    """Bounded attempts under the global deadline; wedges retried early."""
    last_err = "no attempt made (deadline exhausted)"
    for i in range(attempts):
        budget = min(attempt_s, deadline.remaining() - 30)
        if budget < 60:
            break
        res = _run_attempt(code, budget, frozen_s)
        if "ok" in res:
            return res["ok"]
        last_err = f"attempt {i + 1}: {res['err']}"
    return {"error": f"{name}: {last_err}"}


def _emit(result: dict, final: bool) -> None:
    result = dict(result)
    if not final:
        result["partial"] = True
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(os.path.join(HERE, "BENCH_partial.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def main() -> None:
    deadline = Deadline(DEADLINE_S)
    extra = {}
    result = {
        "metric": "stage1_reads_per_s_per_chip",
        "value": 0.0,
        "unit": "reads/s (150bp, k=25, insert dbgbf+cbf(mf8)+rpkbf)",
        "vs_baseline": 0.0,
        "baseline": BASELINE_LABEL,
        "extra": extra,
    }

    def set_stage1(s1: dict) -> None:
        reads_per_s = float(s1.get("reads_per_s", 0.0))
        result["value"] = round(reads_per_s, 1)
        result["vs_baseline"] = round(reads_per_s / BASELINE_READS_PER_S, 3)
        for k in ("merge_exactness_gate", "counter_dtype", "int32_reads_per_s"):
            if k in s1:
                extra[k] = s1[k]
        if "error" in s1:
            extra["stage1_error"] = s1["error"]

    # cheapest-first: the headline phase, then the CPU-only phase (immune
    # to tunnel wedges), then the long stage-2/3 phases
    set_stage1(_run_phase("stage1", _STAGE1_CODE, deadline, attempts=3))
    _emit(result, final=False)

    sh = _run_phase("sharded_cpu", _SHARDED_CODE, deadline, attempts=2)
    extra.update(sh if "error" not in sh else {"sharded_error": sh["error"]})
    _emit(result, final=False)

    mh = _run_phase("multihost_cpu", _MULTIHOST_CODE, deadline, attempts=2)
    extra.update(mh if "error" not in mh else {"multihost_error": mh["error"]})
    _emit(result, final=False)

    # long-read assembly accuracy vs a known truth (internal OLC quality)
    lr = _run_phase(
        "longread_accuracy", _LONGREAD_ACC_CODE, deadline, attempts=2,
        attempt_s=600.0, frozen_s=FROZEN_COMPILE_S,
    )
    extra.update(lr if "error" not in lr else {"lr_accuracy_error": lr["error"]})
    _emit(result, final=False)

    # reference-semantics oracle: measured per-decision divergence rates
    # (rnabloom_tpu/oracle/divergence.py) — CPU-only, immune to wedges
    pd = _run_phase("parity_divergence", _PARITY_CODE, deadline, attempts=2)
    extra.update(
        pd if "error" not in pd else {"parity_divergence": {"error": pd["error"]}}
    )
    # transcript-set parity vs the reference JAR needs fixtures no machine
    # here can generate (no JRE); keep the gap visible per run
    fix_dir = os.path.join(HERE, "tests", "golden", "reference_fixtures")
    has_fixtures = any(
        f.endswith((".fa", ".fa.gz", ".fasta")) for f in (
            os.listdir(fix_dir) if os.path.isdir(fix_dir) else []
        )
    )
    extra["reference_parity"] = (
        "fixtures present (tests/test_reference_parity.py live)"
        if has_fixtures
        else "no fixtures: no JRE in this environment; "
        "tools/make_reference_fixture.sh generates them on any Java machine"
    )
    _emit(result, final=False)

    # graduated sizes, SMALLEST FIRST: the pipeline's kernel shapes are
    # dataset-size independent (batches pad to params.batch_size), so the
    # small run both banks a pairs/s number early and warms every compile
    # the full run needs; the full 8192-pair number then overrides it when
    # the tunnel lets it finish.  Wedge probability compounds with the
    # dispatch count, so a labeled smaller number beats a blank.
    # 32768 pairs = 4 batches at the shipping batch size (8192) — the
    # multi-batch stage-2 number VERDICT r4 item 4 asks for; smaller sets
    # bank a result early in case the tunnel wedges the big one
    for pairs, attempts in ((2048, 2), (8192, 2), (32768, 1)):
        os.environ["RNB_S23_PAIRS"] = str(pairs)
        s23 = _run_phase(
            f"stage23_timed_{pairs}", _STAGE23_TIMED_CODE, deadline,
            attempts=attempts, attempt_s=600.0, frozen_s=FROZEN_COMPILE_S,
        )
        if "error" not in s23:
            extra.update(s23)
            extra["stage23_pairs"] = pairs
        elif "stage23_pairs_per_s" not in extra:
            extra["stage23_pairs_per_s"] = s23["error"]
        _emit(result, final=False)
    os.environ.pop("RNB_S23_PAIRS", None)
    _emit(result, final=True)


if __name__ == "__main__":
    main()
