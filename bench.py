"""Assembly throughput benchmarks on the real chip.

Prints ONE JSON line.  The primary metric is stage-1 reads/s/chip for the
k-mer insert+query inner loop (hash every k-mer of a batch, insert into
dbgbf+cbf+rpkbf) on synthetic 150 bp reads at k=25 — the reference's
stage-1 hot loop (RNABloom.java:760-905).  ``extra`` carries secondary
metrics: end-to-end PE stage-2+3 throughput (pairs/s, fragment connect +
EC + extendPE + screening on the chip) and the sharded-step scaling proxy
measured on a virtual 8-device CPU mesh (the real multi-chip path; no
multi-chip hardware is attached here).

Every phase runs in its own SUBPROCESS with a hard timeout and one retry:
the tunneled TPU backend occasionally wedges on a lost reply (the client
blocks forever on a TCP recv) and a hung phase must degrade to an error
field, not hang the driver's bench run.

Correctness gate: before timing, one batch is inserted through BOTH the
sort-merge MXU-sweep path (ops/histmerge.py) and the plain scatter engine
and the tables must be bit-identical ON THE REAL CHIP — CI pins
JAX_PLATFORMS=cpu, so a Pallas miscompile could otherwise ship behind
green tests.

vs_baseline: the reference's multi-thread Java baseline is NOT runnable in
this environment (no JRE) and has never been measured here; BASELINE.md
records no published numbers either.  The denominator is the driver target
of 10x an ESTIMATED 4-thread Java rate (~4 MH/s of k-mer insertions = 32k
reads/s at 126 k-mers/read), i.e. baseline_reads_per_s = 320_000 — the
JSON labels it "estimated" so it cannot be mistaken for a measurement.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_READS_PER_S = 320_000.0
BASELINE_LABEL = "estimated-320k-reads-per-s (10x est. 4-thread Java; no JRE here to measure)"
HERE = os.path.dirname(os.path.abspath(__file__))


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
    from rnabloom_tpu.bloom import filters
    from rnabloom_tpu.ops.u64 import U64

    rng = np.random.default_rng(11)
    n = 1 << 16
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(n, 2), dtype=np.uint64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=(n, 2), dtype=np.uint64).astype(np.uint32))
    h = U64(lo, hi)
    valid = jnp.asarray(rng.random(n) < 0.9)

    ccfg_m = CountingConfig(size_log2=20, num_hash=2, merge=True)
    ccfg_s = CountingConfig(size_log2=20, num_hash=2)
    cm = filters.counting_increment_cm(filters.make_counting(ccfg_m), ccfg_m, h, valid)
    cs = filters.counting_increment_cm(filters.make_counting(ccfg_s), ccfg_s, h, valid)
    a = np.asarray(cm[: ccfg_m.size])
    b = np.asarray(cs[: ccfg_s.size])
    if not np.array_equal(a, b):
        raise AssertionError(
            f"merge-insert counters diverge from scatter on {int((a != b).sum())} cells"
        )
    bcfg_m = BloomConfig(size_log2=20, num_hash=2, merge=True)
    bcfg_s = BloomConfig(size_log2=20, num_hash=2)
    bm = filters.bloom_add(filters.make_bloom(bcfg_m), bcfg_m, h, valid)
    bs = filters.bloom_add(filters.make_bloom(bcfg_s), bcfg_s, h, valid)
    if not np.array_equal(np.asarray(bm[: bcfg_m.size]), np.asarray(bs[: bcfg_s.size])):
        raise AssertionError("merge-insert bloom lanes diverge from scatter")


read_len, k, batch = 150, 25, 16384
merge = jax.default_backend() == "tpu"
if merge:
    gate_merge_vs_scatter()
    out["merge_exactness_gate"] = "passed"
cfg = dbg.GraphConfig(
    k=k,
    stranded=False,
    dbgbf=BloomConfig(size_log2=30, num_hash=2),  # 1 Gi lanes
    cbf=CountingConfig(
        size_log2=28, num_hash=2, scratch_log2=22, blocked=not merge, merge=merge
    ),
    pkbf=BloomConfig(size_log2=28, num_hash=2, merge=merge),
    read_pair_distance=90,
)
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
print(json.dumps(out))
"""


_STAGE23_COMMON = r"""
import gzip, json, os, shutil, time
import numpy as np
from rnabloom_tpu.cli import _enable_compilation_cache
_enable_compilation_cache()
from rnabloom_tpu.assembly import pipeline as pl
from rnabloom_tpu.utils import seq as sequtils

TMP = "/tmp/rb_bench_s23"

def make_data():
    rng = np.random.default_rng(3)
    os.makedirs(TMP, exist_ok=True)
    transcripts = ["".join(rng.choice(list("ACGT"), size=800)) for _ in range(8)]
    q = "I" * 150
    n = 0
    with gzip.open(f"{TMP}/b_1.fq.gz", "wt") as fl, gzip.open(
        f"{TMP}/b_2.fq.gz", "wt"
    ) as fr:
        for t in transcripts:
            for _ in range(1024):
                s = rng.integers(0, len(t) - 300 + 1)
                frag = t[s : s + 300]
                fl.write(f"@r{n}/1\n{frag[:150]}\n+\n{q}\n")
                fr.write(f"@r{n}/2\n{sequtils.revcomp(frag[-150:])}\n+\n{q}\n")
                n += 1

def run(out):
    shutil.rmtree(out, ignore_errors=True)
    params = pl.PipelineParams(total_mem_bytes=1 << 26, sample_size=500, no_reduce=True)
    return pl.assemble_pe(f"{TMP}/b_1.fq.gz", f"{TMP}/b_2.fq.gz", out, params)
"""

# warm and timed passes run in SEPARATE subprocesses over a persistent
# dataset: the tunneled backend wedges most often during stage-3's long
# dispatch streams, and splitting the passes makes each retry short and
# independent (the persistent XLA cache carries the warm pass's compiles)
_STAGE23_WARM_CODE = _STAGE23_COMMON + r"""
shutil.rmtree(TMP, ignore_errors=True)
make_data()
t0 = time.time()
report = run(f"{TMP}/warm")
print(json.dumps({"warm_s": round(time.time() - t0, 1)}))
"""

_STAGE23_TIMED_CODE = _STAGE23_COMMON + r"""
if not os.path.exists(f"{TMP}/b_1.fq.gz"):
    make_data()
t0 = time.time()
report = run(f"{TMP}/out")
dt = time.time() - t0
assert report.num_transcripts > 0
print(json.dumps({"stage23_pairs_per_s": round(report.num_pairs / dt, 1)}))
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
# (VERDICT r2 item 9: is the sharded walk engine viable for stage 3?)
wcfg = traverse.WalkConfig(max_len=256, lookahead=3)
seeds = np.asarray(rng.integers(0, 4, size=(512, 25), dtype=np.uint8))
ws = traverse.make_walks(cfg, wcfg, seeds)
run8 = sharded.sharded_extend_walks(mesh, cfg, wcfg, "greedy", True, False)
out = run8(ws, st, 1.0, 200); jax.block_until_ready(out.pos)
t0 = time.time()
out = run8(traverse.make_walks(cfg, wcfg, seeds), st, 1.0, 200)
jax.block_until_ready(out.pos)
wdt8 = time.time() - t0
ws1 = traverse.extend_walks(traverse.make_walks(cfg, wcfg, seeds), s1, cfg, wcfg, 1.0, 200)
jax.block_until_ready(ws1.pos)
t0 = time.time()
ws1 = traverse.extend_walks(traverse.make_walks(cfg, wcfg, seeds), s1, cfg, wcfg, 1.0, 200)
jax.block_until_ready(ws1.pos)
wdt1 = time.time() - t0

# replicated walk engine (engine.extend_walks default on a mesh): one
# all-gather of the filters, then collective-free DP supersteps
from rnabloom_tpu.graph import engine as geng
mg = geng.MeshGraph(mesh=mesh, state=st)
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
    "build_step_comm": comm_build,
    "walk_superstep_comm": comm_walk,
}))
"""


def _run_phase(name: str, code: str, timeout_s: int, retries: int = 1) -> dict:
    """Run one bench phase in a subprocess; on timeout/crash, retry once."""
    last_err = ""
    for attempt in range(retries + 1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=timeout_s, cwd=HERE,
            )
        except subprocess.TimeoutExpired:
            last_err = f"timeout after {timeout_s}s (attempt {attempt + 1})"
            continue
        if out.returncode == 0:
            try:
                return json.loads(out.stdout.strip().split("\n")[-1])
            except (json.JSONDecodeError, IndexError):
                last_err = f"unparseable output: {out.stdout[-300:]!r}"
                continue
        last_err = (out.stderr or out.stdout)[-400:]
    return {"error": f"{name}: {last_err}"}


def main() -> None:
    extra = {}
    s1 = _run_phase("stage1", _STAGE1_CODE, timeout_s=1500, retries=1)
    reads_per_s = float(s1.get("reads_per_s", 0.0))
    if "merge_exactness_gate" in s1:
        extra["merge_exactness_gate"] = s1["merge_exactness_gate"]
    if "error" in s1:
        extra["stage1_error"] = s1["error"]

    # bounded attempts instead of one long one: a tunnel wedge (client
    # blocked on TCP recv) costs at most one short attempt, and because
    # every attempt shares the persistent XLA compile cache, a timed-out
    # cold attempt's compiles are NOT lost — the retry resumes from them
    s23w = _run_phase("stage23_warm", _STAGE23_WARM_CODE, timeout_s=1400, retries=2)
    if "warm_s" in s23w:
        extra["stage23_warm_s"] = s23w["warm_s"]
    s23 = _run_phase("stage23_timed", _STAGE23_TIMED_CODE, timeout_s=900, retries=2)
    extra["stage23_pairs_per_s"] = s23.get(
        "stage23_pairs_per_s", s23.get("error", "missing")
    )

    sh = _run_phase("sharded_cpu", _SHARDED_CODE, timeout_s=1200, retries=1)
    extra.update({k: v for k, v in sh.items()})

    print(
        json.dumps(
            {
                "metric": "stage1_reads_per_s_per_chip",
                "value": round(reads_per_s, 1),
                "unit": "reads/s (150bp, k=25, insert dbgbf+cbf+rpkbf)",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
                "baseline": BASELINE_LABEL,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
