"""Stage-1 graph-build throughput benchmark on the real chip.

Prints one JSON line: reads/s/chip for the k-mer insert+query inner loop
(hash every k-mer of a batch, insert into dbgbf+cbf+rpkbf) on synthetic
150 bp reads at k=25 — the reference's stage-1 hot loop
(RNABloom.java:760-905).

vs_baseline: the measured Java multi-thread baseline is not runnable in this
environment (no JRE); BASELINE.md records no published numbers.  We report
against the driver-defined target of 10x an estimated 4-thread Java rate
(~4 MH/s of k-mer insertions ≈ 32k reads/s at 126 k-mers/read), i.e.
baseline_reads_per_s = 320_000.
"""

import json
import time

import numpy as np

BASELINE_READS_PER_S = 320_000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg

    read_len = 150
    k = 25
    batch = 16384
    cfg = dbg.GraphConfig(
        k=k,
        stranded=False,
        dbgbf=BloomConfig(size_log2=30, num_hash=2),  # 1 Gi lanes
        cbf=CountingConfig(size_log2=28, num_hash=2, scratch_log2=22, blocked=True),  # 1 GiB
        pkbf=BloomConfig(size_log2=28, num_hash=2),
        read_pair_distance=90,
    )
    state = dbg.make_graph(cfg, with_rpkbf=True)

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, 4, size=(batch, read_len), dtype=np.uint8))
        for _ in range(8)
    ]

    import jax.numpy as jnp

    def nonzero_cells(c):
        return float(jnp.sum((c[:-1] != 0).astype(jnp.float32)))

    # warmup / compile
    state = dbg.build_step(state, cfg, batches[0], add_read_pairs=True)
    nonzero_cells(state.cbf)  # also compiles the readback

    # timed region ends with a device reduction + host readback so that any
    # runtime-side async completion cannot flatter the number
    t0 = time.time()
    iters = 64
    for i in range(iters):
        state = dbg.build_step(state, cfg, batches[i % len(batches)], add_read_pairs=True)
    popcount = nonzero_cells(state.cbf)
    dt = time.time() - t0
    assert popcount > 1e6, "graph build produced an implausibly empty filter"

    reads_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "stage1_reads_per_s_per_chip",
                "value": round(reads_per_s, 1),
                "unit": "reads/s (150bp, k=25, insert dbgbf+cbf+rpkbf)",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
