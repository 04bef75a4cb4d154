"""Graph checkpointing and stage stamps (restart-based recovery).

Maps the reference's resume protocol: the graph is persisted as raw filter
arrays + a text descriptor (BloomFilterDeBruijnGraph.save :297-360, one
.desc + one raw file per filter), stages leave stamp files
(STARTED, DBG.DONE, FRAGMENTS.DONE, TRANSCRIPTS.DONE, ... —
RNABloom.java:5818-5825), and a rerun skips completed stages unless forced
(:7060-7080).  The learned fragment pair distance is persisted by rewriting
the descriptor after stage 2 (:4665-4677).

Arrays are stored as .npy (host copies of the device lanes); the descriptor
is JSON carrying the full GraphConfig.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bloom.filters import BloomConfig, CountingConfig
from ..graph import dbg

STAMP_STARTED = "STARTED"
STAMP_DBG_DONE = "DBG.DONE"
STAMP_FRAGMENTS_DONE = "FRAGMENTS.DONE"
STAMP_TRANSCRIPTS_DONE = "TRANSCRIPTS.DONE"
STAMP_TRANSCRIPTS_NR_DONE = "TRANSCRIPTS_NR.DONE"
STAMP_LONGREADS_CORRECTED = "LONGREADS.CORRECTED"
STAMP_LONGREADS_ASSEMBLED = "LONGREADS.ASSEMBLED"


def touch_stamp(outdir: str, name: str) -> None:
    with open(os.path.join(outdir, name), "w") as f:
        f.write("")


def has_stamp(outdir: str, name: str) -> bool:
    return os.path.exists(os.path.join(outdir, name))


def clear_stamps(outdir: str) -> None:
    for name in (
        STAMP_STARTED, STAMP_DBG_DONE, STAMP_FRAGMENTS_DONE,
        STAMP_TRANSCRIPTS_DONE, STAMP_TRANSCRIPTS_NR_DONE,
        STAMP_LONGREADS_CORRECTED, STAMP_LONGREADS_ASSEMBLED,
    ):
        p = os.path.join(outdir, name)
        if os.path.exists(p):
            os.remove(p)


def save_graph(
    prefix: str, state: dbg.GraphState, cfg: dbg.GraphConfig,
    compact_counters: bool = True,
) -> None:
    """Persist the graph: {prefix}.graph.json + per-filter .npy arrays.

    ``compact_counters`` stores the int32 cbf counters as 8-bit MiniFloat
    bytes — the reference's on-disk counter format (CountingBloomFilter
    buffers hold MiniFloat bytes, util/MiniFloat.java:40-45) — quartering
    checkpoint size.  Restored counts carry MiniFloat quantization error
    (exact through 7, ~6% relative above), which the reference tolerates
    at runtime, not just on disk.
    """
    from ..ops import minifloat

    desc = {
        "k": cfg.k,
        "stranded": cfg.stranded,
        "exact_counts": cfg.exact_counts,
        "read_pair_distance": cfg.read_pair_distance,
        "fragment_pair_distance": cfg.fragment_pair_distance,
        "dbgbf": asdict(cfg.dbgbf),
        "cbf": asdict(cfg.cbf),
        "pkbf": asdict(cfg.pkbf) if cfg.pkbf else None,
        "filters": {},
        "codecs": {},
    }
    for name in ("dbgbf", "cbf", "rpkbf", "fpkbf"):
        arr = getattr(state, name)
        if arr is None:
            continue
        path = f"{prefix}.{name}.npy"
        host = np.asarray(arr)
        if name == "cbf" and compact_counters and cfg.cbf.dtype == "int32":
            # narrow runtime counters (mf8/u16) are stored raw; int32
            # counters compact to the reference's MiniFloat byte format
            host = np.asarray(minifloat.encode(jnp.asarray(host)))
            desc["codecs"][name] = "minifloat"
        np.save(path, host)
        desc["filters"][name] = os.path.basename(path)
    with open(f"{prefix}.graph.json", "w") as f:
        json.dump(desc, f, indent=1)


def update_fragment_distance(prefix: str, d: int) -> None:
    """Persist the stage-2-learned fragment pair distance into the desc."""
    path = f"{prefix}.graph.json"
    with open(path) as f:
        desc = json.load(f)
    desc["fragment_pair_distance"] = d
    with open(path, "w") as f:
        json.dump(desc, f, indent=1)


def load_graph(prefix: str):
    """Restore (state, cfg) from a save_graph checkpoint."""
    with open(f"{prefix}.graph.json") as f:
        desc = json.load(f)
    cfg = dbg.GraphConfig(
        k=desc["k"],
        stranded=desc["stranded"],
        exact_counts=desc["exact_counts"],
        read_pair_distance=desc["read_pair_distance"],
        fragment_pair_distance=desc["fragment_pair_distance"],
        dbgbf=BloomConfig(**desc["dbgbf"]),
        cbf=CountingConfig(**desc["cbf"]),
        pkbf=BloomConfig(**desc["pkbf"]) if desc["pkbf"] else None,
    )
    arrays = {}
    base = os.path.dirname(prefix)
    codecs = desc.get("codecs", {})
    for name in ("dbgbf", "cbf", "rpkbf", "fpkbf"):
        fname = desc["filters"].get(name)
        if not fname:
            arrays[name] = None
            continue
        host = np.load(os.path.join(base, fname))
        if codecs.get(name) == "minifloat":
            from ..ops import minifloat

            host = np.rint(np.asarray(minifloat.decode(jnp.asarray(host)))).astype(np.int32)
        arrays[name] = jnp.asarray(host)
    state = dbg.GraphState(**arrays)
    return state, cfg
