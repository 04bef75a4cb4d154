"""Redundancy-screen graph re-walks (GraphUtils.represented :711-824).

An error-bearing fragment whose true sequence is already assembled must be
screened out even when its errors cluster (unseen gap > k) or sit at the
sequence edges — the cases direct variant repair can't explain.  Novel
sequence must never be screened.
"""

import jax.numpy as jnp
import numpy as np

from rnabloom_tpu.assembly import transcripts as txmod
from rnabloom_tpu.bloom import filters
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg

K = 25
RNG = np.random.default_rng(77)


def _setup():
    cfg = dbg.GraphConfig(
        k=K, stranded=False,
        dbgbf=BloomConfig(18, 2), cbf=CountingConfig(18, 2, 16),
        pkbf=BloomConfig(18, 2), read_pair_distance=60,
    )
    scfg = BloomConfig(18, 2)
    t = RNG.integers(0, 4, size=400).astype(np.uint8)
    # graph holds the true sequence (high coverage) — 3 inserts
    graph = dbg.make_graph(cfg)
    base = np.full((4, 512), 4, np.uint8)
    base[:3, :400] = t
    graph = dbg.build_step(graph, cfg, jnp.asarray(base))
    screen = filters.make_bloom(scfg)
    screen = txmod.screen_add(screen, scfg, cfg, jnp.asarray(base[:1]))
    return cfg, scfg, graph, screen, t


def _screen(cfg, scfg, graph, screen, variant, **kw):
    W = max(512, 1 << int(len(variant) - 1).bit_length())
    codes = np.full((1, W), 4, np.uint8)
    codes[0, : len(variant)] = variant
    lens = np.asarray([len(variant)], np.int64)
    rep = txmod.screen_represented(
        screen, scfg, cfg, codes, lens, txmod.TranscriptParams(**kw), graph=graph
    )
    return bool(rep[0])


def test_clustered_errors_rewalk():
    """Two substitutions < k apart merge into one >k gap: only the graph
    re-walk can explain it (single-substitution repair cannot)."""
    cfg, scfg, graph, screen, t = _setup()
    v = t.copy()
    v[200] = (v[200] + 1) % 4
    v[212] = (v[212] + 2) % 4
    assert _screen(cfg, scfg, graph, screen, v)
    # without the graph the clustered gap survives -> not represented
    codes = np.full((1, 512), 4, np.uint8)
    codes[0, : len(v)] = v
    rep = txmod.screen_represented(
        screen, scfg, cfg, codes, np.asarray([len(v)], np.int64),
        txmod.TranscriptParams(),
    )
    assert not bool(rep[0])


def test_three_spread_errors_rewalk():
    cfg, scfg, graph, screen, t = _setup()
    v = t.copy()
    for p, d in ((60, 1), (201, 3), (340, 2)):
        v[p] = (v[p] + d) % 4
    assert _screen(cfg, scfg, graph, screen, v)


def test_edge_error_forgiven_as_tip():
    """An error near the sequence end leaves an unseen edge; the erroneous
    end dead-ends in the graph (tip), so the edge is forgiven."""
    cfg, scfg, graph, screen, t = _setup()
    v = t.copy()
    v[2] = (v[2] + 1) % 4
    v[396] = (v[396] + 1) % 4
    assert _screen(cfg, scfg, graph, screen, v)


def test_novel_sequence_not_screened():
    cfg, scfg, graph, screen, _t = _setup()
    novel = RNG.integers(0, 4, size=400).astype(np.uint8)
    assert not _screen(cfg, scfg, graph, screen, novel)


def test_half_novel_extension_not_screened():
    """A sequence extending well beyond the assembled region (novel edge
    with no graph support cap) must be kept."""
    cfg, scfg, graph, screen, t = _setup()
    novel_tail = RNG.integers(0, 4, size=250).astype(np.uint8)
    v = np.concatenate([t, novel_tail])
    assert not _screen(cfg, scfg, graph, screen, v)
