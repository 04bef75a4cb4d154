"""Sort-merge insert (ops/histmerge.py) vs the scatter reference.

The merge path must produce bit-identical tables: exact histogram adds,
exact presence sets, heavy-duplicate absorption via uniform rows, sentinel
routing for masked lanes, and the scatter fallback on window overflow.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnabloom_tpu.ops import histmerge
from rnabloom_tpu.bloom import filters
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.ops import nthash


def _ref_add(size, pad, idx):
    t = np.zeros(size + pad, np.int64)
    sel = idx[idx < size]
    np.add.at(t, sel, 1)
    return t


def _ref_set(size, pad, idx):
    t = np.zeros(size + pad, np.uint8)
    t[idx[idx < size]] = 1
    return t


@pytest.mark.parametrize("op", ["add", "set"])
def test_merge_random_exact(op):
    size_log2 = 20
    size = 1 << size_log2
    pad = histmerge.table_pad(size_log2)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, size, size=50_000, dtype=np.uint32)
    dtype = jnp.int32 if op == "add" else jnp.uint8
    tab = jnp.zeros(size + pad, dtype)
    out = np.asarray(histmerge.hist_update(tab, size_log2, jnp.asarray(idx), op))
    ref = _ref_add(size, pad, idx) if op == "add" else _ref_set(size, pad, idx)
    np.testing.assert_array_equal(out[:size], ref[:size])


@pytest.mark.parametrize("op", ["add", "set"])
def test_merge_heavy_duplicates(op):
    """Heavy hitters (poly-A-like cells) are absorbed by the uniform-row
    peel; totals stay exact."""
    size_log2 = 20
    size = 1 << size_log2
    pad = histmerge.table_pad(size_log2)
    rng = np.random.default_rng(1)
    idx = np.concatenate(
        [
            np.full(20_000, 12345, np.uint32),  # one massive cell
            np.full(5_000, 777_000, np.uint32),
            np.repeat(rng.integers(0, size, 300, dtype=np.uint32), 97),
            rng.integers(0, size, size=30_000, dtype=np.uint32),
        ]
    )
    rng.shuffle(idx)
    dtype = jnp.int32 if op == "add" else jnp.uint8
    tab = jnp.zeros(size + pad, dtype)
    out = np.asarray(histmerge.hist_update(tab, size_log2, jnp.asarray(idx), op))
    ref = _ref_add(size, pad, idx) if op == "add" else _ref_set(size, pad, idx)
    np.testing.assert_array_equal(out[:size], ref[:size])


def test_merge_sentinel_and_trash_dropped():
    size_log2 = 20
    size = 1 << size_log2
    pad = histmerge.table_pad(size_log2)
    rng = np.random.default_rng(2)
    real = rng.integers(0, size, size=9_000, dtype=np.uint32)
    idx = np.concatenate(
        [real, np.full(2_000, size, np.uint32), np.full(2_000, 0xFFFFFFFF, np.uint32)]
    )
    tab = jnp.zeros(size + pad, jnp.int32)
    out = np.asarray(histmerge.hist_update(tab, size_log2, jnp.asarray(idx), "add"))
    np.testing.assert_array_equal(out[:size], _ref_add(size, pad, real)[:size])
    assert int(out[:size].sum()) == len(real)


def test_merge_overflow_falls_back_exactly():
    """All indices distinct but packed into one table block: the window
    overflows and the lax.cond scatter branch must preserve exactness."""
    size_log2 = 24
    size = 1 << size_log2
    pad = histmerge.table_pad(size_log2)
    idx = np.arange(60_000, dtype=np.uint32)  # all within block 0
    tab = jnp.zeros(size + pad, jnp.int32)
    geo = histmerge.plan(size_log2, len(idx))
    assert geo is not None and geo.wrows * 128 < len(idx)  # really overflows
    out = np.asarray(histmerge.hist_update(tab, size_log2, jnp.asarray(idx), "add"))
    np.testing.assert_array_equal(out[:size], _ref_add(size, pad, idx)[:size])


def test_merge_accumulates_across_batches():
    size_log2 = 20
    size = 1 << size_log2
    pad = histmerge.table_pad(size_log2)
    rng = np.random.default_rng(3)
    tab = jnp.zeros(size + pad, jnp.int32)
    ref = np.zeros(size, np.int64)
    for i in range(3):
        idx = rng.integers(0, size, size=20_000, dtype=np.uint32)
        tab = histmerge.hist_update(tab, size_log2, jnp.asarray(idx), "add")
        np.add.at(ref, idx, 1)
    np.testing.assert_array_equal(np.asarray(tab)[:size], ref)


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    lo = jnp.asarray(rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32))
    return nthash.U64(lo, hi)


def test_filters_bloom_add_merge_matches_scatter():
    h = _hashes(30_000, 4)
    valid = jnp.asarray(np.random.default_rng(5).random(30_000) < 0.9)
    plain = BloomConfig(18, 2)
    merged = BloomConfig(18, 2, merge=True)
    a = filters.bloom_add(filters.make_bloom(plain), plain, h, valid)
    b = filters.bloom_add(filters.make_bloom(merged), merged, h, valid)
    np.testing.assert_array_equal(np.asarray(a)[: plain.size], np.asarray(b)[: merged.size])
    # lookups agree too
    q = _hashes(5_000, 6)
    la = filters.bloom_lookup(a, plain, q)
    lb = filters.bloom_lookup(b, merged, q)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_filters_counting_cm_merge_matches_scatter():
    h = _hashes(30_000, 7)
    valid = jnp.asarray(np.random.default_rng(8).random(30_000) < 0.85)
    plain = CountingConfig(18, 2)
    merged = CountingConfig(18, 2, merge=True)
    a = filters.counting_increment_cm(filters.make_counting(plain), plain, h, valid=valid)
    b = filters.counting_increment_cm(filters.make_counting(merged), merged, h, valid=valid)
    np.testing.assert_array_equal(np.asarray(a)[: plain.size], np.asarray(b)[: merged.size])
    q = _hashes(5_000, 9)
    ca = filters.counting_count(a, plain, q)
    cb = filters.counting_count(b, merged, q)
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_graph_build_step_merge_matches_scatter():
    from rnabloom_tpu.graph import dbg

    rng = np.random.default_rng(10)
    codes = jnp.asarray(rng.integers(0, 4, size=(512, 100), dtype=np.uint8))

    def cfg(merge):
        return dbg.GraphConfig(
            k=25,
            stranded=False,
            dbgbf=BloomConfig(16, 2),
            cbf=CountingConfig(17, 2, merge=merge),
            pkbf=BloomConfig(16, 2, merge=merge),
            read_pair_distance=40,
        )

    c0, c1 = cfg(False), cfg(True)
    s0 = dbg.build_step(dbg.make_graph(c0, with_rpkbf=True), c0, codes, add_read_pairs=True)
    s1 = dbg.build_step(dbg.make_graph(c1, with_rpkbf=True), c1, codes, add_read_pairs=True)
    np.testing.assert_array_equal(
        np.asarray(s0.cbf)[: c0.cbf.size], np.asarray(s1.cbf)[: c1.cbf.size]
    )
    np.testing.assert_array_equal(
        np.asarray(s0.rpkbf)[: c0.pkbf.size], np.asarray(s1.rpkbf)[: c1.pkbf.size]
    )


def test_increment_codes_matches_float_codec_exhaustively():
    """The fused integer mf8 increment (ops/minifloat.increment_codes) must
    be bit-identical to encode_stochastic(decode(c) + d, u01) — it replaced
    that chain in the merge sweep, the scatter fallback, and the uniform-row
    peel, so any drift would desynchronize sweep vs scatter tables."""
    from rnabloom_tpu.ops import minifloat as mf

    codes = np.arange(256, dtype=np.uint8)  # incl. invalid >127 codes
    deltas = np.array(
        [0, 1, 2, 3, 5, 7, 8, 15, 16, 100, 127, 128, 1000, 4096, 100000],
        np.int32,
    )
    C, D = np.meshgrid(codes, deltas, indexing="ij")
    for u in (0.0, 0.01, 0.25, 0.4999, 0.5, 0.75, 0.9999):
        uu = jnp.full(C.shape, u, jnp.float32)
        old = mf.encode_stochastic(
            mf.decode(jnp.asarray(C)) + jnp.asarray(D).astype(jnp.float32), uu
        )
        new = mf.increment_codes(jnp.asarray(C), jnp.asarray(D), uu)
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
