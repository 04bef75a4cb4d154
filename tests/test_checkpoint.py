"""Graph save/restore + stamps."""

import jax.numpy as jnp
import numpy as np

from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg
from rnabloom_tpu.ops import nthash_ref as ref
from rnabloom_tpu.utils import checkpoint

RNG = np.random.default_rng(17)


def test_save_restore_roundtrip(tmp_path):
    cfg = dbg.GraphConfig(
        k=25,
        stranded=False,
        dbgbf=BloomConfig(16, 2),
        cbf=CountingConfig(16, 2, 14),
        pkbf=BloomConfig(16, 2),
        read_pair_distance=30,
    )
    state = dbg.make_graph(cfg, with_rpkbf=True)
    seqs = ["".join(RNG.choice(list("ACGT"), size=80)) for _ in range(10)]
    arr = np.full((10, 80), 4, np.uint8)
    for i, s in enumerate(seqs):
        arr[i] = ref.encode(s)
    state = dbg.build_step(state, cfg, jnp.asarray(arr), add_read_pairs=True)

    prefix = str(tmp_path / "ckpt")
    checkpoint.save_graph(prefix, state, cfg)
    checkpoint.update_fragment_distance(prefix, 123)
    state2, cfg2 = checkpoint.load_graph(prefix)

    assert cfg2.k == cfg.k and cfg2.read_pair_distance == 30
    assert cfg2.fragment_pair_distance == 123
    np.testing.assert_array_equal(np.asarray(state.cbf), np.asarray(state2.cbf))
    np.testing.assert_array_equal(np.asarray(state.rpkbf), np.asarray(state2.rpkbf))
    counts, _ = dbg.count_step(state2, cfg2, jnp.asarray(arr))
    assert (np.asarray(counts) >= 1).all()


def test_stamps(tmp_path):
    d = str(tmp_path)
    assert not checkpoint.has_stamp(d, checkpoint.STAMP_DBG_DONE)
    checkpoint.touch_stamp(d, checkpoint.STAMP_DBG_DONE)
    assert checkpoint.has_stamp(d, checkpoint.STAMP_DBG_DONE)
    checkpoint.clear_stamps(d)
    assert not checkpoint.has_stamp(d, checkpoint.STAMP_DBG_DONE)


def test_minifloat_compact_counters(tmp_path):
    """save_graph stores cbf counters as 8-bit MiniFloat (the reference's
    counter byte format, util/MiniFloat.java:40-45); restored counts stay
    within MiniFloat quantization error (exact through 7, 1/16 relative)."""
    import numpy as np
    import jax.numpy as jnp
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg
    from rnabloom_tpu.utils import checkpoint as ckpt

    cfg = dbg.GraphConfig(
        k=25, stranded=False,
        dbgbf=BloomConfig(14, 2), cbf=CountingConfig(14, 2, 12),
        pkbf=BloomConfig(14, 2), read_pair_distance=40,
    )
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 5000, size=1 << 14).astype(np.int32)
    state = dbg.GraphState(dbgbf=None, cbf=jnp.asarray(counts), rpkbf=None, fpkbf=None)
    prefix = str(tmp_path / "g")
    ckpt.save_graph(prefix, state, cfg)
    # on-disk cbf is one byte per cell
    assert np.load(prefix + ".cbf.npy").dtype == np.uint8
    restored, cfg2 = ckpt.load_graph(prefix)
    got = np.asarray(restored.cbf).astype(np.float64)
    want = counts.astype(np.float64)
    exact = want <= 7
    assert (got[exact] == want[exact]).all()
    rel = np.abs(got[~exact] - want[~exact]) / want[~exact]
    assert rel.max() <= 1.0 / 16.0 + 1e-6
