"""Bloom filters + implicit DBG vs a sequential Python oracle."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnabloom_tpu.bloom import filters
from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
from rnabloom_tpu.graph import dbg
from rnabloom_tpu.ops import nthash, nthash_ref as ref, u64

RNG = np.random.default_rng(123)


def mk_u64(vals):
    vals = np.asarray(vals, dtype=np.uint64)
    return u64.U64(
        jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)),
    )


class PyBloom:
    """Sequential oracle with identical pow2 indexing."""

    def __init__(self, size_log2, num_hash, k):
        self.mask = (1 << size_log2) - 1
        self.num_hash = num_hash
        self.k = k
        self.bits = set()

    def indices(self, base):
        return [((h & ref.M64) >> 1) & self.mask for h in ref.multi_hash(base, self.k, self.num_hash)]

    def add(self, base):
        for i in self.indices(base):
            self.bits.add(i)

    def lookup(self, base):
        return all(i in self.bits for i in self.indices(base))


K = 25


def rand_bases(n):
    return [int(x) for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)]


def test_bloom_add_lookup_matches_oracle():
    cfg = BloomConfig(size_log2=14, num_hash=3)
    bits = filters.make_bloom(cfg)
    py = PyBloom(14, 3, K)

    inserted = rand_bases(500)
    probes = inserted[:100] + rand_bases(200)

    base = mk_u64(inserted)
    hashes = nthash.multi_hash(base, K, cfg.num_hash)
    add = jax.jit(functools.partial(filters.bloom_add, cfg=cfg))
    bits = add(bits, hashes=hashes)
    for b in inserted:
        py.add(b)

    probe_h = nthash.multi_hash(mk_u64(probes), K, cfg.num_hash)
    lookup = jax.jit(functools.partial(filters.bloom_lookup, cfg=cfg))
    got = np.asarray(lookup(bits, hashes=probe_h))
    exp = [py.lookup(b) for b in probes]
    assert list(got) == exp
    assert all(got[:100])  # everything inserted must be found


def test_bloom_valid_mask():
    cfg = BloomConfig(size_log2=12, num_hash=2)
    bits = filters.make_bloom(cfg)
    bases = rand_bases(50)
    valid = jnp.asarray(np.array([i % 2 == 0 for i in range(50)]))
    hashes = nthash.multi_hash(mk_u64(bases), K, cfg.num_hash)
    bits = jax.jit(functools.partial(filters.bloom_add, cfg=cfg))(bits, hashes=hashes, valid=valid)
    got = np.asarray(jax.jit(functools.partial(filters.bloom_lookup, cfg=cfg))(bits, hashes=hashes))
    py = PyBloom(12, 2, K)
    for i, b in enumerate(bases):
        if i % 2 == 0:
            py.add(b)
    assert list(got) == [py.lookup(b) for b in bases]


def test_counting_multiplicity_and_min():
    cfg = CountingConfig(size_log2=16, num_hash=2, scratch_log2=16)
    counts = filters.make_counting(cfg)

    distinct = rand_bases(300)
    mult = RNG.integers(1, 9, size=300)
    occurrences = [b for b, m in zip(distinct, mult) for _ in range(m)]
    RNG.shuffle(occurrences)

    h = nthash.multi_hash(mk_u64(occurrences), K, cfg.num_hash)
    inc = jax.jit(functools.partial(filters.counting_increment, cfg=cfg))
    counts = inc(counts, hashes=h)

    hq = nthash.multi_hash(mk_u64(distinct), K, cfg.num_hash)
    got = np.asarray(jax.jit(functools.partial(filters.counting_count, cfg=cfg))(counts, hashes=hq))
    # conservative update: estimate >= truth; with a roomy table, equality
    assert (got >= mult).all()
    assert (got == mult).mean() > 0.95


def test_counting_across_batches():
    cfg = CountingConfig(size_log2=16, num_hash=3, scratch_log2=16)
    counts = filters.make_counting(cfg)
    b = rand_bases(50)
    inc = jax.jit(functools.partial(filters.counting_increment, cfg=cfg))
    h = nthash.multi_hash(mk_u64(b), K, cfg.num_hash)
    for _ in range(4):
        counts = inc(counts, hashes=h)
    got = np.asarray(jax.jit(functools.partial(filters.counting_count, cfg=cfg))(counts, hashes=h))
    assert (got >= 4).all()
    assert (got == 4).mean() > 0.95


def graph_cfg(stranded=True, exact=True):
    return dbg.GraphConfig(
        k=K,
        stranded=stranded,
        dbgbf=BloomConfig(size_log2=18, num_hash=2),
        cbf=CountingConfig(size_log2=18, num_hash=2, scratch_log2=16),
        pkbf=BloomConfig(size_log2=18, num_hash=2),
        read_pair_distance=30,
        exact_counts=exact,
    )


def encode_batch(seqs, L):
    arr = np.full((len(seqs), L), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = ref.encode(s)
    return jnp.asarray(arr)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


@pytest.mark.parametrize("stranded", [True, False])
@pytest.mark.parametrize("exact", [True, False])
def test_graph_build_and_count(stranded, exact):
    cfg = graph_cfg(stranded=stranded, exact=exact)
    state = dbg.make_graph(cfg, with_rpkbf=True)

    # 20 distinct reads, read 0 repeated 5 extra times
    reads = [rand_seq(80) for _ in range(20)]
    batch = reads + [reads[0]] * 5
    codes = encode_batch(batch, 80)
    state = dbg.build_step(state, cfg, codes, add_read_pairs=True)

    counts, valid = dbg.count_step(state, cfg, encode_batch(reads, 80))
    counts = np.asarray(counts)
    assert np.asarray(valid).all()
    # k-mers of read 0 seen 6 times (5 repeats + 1), others >= 1
    assert (counts[0] >= 6).all()
    assert (counts >= 1).all()
    assert np.median(counts[1:]) == 1.0

    # unseen reads must be absent (up to Bloom FPR)
    unseen = encode_batch([rand_seq(80) for _ in range(20)], 80)
    counts_u, _ = dbg.count_step(state, cfg, unseen)
    assert (np.asarray(counts_u) == 0).mean() > 0.98


def test_graph_canonical_mode_folds_strands():
    cfg = graph_cfg(stranded=False)
    state = dbg.make_graph(cfg, with_rpkbf=True)
    s = rand_seq(80)
    rc = s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    state = dbg.build_step(state, cfg, encode_batch([s], 80))
    # reverse complement must be found with the same counts
    counts, _ = dbg.count_step(state, cfg, encode_batch([rc], 80))
    assert (np.asarray(counts) >= 1).all()


def test_graph_read_pair_lookup():
    cfg = graph_cfg()
    state = dbg.make_graph(cfg, with_rpkbf=True)
    s = rand_seq(100)
    codes = encode_batch([s], 100)
    state = dbg.build_step(state, cfg, codes, add_read_pairs=True)

    fh, rh, base, valid = dbg.seq_hashes(cfg, codes)
    pair_base, np_ = dbg.pair_base_hashes(cfg, fh, rh, cfg.read_pair_distance)
    got = np.asarray(dbg.lookup_read_pair(state, cfg, pair_base))
    assert got.all()

    # pairs from a different read are absent
    codes2 = encode_batch([rand_seq(100)], 100)
    fh2, rh2, _, _ = dbg.seq_hashes(cfg, codes2)
    pb2, _ = dbg.pair_base_hashes(cfg, fh2, rh2, cfg.read_pair_distance)
    got2 = np.asarray(dbg.lookup_read_pair(state, cfg, pb2))
    assert (~got2).mean() > 0.95


def test_fpr_reporting():
    cfg = graph_cfg()
    state = dbg.make_graph(cfg, with_rpkbf=True)
    reads = [rand_seq(80) for _ in range(50)]
    state = dbg.build_step(state, cfg, encode_batch(reads, 80), add_read_pairs=True)
    out = dbg.fprs(state, cfg)
    assert 0 < out["dbgbf"] < 0.05
    assert 0 < out["cbf"] < 0.05
    assert out["rpkbf"] > 0


def test_cascading_filter():
    from rnabloom_tpu.bloom import variants

    cfg = variants.CascadingConfig(size_log2=14, num_hash=2, num_levels=3)
    levels = variants.make_cascading(cfg)
    b = rand_bases(50)
    h = nthash.multi_hash(mk_u64(b), K, cfg.num_hash)
    # two passes: nothing reaches level 3 yet
    levels = variants.cascading_add(levels, cfg, h)
    levels = variants.cascading_add(levels, cfg, h)
    assert not np.asarray(variants.cascading_lookup(levels, cfg, h)).any()
    # third pass: all reach the top level
    levels = variants.cascading_add(levels, cfg, h)
    assert np.asarray(variants.cascading_lookup(levels, cfg, h)).all()


def test_partitioned_pair_filter():
    from rnabloom_tpu.bloom import variants

    cfg = variants.PartitionedPairConfig(size_log2=14, num_hash=2)
    st = variants.PartitionedPairState(cfg)
    hl = nthash.multi_hash(mk_u64(rand_bases(40)), K, 2)
    hr = nthash.multi_hash(mk_u64(rand_bases(40)), K, 2)
    hp = nthash.multi_hash(mk_u64(rand_bases(40)), K, 2)
    st.add(hl, hr, hp)
    assert np.asarray(st.lookup(hl, hr, hp)).all()
    other = nthash.multi_hash(mk_u64(rand_bases(40)), K, 2)
    assert (~np.asarray(st.lookup(other, hr, hp))).mean() > 0.9


def test_blocked_counting_matches_flat_counts():
    import jax.numpy as jnp

    from rnabloom_tpu.bloom import filters
    from rnabloom_tpu.bloom.filters import CountingConfig
    from rnabloom_tpu.ops import nthash, u64

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 63, size=(256, 2), dtype=np.uint64)
    h = u64.U64(
        jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)),
    )
    cfgb = CountingConfig(size_log2=20, num_hash=2, scratch_log2=16, blocked=True)
    c = filters.make_counting(cfgb)
    assert c.shape[0] == cfgb.size + 128
    # insert each key 3x
    for _ in range(3):
        c = filters.counting_increment_cm(c, cfgb, h)
    est = np.asarray(filters.counting_count(c, cfgb, h))
    # count-min overestimates only on collisions; at 256 keys in 2^20
    # cells the estimate must be exact
    assert (est == 3).all()
    # validity masking: masked rows go to the trash row
    valid = jnp.zeros(256, bool)
    c2 = filters.counting_increment_cm(filters.make_counting(cfgb), cfgb, h, valid=valid)
    assert float(jnp.sum(c2[: cfgb.size].astype(jnp.float32))) == 0.0
    # distinct lanes: both probes of a key never alias one cell
    row, lanes = filters.blocked_cells(cfgb, h)
    lanes = np.asarray(lanes)
    assert (lanes[:, 0] != lanes[:, 1]).all()


class TestNarrowCounters:
    """mf8 (1 B MiniFloat) and u16 (2 B saturating) counter cells — the
    reference's memory model (util/MiniFloat.java:27-45, 1 byte/cell with
    half the -mem budget in cells, RNABloom.java:6822-6830)."""

    def _insert(self, dtype, merge=False, values=(1, 3, 9, 40, 1000)):
        from rnabloom_tpu.bloom import filters
        from rnabloom_tpu.bloom.filters import CountingConfig
        from rnabloom_tpu.ops.u64 import U64

        cfg = CountingConfig(size_log2=20, num_hash=2, dtype=dtype, merge=merge)
        counts = filters.make_counting(cfg)
        rng = np.random.default_rng(5)
        keys = rng.integers(0, 1 << 62, size=len(values), dtype=np.uint64)
        # one batch containing each key with its multiplicity
        stream = np.repeat(keys, np.asarray(values))
        rng.shuffle(stream)
        h2 = np.stack([stream, stream ^ 0x9E3779B97F4A7C15], axis=-1)
        h = U64(
            jnp.asarray((h2 & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((h2 >> 32).astype(np.uint32)),
        )
        counts = filters.counting_increment_cm(counts, cfg, h)
        hq2 = np.stack([keys, keys ^ 0x9E3779B97F4A7C15], axis=-1)
        hq = U64(
            jnp.asarray((hq2 & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((hq2 >> 32).astype(np.uint32)),
        )
        got = np.asarray(filters.counting_count(counts, cfg, hq))
        return np.asarray(values), got, counts

    def test_mf8_quantized_counts(self):
        want, got, counts = self._insert("mf8")
        assert counts.dtype == np.uint8
        # exact through 15, within MiniFloat quantization (~12%) above
        for w, g in zip(want, got):
            if w <= 15:
                assert g == w, (w, g)
            else:
                assert abs(g - w) / w < 0.13, (w, g)

    def test_u16_exact_saturating(self):
        want, got, counts = self._insert("u16", values=(1, 3, 9, 40, 1000, 70000))
        assert counts.dtype == np.uint16
        for w, g in zip(want, got):
            assert g == min(w, 65535), (w, g)

    def test_mf8_merge_matches_scatter(self):
        """mf8 merge vs scatter agree to within ONE quantization step: the
        merge path splits heavy cells into uniform-row and mixed-row
        updates (two stochastic encodes), so codes may differ by 1."""
        want, got_m, cm = self._insert("mf8", merge=True, values=(2, 7, 30, 500) * 64)
        _, got_s, cs = self._insert("mf8", merge=False, values=(2, 7, 30, 500) * 64)
        for w, m, s in zip(want, got_m, got_s):
            tol = 1 if w <= 15 else 0.14 * w
            assert abs(m - w) <= tol and abs(s - w) <= tol, (w, m, s)

    def test_mf8_conservative_increment(self):
        from rnabloom_tpu.bloom import filters
        from rnabloom_tpu.bloom.filters import CountingConfig
        from rnabloom_tpu.ops.u64 import U64

        cfg = CountingConfig(size_log2=16, num_hash=2, dtype="mf8")
        counts = filters.make_counting(cfg)
        key = np.uint64(123456789)
        h2 = np.stack([key[None], key[None] ^ 0x9E3779B97F4A7C15], axis=-1)
        h = U64(
            jnp.asarray((h2 & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((h2 >> 32).astype(np.uint32)),
        )
        # 20 conservative increments of 1, one per "batch" (the salt is the
        # batch counter — it drives the stochastic rounding across batches)
        for i in range(20):
            counts = filters.counting_increment(counts, cfg, h, salt=i)
        got = float(np.asarray(filters.counting_count(counts, cfg, h))[0])
        # stochastic rounding: unbiased but noisy for +1 steps above the
        # quantization knee; accept a generous band around 20
        assert 15 <= got <= 27, got


def test_simple_bloom_filter():
    """SimpleBloomFilter parity (bloom/SimpleBloomFilter.java): single
    hash, modulo indexing, getAndSet batch semantics, popcount FPR."""
    from rnabloom_tpu.bloom.variants import SimpleBloomFilter

    bf = SimpleBloomFilter(1 << 12)
    h = np.array([1, 2, 3, 4096 + 1, 99], np.uint64)  # 4097 % 4096 == 1
    assert not bf.lookup(h).any()
    pre = bf.lookup_and_add(np.array([1, 2, 1], np.uint64))
    assert list(pre) == [False, False, True]  # in-batch duplicate sees the add
    assert list(bf.lookup(h)) == [True, True, False, True, False]
    assert 0 < bf.fpr() < 0.01
    bf.empty()
    assert not bf.lookup(h).any()
