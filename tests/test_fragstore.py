"""Streaming stratified fragment store (FragmentWriterWorker's .nbits
strata, RNABloom.java:4214-4301)."""

import numpy as np

from rnabloom_tpu.assembly.fragstore import FragmentStore

RNG = np.random.default_rng(42)


def _frag(n):
    return RNG.integers(0, 4, size=n).astype(np.uint8)


def test_store_roundtrip_and_priority_order(tmp_path):
    with FragmentStore(str(tmp_path), long_threshold=100) as store:
        store.add(_frag(150), min_cov=5.0, connected=True)     # E0 long
        store.add(_frag(50), min_cov=5.0, connected=True)      # E0 short
        store.add(_frag(150), min_cov=500.0, connected=True)   # E2 long
        store.add(_frag(150), min_cov=5.0, connected=False)    # E0 un
        store.add(_frag(80), min_cov=2e6, connected=True)      # E5 short
    assert store.count == 5

    reopened = FragmentStore.open(str(tmp_path))
    assert reopened is not None and reopened.count == 5
    assert reopened.max_len == 150

    seen = []
    for codes, lens, covs, conn in reopened.iter_batches(4):
        assert codes.shape == (4, 150)
        for i in range(4):
            if lens[i] > 0:
                seen.append((float(covs[i]), int(lens[i]), bool(conn[i])))
    # reference priority (class-outer): LONG E5..E0, SHORT E5..E0, UN E5..E0
    assert [round(c) for c, _, _ in seen] == [500, 5, 2000000, 5, 5]
    assert [l for _, l, _ in seen] == [150, 150, 80, 50, 150]
    assert [c for _, _, c in seen] == [True, True, True, True, False]


def test_store_singleton_stratum_last(tmp_path):
    """minCov == 1 fragments live in their own '01' files, read after every
    magnitude file of the group (RNABloom.java:150-158, :4132-4145)."""
    with FragmentStore(str(tmp_path), long_threshold=100) as store:
        store.add(_frag(150), min_cov=1.0, connected=True)   # 01 long
        store.add(_frag(50), min_cov=1.0, connected=True)    # 01 short
        store.add(_frag(150), min_cov=2.0, connected=True)   # E0 long
        store.add(_frag(60), min_cov=1.0, connected=False)   # 01 un
        store.add(_frag(70), min_cov=30.0, connected=False)  # E1 un
    reopened = FragmentStore.open(str(tmp_path))
    seen = []
    for codes, lens, covs, conn in reopened.iter_batches(4):
        for i in range(4):
            if lens[i] > 0:
                seen.append((float(covs[i]), int(lens[i])))
    # LONG E0, UN E1, then singletons: 01.long, 01.short, 01.un
    assert seen == [(2.0, 150), (30.0, 70), (1.0, 150), (1.0, 50), (1.0, 60)]


def test_store_polya_priority(tmp_path):
    with FragmentStore(str(tmp_path), long_threshold=100, polya_priority=True) as store:
        store.add(_frag(150), min_cov=5.0, connected=True, polya=False)
        store.add(_frag(140), min_cov=5.0, connected=True, polya=True)
    reopened = FragmentStore.open(str(tmp_path))
    lens = []
    for codes, ls, _c, _ in reopened.iter_batches(2):
        lens.extend(int(x) for x in ls if x > 0)
    assert lens == [140, 150]  # polyA fragment leads its stratum


def test_store_batches_are_bounded(tmp_path):
    """Iteration never materializes more than one batch."""
    with FragmentStore(str(tmp_path), long_threshold=100) as store:
        for _ in range(1000):
            store.add(_frag(int(RNG.integers(30, 200))), min_cov=3.0, connected=True)
    reopened = FragmentStore.open(str(tmp_path))
    total = 0
    for codes, lens, _c, _ in reopened.iter_batches(64):
        assert codes.shape[0] == 64
        total += int((lens > 0).sum())
    assert total == 1000
