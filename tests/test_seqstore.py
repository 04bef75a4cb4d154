"""Disk-backed SeqStore: round-trip, access patterns, bounded RSS."""

import os
import resource

import numpy as np
import pytest

from rnabloom_tpu.io.seqstore import SeqStore


def test_roundtrip_and_access(tmp_path):
    rng = np.random.default_rng(7)
    store = SeqStore(str(tmp_path / "s.2bit"))
    seqs = [rng.integers(0, 4, size=int(n), dtype=np.uint8) for n in rng.integers(1, 700, 50)]
    for s in seqs:
        store.append(s)
    assert len(store) == 50
    np.testing.assert_array_equal(store.lengths, [len(s) for s in seqs])
    # int, negative, slice, iteration — the OLC engine's access patterns
    np.testing.assert_array_equal(store[13], seqs[13])
    np.testing.assert_array_equal(store[-1], seqs[-1])
    got = store[10:14]
    assert all(np.array_equal(a, b) for a, b in zip(got, seqs[10:14]))
    for a, b in zip(store, seqs):
        np.testing.assert_array_equal(a, b)
    # interleaved append-after-read
    extra = rng.integers(0, 4, size=33, dtype=np.uint8)
    store.append(extra)
    np.testing.assert_array_equal(store[50], extra)
    with pytest.raises(IndexError):
        store[51]
    path = store.path
    store.close(delete=True)
    assert not os.path.exists(path)


def test_residual_n_stores_as_a(tmp_path):
    store = SeqStore(str(tmp_path / "s.2bit"))
    store.append(np.array([0, 1, 4, 3], np.uint8))
    np.testing.assert_array_equal(store[0], [0, 1, 0, 3])
    store.close(delete=True)


@pytest.mark.slow
def test_bounded_rss_100k(tmp_path):
    """100k ~1kb sequences (~100 MB decoded) through the store must not
    grow host RSS by more than a fraction of the decoded size: the index
    is ~12 B/seq and bases live on disk."""
    rng = np.random.default_rng(1)
    chunk = rng.integers(0, 4, size=(100, 1000), dtype=np.uint8)
    store = SeqStore(str(tmp_path / "big.2bit"))
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    for i in range(1000):
        for row in chunk:
            store.append(row)
    # random access across the whole store
    for i in rng.integers(0, len(store), 500):
        assert len(store[int(i)]) == 1000
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    store.close(delete=True)
    assert len(store) == 100_000
    # decoded size is 100 MB; require < 30 MB of RSS growth
    assert rss1 - rss0 < 30_000, f"RSS grew {rss1 - rss0} KiB"
