"""Indel-aware consensus polish (racon's role, OverlapLayoutConsensus:849)."""

import numpy as np

from rnabloom_tpu.olc import consensus, realign

RNG = np.random.default_rng(99)


def rand_codes(n):
    return RNG.integers(0, 4, size=n).astype(np.uint8)


def test_banded_align_exact_and_indel():
    t = rand_codes(200)
    w = 8
    reads = np.full((3, 180), 4, np.uint8)
    lens = np.zeros(3, np.int32)
    wins = np.full((3, 180 + 2 * w), 4, np.uint8)
    # read 0: exact slice; read 1: one deletion; read 2: one insertion
    r0 = t[10:150]
    r1 = np.concatenate([t[10:60], t[61:150]])
    r2 = np.concatenate([t[10:60], [t[60] ^ 2], t[60:149]])
    for i, r in enumerate((r0, r1, r2)):
        reads[i, : len(r)] = r
        lens[i] = len(r)
        wins[i, : 2 * w + 180] = np.concatenate(
            [t[10 - w : 10 + 180 + w]]
        )[: 180 + 2 * w]
    tb, end_off, dist = realign.banded_align_batch(reads, lens, wins, w)
    assert dist[0] == 0
    assert dist[1] == 1
    assert dist[2] == 1


def _place_all(n_reads, target, starts):
    return [
        consensus.Placement(
            read=i, target=target, orient=0, start=int(starts[i]),
            q_start=0, q_end=0, t_start=0, t_end=0,
        )
        for i in range(n_reads)
    ]


def test_polish_excises_backbone_insertion():
    """A frameshift insertion in the unitig backbone is removed when the
    placed reads agree it does not exist."""
    t = rand_codes(400)
    bad = np.concatenate([t[:200], [t[200] ^ 1], t[200:]])  # unitig w/ insert
    reads, starts = [], []
    for _ in range(12):
        s = int(RNG.integers(0, 150))
        reads.append(t[s : s + 250].copy())
        starts.append(s if s + 250 <= 200 else s)  # placement on bad unitig
    out = consensus.polish([bad], reads, _place_all(len(reads), 0, starts))
    assert len(out[0]) == len(t)
    assert (out[0] == t).all(), "backbone insertion not excised"


def test_polish_restores_backbone_deletion():
    t = rand_codes(400)
    bad = np.concatenate([t[:200], t[201:]])  # unitig missing base 200
    reads, starts = [], []
    for _ in range(12):
        s = int(RNG.integers(0, 150))
        reads.append(t[s : s + 250].copy())
        starts.append(s)
    out = consensus.polish([bad], reads, _place_all(len(reads), 0, starts))
    assert len(out[0]) == len(t)
    assert (out[0] == t).all(), "backbone deletion not restored"


def test_polish_fixes_substitutions_still():
    t = rand_codes(300)
    bad = t.copy()
    bad[150] ^= 1
    reads = [t[s : s + 200].copy() for s in (0, 50, 100)]
    out = consensus.polish([bad], reads, _place_all(3, 0, [0, 50, 100]))
    assert (out[0] == t).all()
