"""Poly-A detection + artifact trimming."""

import numpy as np

from rnabloom_tpu.assembly import artifacts
from rnabloom_tpu.utils import polya, seq as sequtils

RNG = np.random.default_rng(8)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def test_polya_tail():
    s = rand_seq(200) + "A" * 25
    codes = sequtils.encode(s)
    hit = polya.find_polya_tail(codes)
    assert hit is not None
    start, end = hit
    assert end == len(s)
    assert start <= 202  # tail found near its true start


def test_polya_tail_with_mismatches():
    s = rand_seq(200) + "AAAAAAAGAAAAAAAACAAAAAAA"
    hit = polya.find_polya_tail(sequtils.encode(s))
    assert hit is not None
    assert hit[1] - hit[0] >= 15


def test_polyt_head_and_orientation():
    s = "T" * 25 + rand_seq(200)
    codes = sequtils.encode(s)
    assert polya.find_polyt_head(codes) is not None
    oriented, had_tail, flipped = polya.orient_long_read(codes)
    assert flipped
    assert sequtils.decode(oriented) == sequtils.revcomp(s)


def test_no_false_polya():
    s = rand_seq(300)
    codes = sequtils.encode(s)
    hit = polya.find_polya_tail(codes)
    if hit is not None:
        assert hit[1] - hit[0] < 12  # only short chance runs


def test_pas_search():
    s = rand_seq(150).replace("AATAAA", "ACGTCG") + "GGAATAAAGG" + "CCT" + "A" * 20
    tail_start = len(s) - 20
    pas = polya.find_pas_positions(s, tail_start)
    assert any(s[p : p + 6] == "AATAAA" for p in pas)


def test_rc_artifact_trim():
    core = rand_seq(150)
    artifact = core + sequtils.revcomp(core[50:])  # fold-back of the tail
    codes = sequtils.encode(artifact)
    trimmed = artifacts.trim_rc_artifact(codes)
    assert len(trimmed) < len(codes)
    assert sequtils.decode(trimmed[:150]) == core

    clean = sequtils.encode(rand_seq(300))
    assert len(artifacts.trim_rc_artifact(clean)) == 300


def test_chimera_profile():
    k = 25
    seen = np.ones(100, bool)
    seen[48:52] = False  # short unseen junction between two seen arms
    valid = np.ones(100, bool)
    assert artifacts.is_chimera(seen, valid, k)
    # long unseen middle = novel sequence, not chimera
    seen2 = np.ones(100, bool)
    seen2[30:70] = False
    assert not artifacts.is_chimera(seen2, valid, k)
    # nothing unseen = represented, not chimera
    assert not artifacts.is_chimera(np.ones(100, bool), valid, k)


def test_low_complexity():
    assert artifacts.is_low_complexity(sequtils.encode("A" * 50))
    assert artifacts.is_low_complexity(sequtils.encode("ATATATATATATATATATAT"))
    assert artifacts.is_low_complexity(sequtils.encode("ACGACGACGACGACGACGACG"))
    assert not artifacts.is_low_complexity(sequtils.encode(rand_seq(100)))


def test_blunt_end_artifact():
    n, d = 100, 40
    valid = np.ones(n, bool)
    # left-assembled with a short low-cov unassembled tail
    seen = np.ones(n, bool)
    seen[85:] = False
    counts = np.full(n, 10.0)
    counts[85:] = 2.0
    assert artifacts.is_blunt_end_artifact(seen, valid, counts, d, 20)
    # long novel tail (> d) is NOT an artifact
    seen2 = np.ones(n, bool)
    seen2[40:] = False
    assert not artifacts.is_blunt_end_artifact(seen2, valid, counts, d, 20)
    # fully assembled: not an artifact
    assert not artifacts.is_blunt_end_artifact(np.ones(n, bool), valid, counts, d, 20)
    # mirrored case (right-assembled, short head stub)
    seen3 = np.ones(n, bool)
    seen3[:12] = False
    counts3 = np.full(n, 10.0)
    counts3[:12] = 2.0
    assert artifacts.is_blunt_end_artifact(seen3, valid, counts3, d, 20)


def test_template_switch_tip_profile():
    k = 25
    n = 120
    valid = np.ones(n, bool)
    # assembled suffix, unassembled prefix tip (isTemplateSwitch2)
    seen = np.zeros(n, bool)
    seen[80:] = True
    tip = artifacts.template_switch_tip(seen, valid, k)
    assert tip is not None
    s, e = tip
    assert s == 0 and e == 80 - 2 * k  # fold-back loop (2k) excluded
    # assembled prefix, unassembled suffix tip (isTemplateSwitch)
    seen2 = np.zeros(n, bool)
    seen2[:40] = True
    tip2 = artifacts.template_switch_tip(seen2, valid, k)
    assert tip2 is not None
    s2, e2 = tip2
    assert s2 == 40 + k and e2 == n
    # fully seen / fully unseen: no signature
    assert artifacts.template_switch_tip(np.ones(n, bool), valid, k) is None
    assert artifacts.template_switch_tip(np.zeros(n, bool), valid, k) is None


def test_template_switch_screening_end_to_end():
    import jax.numpy as jnp

    from rnabloom_tpu.assembly import transcripts as txmod
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig, make_bloom
    from rnabloom_tpu.graph import dbg

    k = 25
    # stranded: template-switch tips are only distinguishable from their
    # backbone when hashing is strand-specific (canonical hashing sees the
    # RC tip's k-mers as already assembled — true of the reference too)
    cfg = dbg.GraphConfig(
        k=k, stranded=True,
        dbgbf=BloomConfig(18, 2),
        cbf=CountingConfig(18, 2, 16),
        pkbf=BloomConfig(18, 2),
    )
    scfg = BloomConfig(18, 2)
    screen = make_bloom(scfg)

    backbone = rand_seq(400)
    # mark the backbone as assembled in the screening filter
    pad = np.full((1, 400), 4, np.uint8)
    pad[0, :] = sequtils.encode(backbone)
    screen = txmod.screen_add(screen, scfg, cfg, jnp.asarray(pad))

    # artifact: revcomp of a backbone region + a fold-back loop + an
    # assembled backbone suffix -> the prefix tip's RC is in the screen
    artifact = sequtils.revcomp(backbone[100:250]) + backbone[250:]
    clean = rand_seq(150) + backbone[250:]  # novel tip: NOT a switch
    L = max(len(artifact), len(clean))
    batch = np.full((2, L), 4, np.uint8)
    batch[0, : len(artifact)] = sequtils.encode(artifact)
    batch[1, : len(clean)] = sequtils.encode(clean)
    lens = np.array([len(artifact), len(clean)], np.int32)
    flags = txmod.screen_template_switch(screen, scfg, cfg, batch, lens)
    assert flags[0]
    assert not flags[1]


def test_represented_collapses_indel_bubble():
    """represented() gap repair (GraphUtils.java:711-824): a copy of an
    assembled transcript differing by one indel screens as redundant; with
    -indel 0 (or -p 1.0) it does not."""
    import jax.numpy as jnp
    import numpy as np
    from rnabloom_tpu.assembly import transcripts as txmod
    from rnabloom_tpu.bloom import filters
    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig
    from rnabloom_tpu.graph import dbg

    k = 25
    cfg = dbg.GraphConfig(
        k=k, stranded=False,
        dbgbf=BloomConfig(18, 2), cbf=CountingConfig(18, 2, 16),
        pkbf=BloomConfig(18, 2),
    )
    scfg = BloomConfig(18, 2)
    rng = np.random.default_rng(123)
    t = rng.integers(0, 4, size=400).astype(np.uint8)
    screen = filters.make_bloom(scfg)
    base = np.full((1, 512), 4, np.uint8)
    base[0, :400] = t
    screen = txmod.screen_add(screen, scfg, cfg, jnp.asarray(base))

    for variant in (
        np.concatenate([t[:200], t[201:]]),          # 1-base deletion
        np.concatenate([t[:200], [t[200] ^ 1], t[200:]]),  # 1-base insertion
        np.concatenate([t[:200], [(t[200] + 1) % 4], t[201:]]),  # substitution
    ):
        codes = np.full((1, 512), 4, np.uint8)
        codes[0, : len(variant)] = variant
        lens = np.asarray([len(variant)], np.int32)
        rep = txmod.screen_represented(
            screen, scfg, cfg, codes, lens, txmod.TranscriptParams()
        )
        assert rep[0], f"variant len {len(variant)} not collapsed"

    # indel variants are NOT collapsed when -indel 0 / -p 1.0
    deletion = np.concatenate([t[:200], t[201:]])
    codes = np.full((1, 512), 4, np.uint8)
    codes[0, : len(deletion)] = deletion
    lens = np.asarray([len(deletion)], np.int32)
    for p in (
        txmod.TranscriptParams(max_indel=0),
        txmod.TranscriptParams(percent_identity=1.0),
    ):
        rep = txmod.screen_represented(screen, scfg, cfg, codes, lens, p)
        assert not rep[0]


class TestLowComplexityDetectors:
    """Reference 1/2/3-mer detectors (SeqUtils.java:370-683) — the old
    single base-fraction heuristic passed dinucleotide/trinucleotide
    repeats (AT-rich UTRs)."""

    @staticmethod
    def _e(s):
        enc = {c: i for i, c in enumerate("ACGT")}
        return np.array([enc.get(c, 4) for c in s], np.uint8)

    def test_homopolymer(self):
        assert artifacts.is_low_complexity2(self._e("A" * 80))
        assert artifacts.is_low_complexity_short(self._e("A" * 80))
        assert artifacts.is_repeat(self._e("A" * 80))

    def test_dinucleotide_repeat(self):
        at = self._e("AT" * 50)
        assert artifacts.is_low_complexity2(at)
        assert artifacts.is_low_complexity_long(at)
        assert artifacts.is_repeat(at)

    def test_trinucleotide_repeat(self):
        cag = self._e("CAG" * 40)
        assert artifacts.is_low_complexity2(cag)
        assert artifacts.is_repeat(cag)

    def test_random_passes(self):
        rng = np.random.default_rng(1)
        # is_low_complexity2 is the reference's k-mer-scale test (its
        # byte-capped thresholds bind for len > ~267, exactly as in
        # SeqUtils.java:372-374 — it is only ever applied to k-mers)
        kmer = rng.integers(0, 4, 25).astype(np.uint8)
        assert not artifacts.is_low_complexity2(kmer)
        rnd = rng.integers(0, 4, 300).astype(np.uint8)
        assert not artifacts.is_low_complexity_long(rnd)
        assert not artifacts.is_low_complexity_short(rnd)
        assert not artifacts.is_repeat(rnd)
        assert not artifacts.is_low_complexity_long_windowed(rnd)

    def test_windowed_mixed(self):
        # 3/4 of the windows low-complexity -> flagged
        rnd = np.random.default_rng(2).integers(0, 4, 50).astype(np.uint8)
        seq = np.concatenate([self._e("AT" * 25)] * 3 + [rnd])
        assert artifacts.is_low_complexity_long_windowed(seq)


class TestHairpinTrim:
    """trimHairpinBySequenceMatching (GraphUtils.java:8059-8205): hairpins
    with unequal arms or internal folds that the suffix-fold scan misses."""

    @staticmethod
    def _rand(n, seed):
        return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)

    def test_unequal_arm_hairpin_trimmed(self):
        k = 25
        stem = self._rand(300, 3)
        # long arm + short folded-back arm (arm lengths differ 300 vs 150)
        hp = np.concatenate([stem, (3 - stem[::-1])[:150]]).astype(np.uint8)
        out = artifacts.trim_rc_artifact(hp, k=k)
        assert len(out) < len(hp)
        # the kept half must be a contiguous piece of the original
        assert len(out) >= len(hp) // 2 - k

    def test_internal_loop_hairpin_trimmed(self):
        k = 25
        stem = self._rand(260, 4)
        loop = self._rand(60, 5)  # short non-palindromic loop
        hp = np.concatenate([stem, loop, (3 - stem[::-1])]).astype(np.uint8)
        out = artifacts.trim_rc_artifact(hp, k=k)
        assert len(out) < len(hp)

    def test_clean_sequence_untouched(self):
        clean = self._rand(500, 6)
        out = artifacts.trim_rc_artifact(clean, k=25)
        assert np.array_equal(out, clean)


def test_blunt_end_depth_confirmation():
    """assemble_transcripts_batch's blunt screen requires the reference's
    depth confirmation (isBluntEndArtifact :8558-8580): the stub must be a
    graph DEAD END while an assembled continuation exists.  A stub that
    keeps extending in the graph is NOT an artifact even when the
    coverage/stub signature matches.

    Runs in a FRESH subprocess: after ~60% of the suite in one process,
    XLA-CPU intermittently segfaults while compiling this test's batch
    programs (observed twice at the same spot; not reproducible in
    isolation or smaller combinations) — process isolation sidesteps the
    compiler-state flakiness without losing the coverage."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, timeout=420, env=env, cwd=repo,
    )
    assert out.returncode == 0, f"subprocess failed:\n{(out.stderr or out.stdout)[-3000:]}"


def _blunt_end_depth_confirmation_main():
    import jax.numpy as jnp

    from rnabloom_tpu.bloom.filters import BloomConfig, CountingConfig, make_bloom
    from rnabloom_tpu.graph import dbg
    from rnabloom_tpu.assembly import transcripts as txmod

    rng = np.random.default_rng(55)
    k = 25
    cfg = dbg.GraphConfig(
        k=k, stranded=False,
        dbgbf=BloomConfig(16, 2),
        cbf=CountingConfig(16, 2, scratch_log2=16),
        pkbf=BloomConfig(16, 2), read_pair_distance=40,
    )
    scfg = BloomConfig(16, 2)

    base = rng.integers(0, 4, size=260, dtype=np.uint8)   # assembled transcript
    deep = rng.integers(0, 4, size=140, dtype=np.uint8)   # a real continuation
    cont = np.concatenate([base[:140], deep])             # branch at pos 140

    def batchify(rows, L):
        arr = np.full((len(rows), L), 4, np.uint8)
        lens = np.zeros(len(rows), np.int64)
        for i, r in enumerate(rows):
            arr[i, : len(r)] = r
            lens[i] = len(r)
        return arr, lens

    # graph: transcript at depth 8, continuation at depth 2 (hash every row)
    state = dbg.make_graph(cfg, with_rpkbf=True)
    rows = [base] * 8 + [cont] * 2
    arr, _ = batchify(rows, 416)
    state = dbg.build_step(state, cfg, jnp.asarray(arr), add_read_pairs=True)

    # screen holds ONLY the assembled transcript's k-mers
    screen = make_bloom(scfg)
    sarr, slens = batchify([base], 288)
    screen = txmod.screen_add(screen, scfg, cfg, jnp.asarray(sarr))

    params = txmod.TranscriptParams(
        min_transcript_length=50, max_edge_clip=20, frag_consistency=False,
    )

    # candidate A: assembled prefix + REAL deep continuation stub -> the
    # stub has graph depth, so the depth probe must NOT flag it
    candA = cont[: 140 + k + 25]  # 25 unassembled stub k-mers, deep in graph
    # candidate B: assembled prefix + junk stub that dead-ends
    junk = rng.integers(0, 4, size=25, dtype=np.uint8)
    candB = np.concatenate([base[: 140 + k - 1], junk])

    frags, lens = batchify([candA, candB], 288)
    txs, shorts, screen = txmod.assemble_transcripts_batch(
        state, cfg, screen, scfg, frags, lens, params
    )
    emitted = {sequtils.decode(t.codes) for t in txs} | {
        sequtils.decode(t.codes) for t in shorts
    }
    strA = sequtils.decode(candA)
    # A survives (its stub is a genuine graph path, depth >= max_edge_clip)
    assert any(strA in e or e in strA for e in emitted), "real continuation was screened"
    # B (dead-end stub over an assembled body) is flagged blunt: nothing
    # emitted may contain B's junk stub
    strJ = sequtils.decode(junk)
    assert not any(strJ in e for e in emitted), "dead-end stub survived the blunt screen"


if __name__ == "__main__":  # subprocess entry for the isolated depth test
    import jax

    jax.config.update("jax_platforms", "cpu")
    _blunt_end_depth_confirmation_main()
    print("ok")


def test_polya_finder_hand_labeled_fixtures():
    """Agreement on hand-labeled reads (VERDICT r4 item 8): planted tails
    with adapters at both ends, noisy tails at the profile identity floor,
    and decoys — ONT and ILLUMINA profiles (PolyATailFinder.java:70-89)."""
    rng = np.random.default_rng(99)
    body = "".join(rng.choice(list("CGT"), size=120))  # A-free body
    adapter5, adapter3 = "CTGTCGGTGCTG", "GCAATACGTCCG"

    # ONT: clean 30-A tail between body and 3' adapter
    read = adapter5 + body + "A" * 30 + adapter3
    codes = sequtils.encode(read)
    s, e = polya.find_polya_tail(codes, polya.ONT)
    want_s = len(adapter5) + len(body)
    assert abs(s - want_s) <= 2 and abs(e - (want_s + 30)) <= len(adapter3), (s, e)

    # ONT: 8%-error tail (1 non-A per ~12) still detected end-to-end
    tail = list("A" * 36)
    for p in (5, 17, 29):
        tail[p] = "G"
    read = body + "".join(tail)
    s, e = polya.find_polya_tail(sequtils.encode(read), polya.ONT)
    assert s <= len(body) + 2 and e >= len(read) - 2, (s, e)

    # ONT: no tail -> None; interior A-run outside the window -> None
    assert polya.find_polya_tail(sequtils.encode(body), polya.ONT) is None
    decoy = "A" * 20 + "".join(rng.choice(list("CGT"), size=150))
    assert polya.find_polya_tail(sequtils.encode(decoy), polya.ONT) is None

    # poly-T head on the antisense strand, with a 5' adapter
    read = adapter5 + "T" * 25 + sequtils.revcomp(body)
    head = polya.find_polyt_head(sequtils.encode(read), polya.ONT)
    assert head is not None
    assert abs(head[0] - len(adapter5)) <= len(adapter5), head
    oriented, had, flipped = polya.orient_long_read(sequtils.encode(read))
    assert had and flipped

    # ILLUMINA profile: short 6-A tail at the very end (seed 4, window 5)
    read = body + "AAAAAA"
    s, e = polya.find_polya_tail(sequtils.encode(read), polya.ILLUMINA)
    assert e == len(read) and s <= len(body) + 1, (s, e)
    # ...but the ONT profile (seed 12) rejects it
    assert polya.find_polya_tail(sequtils.encode(read), polya.ONT) is None


def test_pas_motifs_full_reference_set():
    """All 23 PAS hexamers (PolyATailFinder.java:29-34) hit inside the
    [cleavage-60, cleavage-5) search region and nowhere else."""
    rng = np.random.default_rng(5)
    for motif in polya.PAS_MOTIFS:
        body = "".join(rng.choice(list("CG"), size=80))  # motif-free
        seq = body[:40] + motif + body[40:66] + "A" * 30
        tail_start = len(seq) - 30
        hits = polya.find_pas_positions(seq, tail_start)
        assert 40 in hits, (motif, hits)
    # a motif closer than pas_search_end to the cleavage site is excluded
    seq = "".join(rng.choice(list("CG"), size=60)) + "AATAAA" + "AAA"
    assert polya.find_pas_positions(seq, len(seq) - 3) == []
