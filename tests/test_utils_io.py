"""Sequence/alignment utilities and IO round trips."""

import numpy as np

from rnabloom_tpu.io import fastx, nbits, paf
from rnabloom_tpu.utils import align, seq as sequtils

RNG = np.random.default_rng(4)


def rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


def test_banded_edit_distance():
    a = sequtils.encode("ACGTACGTAC")
    assert align.banded_edit_distance(a, a) == 0
    b = sequtils.encode("ACGAACGTAC")  # 1 substitution
    assert align.banded_edit_distance(a, b) == 1
    c = sequtils.encode("ACGTACGTACG")  # 1 insertion
    assert align.banded_edit_distance(a, c) == 1
    d = sequtils.encode("ACGACGTAC")  # 1 deletion
    assert align.banded_edit_distance(a, d) == 1


def test_percent_identity():
    s = rand_seq(200)
    a = sequtils.encode(s)
    assert align.percent_identity(a, a) == 1.0
    mutated = list(s)
    for i in range(0, 200, 20):
        mutated[i] = "ACGT"[(("ACGT".index(mutated[i])) + 1) % 4]
    b = sequtils.encode("".join(mutated))
    pid = align.percent_identity(a, b)
    assert 0.93 <= pid <= 0.96


def test_homopolymer_compress():
    a = sequtils.encode("AAACCCGGGTTTA")
    assert sequtils.decode(align.homopolymer_compress(a)) == "ACGTA"


def test_intervals():
    assert align.overlap_size((0, 10), (5, 20)) == 5
    assert align.merge_intervals([(0, 5), (3, 8), (10, 12)]) == [(0, 8), (10, 12)]
    assert align.is_dovetail((50, 100), 100, (0, 50), 200, 10)


def test_fastq_fasta_roundtrip(tmp_path):
    fq = str(tmp_path / "x.fq.gz")
    import gzip

    with gzip.open(fq, "wt") as f:
        f.write("@r1 extra\nACGTACGT\n+\nIIIIIIII\n@r2\nGGGGCCCC\n+\nIIIIIIII\n")
    recs = list(fastx.read_fastq(fq))
    assert recs == [("r1", "ACGTACGT", "IIIIIIII"), ("r2", "GGGGCCCC", "IIIIIIII")]
    assert fastx.sniff_format(fq) == "fastq"

    fa = str(tmp_path / "y.fa")
    with fastx.FastaWriter(fa, wrap=4) as w:
        w.write("a", "ACGTACGTA", "c=1")
    assert list(fastx.read_fasta(fa)) == [("a", "ACGTACGTA")]


def test_nbits_roundtrip(tmp_path):
    path = str(tmp_path / "f.nbits")
    seqs = [rand_seq(n) for n in (1, 4, 5, 100)]
    with nbits.NbitsWriter(path) as w:
        for s in seqs:
            w.write(s)
    assert list(nbits.read_nbits(path)) == seqs


def test_paf_roundtrip(tmp_path):
    rec = paf.PafRecord(
        qname="q", qlen=100, qstart=0, qend=90, strand="+", tname="t",
        tlen=120, tstart=10, tend=100, num_match=85, block_len=90, mapq=60,
        tags={"cg": "40M2D50M"},
    )
    path = str(tmp_path / "o.paf")
    paf.write_paf(path, [rec])
    back = list(paf.read_paf(path))[0]
    assert back.qname == "q" and back.tend == 100
    assert back.max_indel() == 2
    assert paf.has_good_overlap(back, 0.9)
    assert paf.has_good_alignment(back, 5, 0.9)
    assert not paf.has_good_alignment(back, 1, 0.9)


def test_banded_vs_full_dp():
    def full_dp(a, b):
        n, m = len(a), len(b)
        D = np.zeros((n + 1, m + 1), np.int32)
        D[:, 0] = np.arange(n + 1)
        D[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i, j] = min(
                    D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                    D[i - 1, j] + 1,
                    D[i, j - 1] + 1,
                )
        return int(D[n, m])

    for _ in range(30):
        n = int(RNG.integers(1, 40))
        a = RNG.integers(0, 4, n).astype(np.uint8)
        b = a.copy().tolist()
        for _ in range(int(RNG.integers(0, 5))):
            op = RNG.integers(3)
            p = int(RNG.integers(0, max(len(b), 1)))
            if op == 0 and b:
                b[p % len(b)] = int(RNG.integers(4))
            elif op == 1:
                b.insert(p, int(RNG.integers(4)))
            elif b:
                del b[p % len(b)]
        b = np.asarray(b, np.uint8)
        assert align.banded_edit_distance(a, b, band=12) == full_dp(a, b)


def test_k_spec_parsing():
    from rnabloom_tpu.utils import kselect

    assert kselect.parse_k_spec("25") == [25]
    assert kselect.parse_k_spec("25,26,30-50:5") == [25, 26, 30, 35, 40, 45, 50]
    assert kselect.parse_k_spec("17-21") == [17, 18, 19, 20, 21]


def test_k_selection(tmp_path):
    from rnabloom_tpu.utils import kselect

    # high-coverage reads: larger k keeps more non-singletons than tiny k?
    # sanity: selection returns one of the candidates and runs end to end
    path = str(tmp_path / "r.fa")
    with open(path, "w") as f:
        t = rand_seq(500)
        for i in range(20):
            f.write(f">r{i}\n{t[i*10:i*10+200]}\n")
    k = kselect.select_k([path], [17, 25, 33], sample_size=100)
    assert k in (17, 25, 33)


def test_cli_parser():
    from rnabloom_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(
        ["-left", "l.fq", "-right", "r.fq", "-k", "25,31", "-mem", "0.5",
         "-sensitive", "-savebf", "-Q", "20"]
    )
    assert a.left == "l.fq" and a.kmer == "25,31"
    assert a.sensitive and a.savebf and a.qual_avg == 20
    a2 = p.parse_args(["-long", "x.fa", "y.fa", "-lrpb"])
    assert a2.long_reads == ["x.fa", "y.fa"] and a2.lrpb


def test_pool_list_parsing(tmp_path):
    from rnabloom_tpu.assembly.pipeline import parse_pool_list

    f = tmp_path / "pool.txt"
    f.write_text("# comment\nA a_1.fq a_2.fq\n\nB b_1.fq b_2.fq\n")
    assert parse_pool_list(str(f)) == [
        ("A", "a_1.fq", "a_2.fq", (), ()), ("B", "b_1.fq", "b_2.fq", (), ())
    ]
    # 5-column form with sef/ser lists and '-' placeholders
    # (getPooledReadPaths, RNABloom.java:5066-5224)
    f.write_text(
        "#name left right sef ser\n"
        "A a_1.fq a_2.fq a_se1.fq,a_se2.fq -\n"
        "B b_1.fq b_2.fq - b_ser.fq\n"
    )
    assert parse_pool_list(str(f)) == [
        ("A", "a_1.fq", "a_2.fq", ("a_se1.fq", "a_se2.fq"), ()),
        ("B", "b_1.fq", "b_2.fq", (), ("b_ser.fq",)),
    ]


def test_ntcard_histogram_parser(tmp_path):
    from rnabloom_tpu.utils import kselect

    p = tmp_path / "k25.hist"
    p.write_text("F1\t1000000\nF0\t50000\n1\t30000\n2\t5000\n3\t6000\n4\t4000\n")
    h = kselect.NTCardHistogram(str(p))
    assert h.num_unique == 50000
    assert h.num_singletons == 30000
    assert h.f1 == 1000000
    # first local minimum after the error spike: counts rise from 2 to 3
    assert h.min_cov_threshold() == 2


def test_expected_kmers_sizing():
    from rnabloom_tpu.assembly import stage1

    cfg = stage1.default_graph_config(
        25, False, 1 << 30, expected_num_kmers=1_000_000
    )
    # ~1M keys at 1% FPR with h=2 needs ~2^24 cells -> pow2-rounded
    assert 23 <= cfg.cbf.size_log2 <= 25
    assert cfg.dbgbf.size_log2 == cfg.cbf.size_log2


def test_per_filter_overrides():
    from rnabloom_tpu.assembly import stage1

    cfg = stage1.default_graph_config(
        25, False, 1 << 30,
        dbgbf_hash=3, cbf_hash=4, pkbf_hash=5,
        dbgbf_mem_bytes=1 << 20, cbf_mem_bytes=1 << 22, pkbf_mem_bytes=1 << 21,
    )
    assert cfg.dbgbf.num_hash == 3 and cfg.dbgbf.size_log2 == 20
    # -cm bytes buy cells at the counter's cell width (mf8 default: 1 B/cell,
    # the reference's memory model)
    assert cfg.cbf.num_hash == 4 and cfg.cbf.size_log2 == 22
    assert cfg.pkbf.num_hash == 5 and cfg.pkbf.size_log2 == 21


def test_cli_parses_reference_option_surface():
    from rnabloom_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args([
        "-left", "1.fq", "-right", "2.fq", "-sh", "3", "-dm", "0.5",
        "-c", "2", "-e", "1", "-grad", "0.4", "-indel", "2", "-p", "0.95",
        "-lookahead", "5", "-tiplength", "20", "-extend", "-nofc",
        "-artifact", "-chimera", "-stratum", "e2", "-a", "12",
        "-n", "asm", "-prefix", "S1_", "-norr", "-stage", "2",
        "-fpr", "0.05", "-sample", "500",
    ])
    assert a.sbf_hash == 3 and a.dbgbf_mem == 0.5
    assert a.mincov == 2 and a.errcorritr == 1 and a.maxcovgrad == 0.4
    assert a.stratum == "e2" and a.polya == 12 and a.stage == 2


def test_cli_at_file_indirection(tmp_path):
    """`@list` inputs expand to the file's lines (RNABloom.java:5786-5792)."""
    from rnabloom_tpu import cli

    lst = tmp_path / "reads.txt"
    lst.write_text("a.fa\nb.fa\n\n")
    assert cli._expand_at([f"@{lst}", "c.fa"]) == ["a.fa", "b.fa", "c.fa"]
    assert cli._expand_at("x.fq") == "x.fq"
    one = tmp_path / "one.txt"
    one.write_text("only.fq\n")
    assert cli._expand_at(f"@{one}") == "only.fq"
    import pytest

    with pytest.raises(SystemExit):
        cli._expand_at(f"@{lst}")  # two paths for a single-file option
