"""Genome-projection mode: annotation parsing, exon-chain projection,
junction discounting, and the CLI end-to-end."""

import json
from pathlib import Path

import numpy as np
import pytest

from oarfish_tpu.cli import main
from oarfish_tpu.config import FilterOpts, ProjProbSource
from oarfish_tpu.genome.annotation import (
    load_transcripts,
    write_annotation_junction_bed,
)
from oarfish_tpu.genome.g2t import G2TIndex
from oarfish_tpu.genome.project import (
    GenomicAlignment,
    filter_projected,
    project_alignment,
    project_group,
)
from oarfish_tpu.host.filters import DiscardTable
from oarfish_tpu.io import bam

GTF = """\
chr1\ttest\texon\t101\t200\t.\t+\t.\tgene_id "gA"; transcript_id "TxA";
chr1\ttest\texon\t301\t400\t.\t+\t.\tgene_id "gA"; transcript_id "TxA";
chr1\ttest\texon\t501\t600\t.\t+\t.\tgene_id "gA"; transcript_id "TxA";
chr1\ttest\texon\t101\t200\t.\t+\t.\tgene_id "gA"; transcript_id "TxB";
chr1\ttest\texon\t501\t600\t.\t+\t.\tgene_id "gA"; transcript_id "TxB";
chr1\ttest\texon\t1001\t1100\t.\t-\t.\tgene_id "gC"; transcript_id "TxC";
chr1\ttest\texon\t1201\t1300\t.\t-\t.\tgene_id "gC"; transcript_id "TxC";
"""


@pytest.fixture()
def gtf_file(tmp_path):
    p = tmp_path / "anno.gtf"
    p.write_text(GTF)
    return p


@pytest.fixture()
def g2t(gtf_file):
    txs = load_transcripts(gtf_file)
    return G2TIndex(txs, ["chr1"])


def test_annotation_loading(gtf_file):
    txs = load_transcripts(gtf_file)
    assert [t.id for t in txs] == ["TxA", "TxB", "TxC"]
    assert txs[0].exonic_length == 300
    assert txs[1].exonic_length == 200
    assert txs[2].strand == "-"


def test_junction_bed(gtf_file, tmp_path):
    txs = load_transcripts(gtf_file)
    bed = tmp_path / "j.bed"
    n = write_annotation_junction_bed(txs, bed)
    assert n == 3
    line = bed.read_text().splitlines()[0].split("\t")
    assert line[0] == "chr1" and line[1] == "100" and line[2] == "600"
    assert line[9] == "3" and line[10] == "100,100,100,"


def test_project_three_exon_read(g2t):
    # read matching TxA's structure exactly
    aln = GenomicAlignment(
        ref_id=0, ref_start=101, is_reverse=False,
        cigar=[(100, 0), (100, 3), (100, 0), (100, 3), (100, 0)],
        read_len=300,
    )
    recs = {r.ref_id: r for r in project_alignment(aln, g2t)}
    a, b = recs[0], recs[1]
    assert a.similarity == pytest.approx(1.0)
    assert (a.start, a.end, a.aligned_len) == (1, 300, 300)
    assert b.similarity == pytest.approx(200.0 / 300.0)
    assert not a.is_reverse


def test_junction_discount_breaks_tie(g2t):
    # read matching TxB's structure: also a perfect exonic match for TxA,
    # but with a junction TxA doesn't have
    aln = GenomicAlignment(
        ref_id=0, ref_start=101, is_reverse=False,
        cigar=[(100, 0), (300, 3), (100, 0)], read_len=200,
    )
    recs = {r.ref_id: r for r in project_alignment(aln, g2t)}
    # round 5: the similarity denominator includes the projected
    # transcript span, so the intron spanning TxA's retained middle
    # exon charges its 100 skipped bases even with the discount off
    # (200 matched / 300 span) — junction evidence discriminates by
    # default; see genome/project.py docstring
    assert recs[0].similarity == pytest.approx(200 / 300)
    assert recs[1].similarity == pytest.approx(1.0)
    recs = {r.ref_id: r for r in project_alignment(aln, g2t, 0.5)}
    assert recs[0].similarity == pytest.approx(0.5 * 200 / 300)
    assert recs[1].similarity == pytest.approx(1.0)  # TxB intact


def test_reverse_strand_transcript_coords(g2t):
    aln = GenomicAlignment(
        ref_id=0, ref_start=1001, is_reverse=True,
        cigar=[(100, 0), (100, 3), (100, 0)], read_len=200,
    )
    recs = {r.ref_id: r for r in project_alignment(aln, g2t)}
    c = recs[2]
    assert (c.start, c.end) == (1, 200)
    # reverse read on a reverse-strand transcript reads in transcript sense
    assert c.is_reverse is False


def test_filter_projected_semantics(g2t):
    tlens = g2t.transcript_lengths()
    aln = GenomicAlignment(
        ref_id=0, ref_start=101, is_reverse=False,
        cigar=[(100, 0), (300, 3), (100, 0)], read_len=200,
    )
    recs = project_group([aln], g2t, 0.5)
    d = DiscardTable()
    fg = filter_projected(
        FilterOpts(score_threshold=0.9), d, tlens, recs, 200, 10.0,
        ProjProbSource.SIMILARITY,
    )
    # TxA (sim 0.5) fails the 0.9 similarity threshold; TxB kept at prob 1
    assert list(fg.txp_id) == [1]
    np.testing.assert_allclose(fg.prob, [1.0])
    assert d.discard_score == 1 and d.valid_best_aln == 1


def make_genome_bam(path, reads):
    recs = []
    for name, pos0, cigar, flag, score in reads:
        recs.append(
            dict(name=name, flag=flag, ref_id=0, pos=pos0, cigar=cigar,
                 seq="A" * 200, score=score)
        )
    bam.write_bam(path, ["chr1"], [5000], recs, program="minimap2")


def test_genome_mode_cli(gtf_file, tmp_path):
    p = tmp_path / "genome.bam"
    reads = []
    # 12 reads matching TxA's 3-exon structure; 6 matching TxB's skip
    for i in range(12):
        reads.append((f"ra{i}", 100, "100M100N100M100N100M", 0, 280))
    for i in range(6):
        reads.append((f"rb{i}", 100, "100M300N100M", 0, 190))
    # 4 reverse reads on TxC
    for i in range(4):
        reads.append((f"rc{i}", 1000, "100M100N100M", 0x10, 190))
    make_genome_bam(p, reads)

    out = tmp_path / "g" / "q"
    rc = main([
        "--genome-alignments", str(p), "--annotation", str(gtf_file),
        "-o", str(out), "--junc-miss-discount", "0.5",
        "--em-dtype", "float64", "--quiet",
    ])
    assert rc == 0
    lines = Path(str(out) + ".quant").read_text().splitlines()
    assert lines[0] == "tname\tlen\tnum_reads"
    got = {l.split("\t")[0]: float(l.split("\t")[2]) for l in lines[1:]}
    lens = {l.split("\t")[0]: int(l.split("\t")[1]) for l in lines[1:]}
    assert lens == {"TxA": 300, "TxB": 200, "TxC": 200}
    # the 3-exon reads are TxA-unique (TxB fails the score threshold);
    # skip reads go to TxB (TxA discounted); reverse reads to TxC
    assert got["TxA"] == pytest.approx(12.0, abs=1e-6)
    assert got["TxB"] == pytest.approx(6.0, abs=1e-6)
    assert got["TxC"] == pytest.approx(4.0, abs=1e-6)
    meta = json.loads(Path(str(out) + ".meta_info.json").read_text())
    assert "transcriptome_digest" in meta["digest"]


def test_native_projection_byte_identical_bam_mode(gtf_file, tmp_path,
                                                   monkeypatch):
    """Genome-BAM mode through the native projection engine must match
    the Python oracle byte-for-byte, including soft-clip rescue via
    --genome-fasta."""
    from oarfish_tpu.genome import project_native as pn

    if not pn.available():
        pytest.skip("native projection not built")
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 5000))
    gfa = tmp_path / "genome.fa"
    gfa.write_text(f">chr1\n{genome}\n")

    p = tmp_path / "genome.bam"
    recs = []
    for i in range(10):
        # exon-1 read whose tail soft-clips 40bp past the junction;
        # the clip continues as TxA's exon 2 (rescue discriminates)
        seq = genome[120:200] + genome[300:340]
        recs.append(dict(name=f"sa{i}", flag=0, ref_id=0, pos=120,
                         cigar="80M40S", seq=seq, score=100))
        # and one clipping into TxB's exon (skip junction)
        seq = genome[120:200] + genome[500:540]
        recs.append(dict(name=f"sb{i}", flag=0, ref_id=0, pos=120,
                         cigar="80M40S", seq=seq, score=100))
    for i in range(8):
        recs.append(dict(name=f"fa{i}", flag=0, ref_id=0, pos=100,
                         cigar="100M100N100M100N100M", seq="A" * 300,
                         score=280))
    bam.write_bam(p, ["chr1"], [5000], recs, program="minimap2")

    outs = {}
    for label, env in (("native", "1"), ("python", "0")):
        monkeypatch.setenv("OARFISH_PROJECT_NATIVE", env)
        out = tmp_path / label / "q"
        rc = main([
            "--genome-alignments", str(p), "--annotation", str(gtf_file),
            "--genome-fasta", str(gfa),
            "-o", str(out), "--junc-miss-discount", "0.5",
            "--em-dtype", "float64", "--quiet",
        ])
        assert rc == 0
        outs[label] = Path(str(out) + ".quant").read_bytes()
    assert outs["native"] == outs["python"]


def test_batch_filter_byte_identical_bam_mode(gtf_file, tmp_path,
                                              monkeypatch):
    """Genome-BAM mode through the vectorized filter must match the
    per-read loop byte-for-byte (OARFISH_BATCH_FILTER=0 pins the
    oracle)."""
    p = tmp_path / "genome.bam"
    reads = []
    for i in range(12):
        reads.append((f"ra{i}", 100, "100M100N100M100N100M", 0, 280))
    for i in range(6):
        reads.append((f"rb{i}", 100, "100M300N100M", 0, 190))
    for i in range(4):
        reads.append((f"rc{i}", 1000, "100M100N100M", 0x10, 190))
    make_genome_bam(p, reads)

    outs = {}
    for label, env in (("batch", "1"), ("loop", "0")):
        monkeypatch.setenv("OARFISH_BATCH_FILTER", env)
        out = tmp_path / label / "q"
        rc = main([
            "--genome-alignments", str(p), "--annotation", str(gtf_file),
            "-o", str(out), "--junc-miss-discount", "0.5",
            "--em-dtype", "float64", "--quiet",
        ])
        assert rc == 0
        outs[label] = (
            Path(str(out) + ".quant").read_bytes(),
            json.loads(Path(str(out) + ".meta_info.json").read_text())
            .get("discard_table"),
        )
    assert outs["batch"][0] == outs["loop"][0]
    assert outs["batch"][1] == outs["loop"][1]


def test_filter_projected_batch_empty_segments(g2t):
    """Edge cases for the vectorized filter: zero candidates total, and
    reads with zero candidates among populated ones."""
    import numpy as np

    from oarfish_tpu.config import FilterOpts, ProjProbSource
    from oarfish_tpu.genome.project import filter_projected_batch
    from oarfish_tpu.host.filters import DiscardTable

    tlens = g2t.transcript_lengths()
    opts = FilterOpts()
    # all-empty
    kept, prob, ok = filter_projected_batch(
        opts, DiscardTable(), tlens, np.array([0, 0, 0], np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0),
        np.zeros(0, np.int64), np.zeros(0, bool),
        np.array([100, 100], np.int64), 10.0, ProjProbSource.SIMILARITY)
    assert len(kept) == 0 and not ok.any()
    # read 0 empty, read 1 has one good candidate
    kept, prob, ok = filter_projected_batch(
        opts, DiscardTable(), tlens, np.array([0, 0, 1], np.int64),
        np.array([0], np.int64), np.array([1], np.int64),
        np.array([200], np.int64), np.array([180], np.int64),
        np.array([0.9]), np.array([100], np.int64),
        np.array([False]), np.array([200, 200], np.int64),
        10.0, ProjProbSource.SIMILARITY)
    assert list(ok) == [False, True]
    assert list(kept) == [True]
