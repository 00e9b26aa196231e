"""CLI argument-semantics parity with the reference's inline tests
(`prog_opts.rs:568-691`) plus filter-group resolution
(`main.rs:70-178`)."""

import pytest

from oarfish_tpu.cli import build_parser, to_args, validate_modes
from oarfish_tpu.config import FilterGroup, Strand, resolve_filters


def parse(argv):
    p = build_parser()
    ns = p.parse_args(argv)
    args = to_args(ns)
    validate_modes(args, p)
    return args


def parse_fail(argv):
    with pytest.raises(SystemExit):
        parse(argv)


def test_allows_annotated_and_novel_together():
    args = parse([
        "--reads", "reads.fq.gz", "--annotated", "annotated.fa",
        "--novel", "novel.fa", "--seq-tech", "ont-cdna", "-o", "out",
    ])
    assert str(args.annotated) == "annotated.fa"
    assert str(args.novel) == "novel.fa"
    assert args.index is None


def test_rejects_index_with_raw_reference_fastas():
    parse_fail([
        "--reads", "reads.fq.gz", "--annotated", "annotated.fa",
        "--index", "transcripts.mmi", "--seq-tech", "ont-cdna", "-o", "out",
    ])


def test_genome_alignments_requires_annotation():
    parse_fail(["--genome-alignments", "aln.genome.bam", "-o", "out"])
    args = parse([
        "--genome-alignments", "aln.genome.bam", "--annotation", "anno.gtf",
        "-o", "out",
    ])
    assert str(args.genome_alignments) == "aln.genome.bam"
    assert str(args.annotation) == "anno.gtf"


def test_genome_reads_mode_parses_and_conflicts():
    parse([
        "--reads", "reads.fq.gz", "--genome", "genome.fa",
        "--annotation", "anno.gtf", "--seq-tech", "ont-cdna", "-o", "out",
    ])
    # in the reference --genome conflicts with a transcriptome --index
    parse_fail([
        "--reads", "reads.fq.gz", "--genome", "genome.fa",
        "--index", "txps.mmi", "--annotation", "anno.gtf",
        "--seq-tech", "ont-cdna", "-o", "out",
    ])


def test_score_prob_denom_rejected_in_genome_mode():
    args = parse([
        "--genome-alignments", "a.bam", "--annotation", "a.gtf", "-o", "o",
        "--score-prob-denom", "3.0",
    ])
    with pytest.raises(ValueError, match="genome"):
        resolve_filters(args)


def test_filter_group_resolution_no_filters():
    args = parse(["--alignments", "a.bam", "-o", "o",
                  "--filter-group", "no-filters"])
    fo = resolve_filters(args)
    assert fo.score_threshold == 0.0
    assert fo.min_aligned_fraction == 0.0
    assert fo.min_aligned_len == 1
    # explicit override survives the preset
    args = parse(["--alignments", "a.bam", "-o", "o",
                  "--filter-group", "no-filters", "-l", "99"])
    fo = resolve_filters(args)
    assert fo.min_aligned_len == 99 and fo.score_threshold == 0.0


def test_filter_group_resolution_nanocount():
    args = parse(["--alignments", "a.bam", "-o", "o",
                  "--filter-group", "nanocount-filters"])
    fo = resolve_filters(args)
    assert fo.three_prime_clip == 50
    assert fo.which_strand == Strand.FORWARD
    assert fo.score_threshold == pytest.approx(0.95)
    args = parse(["--alignments", "a.bam", "-o", "o",
                  "--filter-group", "nanocount-filters", "-t", "123"])
    fo = resolve_filters(args)
    assert fo.three_prime_clip == 123


def test_display_thresh_none_sentinel():
    import sys

    args = parse(["--alignments", "a.bam", "-o", "o",
                  "--display-thresh", "none"])
    assert args.display_thresh == sys.float_info.min
    parse_fail(["--alignments", "a.bam", "-o", "o",
                "--display-thresh", "1.5"])


def test_score_prob_denom_positive_only():
    parse_fail(["--alignments", "a.bam", "-o", "o",
                "--score-prob-denom", "0"])
    args = parse(["--alignments", "a.bam", "-o", "o",
                  "--score-prob-denom", "2.5"])
    assert resolve_filters(args).score_prob_denom == pytest.approx(2.5)
