"""AlignmentFilters semantics vs the reference's check order and
score→probability conversion (`oarfish_types.rs:955-1130`)."""

import numpy as np

from oarfish_tpu.config import FilterOpts, Strand
from oarfish_tpu.host.filters import DiscardTable, filter_group
from oarfish_tpu.io.bam import BamRecord


def rec(name="r", flag=0, ref_id=0, pos=0, ref_span=100, seq_len=100, score=100,
        barcode=None):
    return BamRecord(name, flag, ref_id, pos, ref_span, seq_len, score, barcode)


TXP_LEN = np.array([1000, 500], dtype=np.int64)


def test_score_prob_conversion():
    opts = FilterOpts()
    d = DiscardTable()
    g = [rec(score=200), rec(score=195, ref_id=1, pos=1)]
    out = filter_group(opts, d, TXP_LEN, g)
    assert out is not None and len(out.txp_id) == 2
    # prob = exp((score - best)/5) in f32
    np.testing.assert_allclose(
        out.prob, [1.0, np.float32(np.exp(np.float32(-5.0) / np.float32(5.0)))],
        rtol=1e-6)
    assert d.valid_best_aln == 1


def test_score_threshold_discard():
    opts = FilterOpts(score_threshold=0.95)
    d = DiscardTable()
    g = [rec(score=200), rec(score=100, ref_id=1)]
    out = filter_group(opts, d, TXP_LEN, g)
    assert len(out.txp_id) == 1
    assert d.discard_score == 1


def test_strand_filter():
    opts = FilterOpts(which_strand=Strand.FORWARD)
    d = DiscardTable()
    g = [rec(score=200), rec(flag=0x10, score=199, ref_id=1)]
    out = filter_group(opts, d, TXP_LEN, g)
    assert len(out.txp_id) == 1 and d.discard_ori == 1

    opts = FilterOpts(which_strand=Strand.REVERSE)
    d = DiscardTable()
    out = filter_group(opts, d, TXP_LEN, g)
    assert len(out.txp_id) == 1 and out.is_reverse.all() and d.discard_ori == 1


def test_supplementary_and_min_len():
    opts = FilterOpts(min_aligned_len=50)
    d = DiscardTable()
    g = [rec(score=200), rec(flag=0x800, score=300), rec(ref_span=49, score=290)]
    out = filter_group(opts, d, TXP_LEN, g)
    assert len(out.txp_id) == 1
    assert d.discard_supp == 1 and d.discard_aln_len == 1
    # the supplementary score-300 record must not anchor the best score
    np.testing.assert_allclose(out.prob, [1.0])


def test_three_five_prime_clip():
    # 3' filter drops alignments ending too far from the transcript 3' end
    opts = FilterOpts(three_prime_clip=50)
    d = DiscardTable()
    # txp 0 len 1000: end must be > 1000-50=950
    g = [rec(pos=900, ref_span=60, score=200),  # end=960 ok
         rec(pos=800, ref_span=100, score=195)]  # end=900 <= 950 dropped
    out = filter_group(opts, d, TXP_LEN, g)
    assert len(out.txp_id) == 1 and d.discard_3p == 1

    opts = FilterOpts(five_prime_clip=10)
    d = DiscardTable()
    g = [rec(pos=5, score=200),  # start=6 < 10 ok
         rec(pos=20, score=195)]  # start=21 >= 10 dropped
    out = filter_group(opts, d, TXP_LEN, g)
    assert len(out.txp_id) == 1 and d.discard_5p == 1


def test_no_valid_alignment_cases():
    opts = FilterOpts()
    # nonpositive best score => no_valid_aln
    d = DiscardTable()
    assert filter_group(opts, d, TXP_LEN, [rec(score=0)]) is None
    assert d.no_valid_aln == 1
    # missing AS tag (score None -> i32::MIN) => no_valid_aln
    d = DiscardTable()
    assert filter_group(opts, d, TXP_LEN, [rec(score=None)]) is None
    assert d.no_valid_aln == 1
    # all records unmapped => no_mapping
    d = DiscardTable()
    assert filter_group(opts, d, TXP_LEN, [rec(flag=0x4)]) is None
    assert d.no_mapping == 1


def test_aligned_fraction_on_best():
    opts = FilterOpts(min_aligned_fraction=0.5, min_aligned_len=10)
    d = DiscardTable()
    # best-scoring alignment covers only 40/100 of the read -> whole read dropped
    g = [rec(ref_span=40, seq_len=100, score=200),
         rec(ref_span=90, seq_len=0, score=150, ref_id=1)]
    out = filter_group(opts, d, TXP_LEN, g)
    assert out is None and d.discard_aln_frac == 1
    # fraction uses the FIRST record's seq_len (secondary records carry none)
    d = DiscardTable()
    g = [rec(ref_span=90, seq_len=100, score=200),
         rec(ref_span=40, seq_len=0, score=195, ref_id=1)]
    out = filter_group(opts, d, TXP_LEN, g)
    assert out is not None and len(out.txp_id) == 2
