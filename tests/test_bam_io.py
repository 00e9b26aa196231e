"""BAM/BGZF round-trip and header-verification tests."""

import numpy as np
import pytest

from oarfish_tpu.io import bam, bgzf


def test_bgzf_roundtrip(tmp_path):
    payload = bytes(np.random.default_rng(0).integers(0, 256, 300_000, dtype=np.uint8))
    p = tmp_path / "x.bgz"
    bgzf.write_bgzf(p, payload)
    assert bgzf.read_all(p) == payload
    assert b"".join(bgzf.iter_decompressed(p)) == payload
    # stdlib gzip can read BGZF (concatenated members)
    import gzip

    assert gzip.decompress(p.read_bytes()) == payload


def _write_fixture(path, program="minimap2", sort_order="unsorted"):
    recs = [
        dict(name="r1", flag=0, ref_id=0, pos=10, cigar="5S90M5S", seq="A" * 100,
             score=180),
        dict(name="r1", flag=bam.FLAG_SECONDARY, ref_id=1, pos=0, cigar="100M",
             seq="", score=150),
        dict(name="r2", flag=bam.FLAG_REVERSE, ref_id=1, pos=5, cigar="80M10D10M",
             seq="C" * 100, score=170, barcode="ACGT"),
        dict(name="r3", flag=bam.FLAG_UNMAPPED, ref_id=-1, pos=-1, cigar="",
             seq="G" * 50),
    ]
    bam.write_bam(path, ["t1", "t2"], [500, 300], recs, program=program,
                  sort_order=sort_order)


def test_bam_roundtrip(tmp_path):
    p = tmp_path / "x.bam"
    _write_fixture(p)
    r = bam.BamReader(p)
    assert r.header.ref_names == ["t1", "t2"]
    assert r.header.ref_lengths == [500, 300]
    assert r.header.programs() == ["minimap2"]
    assert r.header.sort_order() == "unsorted"
    recs = list(r.records())
    assert len(recs) == 4
    r1, r1b, r2, r3 = recs
    assert (r1.name, r1.ref_id, r1.pos, r1.ref_span, r1.seq_len, r1.score) == (
        "r1", 0, 10, 90, 100, 180)
    assert r1.aln_start == 11 and r1.aln_end == 100
    assert r1b.is_secondary and r1b.seq_len == 0
    assert r2.is_reverse and r2.ref_span == 100 and r2.barcode == b"ACGT"
    assert r3.is_unmapped and r3.score is None


def test_header_verification(tmp_path):
    p = tmp_path / "bad_sort.bam"
    _write_fixture(p, sort_order="coordinate")
    r = bam.BamReader(p)
    with pytest.raises(bam.BamFormatError, match="coordinate"):
        bam.verify_header(r.header, p)

    p2 = tmp_path / "bad_prog.bam"
    _write_fixture(p2, program="bwa")
    r2 = bam.BamReader(p2)
    with pytest.raises(bam.BamFormatError, match="validated aligner"):
        bam.verify_header(r2.header, p2)
    # genome mode does not restrict the aligner
    bam.verify_header(r2.header, p2, require_known_mapper=False)

    p3 = tmp_path / "ok.bam"
    _write_fixture(p3)
    r3 = bam.BamReader(p3)
    bam.verify_header(r3.header, p3)


def test_large_bam_many_blocks(tmp_path):
    # force records to straddle BGZF block boundaries
    recs = [
        dict(name=f"r{i}", flag=0, ref_id=0, pos=i % 400, cigar="100M",
             seq="ACGT" * 25, score=100 + (i % 50))
        for i in range(3000)
    ]
    p = tmp_path / "big.bam"
    bam.write_bam(p, ["t1"], [1000], recs)
    out = list(bam.BamReader(p).records())
    assert len(out) == 3000
    assert out[1234].name == "r1234"
    assert out[2999].score == 100 + (2999 % 50)
