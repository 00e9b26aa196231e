"""Genome read-projection mode end-to-end: synthetic genome + annotation,
spliced reads -> native spliced mapper -> projection -> quant."""

from pathlib import Path

import numpy as np
import pytest

from oarfish_tpu.cli import main
from oarfish_tpu.host import mapper as mp

pytestmark = pytest.mark.skipif(
    not mp.available(), reason="native mapper not built"
)


def make_genome(rng, n=30000):
    return bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))


@pytest.fixture(scope="module")
def genome_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("greads")
    rng = np.random.default_rng(9)
    genome = make_genome(rng)

    # TxA: exons [2001,4000], [6001,8000], [10001,12000] (+)
    # TxB: exons [2001,4000], [10001,12000] (+)  (skips the middle exon)
    gtf = d / "anno.gtf"
    gtf.write_text(
        'chr1\tt\texon\t2001\t4000\t.\t+\t.\ttranscript_id "TxA";\n'
        'chr1\tt\texon\t6001\t8000\t.\t+\t.\ttranscript_id "TxA";\n'
        'chr1\tt\texon\t10001\t12000\t.\t+\t.\ttranscript_id "TxA";\n'
        'chr1\tt\texon\t2001\t4000\t.\t+\t.\ttranscript_id "TxB";\n'
        'chr1\tt\texon\t10001\t12000\t.\t+\t.\ttranscript_id "TxB";\n'
    )
    gfa = d / "genome.fa"
    gfa.write_text(f">chr1\n{genome.decode()}\n")

    def tx_seq(exons):
        return b"".join(genome[s - 1 : e] for s, e in exons)

    seq_a = tx_seq([(2001, 4000), (6001, 8000), (10001, 12000)])
    seq_b = tx_seq([(2001, 4000), (10001, 12000)])

    reads = d / "reads.fa"
    with open(reads, "w") as fh:
        for i in range(30):  # TxA reads (full length)
            fh.write(f">ra{i}\n{seq_a.decode()}\n")
        for i in range(15):  # TxB reads
            fh.write(f">rb{i}\n{seq_b.decode()}\n")
    return d, gfa, gtf, reads


def test_genome_reads_cli(genome_fixture):
    d, gfa, gtf, reads = genome_fixture
    out = d / "o" / "q"
    rc = main([
        "--reads", str(reads), "--genome", str(gfa),
        "--annotation", str(gtf), "--seq-tech", "ont-cdna",
        "-o", str(out), "--junc-miss-discount", "0.3",
        "--em-dtype", "float64", "--quiet",
    ])
    assert rc == 0
    lines = Path(str(out) + ".quant").read_text().splitlines()
    got = {l.split("\t")[0]: float(l.split("\t")[2]) for l in lines[1:]}
    lens = {l.split("\t")[0]: int(l.split("\t")[1]) for l in lines[1:]}
    assert lens == {"TxA": 6000, "TxB": 4000}
    total = got["TxA"] + got["TxB"]
    assert total >= 40  # nearly all 45 reads quantified
    # TxA reads include the middle exon TxB lacks -> mostly assigned to TxA;
    # TxB reads carry the skip junction, discounted on TxA
    assert got["TxA"] == pytest.approx(30, abs=3)
    assert got["TxB"] == pytest.approx(15, abs=3)
    # junction BED side artifact
    assert (d / "o" / "q.annot_junctions.bed").exists()


def test_junction_hints_snap_block_edges(genome_fixture):
    """With annotated junctions loaded, the spliced chainer snaps block
    edges to the exact donor/acceptor instead of anchor resolution
    (reference: junction BED fed into the spliced aligner,
    main.rs:255-281)."""
    d, gfa, gtf, reads = genome_fixture
    from oarfish_tpu.genome.annotation import (
        junctions_from_transcripts,
        load_transcripts,
    )
    from oarfish_tpu.io.fasta import read_fasta_concat

    g_names, g_seqs = read_fasta_concat([gfa])
    genome = g_seqs[0]
    tx_seq = genome[2000:4000] + genome[6000:8000] + genome[10000:12000]

    def run(with_hints):
        m = mp.Mapper.from_sequences(g_names, g_seqs)
        if with_hints:
            juncs = junctions_from_transcripts(load_transcripts(gtf))
            assert m.set_junctions(juncs) == 3  # 2 from TxA + 1 from TxB
        hits = m.map_batch([tx_seq], best_n=5, spliced=True)
        s, e = int(hits.read_off[0]), int(hits.read_off[1])
        assert e > s, "read must map"
        best = s + int(np.argmax(hits.score[s:e]))
        bs = int(hits.block_off[best])
        be = int(hits.block_off[best + 1])
        return [(int(hits.block_s[j]), int(hits.block_e[j]))
                for j in range(bs, be)]

    blocks = run(with_hints=True)
    assert len(blocks) == 3
    # exact annotated exon boundaries at internal junctions (0-based)
    assert blocks[0][1] == 4000 and blocks[1][0] == 6000
    assert blocks[1][1] == 8000 and blocks[2][0] == 10000

    # without hints the chainer still finds 3 blocks but at anchor
    # resolution (edges within ~k+w of the truth, typically inexact)
    blocks_nh = run(with_hints=False)
    assert len(blocks_nh) == 3
    for (s0, e0), (lo, hi) in zip(
        blocks_nh, [(2000, 4000), (6000, 8000), (10000, 12000)]
    ):
        assert abs(s0 - lo) <= 30 and abs(e0 - hi) <= 30


def test_junction_bed_roundtrip(genome_fixture, tmp_path):
    """--junctions BED12 parses back to the same junction set the
    annotation derives."""
    d, gfa, gtf, reads = genome_fixture
    from oarfish_tpu.genome.annotation import (
        junctions_from_transcripts,
        load_transcripts,
        read_junction_bed,
        write_annotation_junction_bed,
    )

    transcripts = load_transcripts(gtf)
    bed = tmp_path / "j.bed"
    write_annotation_junction_bed(transcripts, bed)
    got = read_junction_bed(bed)
    want = junctions_from_transcripts(transcripts)
    assert got == want


def test_genome_prebuilt_index_roundtrip(genome_fixture, tmp_path):
    """--genome accepts a prebuilt index (the reference's --genome takes
    'a genome FASTA or prebuilt genome index', prog_opts.rs:335-341):
    build + persist with --index-out during one quantification, then
    re-quantify passing the index as --genome — outputs byte-identical,
    including the rescue path (RescueDb rebuilt from the index's
    embedded sequences)."""
    d, gfa, gtf, reads = genome_fixture
    out1 = tmp_path / "fasta_run" / "q"
    idx = tmp_path / "genome.otmi"
    rc = main([
        "--reads", str(reads), "--genome", str(gfa),
        "--annotation", str(gtf), "--seq-tech", "ont-cdna",
        "-o", str(out1), "--junc-miss-discount", "0.3",
        "--em-dtype", "float64", "--index-out", str(idx), "--quiet",
    ])
    assert rc == 0
    assert idx.exists()

    out2 = tmp_path / "index_run" / "q"
    rc = main([
        "--reads", str(reads), "--genome", str(idx),
        "--annotation", str(gtf), "--seq-tech", "ont-cdna",
        "-o", str(out2), "--junc-miss-discount", "0.3",
        "--em-dtype", "float64", "--quiet",
    ])
    assert rc == 0
    q1 = Path(str(out1) + ".quant").read_bytes()
    q2 = Path(str(out2) + ".quant").read_bytes()
    assert q1 == q2


def test_native_projection_byte_identical(genome_fixture, tmp_path,
                                          monkeypatch):
    """The native projection engine must reproduce the Python path's
    outputs BYTE-identically (same records, same per-read order) —
    OARFISH_PROJECT_NATIVE=0 forces the Python oracle."""
    from oarfish_tpu.genome import project_native as pn

    if not pn.available():
        pytest.skip("native projection not built")
    d, gfa, gtf, reads = genome_fixture
    outs = {}
    for label, env in (("native", "1"), ("python", "0")):
        monkeypatch.setenv("OARFISH_PROJECT_NATIVE", env)
        out = tmp_path / label / "q"
        rc = main([
            "--reads", str(reads), "--genome", str(gfa),
            "--annotation", str(gtf), "--seq-tech", "ont-cdna",
            "-o", str(out), "--junc-miss-discount", "0.3",
            "--em-dtype", "float64", "--quiet",
        ])
        assert rc == 0
        outs[label] = Path(str(out) + ".quant").read_bytes()
    assert outs["native"] == outs["python"]


def test_batch_filter_byte_identical(genome_fixture, tmp_path, monkeypatch):
    """The vectorized `filter_projected_batch` path must reproduce the
    per-read filter loop's outputs byte-identically, including the
    discard table (OARFISH_BATCH_FILTER=0 forces the loop oracle)."""
    import json

    d, gfa, gtf, reads = genome_fixture
    outs = {}
    for label, env in (("batch", "1"), ("loop", "0")):
        monkeypatch.setenv("OARFISH_BATCH_FILTER", env)
        out = tmp_path / label / "q"
        rc = main([
            "--reads", str(reads), "--genome", str(gfa),
            "--annotation", str(gtf), "--seq-tech", "ont-cdna",
            "-o", str(out), "--em-dtype", "float64", "--quiet",
        ])
        assert rc == 0
        outs[label] = (
            Path(str(out) + ".quant").read_bytes(),
            json.loads(
                Path(str(out) + ".meta_info.json").read_text()
            ).get("discard_table"),
        )
    assert outs["batch"][0] == outs["loop"][0]
    assert outs["batch"][1] == outs["loop"][1]
