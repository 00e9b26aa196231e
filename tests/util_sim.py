"""Shared test simulator: synthesizes name-collated BAM fixtures with
multimapping alignment groups and AS scores (the reference bundles no BAM,
SURVEY §4 — fixtures are generated).

Transcript names/lengths come from the bundled SIRV FASTA under
/root/reference/test_data when present, else a synthetic set.
"""

from pathlib import Path

import numpy as np

from oarfish_tpu.io import bam

SIRV_FASTA = Path(
    "/root/reference/test_data/SIRV_isoforms_multi-fasta_170612a.fasta"
)


def load_sirv_lengths():
    if not SIRV_FASTA.exists():
        return (
            [f"SYN{i}" for i in range(20)],
            list(np.random.default_rng(0).integers(400, 3000, 20)),
        )
    names, lengths = [], []
    cur = None
    ln = 0
    with open(SIRV_FASTA) as fh:
        for line in fh:
            if line.startswith(">"):
                if cur is not None:
                    names.append(cur)
                    lengths.append(ln)
                cur = line[1:].split()[0]
                ln = 0
            else:
                ln += len(line.strip())
    if cur is not None:
        names.append(cur)
        lengths.append(ln)
    return names, lengths


def simulate_bam(
    path,
    num_reads=1000,
    seed=0,
    truth=None,
    barcodes=None,
    secondary_rate=0.6,
    names=None,
    lengths=None,
    keep=None,
):
    """Simulate a name-collated transcriptome BAM. Returns (names, lengths,
    truth). With `barcodes`, emits CB tags grouped by barcode (CB-collated).
    `keep(rid) -> bool` writes only selected reads while drawing the SAME
    rng stream as the unfiltered call — the same seed with complementary
    filters yields disjoint shards of one identical read universe (the
    multi-host sharded-ingest fixtures)."""
    rng = np.random.default_rng(seed)
    if names is None:
        names, lengths = load_sirv_lengths()
    T = len(names)
    if truth is None:
        truth = rng.dirichlet(np.ones(T) * 0.8)

    def make_read_records(rid, bc=None):
        t = int(rng.choice(T, p=truth))
        L = int(lengths[t])
        span = int(rng.integers(max(60, L // 3), L + 1))
        pos = int(rng.integers(0, L - span + 1))
        score = int(span * 2 - rng.integers(0, span // 4 + 1))
        recs = [
            dict(
                name=f"read{rid}",
                flag=0,
                ref_id=t,
                pos=pos,
                cigar=f"{span}M",
                seq="A" * span,
                score=score,
                **({"barcode": bc} if bc else {}),
            )
        ]
        while rng.random() < secondary_rate and len(recs) < 5:
            t2 = int(rng.integers(0, T))
            L2 = int(lengths[t2])
            span2 = min(span, L2)
            pos2 = int(rng.integers(0, L2 - span2 + 1))
            s2 = score - int(rng.integers(0, max(2, score // 10)))
            recs.append(
                dict(
                    name=f"read{rid}",
                    flag=bam.FLAG_SECONDARY,
                    ref_id=t2,
                    pos=pos2,
                    cigar=f"{span2}M",
                    seq="",
                    score=s2,
                    **({"barcode": bc} if bc else {}),
                )
            )
        return recs

    records = []
    if barcodes is None:
        for r in range(num_reads):
            recs = make_read_records(r)
            if keep is None or keep(r):
                records.extend(recs)
    else:
        rid = 0
        for bc in barcodes:
            n_bc = max(1, num_reads // len(barcodes))
            for _ in range(n_bc):
                records.extend(make_read_records(rid, bc))
                rid += 1
    bam.write_bam(path, names, [int(x) for x in lengths], records)
    return names, [int(x) for x in lengths], truth
