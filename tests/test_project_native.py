"""Native projection engine (csrc/project.cpp) vs the Python oracle
(genome/project.py::project_blocks + genome/rescue.py) — randomized
differential over worlds with multi-exon genes, skipped exons, both
strands, intron jitter, and soft clips."""

import numpy as np
import pytest

from oarfish_tpu.genome import project_native as pn
from oarfish_tpu.genome.annotation import Transcript
from oarfish_tpu.genome.g2t import G2TIndex
from oarfish_tpu.genome.project import project_blocks
from oarfish_tpu.genome.rescue import RescueDb

pytestmark = pytest.mark.skipif(
    not pn.available(), reason="native projection not built"
)


def make_world(rng, n_genes=12, n_chroms=2):
    refnames = [f"chr{i+1}" for i in range(n_chroms)]
    chrom_seqs = {}
    transcripts = []
    for c, name in enumerate(refnames):
        glen = 60_000
        seq = bytes(
            rng.choice(np.frombuffer(b"ACGT", np.uint8), glen).tobytes()
        )
        chrom_seqs[name] = seq
        pos = 500
        for g in range(n_genes):
            exons = []
            for _ in range(int(rng.integers(2, 5))):
                elen = int(rng.integers(80, 400))
                exons.append((pos + 1, pos + elen))
                pos += elen + int(rng.integers(100, 500))
            a = f"{name}G{g}A"
            b = f"{name}G{g}B"
            transcripts.append(
                Transcript(id=a, seqname=name, strand="+"
                           if rng.random() < 0.5 else "-", exons=exons)
            )
            if len(exons) >= 3:
                transcripts.append(
                    Transcript(id=b, seqname=name, strand="+",
                               exons=[exons[0]] + exons[2:])
                )
            pos += 800
    return refnames, chrom_seqs, transcripts


def random_hits(rng, g2t, n_hits=60):
    hits = []
    placed = [m for m in g2t.models if m.chrom_id >= 0
              and int(m.exon_ends[-1]) > int(m.exon_starts[0])]
    for _ in range(n_hits):
        m = placed[int(rng.integers(len(placed)))]
        es, ee = m.exon_starts, m.exon_ends
        # blocks follow a subset of exons with jittered edges
        i0 = int(rng.integers(0, len(es)))
        i1 = int(rng.integers(i0, len(es)))
        blocks = []
        for i in range(i0, i1 + 1):
            s = int(es[i]) + int(rng.integers(-3, 4))
            e = int(ee[i]) + int(rng.integers(-3, 4))
            if e < s:
                s, e = e, s
            blocks.append((max(s, 1), max(e, 1)))
        blocks = sorted(set(blocks))
        # drop overlapping collisions after jitter
        clean = []
        for s, e in blocks:
            if clean and s <= clean[-1][1]:
                continue
            clean.append((s, e))
        blocks = clean
        introns = [
            (blocks[j][1] + 1, blocks[j + 1][0] - 1)
            for j in range(len(blocks) - 1)
            if blocks[j + 1][0] - blocks[j][1] > 1
        ]
        q_aligned = sum(e - s + 1 for s, e in blocks)
        clip_l = bytes(rng.choice(
            np.frombuffer(b"ACGT", np.uint8),
            int(rng.integers(0, 30))).tobytes())
        clip_r = bytes(rng.choice(
            np.frombuffer(b"ACGT", np.uint8),
            int(rng.integers(0, 30))).tobytes())
        hits.append((m.chrom_id, blocks, introns, q_aligned,
                     bool(rng.random() < 0.5), int(rng.integers(0, 100)),
                     clip_l, clip_r))
    return hits


@pytest.mark.parametrize("seed,with_rescue,tol", [
    (1, False, 0), (2, True, 0), (3, True, 25), (4, False, 25),
])
def test_native_matches_python(seed, with_rescue, tol):
    rng = np.random.default_rng(seed)
    refnames, chrom_seqs, transcripts = make_world(rng)
    g2t = G2TIndex(transcripts, refnames)
    db = RescueDb(
        {n: s.upper() for n, s in chrom_seqs.items()}, refnames
    ) if with_rescue else None
    hits = random_hits(rng, g2t)
    disc = 0.3

    flat = pn.FlatG2T(g2t, rescue_db=db)
    n = len(hits)
    block_off = np.zeros(n + 1, np.int64)
    intron_off = np.zeros(n + 1, np.int64)
    bs, be, is_, ie_ = [], [], [], []
    clL, clR = bytearray(), bytearray()
    clL_off = np.zeros(n + 1, np.int64)
    clR_off = np.zeros(n + 1, np.int64)
    for i, (cid, blocks, introns, qa, rc, score, cl, cr) in enumerate(hits):
        for s, e in blocks:
            bs.append(s)
            be.append(e)
        for s, e in introns:
            is_.append(s)
            ie_.append(e)
        block_off[i + 1] = len(bs)
        intron_off[i + 1] = len(is_)
        use_clips = with_rescue and (len(cl) >= 3 or len(cr) >= 3)
        if use_clips:
            clL.extend(cl)
            clR.extend(cr)
        clL_off[i + 1] = len(clL)
        clR_off[i + 1] = len(clR)

    hit_off, tid, start, end, matched, sim, is_rev = pn.project_batch_native(
        flat,
        hit_chrom=np.asarray([h[0] for h in hits], np.int32),
        block_off=block_off,
        block_s=np.asarray(bs, np.int64),
        block_e=np.asarray(be, np.int64),
        intron_off=intron_off,
        intron_s=np.asarray(is_, np.int64),
        intron_e=np.asarray(ie_, np.int64),
        hit_is_rc=np.asarray([h[4] for h in hits], np.uint8),
        q_aligned=np.asarray([h[3] for h in hits], np.int64),
        clips=(bytes(clL), clL_off, bytes(clR), clR_off)
        if with_rescue else None,
        junc_miss_discount=disc,
        tol=tol,
        threads=3,
    )

    for i, (cid, blocks, introns, qa, rc, score, cl, cr) in enumerate(hits):
        use_clips = with_rescue and (len(cl) >= 3 or len(cr) >= 3)
        rescue = (db, cl, cr) if use_clips else None
        want = project_blocks(
            cid, blocks, introns, qa, rc, score, g2t, disc,
            junction_tolerance=tol, rescue=rescue,
        )
        s, e = int(hit_off[i]), int(hit_off[i + 1])
        got = sorted(
            zip(tid[s:e], start[s:e], end[s:e], matched[s:e], sim[s:e],
                is_rev[s:e])
        )
        want_t = sorted(
            (r.ref_id, r.start, r.end, r.query_aligned_len, r.similarity,
             int(r.is_reverse))
            for r in want
        )
        assert len(got) == len(want_t), (i, got, want_t)
        for g_, w_ in zip(got, want_t):
            assert g_[0] == w_[0] and g_[1] == w_[1] and g_[2] == w_[2]
            assert g_[3] == w_[3], (i, g_, w_)
            assert g_[5] == w_[5]
            assert g_[4] == pytest.approx(w_[4], rel=1e-12)
