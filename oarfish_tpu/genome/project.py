"""Projection of genomic (spliced) alignments onto transcript models, and
the projected-alignment filter.

This is the from-scratch equivalent of the external `bramble-rs`
projection engine the reference drives (`project_group_with` at
`bulk.rs:521` / `alignment_parser.rs:564`) together with an exact
reimplementation of `AlignmentFilters::filter_projected`
(`oarfish_types.rs:1179-1297`).

Semantics of the projection (clean-room design, guided by the reference's
documented behavior):

* A genomic alignment is decomposed by CIGAR walk into aligned match
  blocks (M/=/X), insertions, and introns (N).
* For every transcript whose exonic extent overlaps the aligned span, the
  exonic-coverage similarity is the fraction of the read's aligned bases
  that land inside the transcript's exons, discounted by
  `junc_miss_discount` for every alignment intron that does not match a
  transcript splice junction (`--junc-miss-discount`,
  `prog_opts.rs:399-403`).
* Transcript-space start/end come from mapping the first/last
  exonic-overlapping genomic base through the exon chain (reverse-strand
  transcripts flip the coordinate).
* `is_reverse` = read strand XOR transcript strand.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import FilterOpts, ProjProbSource, Strand
from .g2t import G2TIndex

F32_MIN_EXP = -87.0  # below this exp() underflows f32 anyway


@dataclass
class GenomicAlignment:
    """One spliced genome-space alignment record (subset of the reference's
    `GenomicAlignment`, `alignment_parser.rs:484-524`)."""

    ref_id: int
    ref_start: int  # 1-based (SAM POS)
    is_reverse: bool
    cigar: List[Tuple[int, int]]  # (len, op) BAM op codes
    read_len: int
    score: int = 0  # AS tag of the source alignment
    sequence: Optional[bytes] = None


@dataclass
class ProjectedAlnRecord:
    """Neutral projection hand-off (`oarfish_types.rs:1142-1164`)."""

    ref_id: int
    start: int  # 1-based
    end: int  # 1-based inclusive
    aligned_len: int
    query_aligned_len: int
    is_reverse: bool
    similarity: float
    aln_score: int


def _walk_cigar(aln: GenomicAlignment):
    """Returns (match_blocks [(gs, ge)] 1-based inclusive, introns
    [(gs, ge)], total_query_aligned (M/I/=/X bases))."""
    g = aln.ref_start
    blocks: List[Tuple[int, int]] = []
    introns: List[Tuple[int, int]] = []
    q_aligned = 0
    for length, op in aln.cigar:
        if op in (0, 7, 8):  # M / = / X
            blocks.append((g, g + length - 1))
            q_aligned += length
            g += length
        elif op == 1:  # I
            q_aligned += length
        elif op == 2:  # D
            g += length
        elif op == 3:  # N
            introns.append((g, g + length - 1))
            g += length
        # S/H/P consume no reference
    return blocks, introns, q_aligned


def project_alignment(
    aln: GenomicAlignment,
    g2t: G2TIndex,
    junc_miss_discount: float = 1.0,
    rescue_db=None,
) -> List[ProjectedAlnRecord]:
    """Project one genomic alignment onto all candidate transcripts."""
    blocks, introns, q_aligned = _walk_cigar(aln)
    clips = None
    if rescue_db is not None and aln.sequence:
        # leading/trailing soft-clip lengths from the CIGAR (BAM SEQ is
        # already reference-forward, so no strand handling needed)
        c5 = aln.cigar[0][0] if aln.cigar and aln.cigar[0][1] == 4 else 0
        c3 = aln.cigar[-1][0] if aln.cigar and aln.cigar[-1][1] == 4 else 0
        if c5 or c3:
            seq = aln.sequence.upper()
            clips = (
                seq[:c5] if c5 else b"",
                seq[len(seq) - c3 :] if c3 else b"",
            )
    return project_blocks(
        aln.ref_id, blocks, introns, q_aligned, aln.is_reverse, aln.score,
        g2t, junc_miss_discount,
        rescue=(rescue_db, *clips) if clips else None,
    )


def project_blocks(
    ref_id: int,
    blocks: List[Tuple[int, int]],
    introns: List[Tuple[int, int]],
    q_aligned: int,
    is_reverse: bool,
    score: int,
    g2t: G2TIndex,
    junc_miss_discount: float = 1.0,
    junction_tolerance: int = 0,
    rescue=None,
) -> List[ProjectedAlnRecord]:
    """Project aligned genomic blocks (1-based inclusive) + introns onto
    all candidate transcripts. This is the shared core for both the
    CIGAR path (genome BAM, base-accurate, tolerance 0) and the
    spliced-mapper path (genome reads, anchor-resolution block edges, so
    junction matching allows `junction_tolerance` bases of slack).

    `rescue` is an optional `(RescueDb, clip_left, clip_right)` triple
    (sequences in genome-forward orientation): clipped read ends are
    x-drop-extended against each candidate's neighboring exon sequence,
    adding recovered bases to the exonic match (and the capped clip
    lengths to the denominator, so isoforms that explain the clip win)."""
    if not blocks or q_aligned == 0:
        return []
    q_den = q_aligned
    if rescue is not None:
        from .rescue import CLIP_CAP

        _db, _cl, _cr = rescue
        q_den += min(len(_cl), CLIP_CAP) + min(len(_cr), CLIP_CAP)
    gstart = blocks[0][0]
    gend = blocks[-1][1]
    out: List[ProjectedAlnRecord] = []
    for tid in g2t.candidates(ref_id, gstart, gend):
        m = g2t.models[tid]
        es, ee = m.exon_starts, m.exon_ends
        # exonic overlap of the match blocks
        matched = 0
        first_g: Optional[int] = None
        last_g: Optional[int] = None
        for bs, be in blocks:
            lo = int(np.searchsorted(ee, bs, side="left"))
            for i in range(lo, len(es)):
                s, e = int(es[i]), int(ee[i])
                if s > be:
                    break
                o_s = max(bs, s)
                o_e = min(be, e)
                if o_s <= o_e:
                    matched += o_e - o_s + 1
                    if first_g is None:
                        first_g = o_s
                    last_g = o_e
        if matched == 0 or first_g is None:
            continue

        # junction consistency: each alignment intron inside the transcript
        # span must coincide with a transcript intron (exon_end == gs-1 and
        # next exon_start == ge+1)
        n_mismatch = 0
        span_s, span_e = m.span()
        tol = junction_tolerance
        for gs, ge in introns:
            if ge < span_s or gs > span_e:
                continue
            i = int(np.searchsorted(ee, gs - 1 - tol, side="left"))
            ok = False
            for j in (i, i + 1):
                if 0 <= j < len(ee) - 1 and (
                    abs(int(ee[j]) - (gs - 1)) <= tol
                    and abs(int(es[j + 1]) - (ge + 1)) <= tol
                ):
                    ok = True
                    break
            if not ok:
                n_mismatch += 1

        rl = rr = 0
        if rescue is not None:
            from .rescue import rescue_clips

            db, clip_l, clip_r = rescue
            rl, rr = rescue_clips(db, m, first_g, last_g, clip_l, clip_r)
            matched += rl + rr

        t1 = m.to_txp_coord(first_g)
        t2 = m.to_txp_coord(last_g)
        if t1 is None or t2 is None:
            continue
        start, end = (t1, t2) if t1 <= t2 else (t2, t1)
        if rl or rr:
            # extend transcript coordinates by the rescued bases; the
            # genome-left clip extends the transcript start on '+' strand
            # and the end on '-' strand
            if m.strand == "-":
                start -= rr
                end += rl
            else:
                start -= rl
                end += rr
            start = max(start, 1)
            end = min(end, m.length)

        # similarity denominator: the aligned query span OR the projected
        # transcript span, whichever is larger. The span term charges
        # internal transcript sequence the alignment skips (an intron
        # spanning a retained exon), so a junction-spanning read
        # discriminates against the intron-retaining isoform — without
        # it, both isoforms of a skipped-exon pair score 1.0 and the EM
        # collapses the pair (genome_vs_txome_eval: 2436/2552
        # both-expressed genes collapsed; with the span term the genome
        # mode tracks direct transcriptome quantification, the
        # reference's README.md:229 claim).
        similarity = matched / max(q_den, end - start + 1)
        if junc_miss_discount < 1.0 and n_mismatch:
            similarity *= junc_miss_discount**n_mismatch
        out.append(
            ProjectedAlnRecord(
                ref_id=tid,
                start=int(start),
                end=int(end),
                aligned_len=int(end - start + 1),
                query_aligned_len=int(matched),
                is_reverse=bool(is_reverse ^ (m.strand == "-")),
                similarity=float(similarity),
                aln_score=int(score),
            )
        )
    return out


def project_group(
    alns: Sequence[GenomicAlignment],
    g2t: G2TIndex,
    junc_miss_discount: float = 1.0,
    rescue_db=None,
) -> List[ProjectedAlnRecord]:
    """Project a read's alignment group; when several source alignments hit
    the same transcript, the highest-similarity projection wins."""
    best: dict = {}
    for a in alns:
        for rec in project_alignment(a, g2t, junc_miss_discount, rescue_db):
            prev = best.get(rec.ref_id)
            if prev is None or rec.similarity > prev.similarity:
                best[rec.ref_id] = rec
    return list(best.values())


def filter_projected(
    opts: FilterOpts,
    discard,
    txp_len: np.ndarray,
    recs: Sequence[ProjectedAlnRecord],
    read_len: int,
    beta: float,
    prob_source: ProjProbSource,
):
    """Exact port of `AlignmentFilters::filter_projected`
    (`oarfish_types.rs:1179-1297`). Returns a `FilteredGroup` or None."""
    from ..host.filters import FilteredGroup

    best_sim = -np.inf
    best_score = -(1 << 31)
    frac_at_best = np.float32(0.0)
    kept: List[ProjectedAlnRecord] = []

    for r in recs:
        if opts.which_strand == Strand.REVERSE and not r.is_reverse:
            discard.discard_ori += 1
            continue
        if opts.which_strand == Strand.FORWARD and r.is_reverse:
            discard.discard_ori += 1
            continue
        if r.aligned_len < opts.min_aligned_len:
            discard.discard_aln_len += 1
            continue
        tl = int(txp_len[r.ref_id])
        if r.end <= tl - opts.three_prime_clip:
            discard.discard_3p += 1
            continue
        if r.start >= opts.five_prime_clip:
            discard.discard_5p += 1
            continue
        if r.similarity > best_sim:
            best_sim = r.similarity
            frac_at_best = (
                np.float32(r.query_aligned_len) / np.float32(read_len)
                if read_len > 0
                else np.float32(0.0)
            )
        if r.aln_score > best_score:
            best_score = r.aln_score
        kept.append(r)

    if not kept or best_sim <= 0.0:
        return None
    if frac_at_best < np.float32(opts.min_aligned_fraction):
        discard.discard_aln_frac += 1
        return None
    discard.valid_best_aln += 1

    inv_msim = 1.0 / best_sim
    txp, start, end, prob, is_rev = [], [], [], [], []
    for r in kept:
        if np.float32(r.similarity * inv_msim) < np.float32(opts.score_threshold):
            discard.discard_score += 1
            continue
        tl = int(txp_len[r.ref_id])
        s = min(max(r.start, 1), tl)
        e = min(max(r.end, s), tl)
        if prob_source == ProjProbSource.SIMILARITY:
            f = np.float32(r.similarity - best_sim) * np.float32(beta)
        elif prob_source == ProjProbSource.SCORE:
            f = np.float32(r.aln_score - best_score) / np.float32(
                opts.score_prob_denom
            )
        else:
            f = np.float32(r.aln_score - best_score) / np.float32(
                opts.score_prob_denom
            ) + np.float32(beta) * np.float32(r.similarity - best_sim)
        txp.append(r.ref_id)
        start.append(s)
        end.append(e)
        prob.append(np.exp(np.float32(f)))
        is_rev.append(r.is_reverse)

    return FilteredGroup(
        txp_id=np.asarray(txp, dtype=np.int32),
        start=np.asarray(start, dtype=np.int64),
        end=np.asarray(end, dtype=np.int64),
        prob=np.asarray(prob, dtype=np.float32),
        is_reverse=np.asarray(is_rev, dtype=bool),
    )
