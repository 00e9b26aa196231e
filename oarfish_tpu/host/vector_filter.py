"""Whole-file vectorized alignment filtering.

Semantically identical to the per-group `filters.filter_group`
(= `AlignmentFilters::filter`, `oarfish_types.rs:955-1130`) but evaluated
as columnar numpy passes over every record in the BAM at once — the
filter-order attribution of discards, the first-max best-score tracking,
and the f32 score→probability conversion are all reproduced with segment
operations. This is the host-side hot path that feeds the device CSR;
the scalar implementation remains as its differential oracle.

Input is a `RecordColumns` batch (from the C++ decoder or the Python BAM
reader): one row per *mapped* record, in file order, with `group_id`
derived from contiguous read-name runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..config import FilterOpts, Strand
from .filters import DiscardTable

I32_MIN = -(1 << 31)


@dataclass
class RecordColumns:
    """Columnar mapped-record batch (file order)."""

    group_id: np.ndarray  # int64 [N] nondecreasing, contiguous runs
    flag: np.ndarray  # uint16 [N]
    ref_id: np.ndarray  # int32 [N]
    pos: np.ndarray  # int64 [N] 0-based
    ref_span: np.ndarray  # int64 [N]
    seq_len: np.ndarray  # int64 [N]
    score: np.ndarray  # int64 [N]
    has_score: np.ndarray  # bool [N]

    @property
    def num_groups(self) -> int:
        return int(self.group_id[-1]) + 1 if len(self.group_id) else 0


@dataclass
class PackedCsr:
    """Filter output: the retained CSR + per-group bookkeeping."""

    txp_id: np.ndarray
    start: np.ndarray
    end: np.ndarray
    prob: np.ndarray  # float32
    boundaries: np.ndarray  # int64 [R+1] (kept groups only)
    group_of_read: np.ndarray  # int64 [R]: original group index per kept read
    discard: DiscardTable
    num_unique_alignments: int


def _segment_first(values: np.ndarray, seg: np.ndarray, num_seg: int, fill=0):
    """First value per segment (segments = nondecreasing ids)."""
    out = np.full(num_seg, fill, dtype=values.dtype if len(values) else np.int64)
    if len(values):
        # reversed scatter: earliest index wins
        out[seg[::-1]] = values[::-1]
    return out


def _segment_max(values: np.ndarray, seg: np.ndarray, num_seg: int, fill):
    out = np.full(num_seg, fill, dtype=values.dtype)
    if len(values):
        np.maximum.at(out, seg, values)
    return out


def filter_records(
    opts: FilterOpts, txp_len: np.ndarray, cols: RecordColumns
) -> PackedCsr:
    """Vectorized equivalent of running `AlignmentFilters::filter` on every
    name group in the file."""
    d = DiscardTable()
    N = len(cols.flag)
    G = cols.num_groups
    gid = cols.group_id

    # --- per-record retain filters, charged to the FIRST failing check in
    # reference order: orientation -> supplementary -> min aligned length ->
    # 3' clip -> 5' clip (`oarfish_types.rs:987-1050`)
    is_rc = (cols.flag & 0x10) != 0
    if opts.which_strand == Strand.FORWARD:
        fail_ori = is_rc
    elif opts.which_strand == Strand.REVERSE:
        fail_ori = ~is_rc
    else:
        fail_ori = np.zeros(N, dtype=bool)
    fail_supp = (cols.flag & 0x800) != 0
    fail_len = cols.ref_span < opts.min_aligned_len
    tlen = txp_len[cols.ref_id]
    aln_start = cols.pos + 1
    aln_end = cols.pos + cols.ref_span
    fail_3p = aln_end <= tlen - opts.three_prime_clip
    fail_5p = aln_start >= opts.five_prime_clip

    still = ~fail_ori
    d.discard_ori = int(fail_ori.sum())
    d.discard_supp = int((still & fail_supp).sum())
    still &= ~fail_supp
    d.discard_aln_len = int((still & fail_len).sum())
    still &= ~fail_len
    d.discard_3p = int((still & fail_3p).sum())
    still &= ~fail_3p
    d.discard_5p = int((still & fail_5p).sum())
    still &= ~fail_5p
    retained = still

    # --- per-group best retained score (strict >, first occurrence wins
    # for the aligned-fraction snapshot, `oarfish_types.rs:1055-1065`)
    score_or_min = np.where(cols.has_score, cols.score, I32_MIN).astype(np.int64)
    r_idx = np.nonzero(retained)[0]
    r_gid = gid[r_idx]
    r_score = score_or_min[r_idx]
    best_score = _segment_max(r_score, r_gid, G, np.int64(I32_MIN))
    # first retained record per group achieving the max: reversed scatter of
    # candidates (earliest wins)
    is_best = r_score == best_score[r_gid]
    cand_idx = r_idx[is_best]
    cand_gid = r_gid[is_best]
    first_best = np.full(G, -1, dtype=np.int64)
    first_best[cand_gid[::-1]] = cand_idx[::-1]

    # group's sequence length = the FIRST record's (mapped, pre-filter)
    seq_len_g = _segment_first(cols.seq_len, gid, G, 0)
    has_best = first_best >= 0
    span_at_best = np.where(has_best, cols.ref_span[np.maximum(first_best, 0)], 0)
    frac_ok_denom = np.where(seq_len_g > 0, seq_len_g, 1)
    frac_at_best = np.where(
        (seq_len_g > 0) & has_best,
        span_at_best.astype(np.float32) / frac_ok_denom.astype(np.float32),
        np.float32(0.0),
    ).astype(np.float32)

    # --- group-level dispositions (`oarfish_types.rs:1072-1093`)
    # groups whose records were all dropped pre-push (no mapped ref) never
    # reach the filter in the reference (`add_group` empty check) and must
    # not be charged to any counter
    group_exists = np.bincount(gid, minlength=G) > 0
    n_retained_g = np.bincount(r_gid, minlength=G)
    group_dead = group_exists & (
        (n_retained_g == 0) | (span_at_best == 0) | (best_score <= 0)
    )
    # all groups here had >= 1 mapped record (unmapped were never pushed),
    # so the dead split is no_mapping=0 / no_valid_aln=all (the reference's
    # n_mapped_in counts mapped records; in BAM mode groups are all mapped)
    d.no_valid_aln = int(group_dead.sum())
    frac_fail = (
        group_exists
        & ~group_dead
        & (frac_at_best < np.float32(opts.min_aligned_fraction))
    )
    d.discard_aln_frac = int(frac_fail.sum())
    group_live = group_exists & ~group_dead & ~frac_fail
    d.valid_best_aln = int(group_live.sum())

    # --- score threshold + probability over retained records of live groups
    live_rec = retained & group_live[gid]
    l_idx = np.nonzero(live_rec)[0]
    l_gid = gid[l_idx]
    mscore = best_score[l_gid].astype(np.float32)
    fscore = np.where(cols.has_score[l_idx], cols.score[l_idx], 0).astype(
        np.float32
    )
    score_ok = (fscore * (np.float32(1.0) / mscore)) >= np.float32(
        opts.score_threshold
    )
    d.discard_score = int((~score_ok).sum())
    keep = l_idx[score_ok]
    keep_gid = gid[keep]
    prob = np.exp(
        (fscore[score_ok] - mscore[score_ok]) / np.float32(opts.score_prob_denom)
    ).astype(np.float32)

    # --- groups that still have >= 1 kept record become CSR rows
    kept_per_group = np.bincount(keep_gid, minlength=G)
    emitted = kept_per_group > 0
    group_of_read = np.nonzero(emitted)[0]
    boundaries = np.zeros(len(group_of_read) + 1, dtype=np.int64)
    np.cumsum(kept_per_group[emitted], out=boundaries[1:])
    num_unique = int((kept_per_group[emitted] == 1).sum())

    return PackedCsr(
        txp_id=cols.ref_id[keep].astype(np.int32),
        start=aln_start[keep].astype(np.int64),
        end=aln_end[keep].astype(np.int64),
        prob=prob,
        boundaries=boundaries,
        group_of_read=group_of_read,
        discard=d,
        num_unique_alignments=num_unique,
    )


def columns_from_records(records) -> "tuple[RecordColumns, list, int]":
    """Build RecordColumns from an iterable of BamRecord (Python fallback
    path). Returns (columns, group_names, num_unmapped)."""
    flag, ref_id, pos, span, seqlen, score, has = [], [], [], [], [], [], []
    gids: List[int] = []
    names: List[str] = []
    prev = None
    g = -1
    num_unmapped = 0
    for rec in records:
        if rec.is_unmapped:
            num_unmapped += 1
            continue
        if rec.name != prev:
            g += 1
            prev = rec.name
            names.append(rec.name)
        if rec.ref_id < 0:
            continue
        gids.append(g)
        flag.append(rec.flag)
        ref_id.append(rec.ref_id)
        pos.append(rec.pos)
        span.append(rec.ref_span)
        seqlen.append(rec.seq_len)
        score.append(rec.score if rec.score is not None else 0)
        has.append(rec.score is not None)
    cols = RecordColumns(
        group_id=np.asarray(gids, dtype=np.int64),
        flag=np.asarray(flag, dtype=np.uint16),
        ref_id=np.asarray(ref_id, dtype=np.int32),
        pos=np.asarray(pos, dtype=np.int64),
        ref_span=np.asarray(span, dtype=np.int64),
        seq_len=np.asarray(seqlen, dtype=np.int64),
        score=np.asarray(score, dtype=np.int64),
        has_score=np.asarray(has, dtype=bool),
    )
    return cols, names, num_unmapped
