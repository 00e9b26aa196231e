"""Per-read-group alignment filtering and score→probability conversion.

Reference semantics: `AlignmentFilters::filter` (`oarfish_types.rs:955-1130`)
and `DiscardTable` (`oarfish_types.rs:811-942`). The order of the checks is
load-bearing — each record is charged to the *first* filter it fails — so the
per-record check sequence here mirrors the reference exactly:
orientation → supplementary → min aligned length → 3' clip → 5' clip.
Score thresholding and `exp((score-best)/D)` run afterwards over the
survivors, in float32 like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import List, Optional, Tuple

import numpy as np

from ..config import FilterOpts, Strand
from ..io.bam import BamRecord

I32_MIN = -(1 << 31)


@dataclass
class DiscardTable:
    """Why alignments/reads were dropped (`oarfish_types.rs:811-856`)."""

    discard_5p: int = 0
    discard_3p: int = 0
    discard_score: int = 0
    discard_aln_frac: int = 0
    discard_aln_len: int = 0
    discard_ori: int = 0
    discard_supp: int = 0
    no_mapping: int = 0
    no_valid_aln: int = 0
    valid_best_aln: int = 0

    def aggregate(self, other: "DiscardTable") -> None:
        for f in fields(self):
            setattr(self, f.name, getattr(self, f.name) + getattr(other, f.name))

    def to_json_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}

    def to_table(self) -> str:
        rows = [
            ("reason", "count"),
            ("too far from 5' end", str(self.discard_5p)),
            ("too far from 3' end", str(self.discard_3p)),
            ("score too low", str(self.discard_score)),
            ("aligned fraction too low", str(self.discard_aln_frac)),
            ("aligned length too short", str(self.discard_aln_len)),
            ("inconsistent orientation", str(self.discard_ori)),
            ("supplementary alignment", str(self.discard_supp)),
            ("read had no mapping", str(self.no_mapping)),
            ("read had no valid alignment", str(self.no_valid_aln)),
            ("reads with valid best alignment", str(self.valid_best_aln)),
        ]
        w0 = max(len(r[0]) for r in rows)
        w1 = max(len(r[1]) for r in rows)
        lines = [f"| {r[0]:<{w0}} | {r[1]:>{w1}} |" for r in rows]
        sep = "-" * len(lines[0])
        return "\n".join([sep, lines[0], sep] + lines[1:] + [sep])


@dataclass
class FilteredGroup:
    """Survivors of one read's alignment group."""

    txp_id: np.ndarray  # int32
    start: np.ndarray  # int64, 1-based
    end: np.ndarray  # int64, 1-based inclusive
    prob: np.ndarray  # float32
    is_reverse: np.ndarray  # bool


def filter_group(
    opts: FilterOpts,
    discard: DiscardTable,
    txp_len: np.ndarray,
    group: List[BamRecord],
) -> Optional[FilteredGroup]:
    """Filter one read's alignment records; returns None if the read is
    dropped entirely. Mirrors `oarfish_types.rs:955-1130`."""
    best_retained_score = I32_MIN
    aln_frac_at_best = np.float32(0.0)
    aln_len_at_best = 0

    n_mapped_in = sum(1 for x in group if not x.is_unmapped)

    # the reference takes the sequence length of the *first* record that
    # reports one (`oarfish_types.rs:981-984`); noodles RecordBufs always
    # report Some(len), so in practice this is the group's first record.
    seq_len = group[0].seq_len if group else 0

    retained: List[BamRecord] = []
    for x in group:
        if x.is_unmapped:
            continue
        is_rc = x.is_reverse
        if opts.which_strand == Strand.REVERSE and not is_rc:
            discard.discard_ori += 1
            continue
        if opts.which_strand == Strand.FORWARD and is_rc:
            discard.discard_ori += 1
            continue
        if x.is_supplementary:
            discard.discard_supp += 1
            continue
        aln_span = x.ref_span
        if aln_span < opts.min_aligned_len:
            discard.discard_aln_len += 1
            continue
        tid = x.ref_id
        if x.aln_end <= int(txp_len[tid]) - opts.three_prime_clip:
            discard.discard_3p += 1
            continue
        if x.aln_start >= opts.five_prime_clip:
            discard.discard_5p += 1
            continue
        score = x.score if x.score is not None else I32_MIN
        if score > best_retained_score:
            best_retained_score = score
            aln_len_at_best = aln_span
            aln_frac_at_best = (
                np.float32(aln_span) / np.float32(seq_len)
                if seq_len > 0
                else np.float32(0.0)
            )
        retained.append(x)

    if not retained or aln_len_at_best == 0 or best_retained_score <= 0:
        if n_mapped_in == 0:
            discard.no_mapping += 1
        else:
            discard.no_valid_aln += 1
        return None
    if aln_frac_at_best < np.float32(opts.min_aligned_fraction):
        discard.discard_aln_frac += 1
        return None

    discard.valid_best_aln += 1

    mscore = np.float32(best_retained_score)
    inv_max_score = np.float32(1.0) / mscore
    denom = np.float32(opts.score_prob_denom)
    thresh = np.float32(opts.score_threshold)

    scores = np.asarray(
        [x.score if x.score is not None else 0 for x in retained], dtype=np.float32
    )
    score_ok = (scores * inv_max_score) >= thresh
    n_bad = int((~score_ok).sum())
    discard.discard_score += n_bad
    kept = [r for r, ok in zip(retained, score_ok) if ok]
    probs = np.exp((scores[score_ok] - mscore) / denom).astype(np.float32)

    if not kept:
        # all survivors fell below the score threshold; the reference would
        # emit an empty group after having counted valid_best_aln
        return FilteredGroup(
            txp_id=np.empty(0, np.int32),
            start=np.empty(0, np.int64),
            end=np.empty(0, np.int64),
            prob=np.empty(0, np.float32),
            is_reverse=np.empty(0, bool),
        )

    return FilteredGroup(
        txp_id=np.asarray([r.ref_id for r in kept], dtype=np.int32),
        start=np.asarray([r.aln_start for r in kept], dtype=np.int64),
        end=np.asarray([r.aln_end for r in kept], dtype=np.int64),
        prob=probs,
        is_reverse=np.asarray([r.is_reverse for r in kept], dtype=bool),
    )
