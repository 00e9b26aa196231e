"""Run-metadata JSON (`meta_info.json`) construction.

Mirrors `get_json_info` (`bulk.rs:37-80`) and the single-cell variant
(`single_cell.rs:30-52`): probability model, alignment source, phase
timing, filter options, discard table, run arguments, digests.
"""

from __future__ import annotations

from typing import Optional

from ..config import Args, FilterGroup, FilterOpts
from ..host.filters import DiscardTable
from ..utils.digest import resolve_lazy_digests


def humantime(seconds: float) -> str:
    """humantime-crate-style rendering: `1m 2s 345ms 678us`."""
    if seconds == 0:
        return "0s"
    parts = []
    total_us = int(round(seconds * 1e6))
    units = [
        ("y", 365 * 24 * 3600 * 10**6),
        ("months", 30 * 24 * 3600 * 10**6),
        ("d", 24 * 3600 * 10**6),
        ("h", 3600 * 10**6),
        ("m", 60 * 10**6),
        ("s", 10**6),
        ("ms", 10**3),
        ("us", 1),
    ]
    for name, unit in units:
        q, total_us = divmod(total_us, unit)
        if q:
            parts.append(f"{q}{name}")
    return " ".join(parts) if parts else "0s"


def get_json_info(
    args: Args,
    opts: FilterOpts,
    discard: DiscardTable,
    digest: dict,
    aln_time_s: float,
) -> dict:
    prob = "logistic_coverage" if args.model_coverage else "no_coverage"
    source = "from_bam" if args.alignments is not None else "from_raw_reads"
    fg = None
    if args.filter_group == FilterGroup.NO_FILTERS:
        fg = "NoFilters"
    elif args.filter_group == FilterGroup.NANOCOUNT_FILTERS:
        fg = "NanocountFilters"
    wap = opts.to_json_dict()["write_assignment_probs_type"]
    return {
        "prob_model": prob,
        "alignment_source": source,
        "alignment_time": {
            "comment": (
                "Time to parse (in alignment mode) or generate (in raw read "
                "mode) alignments, as well as apply filters, and compute "
                "conditional probabilities."
            ),
            "human_time": humantime(aln_time_s),
            "seconds": aln_time_s,
        },
        "bin_width": args.bin_width,
        "filter_options": opts.to_json_dict(),
        "discard_table": discard.to_json_dict(),
        "alignments": str(args.alignments) if args.alignments else None,
        "output": str(args.output),
        "verbose": args.verbose,
        "single_cell": args.single_cell,
        "quiet": args.quiet,
        "em_max_iter": args.max_em_iter,
        "em_convergence_thresh": args.convergence_thresh,
        "threads": args.threads,
        "filter_group": fg,
        "write_assignment_probs": wap,
        "short_quant": args.short_quant,
        "num_bootstraps": args.num_bootstraps,
        "digest": resolve_lazy_digests(digest),
    }
