"""Genome-alignment projection mode (`--genome-alignments --annotation`).

TPU-era equivalent of `run_genome_alignments` (`main.rs:182-235`) +
`quantify_genome_alignments_from_bam` (`bulk.rs:268-323`) +
`parse_genome_alignments` (`alignment_parser.rs:580-700`): a name-collated
spliced genome BAM is streamed, each read's alignments are projected onto
the transcripts of the annotation, filtered (`filter_projected`), and
quantified with the same device EM + output tail as alignment mode.

Soft-clip rescue against neighboring exon sequence (bramble's
default-on feature, disabled by `--no-rescue`) IS implemented: when a
genome FASTA is supplied (`--genome`), a `RescueDb` is built from it and
soft-clipped tails are re-aligned against the flanking exon sequence
during projection (see `genome/rescue.py`; measured effect in
`scripts/rescue_eval.py` — rescue roughly halves MARD on a simulated
skipped-exon world). Without a FASTA the mode degrades to `--no-rescue`
behavior, since there is no sequence to rescue against.
"""

from __future__ import annotations

import logging
import time
from typing import List

import numpy as np

from ..config import Args, FilterOpts
from ..constants import EMPTY_READ_NAME
from ..genome.annotation import load_transcripts
from ..genome.g2t import G2TIndex
from ..genome.project import (
    GenomicAlignment,
    filter_projected,
    project_group,
)
from ..host.store import StoreBuilder, TranscriptCoverage
from ..io.bam import BamReader, verify_header
from ..utils.digest import LazyDigest, digest_from_header
from .bulk import perform_inference_and_write_output

log = logging.getLogger("oarfish_tpu")


def _record_to_genomic_alignment(rec) -> GenomicAlignment:
    """`record_buf_to_genomic_alignment` (`alignment_parser.rs:484-524`),
    restricted to the fields the projection consumes."""
    # query length from CIGAR read-consuming ops when SEQ is absent
    read_len = rec.seq_len
    if read_len == 0 and rec.cigar:
        read_len = sum(
            l for l, op in rec.cigar if op in (0, 1, 4, 7, 8)
        )
    return GenomicAlignment(
        ref_id=rec.ref_id,
        ref_start=rec.pos + 1,
        is_reverse=rec.is_reverse,
        cigar=rec.cigar or [],
        read_len=read_len,
        score=rec.score if rec.score is not None else 0,
        sequence=rec.seq,
    )


def quantify_genome_alignments_from_bam(args: Args, opts: FilterOpts):
    annotation = args.annotation
    bam_path = args.genome_alignments
    log.info("operating in genome-alignment (projection) mode")

    reader = BamReader(bam_path, threads=max(args.threads - 1, 1))
    # genome mode does not restrict the aligner (`alignment_parser.rs:106-137`)
    verify_header(reader.header, bam_path, require_known_mapper=False)
    refnames = reader.header.ref_names

    log.info("loading annotation from %s", annotation)
    transcripts = load_transcripts(annotation)
    log.info("loaded %d transcripts from annotation", len(transcripts))
    g2t = G2TIndex(transcripts, refnames)

    # soft-clip rescue (on by default when a genome FASTA is available;
    # genome-BAM mode sources it from --genome-fasta only, `main.rs:211-215`)
    rescue_db = None
    if not args.no_rescue and args.genome_fasta is not None:
        from ..genome.rescue import RescueDb

        log.info(
            "loading genome FASTA for soft-clip rescue from %s",
            args.genome_fasta,
        )
        rescue_db = RescueDb.from_fasta(args.genome_fasta, refnames)
    txps_name = list(g2t.names)
    txps_len = g2t.transcript_lengths()
    log.info("built g2t index over %d transcripts", g2t.num_transcripts)

    digest = {
        "transcriptome_digest": LazyDigest(
            digest_from_header, txps_name, txps_len
        )
    }

    coverage = TranscriptCoverage(
        txps_len, args.bin_width if opts.model_coverage else 0
    )
    builder = StoreBuilder(coverage, keep_names=opts.write_assignment_probs)

    t0 = time.time()
    num_unmapped = 0
    prev_name = None
    group: List = []
    seen = set()
    rg_num = 0

    def flush(name, group):
        if not group:
            return
        alns = [_record_to_genomic_alignment(r) for r in group]
        read_len = next((a.read_len for a in alns if a.read_len > 0), 0)
        projected = project_group(
            alns, g2t, args.junc_miss_discount, rescue_db
        )
        if not projected:
            return
        fg = filter_projected(
            opts,
            builder.discard,
            txps_len,
            projected,
            read_len,
            args.projected_prob_beta,
            args.projected_prob_source,
        )
        if fg is not None and builder.add_filtered_group(
            fg, name if name else EMPTY_READ_NAME
        ):
            # uniqueness judged on the genomic record-group size
            # (`alignment_parser.rs:655,688`)
            if len(group) == 1:
                builder.num_unique_alignments += 1

    for rec in reader.records(keep_cigar=True, keep_seq=rescue_db is not None):
        if rec.is_unmapped:
            num_unmapped += 1
            continue
        if rec.name != prev_name:
            flush(prev_name, group)
            group = []
            prev_name = rec.name
            if rg_num < args.sort_check_num:
                if rec.name in seen:
                    raise ValueError(
                        "the input genome BAM appears not to be "
                        f"name-collated: read {rec.name!r} was observed "
                        "twice in a non-contiguous block. Try `samtools "
                        "collate`."
                    )
                seen.add(rec.name)
                rg_num += 1
        if rec.ref_id >= 0:
            group.append(rec)
    flush(prev_name, group)

    store = builder.finalize()
    aln_time_s = time.time() - t0
    log.info(
        "the genome alignment file contained %d unmapped read records.",
        num_unmapped,
    )

    return perform_inference_and_write_output(
        store,
        coverage,
        txps_name,
        txps_len,
        opts,
        args,
        digest,
        aln_time_s,
    )
