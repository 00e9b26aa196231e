"""Differential test: whole-file vectorized filtering vs the scalar
per-group implementation (which itself is unit-tested against the
reference's check order)."""

import dataclasses

import numpy as np
import pytest

from oarfish_tpu.config import FilterOpts, Strand
from oarfish_tpu.host.filters import DiscardTable, filter_group
from oarfish_tpu.host.vector_filter import columns_from_records, filter_records
from oarfish_tpu.io.bam import BamRecord


def random_records(rng, T=8, n_groups=400, adversarial=True):
    """Generate groups exercising every filter branch."""
    tlens = rng.integers(200, 2000, size=T).astype(np.int64)
    records = []
    for g in range(n_groups):
        k = int(rng.integers(1, 6))
        name = f"r{g}"
        for j in range(k):
            t = int(rng.integers(0, T))
            L = int(tlens[t])
            span = int(rng.integers(10, L + 1))
            pos = int(rng.integers(0, L - span + 1))
            flag = 0
            if rng.random() < 0.2:
                flag |= 0x10  # reverse
            if rng.random() < 0.1:
                flag |= 0x800  # supplementary
            if j > 0:
                flag |= 0x100
            if adversarial and rng.random() < 0.05:
                flag |= 0x4  # unmapped
            score = int(rng.integers(-5, 400)) if rng.random() > 0.05 else None
            seq_len = int(rng.integers(0, 2 * span)) if j == 0 else 0
            records.append(
                BamRecord(name, flag, t, pos, span, seq_len, score, None)
            )
    return tlens, records


OPTS = [
    FilterOpts(),
    FilterOpts(which_strand=Strand.FORWARD),
    FilterOpts(which_strand=Strand.REVERSE),
    FilterOpts(min_aligned_len=100, score_threshold=0.8),
    FilterOpts(three_prime_clip=50, five_prime_clip=100),
    FilterOpts(min_aligned_fraction=0.9, score_prob_denom=2.0),
]


@pytest.mark.parametrize("opt_i", range(len(OPTS)))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vector_matches_scalar(opt_i, seed):
    opts = OPTS[opt_i]
    rng = np.random.default_rng(seed)
    tlens, records = random_records(rng)

    # scalar reference path: group by contiguous name over mapped records
    d_ref = DiscardTable()
    ref_txp, ref_start, ref_end, ref_prob, sizes = [], [], [], [], []
    n_unique = 0
    prev, group = None, []

    def flush(group):
        nonlocal n_unique
        if not group:
            return
        fg = filter_group(opts, d_ref, tlens, group)
        if fg is not None and len(fg.txp_id):
            ref_txp.append(fg.txp_id)
            ref_start.append(fg.start)
            ref_end.append(fg.end)
            ref_prob.append(fg.prob)
            sizes.append(len(fg.txp_id))
            if len(fg.txp_id) == 1:
                n_unique += 1

    for rec in records:
        if rec.is_unmapped:
            continue
        if rec.name != prev:
            flush(group)
            group = []
            prev = rec.name
        group.append(rec)
    flush(group)

    # vectorized path
    cols, names, _ = columns_from_records(records)
    out = filter_records(opts, tlens, cols)

    assert out.discard.to_json_dict() == d_ref.to_json_dict()
    assert out.num_unique_alignments == n_unique
    if sizes:
        np.testing.assert_array_equal(out.txp_id, np.concatenate(ref_txp))
        np.testing.assert_array_equal(out.start, np.concatenate(ref_start))
        np.testing.assert_array_equal(out.end, np.concatenate(ref_end))
        np.testing.assert_array_equal(out.prob, np.concatenate(ref_prob))
        want_b = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=want_b[1:])
        np.testing.assert_array_equal(out.boundaries, want_b)
    else:
        assert len(out.txp_id) == 0
