"""Coverage models vs scalar transliterations of the reference
(`logistic_probability.rs`, `normalize_probability.rs`,
`binomial_probability.rs`)."""

import numpy as np
from scipy.special import gammaln

from oarfish_tpu.config import FilterOpts
from oarfish_tpu.host.filters import DiscardTable, filter_group
from oarfish_tpu.host.store import StoreBuilder, TranscriptCoverage, _rust_round
from oarfish_tpu.io.bam import BamRecord
from oarfish_tpu.models.coverage import (
    binomial_continuous_prob,
    logistic_prob,
    normalize_read_probs,
)


def build_store(rng, T=6, R=200, bin_width=100):
    tlens = rng.integers(300, 3000, size=T).astype(np.int64)
    cov = TranscriptCoverage(tlens, bin_width)
    builder = StoreBuilder(cov)
    opts = FilterOpts()
    for r in range(R):
        k = int(rng.integers(1, 4))
        group = []
        score = int(rng.integers(100, 300))
        for j in range(k):
            t = int(rng.integers(0, T))
            L = int(tlens[t])
            span = int(rng.integers(60, max(61, L // 2)))
            pos = int(rng.integers(0, max(1, L - span)))
            group.append(
                BamRecord(f"r{r}", 0, t, pos, span, span, score - j, None)
            )
        fg = filter_group(opts, builder.discard, tlens, group)
        if fg is not None:
            builder.add_filtered_group(fg)
    return builder.finalize(), cov, tlens


def scalar_logistic_prob(cov_bins, tlen, total_weight, growth_rate):
    """Direct port of logistic_prob for one transcript (test oracle)."""
    bins = cov_bins.copy()
    bins += total_weight / 100.0
    n = len(bins)
    bw = _rust_round(np.array(float(tlen) / n)).item()
    counts = bins.astype(np.float32)
    count_sum = float(counts.astype(np.float64).sum())
    if count_sum <= 1e-8:
        return np.zeros(n)
    expected = count_sum / n
    out = []
    for c in counts:
        diff = (expected - float(c)) / expected
        v = 1.0 / (1.0 + np.exp(-growth_rate * diff))
        out.append(min(max(v, 1e-8), 0.99999))
    del bw
    return np.array(out)


def test_logistic_matches_scalar():
    rng = np.random.default_rng(0)
    store, cov, tlens = build_store(rng)
    bins_before = cov.bins.copy()
    tw = cov.total_weight.copy()
    got = logistic_prob(cov, growth_rate=2.0)
    for t in range(len(tlens)):
        s, e = cov.bin_offsets[t], cov.bin_offsets[t + 1]
        want = scalar_logistic_prob(bins_before[s:e], tlens[t], tw[t], 2.0)
        np.testing.assert_allclose(got[s:e], want, rtol=1e-12)
    # pseudo-count mutation applied exactly once
    np.testing.assert_allclose(
        cov.bins, bins_before + np.repeat(tw / 100.0, cov.nbins)
    )


def scalar_normalize_one_read(alns, cov_prob_by_txp, tlens, bin_width):
    """Direct port of the per-read loop in normalize_probability.rs."""
    bl = float(bin_width)
    temp = []
    nprob_sum = 0.0
    for (tid, start, end) in alns:
        cp = cov_prob_by_txp[tid]
        tlen = float(tlens[tid])
        start_bin = int(start / bl)
        end_bin = min(int(end / bl), len(cp) - 1)
        if start_bin == end_bin:
            w = (end - start) / bl
            tw, covp = w, w * cp[start_bin]
        else:
            tw, covp = 0.0, 0.0
            for i in range(start_bin, end_bin):
                if i == start_bin:
                    w = (min(bl * start_bin + bl, tlen) - start) / bl
                else:
                    w = 1.0
                tw += w
                covp += w * cp[i]
        expected = covp / tw
        nprob_sum += expected
        temp.append(expected)
    denom = nprob_sum if nprob_sum > 0.0 else 1.0
    return [x / denom for x in temp]


def test_normalize_read_probs_matches_scalar():
    rng = np.random.default_rng(1)
    store, cov, tlens = build_store(rng, T=5, R=300)
    flat = logistic_prob(cov, 2.0)
    normalize_read_probs(store, cov, flat, 100)

    cov_by_txp = [
        flat[cov.bin_offsets[t] : cov.bin_offsets[t + 1]]
        for t in range(len(tlens))
    ]
    for r in range(store.num_reads):
        s, e = store.boundaries[r], store.boundaries[r + 1]
        alns = [
            (int(store.txp_id[i]), float(store.start[i]), float(store.end[i]))
            for i in range(s, e)
        ]
        want = scalar_normalize_one_read(alns, cov_by_txp, tlens, 100)
        np.testing.assert_allclose(store.cov_prob[s:e], want, rtol=1e-12,
                                   err_msg=f"read {r}")


def test_binomial_prob_basics():
    rng = np.random.default_rng(2)
    store, cov, tlens = build_store(rng, T=4, R=150)
    flat = binomial_continuous_prob(cov)
    # each transcript's bin probabilities are a normalized distribution
    for t in range(len(tlens)):
        s, e = cov.bin_offsets[t], cov.bin_offsets[t + 1]
        seg = flat[s:e]
        assert np.isfinite(seg).all()
        if seg.sum() > 0:
            np.testing.assert_allclose(seg.sum(), 1.0, rtol=1e-9)


def test_binomial_scalar_parity():
    # one-transcript scalar check against a direct log-space recomputation
    from oarfish_tpu.models.coverage import binomial_probability

    counts = np.array([3.0, 0.5, 7.0, 1.0], dtype=np.float32)
    widths = np.array([100.0, 100.0, 100.0, 50.0], dtype=np.float32)
    rate = float((counts.astype(np.float64) / widths.astype(np.float64)).sum())
    got = binomial_probability(counts, widths, rate)
    # manual recompute
    probs = counts.astype(np.float64) / (widths.astype(np.float64) * rate)
    mod = np.where(
        counts == counts.max(), np.float32(709.0),
        ((counts.astype(np.float64) * 709.0) / float(counts.max())).astype(np.float32))
    sv = np.float32(mod.sum())
    ln1 = gammaln(float(sv) + 1.0)
    lden = gammaln(mod.astype(np.float64) + 1) + gammaln((sv - mod).astype(np.float64) + 1)
    n2 = np.log(probs) * mod
    n3 = np.log(1 - probs) * (sv - mod).astype(np.float64)
    want = np.exp(ln1 - lden + n2 + n3)
    want /= want.sum()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_native_covmodel_matches_numpy_oracle():
    """csrc/covmodel.cpp vs the NumPy oracle (`logistic_prob_np`,
    `normalize_read_probs_np`) on randomized stores, including zero-sum
    transcripts and 1-bin transcripts."""
    from oarfish_tpu.models.coverage import (
        _get_lib,
        logistic_prob_np,
        normalize_read_probs_np,
    )

    if _get_lib() is None:
        import pytest

        pytest.skip("native covmodel unavailable")

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        T = int(rng.integers(3, 12))
        store, cov, tlens = build_store(rng, T=T, R=400)
        cov2 = TranscriptCoverage(tlens, 100)
        cov2.bins[:] = cov.bins
        cov2.total_weight[:] = cov.total_weight

        flat_nat = logistic_prob(cov, 2.0, threads=3)
        flat_np = logistic_prob_np(cov2, 2.0)
        np.testing.assert_allclose(flat_nat, flat_np, rtol=1e-13, atol=0)
        # pseudo-count mutation identical
        np.testing.assert_array_equal(cov.bins, cov2.bins)

        normalize_read_probs(store, cov, flat_nat, 100, threads=3)
        got = store.cov_prob.copy()
        normalize_read_probs_np(store, cov2, flat_np, 100)
        np.testing.assert_allclose(got, store.cov_prob, rtol=1e-13, atol=0)


def test_jax_covmodel_matches_numpy_oracle():
    """models/coverage_jax.py (device segment-op formulation, SURVEY §7.4)
    vs the NumPy oracle, on the CPU backend (x64 on via conftest)."""
    from oarfish_tpu.models.coverage import (
        logistic_prob_np,
        normalize_read_probs_np,
    )
    from oarfish_tpu.models.coverage_jax import (
        logistic_prob_jax,
        normalize_read_probs_jax,
    )

    for seed in (3, 4):
        rng = np.random.default_rng(seed)
        store, cov, tlens = build_store(rng, T=7, R=300)
        cov2 = TranscriptCoverage(tlens, 100)
        cov2.bins[:] = cov.bins
        cov2.total_weight[:] = cov.total_weight

        flat_j = logistic_prob_jax(cov, 2.0)
        flat_np = logistic_prob_np(cov2, 2.0)
        np.testing.assert_allclose(flat_j, flat_np, rtol=1e-12, atol=0)
        np.testing.assert_allclose(cov.bins, cov2.bins, rtol=1e-15)

        normalize_read_probs_jax(store, cov, flat_j, 100)
        got = store.cov_prob.copy()
        normalize_read_probs_np(store, cov2, flat_np, 100)
        np.testing.assert_allclose(got, store.cov_prob, rtol=1e-12, atol=0)


def test_accumulator_session_matches_per_call():
    """The persistent native accumulator (begin/finish_accumulation, used
    by the streaming pack) must match per-call add_intervals to FP
    tolerance (bin sums are accumulation-order tolerant)."""
    rng = np.random.default_rng(9)
    tlens = rng.integers(200, 4000, size=40).astype(np.int64)
    T = len(tlens)
    chunks = []
    for _ in range(5):
        n = int(rng.integers(50, 400))
        tid = rng.integers(0, T, size=n).astype(np.int64)
        L = tlens[tid]
        end = rng.integers(1, L + 1)
        start = rng.integers(0, end)
        chunks.append((tid, start, end))

    cov_a = TranscriptCoverage(tlens, 100)
    for tid, s, e in chunks:
        cov_a.add_intervals(tid, s, e, threads=3)

    cov_b = TranscriptCoverage(tlens, 100)
    opened = cov_b.begin_accumulation(threads=3)
    for tid, s, e in chunks:
        cov_b.add_intervals(tid, s, e)
    cov_b.finish_accumulation()

    np.testing.assert_allclose(cov_b.bins, cov_a.bins, rtol=1e-12)
    np.testing.assert_allclose(cov_b.total_weight, cov_a.total_weight)
    if not opened:
        import pytest

        pytest.skip("native accumulator unavailable (fallback verified)")
