"""Vectorized coverage binning vs a scalar transliteration of the reference
`TranscriptInfo::add_interval` (`oarfish_types.rs:496-538`)."""

import math

import numpy as np

from oarfish_tpu.host.store import TranscriptCoverage, _rust_round


def scalar_add_interval(bins, tlen, start, stop):
    """Direct scalar port of the reference algorithm (test oracle only)."""
    num_intervals = len(bins)
    tlen_f = float(tlen)
    bin_width = _rust_round(np.array(tlen_f / num_intervals)).item()
    s = min(start, stop)
    e = max(s, stop)
    start_bin = int((s / tlen_f) * num_intervals)
    end_bin = int((e / tlen_f) * num_intervals)
    for bidx in range(start_bin, end_bin):
        cbs = int(bidx * bin_width)
        cbe = int(min((bidx + 1.0) * bin_width, tlen_f))
        olap = (min(e, cbe) - max(s, cbs)) if s <= cbe else 0
        bins[bidx] += olap / (cbe - cbs)
    return bins


def test_binning_matches_scalar_reference():
    rng = np.random.default_rng(42)
    tlens = np.array([1000, 997, 101, 2503, 50, 333], dtype=np.int64)
    bin_width = 100
    cov = TranscriptCoverage(tlens, bin_width)

    tids, starts, ends = [], [], []
    for _ in range(500):
        t = int(rng.integers(0, len(tlens)))
        L = int(tlens[t])
        a = int(rng.integers(1, L + 1))
        b = int(rng.integers(a, L + 1))
        tids.append(t)
        starts.append(a)
        ends.append(b)
    cov.add_intervals(np.array(tids), np.array(starts), np.array(ends))

    # scalar oracle
    nbins = [math.ceil(L / bin_width) for L in tlens]
    oracle = [np.zeros(nb) for nb in nbins]
    tw = np.zeros(len(tlens))
    for t, a, b in zip(tids, starts, ends):
        scalar_add_interval(oracle[t], tlens[t], a, b)
        tw[t] += 1.0

    for t in range(len(tlens)):
        got = cov.bins[cov.bin_offsets[t] : cov.bin_offsets[t + 1]]
        np.testing.assert_allclose(got, oracle[t], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(cov.total_weight, tw)


def test_normalized_counts_and_lengths():
    tlens = np.array([250, 999], dtype=np.int64)
    cov = TranscriptCoverage(tlens, 100)
    cov.add_intervals(np.array([0, 1]), np.array([1, 100]), np.array([200, 900]))
    counts, widths = cov.normalized_counts_and_lengths()
    assert counts.dtype == np.float32 and widths.dtype == np.float32
    # txp0: 3 bins, rounded bin width = round(250/3) = 83; the last bin ends
    # at min(3*83, 250) = 249, so all widths are 83 (reference behavior)
    assert cov.nbins[0] == 3
    w0 = widths[: cov.bin_offsets[1]]
    np.testing.assert_allclose(w0, [83.0, 83.0, 83.0])
    # txp1: 10 bins, width 100 (999/10 -> round = 100); last = 999-900 = 99
    w1 = widths[cov.bin_offsets[1] :]
    np.testing.assert_allclose(w1[:9], [100.0] * 9)
    np.testing.assert_allclose(w1[9], 99.0)
    assert (widths > 0).all()


def test_native_coverage_matches_numpy():
    """csrc/coverage.cpp vs the NumPy path on random intervals."""
    import numpy as np

    from oarfish_tpu.host import store as store_mod
    from oarfish_tpu.host.store import TranscriptCoverage

    lib = store_mod._get_cov_lib()
    assert lib is not None, "native coverage lib must build"
    rng = np.random.default_rng(21)
    T = 300
    txp_len = rng.integers(200, 5000, size=T)
    n = 200_000
    tid = rng.integers(0, T, size=n)
    start = rng.integers(0, txp_len[tid] - 1)
    end = np.minimum(start + rng.integers(50, 3000, size=n), txp_len[tid])
    cov_nat = TranscriptCoverage(txp_len, 100)
    cov_nat.add_intervals(tid, start, end)
    # force the numpy path
    store_mod._cov_lib, store_mod._cov_tried = None, True
    try:
        cov_np = TranscriptCoverage(txp_len, 100)
        cov_np.add_intervals(tid, start, end)
    finally:
        store_mod._cov_lib, store_mod._cov_tried = lib, True
    np.testing.assert_allclose(cov_nat.bins, cov_np.bins, rtol=1e-12)
    np.testing.assert_array_equal(cov_nat.total_weight, cov_np.total_weight)
