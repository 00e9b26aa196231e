"""Coverage models: logistic (bulk), binomial/multinomial (single-cell),
and the per-read coverage-probability normalization.

Reference semantics: `src/util/logistic_probability.rs`,
`src/util/binomial_probability.rs`, `src/util/normalize_probability.rs`.
These are one-shot O(total_bins)/O(total_alignment_bins) passes executed
between packing and the EM; they are fully vectorized here (the reference
rayon-parallelizes over transcripts; vectorization subsumes that). All
arithmetic orders follow the reference, including its quirks:

* `logistic_prob` first adds a pseudo-count `total_weight/100` to every bin
  *in place* (`logistic_probability.rs:51`), then converts to f32 counts.
* `normalize_read_probs` folds bins over `start_bin..end_bin` with the end
  bin *excluded* — its `i == end_bin` arm is unreachable
  (`normalize_probability.rs:37-46`) — except for the `start_bin == end_bin`
  case which contributes a fractional weight of the single bin.
* the binomial model rescales counts so the max bin is 709 (ln_gamma
  overflow guard, `binomial_probability.rs:17,60-70`).
"""

from __future__ import annotations

import numpy as np
from scipy.special import gammaln

from ..host.store import AlignmentStore, TranscriptCoverage

_lib = None
_lib_tried = False


def _get_lib():
    """ctypes handle to the native covmodel pass (csrc/covmodel.cpp),
    built on first use; None if the toolchain is unavailable. The NumPy
    `*_np` functions below are the differential oracle and fallback."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    import ctypes
    import subprocess
    from pathlib import Path

    csrc = Path(__file__).resolve().parent.parent.parent / "csrc"
    src = csrc / "covmodel.cpp"
    so = csrc / "liboarfish_covmodel.so"
    if not so.exists() or (
        src.exists() and src.stat().st_mtime > so.stat().st_mtime
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-ffp-contract=off", "-shared",
                 "-fPIC", str(src), "-o", str(so), "-pthread"],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:  # noqa: BLE001
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    p64 = ctypes.POINTER(ctypes.c_int64)
    p32 = ctypes.POINTER(ctypes.c_int32)
    pd = ctypes.POINTER(ctypes.c_double)
    lib.oarfish_logistic_prob.argtypes = [
        pd, pd, p64, ctypes.c_int64, ctypes.c_double, pd, ctypes.c_int,
    ]
    lib.oarfish_normalize_read_probs.restype = ctypes.c_int
    lib.oarfish_normalize_read_probs.argtypes = [
        p32, p64, p64, ctypes.c_int64, p64, ctypes.c_int64, p64, p64, pd,
        pd, ctypes.c_int64, ctypes.c_double, pd, ctypes.c_int,
    ]
    _lib = lib
    return lib


def logistic(x: np.ndarray, a: float) -> np.ndarray:
    """Scaled logistic clamped to [1e-8, 0.99999]
    (`logistic_probability.rs:7-10`)."""
    return np.clip(1.0 / (1.0 + np.exp(-a * x)), 1e-8, 0.99999)


def logistic_prob(
    cov: TranscriptCoverage, growth_rate: float, threads: int = 8
) -> np.ndarray:
    """Native multithreaded `logistic_prob` (csrc/covmodel.cpp), falling
    back to the NumPy oracle. Same contract as `logistic_prob_np`."""
    lib = _get_lib()
    if lib is None:
        return logistic_prob_np(cov, growth_rate)
    import ctypes

    # the native pass reads/writes f64 through raw pointers: normalize
    # any caller-perturbed dtypes/layout first (in-place mutation
    # semantics are preserved because cov keeps the converted arrays)
    if cov.bins.dtype != np.float64 or not cov.bins.flags.c_contiguous:
        cov.bins = np.ascontiguousarray(cov.bins, dtype=np.float64)
    if (cov.total_weight.dtype != np.float64
            or not cov.total_weight.flags.c_contiguous):
        cov.total_weight = np.ascontiguousarray(
            cov.total_weight, dtype=np.float64)

    p64 = ctypes.POINTER(ctypes.c_int64)
    pd = ctypes.POINTER(ctypes.c_double)
    out = np.empty(len(cov.bins), dtype=np.float64)
    lib.oarfish_logistic_prob(
        cov.bins.ctypes.data_as(pd),
        cov.total_weight.ctypes.data_as(pd),
        cov.bin_offsets.ctypes.data_as(p64),
        len(cov.txp_len),
        float(growth_rate),
        out.ctypes.data_as(pd),
        int(threads),
    )
    return out


def logistic_prob_np(cov: TranscriptCoverage, growth_rate: float) -> np.ndarray:
    """Per-bin logistic coverage probabilities for all transcripts
    (`logistic_prob`, `logistic_probability.rs:40-79`). Returns a flat f64
    array aligned with `cov.bins` / `cov.bin_offsets`. Mutates `cov.bins`
    by the pseudo-count, exactly as the reference mutates
    `coverage_bins`."""
    T = len(cov.txp_len)
    t_of_bin = np.repeat(np.arange(T), cov.nbins)
    # pseudo-count: total_weight/100 added to every bin, in place
    cov.bins += (cov.total_weight / 100.0)[t_of_bin]
    counts_f32, _widths_f32 = cov.normalized_counts_and_lengths()

    counts64 = counts_f32.astype(np.float64)
    offs = np.asarray(cov.bin_offsets[:-1], dtype=np.int64)
    if T and np.all(np.diff(cov.bin_offsets) > 0):
        # per-transcript sums as reduceat segments (bins are contiguous
        # per transcript); np.add.at costs ~1.5s at 16M bins
        count_sum = np.add.reduceat(counts64, offs)
    else:  # zero-bin transcripts would trip reduceat's empty-slice quirk
        count_sum = np.zeros(T)
        np.add.at(count_sum, t_of_bin, counts64)
    expected = count_sum / cov.nbins.astype(np.float64)

    active = count_sum > 1e-8
    out = np.zeros(len(cov.bins), dtype=np.float64)
    act_bins = active[t_of_bin]
    exp_b = expected[t_of_bin][act_bins]
    diff = (exp_b - counts64[act_bins]) / exp_b
    out[act_bins] = logistic(diff, growth_rate)
    return out


def binomial_probability(
    counts_f32: np.ndarray, widths_f32: np.ndarray, distinct_rate: float
) -> np.ndarray:
    """Multinomial bin probability for ONE transcript
    (`binomial_probability.rs:7-178`). Inputs are that transcript's f32 bin
    counts/widths."""
    ZERO_THRESH = 1e-20
    MAX_SCALE = 709.0
    n = len(counts_f32)
    count_sum = np.float32(counts_f32.sum())
    if count_sum == 0.0 or distinct_rate == 0.0:
        return np.zeros(n)

    c = counts_f32.astype(np.float64)
    w = widths_f32.astype(np.float64)
    probabilities = np.where((c == 0.0) | (w == 0.0), 0.0, c / (w * distinct_rate))

    max_val = counts_f32.max()
    mod = np.where(
        counts_f32 == max_val,
        np.float32(MAX_SCALE),
        ((counts_f32.astype(np.float64) * MAX_SCALE) / float(max_val)).astype(
            np.float32
        ),
    )
    sum_vec = np.float32(mod.sum())
    log_num1 = gammaln(float(sum_vec) + 1.0)
    log_denom = gammaln(mod.astype(np.float64) + 1.0) + gammaln(
        (sum_vec - mod).astype(np.float64) + 1.0
    )
    ln_zero = np.log(ZERO_THRESH)
    num2 = np.where(
        probabilities > ZERO_THRESH,
        np.log(np.maximum(probabilities, ZERO_THRESH)) * mod.astype(np.float64),
        ln_zero * mod.astype(np.float64),
    )
    one_minus = 1.0 - probabilities
    num3 = np.where(
        one_minus > ZERO_THRESH,
        np.log(np.maximum(one_minus, ZERO_THRESH))
        * (sum_vec - mod).astype(np.float64),
        ln_zero * (sum_vec - mod).astype(np.float64),
    )
    result = np.exp(log_num1 - log_denom + num2 + num3)
    s = result.sum()
    return result / s


def binomial_continuous_prob(cov: TranscriptCoverage) -> np.ndarray:
    """Per-bin binomial coverage probabilities for all transcripts
    (`binomial_continuous_prob`, `binomial_probability.rs:180-224`).
    Mutates `cov.bins` by the pseudo-count. Returns flat f64 array."""
    T = len(cov.txp_len)
    t_of_bin = np.repeat(np.arange(T), cov.nbins)
    cov.bins += (cov.total_weight / 100.0)[t_of_bin]
    counts_f32, widths_f32 = cov.normalized_counts_and_lengths()
    out = np.zeros(len(cov.bins), dtype=np.float64)
    for t in range(T):
        s, e = cov.bin_offsets[t], cov.bin_offsets[t + 1]
        cs, ws = counts_f32[s:e], widths_f32[s:e]
        distinct_rate = float(
            (cs.astype(np.float64) / ws.astype(np.float64)).sum()
        )
        out[s:e] = binomial_probability(cs, ws, distinct_rate)
    return out


def normalize_read_probs(
    store: AlignmentStore,
    cov: TranscriptCoverage,
    cov_prob_flat: np.ndarray,
    bin_width: int,
    threads: int = 8,
) -> None:
    """Native multithreaded `normalize_read_probs` (csrc/covmodel.cpp),
    falling back to the NumPy oracle. Same contract as
    `normalize_read_probs_np`."""
    lib = _get_lib()
    if lib is None:
        return normalize_read_probs_np(store, cov, cov_prob_flat, bin_width)
    A = store.num_alignments
    if A == 0:
        return
    import ctypes

    p64 = ctypes.POINTER(ctypes.c_int64)
    p32 = ctypes.POINTER(ctypes.c_int32)
    pd = ctypes.POINTER(ctypes.c_double)
    tid = np.ascontiguousarray(store.txp_id, dtype=np.int32)
    start = np.ascontiguousarray(store.start, dtype=np.int64)
    end = np.ascontiguousarray(store.end, dtype=np.int64)
    bnd = np.ascontiguousarray(store.boundaries, dtype=np.int64)
    cpf = np.ascontiguousarray(cov_prob_flat, dtype=np.float64)
    rc = lib.oarfish_normalize_read_probs(
        tid.ctypes.data_as(p32),
        start.ctypes.data_as(p64),
        end.ctypes.data_as(p64),
        A,
        bnd.ctypes.data_as(p64),
        store.num_reads,
        cov.bin_offsets.ctypes.data_as(p64),
        cov.nbins.ctypes.data_as(p64),
        cov.lenf.ctypes.data_as(pd),
        cpf.ctypes.data_as(pd),
        len(cpf),
        float(bin_width),
        store.cov_prob.ctypes.data_as(pd),
        int(threads),
    )
    if rc != 0:
        raise FloatingPointError(
            "invalid result in normalize_read_probs (NaN/inf coverage prob)"
        )


def normalize_read_probs_np(
    store: AlignmentStore,
    cov: TranscriptCoverage,
    cov_prob_flat: np.ndarray,
    bin_width: int,
) -> None:
    """Fill `store.cov_prob` with per-alignment expected coverage
    probabilities, normalized to sum 1 within each read
    (`normalize_read_probs`, `normalize_probability.rs:5-74`).
    Fully vectorized over all alignments via ragged bin expansion."""
    A = store.num_alignments
    if A == 0:
        return
    tid = store.txp_id.astype(np.int64)
    start = store.start.astype(np.float64)
    end = store.end.astype(np.float64)
    tlen = cov.lenf[tid]
    bl = float(bin_width)

    nb = cov.nbins[tid]
    start_bin = (start / bl).astype(np.int64)
    end_bin = np.minimum((end / bl).astype(np.int64), nb - 1)

    same = start_bin == end_bin
    expected = np.zeros(A, dtype=np.float64)

    # case 1: single-bin alignments — w = (end-start)/bl over cp[start_bin]
    if same.any():
        w = (end[same] - start[same]) / bl
        cp = cov_prob_flat[cov.bin_offsets[tid[same]] + start_bin[same]]
        # expected = (w*cp)/w == cp; w == 0 gives the reference's 0/0 = NaN,
        # caught by the finiteness check below (the reference panics too)
        expected[same] = np.where(w != 0.0, cp, np.nan)

    # case 2: multi-bin — fold i in [start_bin, end_bin) with the first bin
    # fractional and the end bin EXCLUDED (reference quirk). O(A) via
    # reduceat segment sums over the flat bin array: the old ragged
    # expansion materialized ~50 bins/alignment (np.repeat + np.add.at
    # over ~300M elements = 30s+ of a 2M-read coverage run); interior
    # bins all have weight 1, so only their cp sum is needed and the
    # fractional first bin is a closed form.
    multi = ~same
    if multi.any():
        mi = np.nonzero(multi)[0]
        off = cov.bin_offsets[tid[mi]]
        a = off + start_bin[mi] + 1  # interior bins [sb+1, eb)
        b = off + end_bin[mi]
        # prefix-sum differences: interior = sum(cov_prob_flat[a:b])
        # = csum0[b] - csum0[a]. (np.add.reduceat measured ~10us/segment
        # at 12M segments — pathological; the cumsum costs one pass over
        # the 16M-bin flat array and each alignment two gathers.)
        csum0 = np.empty(len(cov_prob_flat) + 1, dtype=np.float64)
        csum0[0] = 0.0
        np.cumsum(cov_prob_flat, out=csum0[1:])
        n_interior = np.maximum((b - a).astype(np.float64), 0.0)
        interior = np.where(a < b, csum0[b] - csum0[a], 0.0)
        bin_end_first = np.minimum(
            bl * start_bin[mi].astype(np.float64) + bl, tlen[mi]
        )
        w_first = (bin_end_first - start[mi]) / bl
        cp_first = cov_prob_flat[off + start_bin[mi]]
        expected[mi] = (w_first * cp_first + interior) / (
            w_first + n_interior
        )

    if not np.isfinite(expected).all():
        raise FloatingPointError(
            "invalid result in normalize_read_probs (NaN/inf coverage prob)"
        )

    # normalize within each read to sum 1 (sum<=0 -> divide by 1);
    # alignments are CSR-contiguous per read, so the per-read sums are
    # reduceat segments over boundaries (every read has >=1 alignment)
    rid = store.read_ids()
    bnd = np.asarray(store.boundaries, dtype=np.int64)
    if store.num_reads and np.all(np.diff(bnd) > 0):
        nsum = np.add.reduceat(expected, bnd[:-1])
    else:  # defensive: empty segments would trip reduceat's quirk
        nsum = np.zeros(store.num_reads)
        np.add.at(nsum, rid, expected)
    denom = np.where(nsum > 0.0, nsum, 1.0)
    store.cov_prob[:] = expected / denom[rid]
