// Native coverage-bin accumulation: the vectorized NumPy version of
// TranscriptInfo::add_interval (reference oarfish_types.rs:496-538)
// expands one row per (alignment, covered bin) — ~25 rows/alignment at
// bin width 100 — and runs ~10 s/M alignments in NumPy. This is the
// same arithmetic as a scalar loop, multithreaded with per-thread
// partial bin arrays. Semantics must match oarfish_tpu/host/store.py
// add_intervals exactly (including the f64->integer truncations).
//
// Two entry styles:
//  * oarfish_coverage_add — one-shot over a full alignment array
//    (allocates + merges per-thread partials per call).
//  * oarfish_cov_acc_new/add/finish — a persistent accumulator for the
//    streaming pack, which calls add once per decoded chunk: the
//    per-thread partial arrays (~NB doubles each) are allocated and
//    zeroed ONCE and merged ONCE, instead of per chunk. Before this,
//    16 chunks x 4 threads x 114 MB zero+merge was ~5s of the R=2M
//    coverage-mode pack (PERF_NOTES "covmodel", round 5).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC coverage.cpp -o liboarfish_coverage.so -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Accumulate alignments [lo, hi) into this thread's partial arrays.
inline void cov_accumulate_range(
    const int64_t* tid, const int64_t* start, const int64_t* end,
    int64_t lo, int64_t hi, const double* lenf, const int64_t* nbins,
    const int64_t* bin_offsets, const double* rbw, double* pb, double* tw) {
  for (int64_t i = lo; i < hi; i++) {
    int64_t ti = tid[i];
    tw[size_t(ti)] += 1.0;
    // EXACT oracle semantics (store.py add_intervals):
    // s = min(start, end); e = max(s, end) — a reversed interval
    // collapses to the point `end`, it is NOT swapped to the full span
    double s = double(std::min(start[i], end[i]));
    double e = std::max(s, double(end[i]));
    double tl = lenf[ti];
    double nb = double(nbins[ti]);
    int64_t start_bin = int64_t(std::floor(s / tl * nb));
    int64_t end_bin = int64_t(std::floor(e / tl * nb));
    if (end_bin <= start_bin) continue;
    double bw = rbw[ti];
    int64_t s_r = int64_t(s);
    int64_t e_r = int64_t(e);
    int64_t base = bin_offsets[ti];
    for (int64_t b = start_bin; b < end_bin; b++) {
      // f64 products truncated toward zero, as numpy astype does
      int64_t cbs = int64_t(double(b) * bw);
      int64_t cbe = int64_t(std::min(double(b + 1) * bw, tl));
      int64_t olap = 0;
      if (s_r <= cbe) olap = std::min(e_r, cbe) - std::max(s_r, cbs);
      double width = double(cbe - cbs);
      pb[size_t(base + b)] += double(olap) / width;
    }
  }
}

struct CovAcc {
  int nt;
  int64_t n_txps, n_bins_total;
  const double* lenf;
  const int64_t* nbins;
  const int64_t* bin_offsets;
  const double* rbw;
  std::vector<std::vector<double>> partial_bins;
  std::vector<std::vector<double>> partial_tw;
};

}  // namespace

extern "C" {

// bins/total_weight are accumulated in place (caller owns zeroed arrays).
void oarfish_coverage_add(const int64_t* tid, const int64_t* start,
                          const int64_t* end, int64_t n_aln,
                          const double* lenf, const int64_t* nbins,
                          const int64_t* bin_offsets, const double* rbw,
                          int64_t n_txps, int64_t n_bins_total,
                          double* bins, double* total_weight, int threads) {
  int nt = threads > 0 ? threads : 1;
  if (nt > 16) nt = 16;
  std::vector<std::vector<double>> partial_bins(nt);
  std::vector<std::vector<double>> partial_tw(nt);
  std::atomic<int64_t> next{0};
  const int64_t CHUNK = 65536;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      auto& pb = partial_bins[t];
      auto& tw = partial_tw[t];
      pb.assign(size_t(n_bins_total), 0.0);
      tw.assign(size_t(n_txps), 0.0);
      int64_t c;
      while ((c = next.fetch_add(1) * CHUNK) < n_aln) {
        int64_t hi = std::min(c + CHUNK, n_aln);
        cov_accumulate_range(tid, start, end, c, hi, lenf, nbins,
                             bin_offsets, rbw, pb.data(), tw.data());
      }
    });
  }
  for (auto& th : pool) th.join();
  for (int t = 0; t < nt; t++) {
    const auto& pb = partial_bins[t];
    for (int64_t i = 0; i < n_bins_total; i++) bins[i] += pb[size_t(i)];
    const auto& tw = partial_tw[t];
    for (int64_t i = 0; i < n_txps; i++) total_weight[i] += tw[size_t(i)];
  }
}

// Persistent accumulator for the chunked streaming pack. The geometry
// arrays (lenf/nbins/bin_offsets/rbw) must outlive the handle — the
// Python TranscriptCoverage owns them for the pack's duration.
void* oarfish_cov_acc_new(int64_t n_txps, int64_t n_bins_total,
                          const double* lenf, const int64_t* nbins,
                          const int64_t* bin_offsets, const double* rbw,
                          int threads) {
  int nt = threads > 0 ? threads : 1;
  if (nt > 16) nt = 16;
  auto* h = new CovAcc();
  h->nt = nt;
  h->n_txps = n_txps;
  h->n_bins_total = n_bins_total;
  h->lenf = lenf;
  h->nbins = nbins;
  h->bin_offsets = bin_offsets;
  h->rbw = rbw;
  h->partial_bins.resize(nt);
  h->partial_tw.resize(nt);
  // zero the partials in parallel (one-time ~nt x NB doubles)
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++)
    pool.emplace_back([h, t] {
      h->partial_bins[t].assign(size_t(h->n_bins_total), 0.0);
      h->partial_tw[t].assign(size_t(h->n_txps), 0.0);
    });
  for (auto& th : pool) th.join();
  return h;
}

void oarfish_cov_acc_add(void* handle, const int64_t* tid,
                         const int64_t* start, const int64_t* end,
                         int64_t n_aln) {
  auto* h = static_cast<CovAcc*>(handle);
  std::atomic<int64_t> next{0};
  const int64_t CHUNK = 65536;
  std::vector<std::thread> pool;
  for (int t = 0; t < h->nt; t++) {
    pool.emplace_back([&, t] {
      auto* pb = h->partial_bins[t].data();
      auto* tw = h->partial_tw[t].data();
      int64_t c;
      while ((c = next.fetch_add(1) * CHUNK) < n_aln) {
        int64_t hi = std::min(c + CHUNK, n_aln);
        cov_accumulate_range(tid, start, end, c, hi, h->lenf, h->nbins,
                             h->bin_offsets, h->rbw, pb, tw);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Merge partials into caller-owned arrays (accumulated in place, so the
// caller may pre-seed them) and free the handle.
void oarfish_cov_acc_finish(void* handle, double* bins,
                            double* total_weight) {
  auto* h = static_cast<CovAcc*>(handle);
  // parallel merge: each thread owns a contiguous bin range
  std::vector<std::thread> pool;
  int nt = h->nt;
  int64_t NB = h->n_bins_total;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      int64_t lo = NB * t / nt, hi = NB * (t + 1) / nt;
      for (int k = 0; k < nt; k++) {
        const auto* pb = h->partial_bins[k].data();
        for (int64_t i = lo; i < hi; i++) bins[i] += pb[size_t(i)];
      }
    });
  }
  for (auto& th : pool) th.join();
  for (int k = 0; k < nt; k++) {
    const auto* tw = h->partial_tw[k].data();
    for (int64_t i = 0; i < h->n_txps; i++) total_weight[i] += tw[size_t(i)];
  }
  delete h;
}

void oarfish_cov_acc_abort(void* handle) {
  delete static_cast<CovAcc*>(handle);
}

}  // extern "C"
