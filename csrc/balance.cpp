// Greedy flow-balancing placement for the v4 routed EM layouts.
//
// The dual-bucketed EM (oarfish_tpu/ops/em_v4.py) connects a transcript
// -side bucket layout and a read-side bucket layout with two static
// routes whose quota Q must cover the MAX per-(src,dst)-chunk flow.
// Random row placement leaves that max ~2-3x above the mean (load skew
// + Poisson noise); this module places each item (read or transcript)
// into the bucket row whose chunk minimizes the running max cell load —
// the "power of all choices" analogue of d-choice balls-into-bins, which
// concentrates the max near the mean.
//
// One generic routine serves all passes:
//   - transcript scalar pass: items = transcripts, every alignment's
//     src cell = 0 (pure per-chunk load balancing; n_src = 1);
//   - read vector pass: items = reads, src cell = chunk of the
//     alignment's transcript-side slot;
//   - transcript vector re-pass: items = transcripts, src cell = chunk
//     of the alignment's read-side slot (pass F transposed).
//
// An item of bucket (start, K) placed in bucket row i occupies slots
//   start + (i>>7)*K*128 + col*128 + (i&127)     for col in [0, size)
// (the column-major layout), so its chunk footprint depends only on the
// GROUP g = i>>7. Groups with equal (base/CHR, base%CHR) footprints are
// interchangeable; they are collapsed into candidate classes (at most
// ~2 per chunk for K*128 <= CHR, one per group otherwise), keeping the
// candidate list per item ~O(chunks spanned by its bucket).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC balance.cpp -o
//        liboarfish_balance.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct CandClass {
  int64_t base;       // representative slot base (start + g*K*128)
  int32_t capacity;   // remaining row slots across member groups
  int32_t next_group; // index into `groups` of the class
  int32_t next_row;   // next free row within the current group [0,128)
  std::vector<int32_t> groups; // member group ids, fill order
};

// classes per bucket + group -> class index map (shared by the greedy
// placer and the repair pass; the footprint-equivalence keying must
// match exactly)
void build_classes(int64_t n_buckets, const int64_t* bucket_start,
                   const int64_t* bucket_K,
                   const int64_t* bucket_ngroups, int64_t CHR,
                   std::vector<std::vector<CandClass>>& classes,
                   std::vector<std::vector<int32_t>>* gclass) {
  classes.assign(n_buckets, {});
  if (gclass) gclass->assign(n_buckets, {});
  for (int64_t b = 0; b < n_buckets; b++) {
    auto& cls = classes[b];
    std::unordered_map<int64_t, int32_t> key_of;  // (d0*CHR+off) -> idx
    const int64_t K = bucket_K[b];
    const int64_t start = bucket_start[b];
    const int64_t span = K << 7;  // slots per 128-row group
    if (gclass) (*gclass)[b].resize(bucket_ngroups[b]);
    for (int64_t g = 0; g < bucket_ngroups[b]; g++) {
      const int64_t base = start + g * span;
      const int64_t d0 = base / CHR;
      const int64_t off = base % CHR;
      // groups that sit inside one chunk are interchangeable regardless
      // of their offset; straddling / multi-chunk groups key on it
      const int64_t key =
          (off + span <= CHR) ? (d0 * CHR) : (d0 * CHR + off + 1);
      auto it = key_of.find(key);
      int32_t ci;
      if (it == key_of.end()) {
        ci = (int32_t)cls.size();
        key_of.emplace(key, ci);
        cls.push_back(CandClass{base, 128, 0, 0, {(int32_t)g}});
      } else {
        ci = it->second;
        cls[ci].capacity += 128;
        cls[ci].groups.push_back((int32_t)g);
      }
      if (gclass) (*gclass)[b][g] = ci;
    }
  }
}

}  // namespace

extern "C" {

// Returns the final max cell of F, or -1 on capacity errors.
//
// n_items        items to place (in `order` order)
// item_off       [n_items+1] CSR offsets into src_cell / item sizes
// src_cell       [nnz] src chunk id per (item, col) — col order matters
// item_bucket    [n_items] bucket id per item
// n_buckets      bucket count
// bucket_start   [n_buckets] first slot of the bucket
// bucket_K       [n_buckets] bucket width (slots per row)
// bucket_ngroups [n_buckets] 128-row groups in the bucket (rows_pad/128)
// CHR            elements per chunk (the balancing granularity)
// n_dst          dst chunk count (slot space / CHR)
// n_src          src chunk count (rows of F)
// order          [n_items] processing order (e.g. size-descending)
// F              [n_src*n_dst] int32 cell loads, in/out (preload with
//                contributions of items NOT being placed, e.g. big
//                transcripts with fixed rows)
// out_row        [n_items] assigned row within the item's bucket
int64_t oarfish_balance_greedy(
    int64_t n_items, const int64_t* item_off, const int32_t* src_cell,
    const int32_t* item_bucket, int64_t n_buckets,
    const int64_t* bucket_start, const int64_t* bucket_K,
    const int64_t* bucket_ngroups, int64_t CHR, int32_t n_dst,
    int32_t n_src, const int64_t* order, int32_t* F, int64_t* out_row) {
  // ---- candidate classes per bucket
  std::vector<std::vector<CandClass>> classes;
  build_classes(n_buckets, bucket_start, bucket_K, bucket_ngroups, CHR,
                classes, nullptr);

  // d-choice candidate sampling: evaluating every class costs
  // O(n_classes * item_size) per item, which dominates the build at
  // millions of items. Balls-into-bins theory (and measurement) says a
  // modest number of random choices already concentrates the max near
  // the mean; sample a deterministic pseudo-random window of DCAND
  // classes per item instead of scanning all of them.
  constexpr int32_t DCAND = 12;
  uint64_t h = 0x9e3779b97f4a7c15ull;
  for (int64_t oi = 0; oi < n_items; oi++) {
    const int64_t it = order[oi];
    const int64_t j0 = item_off[it], j1 = item_off[it + 1];
    const int64_t sz = j1 - j0;
    if (sz == 0) { out_row[it] = 0; continue; }
    auto& cls = classes[item_bucket[it]];
    const int32_t ncls = (int32_t)cls.size();
    int32_t n_eval = ncls;
    int32_t c_start = 0, c_step = 1;
    if (ncls > DCAND) {
      h = h * 6364136223846793005ull + 1442695040888963407ull;
      c_start = (int32_t)((h >> 33) % (uint64_t)ncls);
      // any step coprime with ncls covers all classes; odd steps are
      // coprime with the common power-of-two-ish counts often enough,
      // and full coverage only matters in the capacity-pressed tail
      c_step = (int32_t)(((h >> 17) % (uint64_t)(ncls - 1)) + 1);
      n_eval = DCAND;
    }
    int32_t best = -1;
    int64_t best_max = INT64_MAX, best_sum = INT64_MAX;
    int32_t ci = c_start;
    for (int32_t k = 0; k < n_eval || best < 0; k++) {
      if (k >= ncls + n_eval) break;  // every class visited: all full
      if (k >= n_eval) c_step = 1;    // exhaustive fallback sweep
      const int32_t cur = ci;
      ci += c_step;
      if (ci >= ncls) ci -= ncls;
      CandClass& c = cls[cur];
      if (c.capacity <= 0) continue;
      const int64_t base = c.base;
      int64_t mx = 0, sum = 0;
      if (base % CHR + (sz << 7) <= CHR) {
        // fast path: whole footprint in one dst chunk
        const int64_t d = base / CHR;
        const int32_t* Fd = F + (int64_t)0 * n_dst + d;
        for (int64_t j = j0; j < j1; j++) {
          const int64_t v = Fd[(int64_t)src_cell[j] * n_dst];
          sum += v;
          if (v > mx) mx = v;
        }
      } else {
        for (int64_t j = j0; j < j1; j++) {
          const int64_t d = (base + ((j - j0) << 7)) / CHR;
          const int64_t v = F[(int64_t)src_cell[j] * n_dst + d];
          sum += v;
          if (v > mx) mx = v;
        }
      }
      if (mx < best_max || (mx == best_max && sum < best_sum)) {
        best_max = mx;
        best_sum = sum;
        best = cur;
      }
    }
    if (best < 0) return -1;  // no capacity anywhere: caller bug
    CandClass& c = cls[best];
    for (int64_t j = j0; j < j1; j++) {
      const int64_t d = (c.base + ((j - j0) << 7)) / CHR;
      F[(int64_t)src_cell[j] * n_dst + d] += 1;
    }
    out_row[it] = (int64_t)c.groups[c.next_group] * 128 + c.next_row;
    c.capacity--;
    if (++c.next_row == 128) { c.next_row = 0; c.next_group++; }
  }

  int64_t mx = 0;
  const int64_t ncells = (int64_t)n_src * n_dst;
  for (int64_t i = 0; i < ncells; i++)
    if (F[i] > mx) mx = F[i];
  return mx;
}

// Local-search repair: re-place items whose footprint touches a cell
// with load > target, choosing the class minimizing (max, sum) by an
// EXHAUSTIVE class scan (repairs touch few items; the d-choice shortcut
// is what left the tail hot in the first place). `F` and `out_row`
// carry the incumbent placement in/out; the repair granularity CHR may
// differ from the greedy pass's (repair at the SELECTED route chunk so
// `target` is the actual quota boundary). Returns the final max cell.
int64_t oarfish_balance_repair(
    int64_t n_items, const int64_t* item_off, const int32_t* src_cell,
    const int32_t* item_bucket, int64_t n_buckets,
    const int64_t* bucket_start, const int64_t* bucket_K,
    const int64_t* bucket_ngroups, int64_t CHR, int32_t n_dst,
    int32_t n_src, int64_t target, int64_t max_rounds, int32_t* F,
    int64_t* out_row) {
  std::vector<std::vector<CandClass>> classes;
  std::vector<std::vector<int32_t>> gclass;
  build_classes(n_buckets, bucket_start, bucket_K, bucket_ngroups, CHR,
                classes, &gclass);
  // free-row stacks per class: member-local row id = pos_in_groups*128
  // + row127; replay the incumbent assignment to mark used rows
  struct Free {
    std::vector<int32_t> rows;  // free member-local row ids
  };
  std::vector<std::vector<Free>> freerows(n_buckets);
  std::vector<std::vector<std::vector<uint8_t>>> used(n_buckets);
  // member position of group g within its class's `groups` (flat per
  // bucket — per-class arrays would be O(n_classes * n_groups))
  std::vector<std::vector<int32_t>> gpos(n_buckets);
  for (int64_t b = 0; b < n_buckets; b++) {
    freerows[b].resize(classes[b].size());
    used[b].resize(classes[b].size());
    gpos[b].assign(bucket_ngroups[b], -1);
    for (size_t c = 0; c < classes[b].size(); c++) {
      used[b][c].assign(classes[b][c].groups.size() << 7, 0);
      for (size_t p = 0; p < classes[b][c].groups.size(); p++)
        gpos[b][classes[b][c].groups[p]] = (int32_t)p;
    }
  }
  for (int64_t it = 0; it < n_items; it++) {
    if (item_off[it + 1] == item_off[it]) continue;
    const int64_t b = item_bucket[it];
    const int32_t g = (int32_t)(out_row[it] >> 7);
    const int32_t c = gclass[b][g];
    used[b][c][(gpos[b][g] << 7) | (out_row[it] & 127)] = 1;
  }
  for (int64_t b = 0; b < n_buckets; b++)
    for (size_t c = 0; c < classes[b].size(); c++)
      for (int32_t r = (int32_t)used[b][c].size() - 1; r >= 0; r--)
        if (!used[b][c][r]) freerows[b][c].rows.push_back(r);

  int64_t mx_out = 0;
  for (int64_t round = 0; round < max_rounds; round++) {
    int64_t moved = 0;
    for (int64_t it = 0; it < n_items; it++) {
      const int64_t j0 = item_off[it], j1 = item_off[it + 1];
      const int64_t sz = j1 - j0;
      if (sz == 0) continue;
      const int64_t b = item_bucket[it];
      const int64_t K = bucket_K[b];
      const int64_t old_base = bucket_start[b] + (out_row[it] >> 7) * (K << 7);
      bool hot = false;
      for (int64_t j = j0; j < j1 && !hot; j++) {
        const int64_t d = (old_base + ((j - j0) << 7)) / CHR;
        hot = F[(int64_t)src_cell[j] * n_dst + d] > target;
      }
      if (!hot) continue;
      // remove the item, free its row
      for (int64_t j = j0; j < j1; j++) {
        const int64_t d = (old_base + ((j - j0) << 7)) / CHR;
        F[(int64_t)src_cell[j] * n_dst + d] -= 1;
      }
      const int32_t old_g = (int32_t)(out_row[it] >> 7);
      const int32_t old_c = gclass[b][old_g];
      freerows[b][old_c].rows.push_back(
          (gpos[b][old_g] << 7) | (int32_t)(out_row[it] & 127));
      // exhaustive best-class scan
      auto& cls = classes[b];
      int32_t best = -1;
      int64_t best_max = INT64_MAX, best_sum = INT64_MAX;
      for (int32_t cur = 0; cur < (int32_t)cls.size(); cur++) {
        if (freerows[b][cur].rows.empty()) continue;
        const int64_t base = cls[cur].base;
        int64_t m = 0, sum = 0;
        for (int64_t j = j0; j < j1; j++) {
          const int64_t d = (base + ((j - j0) << 7)) / CHR;
          const int64_t v = F[(int64_t)src_cell[j] * n_dst + d];
          sum += v;
          if (v > m) m = v;
        }
        if (m < best_max || (m == best_max && sum < best_sum)) {
          best_max = m;
          best_sum = sum;
          best = cur;
        }
      }
      // place (best is never -1: the item's own row was just freed)
      const int32_t lr = freerows[b][best].rows.back();
      freerows[b][best].rows.pop_back();
      const int64_t new_g = cls[best].groups[lr >> 7];
      const int64_t new_base =
          bucket_start[b] + new_g * (K << 7);
      for (int64_t j = j0; j < j1; j++) {
        const int64_t d = (new_base + ((j - j0) << 7)) / CHR;
        F[(int64_t)src_cell[j] * n_dst + d] += 1;
      }
      const int64_t new_row = (new_g << 7) | (lr & 127);
      if (best != old_c) moved++;
      out_row[it] = new_row;
    }
    mx_out = 0;
    const int64_t ncells = (int64_t)n_src * n_dst;
    for (int64_t i = 0; i < ncells; i++)
      if (F[i] > mx_out) mx_out = F[i];
    if (mx_out <= target || moved == 0) break;
  }
  return mx_out;
}

// ---- layout slot-fill helpers (the _apply_reads/_apply_small hot
// paths of em_v4._v4_layout, called repeatedly by the repair loop;
// the NumPy forms materialize several A-sized int64 temporaries per
// call). Column-major slot of (row, col) in bucket (start, K):
//   start + (row>>7)*(K<<7) + (col<<7) + (row&127)

// Read-side: item i (a read) occupies cols [0, off[i+1]-off[i]) of its
// bucket row; its slots land at slot_out[aln_base[i] + j].
void oarfish_v4_read_slots(int64_t n_items, const int64_t* off,
                           const int64_t* aln_base, const int64_t* ib,
                           const int64_t* bstart, const int64_t* bK,
                           const int64_t* row, int64_t* slot_out,
                           int32_t n_threads) {
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      int64_t lo = n_items * t / nt, hi = n_items * (t + 1) / nt;
      for (int64_t i = lo; i < hi; i++) {
        const int64_t K = bK[ib[i]];
        const int64_t base = bstart[ib[i]] + (row[i] >> 7) * (K << 7) +
                             (row[i] & 127);
        int64_t* o = slot_out + aln_base[i];
        const int64_t m = off[i + 1] - off[i];
        for (int64_t j = 0; j < m; j++) o[j] = base + (j << 7);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Small-transcript side: alignment k of transcript tid[k] sits at
// column rank[k] of the transcript's bucket row row_of[tid[k]]; the
// slot is written to slot_out[out_pos[k]].
void oarfish_v4_small_slots(int64_t n, const int64_t* tid,
                            const int64_t* rank, const int64_t* out_pos,
                            const int64_t* bst, const int64_t* bK,
                            const int64_t* row_of, int64_t* slot_out,
                            int32_t n_threads) {
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      for (int64_t k = lo; k < hi; k++) {
        const int64_t tt = tid[k];
        const int64_t K = bK[tt], r = row_of[tt];
        slot_out[out_pos[k]] =
            bst[tt] + (r >> 7) * (K << 7) + (rank[k] << 7) + (r & 127);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// CSR ramp fill: out[off[i]+j] = base[i] + j for j in [0, off[i+1]-off[i])
// — the NumPy `repeat(base, sizes) + (arange(tot) - repeat(off, sizes))`
// expansion in one pass.
void oarfish_ramp_fill(int64_t n_items, const int64_t* off,
                       const int64_t* base, int64_t* out) {
  int nt = (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  if (n_items < 4096) nt = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      const int64_t lo = n_items * t / nt, hi = n_items * (t + 1) / nt;
      for (int64_t i = lo; i < hi; i++) {
        int64_t* o = out + off[i];
        const int64_t m = off[i + 1] - off[i], b = base[i];
        for (int64_t j = 0; j < m; j++) o[j] = b + j;
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Stable counting sort by small int key: writes order (positions sorted
// by (key, position)), per-element rank within its key run (position
// order), and run_start[T+1] offsets. Replaces an A-sized argsort +
// cumsum arithmetic. Keys must lie in [0, T); returns nonzero if not.
int64_t oarfish_rank_by_key(int64_t n, const int64_t* key, int64_t T,
                            int64_t* order, int64_t* rank,
                            int64_t* run_start) {
  int nt = (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  // parallel stable counting sort: per-range histograms, per-(thread,
  // key) offset combine, then each thread scatters its own input range
  // — positions within a key stay in input order (stability), output
  // identical to the serial form for any thread count.
  std::vector<std::vector<int64_t>> cnt_p(nt);
  std::vector<int64_t> bad(nt, 0);
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) {
      pool.emplace_back([&, t] {
        auto& c = cnt_p[t];
        c.assign(size_t(T) + 1, 0);
        const int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
        for (int64_t i = lo; i < hi; i++) {
          const int64_t k = key[i];
          if (k < 0 || k >= T) { bad[t] = 1; return; }
          c[size_t(k) + 1]++;
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  for (int t = 0; t < nt; t++)
    if (bad[t]) return 1;
  // run_start[k+1] = total count of key k (exclusive-prefixed below);
  // cnt_p[t][k] becomes thread t's starting offset within key k's run
  for (int64_t k = 0; k < T; k++) {
    int64_t acc = 0;
    for (int t = 0; t < nt; t++) {
      const int64_t c = cnt_p[t][size_t(k) + 1];
      cnt_p[t][size_t(k) + 1] = acc;
      acc += c;
    }
    run_start[k + 1] = acc;
  }
  run_start[0] = 0;
  for (int64_t t = 0; t < T; t++) run_start[t + 1] += run_start[t];
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) {
      pool.emplace_back([&, t] {
        auto& off = cnt_p[t];
        const int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
        for (int64_t i = lo; i < hi; i++) {
          const int64_t k = key[i];
          const int64_t r = off[size_t(k) + 1]++;
          order[run_start[k] + r] = i;
          rank[i] = r;
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}

// 2-D flow histogram: F[(a[i]/div)*n_dst + b[i]/div] += 1 over
// i in idx[0:n_idx] (idx NULL = all of [0, n)). F must arrive zeroed.
// Bounds are CHECKED (the NumPy np.add.at this replaces raised on
// out-of-range indices; silent heap writes would be strictly worse):
// returns 0 on success, 1 on an out-of-range element or idx entry.
int64_t oarfish_flows2d(int64_t n, const int64_t* a, const int64_t* b,
                        const int64_t* idx, int64_t n_idx, int64_t div,
                        int64_t n_src, int64_t n_dst, int32_t* F) {
  const int64_t count = idx ? n_idx : n;
  for (int64_t k = 0; k < count; k++) {
    const int64_t i = idx ? idx[k] : k;
    if (i < 0 || i >= n) return 1;
    const int64_t r = a[i] / div, c = b[i] / div;
    if (a[i] < 0 || b[i] < 0 || r >= n_src || c >= n_dst) return 1;
    F[r * n_dst + c] += 1;
  }
  return 0;
}

}  // extern "C"

// Big-transcript side: alignment k of a big transcript (big_index[tid]
// >= 0) occupies column rank[k] % capk of physical row
// bphys(big_off_log[bi] + rank[k]/capk); non-big alignments are left
// untouched. Replaces four boolean-masked A-sized NumPy passes with one
// threaded scan (em_v4._v4_layout "big_slots" phase).
extern "C" void oarfish_v4_big_slots(
    int64_t n, const int64_t* tid, const int64_t* rank,
    const int64_t* big_index, const int64_t* big_off_log, int64_t capk,
    int64_t big_start, int64_t bp, int64_t bq, int64_t* slot_out,
    int32_t n_threads) {
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  const bool ident = (bp == 1 && bq == 1);
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      for (int64_t k = lo; k < hi; k++) {
        const int64_t bi = big_index[tid[k]];
        if (bi < 0) continue;
        const int64_t rl = big_off_log[bi] + rank[k] / capk;
        const int64_t row = ident ? rl : (rl / bq) * bp + rl % bq;
        slot_out[k] = big_start + (row >> 7) * (capk << 7) +
                      ((rank[k] % capk) << 7) + (row & 127);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Fused gather + divide + narrow: out[i] = src[idx[i]] / div as int32
// (idx == nullptr: out[i] = src[i] / div). The placement passes call
// the NumPy form (gather, floordiv, astype — three A-sized temporaries)
// repeatedly inside the repair loop.
extern "C" void oarfish_gather_div_i32(
    int64_t n, const int64_t* src, const int64_t* idx, int64_t div,
    int32_t* out, int32_t n_threads) {
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
      if (idx) {
        for (int64_t i = lo; i < hi; i++)
          out[i] = (int32_t)(src[idx[i]] / div);
      } else {
        for (int64_t i = lo; i < hi; i++)
          out[i] = (int32_t)(src[i] / div);
      }
    });
  }
  for (auto& th : pool) th.join();
}
