// Edge coloring of d-regular bipartite multigraphs by recursive Euler
// splitting (d a power of two). Used by the static-permutation planner
// (oarfish_tpu/ops/permute_plan.py) to build TPU routing tables: each
// color class is a perfect matching = one intermediate lane/column.
//
// Two entry points:
//  - oarfish_edge_color: one graph whose edges are ALREADY d-regular
//    (the tile-permute planner's case: every row holds exactly 128
//    elements).
//  - oarfish_edge_color_batch: many independent irregular graphs
//    (GlobalRoute's per-chunk channel graphs); each is padded to
//    d-regular with dummy edges INTERNALLY (the dummies' colors are
//    discarded) and the graphs are colored in parallel by a thread
//    pool. This is the v4 layout-build hot path.
//
// The core recursion is in-place over one edge-index buffer (no
// per-level vector allocation) with scratch reused across graphs.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC euler_color.cpp -o
//        liboarfish_color.so -pthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace {

// Per-worker reusable scratch. `n_nodes` is the per-side node count of
// the padded graph; node v on the right is addressed as n_nodes + v.
struct ColorCore {
  std::vector<int64_t> deg, off, ptr, inc;
  std::vector<uint8_t> used, half;
  std::vector<int64_t> eidx, tmp;
  std::vector<int32_t> es, ed, col;

  // Split edges eidx[0:m] (values index es/ed) into two halves of equal
  // degree at every node by orienting Euler circuits. Writes
  // half_out[i] for each POSITION i in [0, m).
  void split(const int32_t* es_, const int32_t* ed_, const int64_t* ids,
             int64_t m, int64_t n_nodes, uint8_t* half_out) {
    int64_t nn = 2 * n_nodes;
    deg.assign(nn, 0);
    for (int64_t i = 0; i < m; i++) {
      deg[es_[ids[i]]]++;
      deg[n_nodes + ed_[ids[i]]]++;
    }
    off.resize(nn + 1);
    off[0] = 0;
    for (int64_t v = 0; v < nn; v++) off[v + 1] = off[v] + deg[v];
    inc.resize(2 * m);
    ptr.assign(nn, 0);
    for (int64_t i = 0; i < m; i++) {
      int64_t l = es_[ids[i]];
      int64_t r = n_nodes + ed_[ids[i]];
      inc[off[l] + ptr[l]++] = i;
      inc[off[r] + ptr[r]++] = i;
    }
    used.assign(m, 0);
    std::fill(ptr.begin(), ptr.end(), 0);
    for (int64_t start = 0; start < nn; start++) {
      for (;;) {
        while (ptr[start] < deg[start] &&
               used[inc[off[start] + ptr[start]]])
          ptr[start]++;
        if (ptr[start] >= deg[start]) break;
        int64_t v = start;
        uint8_t flag = 0;
        for (;;) {
          while (ptr[v] < deg[v] && used[inc[off[v] + ptr[v]]]) ptr[v]++;
          if (ptr[v] >= deg[v]) break;
          int64_t e = inc[off[v] + ptr[v]];
          used[e] = 1;
          half_out[e] = flag;
          flag ^= 1;
          int64_t l = es_[ids[e]];
          int64_t r = n_nodes + ed_[ids[e]];
          v = (v == l) ? r : l;
        }
      }
    }
  }

  // Color M regular edges with `colors` colors into out_color[0:M].
  void color(const int32_t* es_, const int32_t* ed_, int64_t M,
             int64_t n_nodes, int32_t colors, int32_t* out_color) {
    memset(out_color, 0, size_t(M) * sizeof(int32_t));
    eidx.resize(M);
    for (int64_t i = 0; i < M; i++) eidx[i] = i;
    half.resize(M);
    tmp.resize(M);
    struct Seg {
      int64_t lo, hi;
      int32_t c;
    };
    std::vector<Seg> stack;
    stack.push_back({0, M, colors});
    while (!stack.empty()) {
      Seg s = stack.back();
      stack.pop_back();
      if (s.c <= 1 || s.hi <= s.lo) continue;
      int64_t m = s.hi - s.lo;
      split(es_, ed_, eidx.data() + s.lo, m, n_nodes, half.data());
      // stable in-place partition: half-0 edges stay low, half-1 high
      int64_t a = s.lo, nb = 0;
      for (int64_t i = 0; i < m; i++) {
        int64_t e = eidx[s.lo + i];
        if (half[i]) {
          out_color[e] += s.c / 2;
          tmp[nb++] = e;
        } else {
          eidx[a++] = e;
        }
      }
      memcpy(eidx.data() + a, tmp.data(), size_t(nb) * sizeof(int64_t));
      stack.push_back({s.lo, a, s.c / 2});
      stack.push_back({a, s.hi, s.c / 2});
    }
  }

  // Pad an irregular graph (m data edges over n_nodes per side) to
  // `colors`-regular with dummy edges, color, and write the DATA edges'
  // colors to out (dummy colors discarded). Returns false (touching
  // nothing) if the graph violates the degree<=colors / node-id range
  // contract — out-of-contract input would otherwise corrupt memory.
  bool color_padded(const int32_t* src, const int32_t* dst, int64_t m,
                    int64_t n_nodes, int32_t colors, int32_t* out) {
    int64_t M = int64_t(colors) * n_nodes;
    if (m > M) return false;
    es.resize(M);
    ed.resize(M);
    memcpy(es.data(), src, size_t(m) * sizeof(int32_t));
    memcpy(ed.data(), dst, size_t(m) * sizeof(int32_t));
    deg.assign(2 * n_nodes, 0);
    for (int64_t i = 0; i < m; i++) {
      if (src[i] < 0 || src[i] >= n_nodes || dst[i] < 0 ||
          dst[i] >= n_nodes)
        return false;
      deg[src[i]]++;
      deg[n_nodes + dst[i]]++;
    }
    for (int64_t v = 0; v < 2 * n_nodes; v++)
      if (deg[v] > colors) return false;
    int64_t w = m;
    for (int64_t v = 0; v < n_nodes; v++)
      for (int64_t k = deg[v]; k < colors; k++) es[w++] = int32_t(v);
    w = m;
    for (int64_t v = 0; v < n_nodes; v++)
      for (int64_t k = deg[n_nodes + v]; k < colors; k++)
        ed[w++] = int32_t(v);
    col.resize(M);
    color(es.data(), ed.data(), M, n_nodes, colors, col.data());
    memcpy(out, col.data(), size_t(m) * sizeof(int32_t));
    return true;
  }

  // Konig alternating-path edge coloring: proper `colors`-coloring of
  // an irregular bipartite graph with max degree <= colors, touching
  // ONLY the m data edges (no dummy padding). For the route-table
  // channel graphs the padded Euler recursion colors
  // colors*max(n_left,n_right) edges over log2(colors) levels; this
  // runs in ~O(m) amortized (alternating-path flips are rare and
  // short), a large constant-factor win when m << colors*n_nodes.
  // Contract mirrors color_padded: returns false (touching nothing
  // beyond scratch) on degree/node-range violations.
  std::vector<int32_t> atL, atR;        // node x color -> edge id | -1
  std::vector<uint64_t> freeL, freeR;   // node -> 2x64-bit free mask
  std::vector<int32_t> path;

  static inline int first_free(const uint64_t* f) {
    if (f[0]) return __builtin_ctzll(f[0]);
    return 64 + __builtin_ctzll(f[1]);
  }

  bool color_konig(const int32_t* src, const int32_t* dst, int64_t m,
                   int64_t n_left, int64_t n_right, int32_t colors,
                   int32_t* out) {
    if (colors < 1 || colors > 128) return false;
    deg.assign(n_left + n_right, 0);
    for (int64_t i = 0; i < m; i++) {
      if (src[i] < 0 || src[i] >= n_left || dst[i] < 0 ||
          dst[i] >= n_right)
        return false;
      if (++deg[src[i]] > colors) return false;
      if (++deg[n_left + dst[i]] > colors) return false;
    }
    atL.assign(size_t(n_left) * colors, -1);
    atR.assign(size_t(n_right) * colors, -1);
    uint64_t m0 = colors >= 64 ? ~0ull
                               : ((1ull << colors) - 1);
    uint64_t m1 = colors <= 64 ? 0ull
                               : (colors == 128 ? ~0ull
                                                : ((1ull << (colors - 64)) - 1));
    freeL.assign(size_t(n_left) * 2, 0);
    freeR.assign(size_t(n_right) * 2, 0);
    for (int64_t v = 0; v < n_left; v++) {
      freeL[2 * v] = m0;
      freeL[2 * v + 1] = m1;
    }
    for (int64_t v = 0; v < n_right; v++) {
      freeR[2 * v] = m0;
      freeR[2 * v + 1] = m1;
    }
    auto clearbit = [](uint64_t* f, int c) { f[c >> 6] &= ~(1ull << (c & 63)); };
    auto setbit = [](uint64_t* f, int c) { f[c >> 6] |= 1ull << (c & 63); };
    for (int64_t e = 0; e < m; e++) {
      const int32_t u = src[e], v = dst[e];
      uint64_t* fu = &freeL[2 * size_t(u)];
      uint64_t* fv = &freeR[2 * size_t(v)];
      uint64_t c0 = fu[0] & fv[0], c1 = fu[1] & fv[1];
      int c;
      if (c0 | c1) {
        c = c0 ? __builtin_ctzll(c0) : 64 + __builtin_ctzll(c1);
      } else {
        // no common free color: free `a` at v by flipping the maximal
        // a/b alternating path from v (it provably never reaches u)
        const int a = first_free(fu);
        const int b = first_free(fv);
        path.clear();
        int side = 1;  // 0 = left, 1 = right
        int32_t node = v;
        int want = a;
        for (;;) {
          int32_t e2 = side ? atR[size_t(node) * colors + want]
                            : atL[size_t(node) * colors + want];
          if (e2 < 0) break;
          path.push_back(e2);
          node = side ? src[e2] : dst[e2];
          side ^= 1;
          want = (want == a) ? b : a;
        }
        // two-pass recolor: clear every old entry, then set new ones
        for (size_t i = 0; i < path.size(); i++) {
          const int32_t e2 = path[i];
          const int old = (i % 2 == 0) ? a : b;
          atL[size_t(src[e2]) * colors + old] = -1;
          atR[size_t(dst[e2]) * colors + old] = -1;
          setbit(&freeL[2 * size_t(src[e2])], old);
          setbit(&freeR[2 * size_t(dst[e2])], old);
        }
        for (size_t i = 0; i < path.size(); i++) {
          const int32_t e2 = path[i];
          const int neu = (i % 2 == 0) ? b : a;
          atL[size_t(src[e2]) * colors + neu] = e2;
          atR[size_t(dst[e2]) * colors + neu] = e2;
          clearbit(&freeL[2 * size_t(src[e2])], neu);
          clearbit(&freeR[2 * size_t(dst[e2])], neu);
          out[e2] = neu;  // flipped edges get their NEW color reported
        }
        c = a;
      }
      out[e] = c;
      atL[size_t(u) * colors + c] = int32_t(e);
      atR[size_t(v) * colors + c] = int32_t(e);
      clearbit(fu, c);
      clearbit(fv, c);
    }
    return true;
  }
};

}  // namespace

extern "C" {

// One graph whose edges are already `colors`-regular. src/dst: [n]
// node ids; out_color: [n].
void oarfish_edge_color(const int32_t* src, const int32_t* dst, int64_t n,
                        int32_t n_left, int32_t n_right, int32_t colors,
                        int32_t* out_color) {
  ColorCore core;
  int64_t n_nodes = n_left > n_right ? n_left : n_right;
  core.color(src, dst, n, n_nodes, colors, out_color);
}

// Many independent graphs: graph g's data edges are
// src/dst[offsets[g] : offsets[g+1]]; every graph has `n_nodes` nodes
// per side and is padded to `colors`-regular internally. Colors of the
// data edges land in out[offsets[g] : offsets[g+1]]. Empty graphs are
// skipped (their slice of `out` is untouched). Returns 0 on success,
// g+1 if graph g violates the degree/node-range contract.
int64_t oarfish_edge_color_batch(const int32_t* src, const int32_t* dst,
                                 const int64_t* offsets, int64_t n_graphs,
                                 int64_t n_nodes, int32_t colors,
                                 int32_t n_threads, int32_t* out) {
  int nt = n_threads > 0
               ? n_threads
               : int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n_graphs) nt = int(n_graphs > 0 ? n_graphs : 1);
  std::atomic<int64_t> next{0};
  std::atomic<int64_t> bad{0};  // 0 = ok, else first bad graph + 1
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&] {
      ColorCore core;
      int64_t g;
      while ((g = next.fetch_add(1)) < n_graphs) {
        if (bad.load(std::memory_order_relaxed)) return;
        int64_t lo = offsets[g], hi = offsets[g + 1];
        if (hi <= lo) continue;
        if (!core.color_padded(src + lo, dst + lo, hi - lo, n_nodes,
                               colors, out + lo)) {
          int64_t expect = 0;
          bad.compare_exchange_strong(expect, g + 1);
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  return bad.load();
}

// Full GlobalRoute table build (see oarfish_tpu/ops/static_permute.py
// GlobalRoute.__init__ for the geometry contract). Given the static
// partial injective map out_idx[k] <- in_idx[k] over chunked tiles of
// CR*128 elements, computes per-edge (src chunk, dst chunk, rank within
// flow) by stable counting sort, 128-edge-colors each chunk's channel
// graph (stage 1: in_row -> quota row; stage 3: quota row -> out_row),
// and scatters the nine int8 routing tables. Tables must arrive
// ZEROED; only data positions are written. Layouts (C-contiguous):
//   s1_r1  [n_src, CR, 128]        s1_src/s1_row [n_src, R1/128, 128, 128]
//   s1_r2  [n_src, R1, 128]        s3_r1 [n_dst, R3, 128]
//   s3_src/s3_row [n_dst, CR/128, 128, 128]
//   s3_r2/s3_mask [n_dst, CR, 128]
// where R1 = n_dst*Q/128, R3 = n_src*Q/128. s1_src may be null when
// CR == 128. Returns 0 on success; 1 = chunk id out of range, 2 = a
// (src,dst) flow exceeds Q, 3 = coloring contract violation.
//
// Paired variant (`oarfish_route_tables_pair`): also fills the REVERSED
// route's nine tables (out_idx <- in_idx swapped; geometry n_src/n_dst
// swapped, same Q). The reversed route's stage-1 graph per chunk is the
// forward route's stage-3 graph with edge direction flipped (identical
// flows, identical ranks — rank is by edge order within each (s,d)
// group, shared), so ONE edge coloring per chunk side serves all four
// stage-table sets — the colorings are ~2/3 of the table-build cost.
static int64_t route_tables_impl(
    const int64_t* out_idx, const int64_t* in_idx, int64_t E, int32_t CR,
    int32_t n_src, int32_t n_dst, int32_t Q, int32_t n_threads,
    int8_t* s1_r1, int8_t* s1_src, int8_t* s1_row, int8_t* s1_r2,
    int8_t* s3_r1, int8_t* s3_src, int8_t* s3_row, int8_t* s3_r2,
    int8_t* s3_mask,
    // reversed-route tables (all null in the single-route call);
    // b_s1_src may be null when CR == 128
    int8_t* b_s1_r1, int8_t* b_s1_src, int8_t* b_s1_row, int8_t* b_s1_r2,
    int8_t* b_s3_r1, int8_t* b_s3_src, int8_t* b_s3_row, int8_t* b_s3_r2,
    int8_t* b_s3_mask) {
  const int64_t L = 128;
  const int64_t CHR = int64_t(CR) * L;
  const int64_t R1 = int64_t(n_dst) * Q / L;
  const int64_t R3 = int64_t(n_src) * Q / L;
  const int64_t H1 = R1 / L;
  const bool timing = getenv("OARFISH_ROUTE_TIMING") != nullptr;
  // OARFISH_EULER_COLOR=1 forces the padded Euler-split coloring (the
  // Konig alternating-path colorer is the default; both produce proper
  // colorings, generally different ones -- any proper coloring yields a
  // correct route, see permute_plan.py)
  const char* ec = getenv("OARFISH_EULER_COLOR");
  const bool use_euler = ec && ec[0] == '1';
  auto t0 = std::chrono::steady_clock::now();
  auto tick = [&](const char* name) {
    if (!timing) return;
    auto t1 = std::chrono::steady_clock::now();
    fprintf(stderr, "route_tables %s %.3fs\n", name,
            std::chrono::duration<double>(t1 - t0).count());
    t0 = t1;
  };

  std::vector<int32_t> s_of(E), d_of(E), rank(E);
  for (int64_t i = 0; i < E; i++) {
    int64_t s = in_idx[i] / CHR, d = out_idx[i] / CHR;
    if (in_idx[i] < 0 || out_idx[i] < 0 || s >= n_src || d >= n_dst)
      return 1;
    s_of[i] = int32_t(s);
    d_of[i] = int32_t(d);
  }
  tick("s_of/d_of");
  {
    std::vector<int32_t> run(size_t(n_src) * n_dst, 0);
    for (int64_t i = 0; i < E; i++) {
      int32_t r = run[size_t(s_of[i]) * n_dst + d_of[i]]++;
      if (r >= Q) return 2;
      rank[i] = r;
    }
  }
  tick("rank");
  // group edges by src chunk / by dst chunk (original order within)
  std::vector<int64_t> s_off(n_src + 1, 0), d_off(n_dst + 1, 0);
  for (int64_t i = 0; i < E; i++) {
    s_off[s_of[i] + 1]++;
    d_off[d_of[i] + 1]++;
  }
  for (int32_t s = 0; s < n_src; s++) s_off[s + 1] += s_off[s];
  for (int32_t d = 0; d < n_dst; d++) d_off[d + 1] += d_off[d];
  std::vector<int64_t> s_ord(E), d_ord(E);
  {
    std::vector<int64_t> sp(s_off.begin(), s_off.end() - 1);
    std::vector<int64_t> dp(d_off.begin(), d_off.end() - 1);
    for (int64_t i = 0; i < E; i++) {
      s_ord[sp[s_of[i]]++] = i;
      d_ord[dp[d_of[i]]++] = i;
    }
  }
  tick("group_sorts");

  int nt = n_threads > 0 ? n_threads
                         : int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  int64_t n_tasks = int64_t(n_src) + n_dst;
  if (nt > n_tasks) nt = int(n_tasks);
  std::atomic<int64_t> next{0};
  std::atomic<int64_t> bad{0};
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&] {
      ColorCore core;
      std::vector<int32_t> a_row, b_row, col;
      int64_t task;
      while ((task = next.fetch_add(1)) < n_tasks) {
        if (bad.load(std::memory_order_relaxed)) return;
        if (task < n_src) {
          // stage 1, src chunk s: in_row -> quota row
          int32_t s = int32_t(task);
          int64_t lo = s_off[s], m = s_off[s + 1] - lo;
          if (m == 0) continue;
          a_row.resize(m);
          b_row.resize(m);
          col.resize(m);
          for (int64_t j = 0; j < m; j++) {
            int64_t i = s_ord[lo + j];
            a_row[j] = int32_t((in_idx[i] % CHR) / L);
            b_row[j] =
                int32_t((int64_t(d_of[i]) * Q + rank[i]) / L);
          }
          bool ok;
          if (use_euler) {
            int64_t n_nodes = CR > R1 ? CR : R1;
            ok = core.color_padded(a_row.data(), b_row.data(), m,
                                   n_nodes, int32_t(L), col.data());
          } else {
            ok = core.color_konig(a_row.data(), b_row.data(), m, CR, R1,
                                  int32_t(L), col.data());
          }
          if (!ok) {
            int64_t expect = 0;
            bad.compare_exchange_strong(expect, 3);
            return;
          }
          const int64_t H3 = CR / L;
          for (int64_t j = 0; j < m; j++) {
            int64_t i = s_ord[lo + j];
            int64_t irow = a_row[j], ilane = in_idx[i] % L;
            int64_t q = int64_t(d_of[i]) * Q + rank[i];
            int64_t qrow = b_row[j], qlane = q % L;
            int64_t c = col[j];
            s1_r1[(int64_t(s) * CR + irow) * L + c] = int8_t(ilane);
            int64_t mid =
                ((int64_t(s) * H1 + qrow / L) * L + c) * L + qrow % L;
            if (s1_src) s1_src[mid] = int8_t(irow / L);
            s1_row[mid] = int8_t(irow % L);
            s1_r2[(int64_t(s) * R1 + qrow) * L + qlane] = int8_t(c);
            if (b_s3_r1) {
              // reversed route, stage 3, dst chunk s (R3_rev == R1):
              // quota row q (same rank) -> this chunk's in_idx rows
              b_s3_r1[(int64_t(s) * R1 + qrow) * L + c] = int8_t(qlane);
              int64_t midb =
                  ((int64_t(s) * H3 + irow / L) * L + c) * L + irow % L;
              b_s3_src[midb] = int8_t(qrow / L);
              b_s3_row[midb] = int8_t(qrow % L);
              int64_t ofb = (int64_t(s) * CR + irow) * L + ilane;
              b_s3_r2[ofb] = int8_t(c);
              b_s3_mask[ofb] = 1;
            }
          }
        } else {
          // stage 3, dst chunk d: quota row (post-exchange) -> out_row
          int32_t d = int32_t(task - n_src);
          int64_t lo = d_off[d], m = d_off[d + 1] - lo;
          if (m == 0) continue;
          a_row.resize(m);
          b_row.resize(m);
          col.resize(m);
          for (int64_t j = 0; j < m; j++) {
            int64_t i = d_ord[lo + j];
            a_row[j] =
                int32_t((int64_t(s_of[i]) * Q + rank[i]) / L);
            b_row[j] = int32_t((out_idx[i] % CHR) / L);
          }
          bool ok;
          if (use_euler) {
            int64_t n_nodes = CR > R3 ? CR : R3;
            ok = core.color_padded(a_row.data(), b_row.data(), m,
                                   n_nodes, int32_t(L), col.data());
          } else {
            ok = core.color_konig(a_row.data(), b_row.data(), m, R3, CR,
                                  int32_t(L), col.data());
          }
          if (!ok) {
            int64_t expect = 0;
            bad.compare_exchange_strong(expect, 3);
            return;
          }
          const int64_t H3 = CR / L;
          const int64_t H1b = R3 / L;  // reversed route's H1
          for (int64_t j = 0; j < m; j++) {
            int64_t i = d_ord[lo + j];
            int64_t q3 = int64_t(s_of[i]) * Q + rank[i];
            int64_t q3row = a_row[j], q3lane = q3 % L;
            int64_t orow = b_row[j], olane = out_idx[i] % L;
            int64_t c = col[j];
            s3_r1[(int64_t(d) * R3 + q3row) * L + c] = int8_t(q3lane);
            int64_t mid =
                ((int64_t(d) * H3 + orow / L) * L + c) * L + orow % L;
            s3_src[mid] = int8_t(q3row / L);
            s3_row[mid] = int8_t(q3row % L);
            int64_t of = (int64_t(d) * CR + orow) * L + olane;
            s3_r2[of] = int8_t(c);
            s3_mask[of] = 1;
            if (b_s1_r1) {
              // reversed route, stage 1, src chunk d (R1_rev == R3):
              // this chunk's out_idx rows -> quota row q3 (same rank)
              b_s1_r1[(int64_t(d) * CR + orow) * L + c] = int8_t(olane);
              int64_t midb =
                  ((int64_t(d) * H1b + q3row / L) * L + c) * L +
                  q3row % L;
              if (b_s1_src) b_s1_src[midb] = int8_t(orow / L);
              b_s1_row[midb] = int8_t(orow % L);
              b_s1_r2[(int64_t(d) * R3 + q3row) * L + q3lane] =
                  int8_t(c);
            }
          }
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  tick("color+scatter");
  return bad.load();
}

int64_t oarfish_route_tables(const int64_t* out_idx, const int64_t* in_idx,
                             int64_t E, int32_t CR, int32_t n_src,
                             int32_t n_dst, int32_t Q, int32_t n_threads,
                             int8_t* s1_r1, int8_t* s1_src, int8_t* s1_row,
                             int8_t* s1_r2, int8_t* s3_r1, int8_t* s3_src,
                             int8_t* s3_row, int8_t* s3_r2,
                             int8_t* s3_mask) {
  return route_tables_impl(out_idx, in_idx, E, CR, n_src, n_dst, Q,
                           n_threads, s1_r1, s1_src, s1_row, s1_r2, s3_r1,
                           s3_src, s3_row, s3_r2, s3_mask, nullptr,
                           nullptr, nullptr, nullptr, nullptr, nullptr,
                           nullptr, nullptr, nullptr);
}

// Both routes of a forward/reverse pair from ONE build: the forward
// tables exactly as oarfish_route_tables, plus the reversed route
// (in_idx <- out_idx; geometry (n_dst, n_src, Q)) reusing the same
// counting sorts and edge colorings. b_s1_src may be null when
// CR == 128; all 18 tables must arrive zeroed.
int64_t oarfish_route_tables_pair(
    const int64_t* out_idx, const int64_t* in_idx, int64_t E, int32_t CR,
    int32_t n_src, int32_t n_dst, int32_t Q, int32_t n_threads,
    int8_t* s1_r1, int8_t* s1_src, int8_t* s1_row, int8_t* s1_r2,
    int8_t* s3_r1, int8_t* s3_src, int8_t* s3_row, int8_t* s3_r2,
    int8_t* s3_mask, int8_t* b_s1_r1, int8_t* b_s1_src, int8_t* b_s1_row,
    int8_t* b_s1_r2, int8_t* b_s3_r1, int8_t* b_s3_src, int8_t* b_s3_row,
    int8_t* b_s3_r2, int8_t* b_s3_mask) {
  return route_tables_impl(out_idx, in_idx, E, CR, n_src, n_dst, Q,
                           n_threads, s1_r1, s1_src, s1_row, s1_r2, s3_r1,
                           s3_src, s3_row, s3_r2, s3_mask, b_s1_r1,
                           b_s1_src, b_s1_row, b_s1_r2, b_s3_r1, b_s3_src,
                           b_s3_row, b_s3_r2, b_s3_mask);
}

// Test-only direct entry for the Konig colorer (differential property
// tests in tests/test_static_routing.py).
int64_t oarfish_color_konig(const int32_t* src, const int32_t* dst,
                            int64_t m, int64_t n_left, int64_t n_right,
                            int32_t colors, int32_t* out) {
  ColorCore core;
  return core.color_konig(src, dst, m, n_left, n_right, colors, out) ? 0
                                                                     : 1;
}

}  // extern "C"
