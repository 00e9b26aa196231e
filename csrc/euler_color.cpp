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

}  // extern "C"
