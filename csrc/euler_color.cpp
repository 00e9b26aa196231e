// Edge coloring of d-regular bipartite multigraphs by recursive Euler
// splitting (d a power of two). Used by the static-permutation planner
// (oarfish_tpu/ops/permute_plan.py) to build TPU routing tables: each
// color class is a perfect matching = one intermediate lane/column.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC euler_color.cpp -o
//        liboarfish_color.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// One Euler-split level: partition edges of an even-regular bipartite
// multigraph into two halves such that every node's degree halves.
// src/dst: node ids (left/right); idx: edge subset to split.
void euler_split(const int32_t* src, const int32_t* dst,
                 const int64_t* idx, int64_t n_edges, int32_t n_left,
                 int32_t n_right, uint8_t* half /* per edge in idx order */) {
  // adjacency over the subset: nodes 0..n_left-1 (left),
  // n_left..n_left+n_right-1 (right)
  int64_t n_nodes = int64_t(n_left) + n_right;
  std::vector<int64_t> deg(n_nodes, 0);
  for (int64_t i = 0; i < n_edges; i++) {
    deg[src[idx[i]]]++;
    deg[int64_t(n_left) + dst[idx[i]]]++;
  }
  std::vector<int64_t> off(n_nodes + 1, 0);
  for (int64_t v = 0; v < n_nodes; v++) off[v + 1] = off[v] + deg[v];
  std::vector<int64_t> inc(off[n_nodes]);   // incident edge (index into idx)
  std::vector<int64_t> pos(n_nodes, 0);
  for (int64_t i = 0; i < n_edges; i++) {
    int64_t l = src[idx[i]];
    int64_t r = int64_t(n_left) + dst[idx[i]];
    inc[off[l] + pos[l]++] = i;
    inc[off[r] + pos[r]++] = i;
  }
  std::vector<uint8_t> used(n_edges, 0);
  std::vector<int64_t> ptr(n_nodes, 0);
  for (int64_t start = 0; start < n_nodes; start++) {
    for (;;) {
      // find an unused edge at `start`
      while (ptr[start] < deg[start] &&
             used[inc[off[start] + ptr[start]]])
        ptr[start]++;
      if (ptr[start] >= deg[start]) break;
      // walk a circuit, alternating halves
      int64_t v = start;
      uint8_t flag = 0;
      for (;;) {
        while (ptr[v] < deg[v] && used[inc[off[v] + ptr[v]]]) ptr[v]++;
        if (ptr[v] >= deg[v]) break;
        int64_t e = inc[off[v] + ptr[v]];
        used[e] = 1;
        half[e] = flag;
        flag ^= 1;
        int64_t l = src[idx[e]];
        int64_t r = int64_t(n_left) + dst[idx[e]];
        v = (v == l) ? r : l;
      }
    }
  }
}

}  // namespace

extern "C" {

// Color edges with `colors` colors (power of two). src/dst: [n] int32
// node ids; out_color: [n] int32.
void oarfish_edge_color(const int32_t* src, const int32_t* dst, int64_t n,
                        int32_t n_left, int32_t n_right, int32_t colors,
                        int32_t* out_color) {
  memset(out_color, 0, n * sizeof(int32_t));
  // iterative recursion over (subset, width)
  struct Item {
    std::vector<int64_t> idx;
    int32_t c;
  };
  std::vector<Item> stack;
  {
    Item root;
    root.idx.resize(n);
    for (int64_t i = 0; i < n; i++) root.idx[i] = i;
    root.c = colors;
    stack.push_back(std::move(root));
  }
  std::vector<uint8_t> half;
  while (!stack.empty()) {
    Item it = std::move(stack.back());
    stack.pop_back();
    if (it.c <= 1 || it.idx.empty()) continue;
    half.assign(it.idx.size(), 0);
    euler_split(src, dst, it.idx.data(), int64_t(it.idx.size()), n_left,
                n_right, half.data());
    Item hi, lo;
    hi.c = it.c / 2;
    lo.c = it.c / 2;
    for (size_t i = 0; i < it.idx.size(); i++) {
      if (half[i]) {
        out_color[it.idx[i]] += it.c / 2;
        hi.idx.push_back(it.idx[i]);
      } else {
        lo.idx.push_back(it.idx[i]);
      }
    }
    stack.push_back(std::move(hi));
    stack.push_back(std::move(lo));
  }
}

}  // extern "C"
