// meshcore: native mesh-connectivity and partitioning kernels.
//
// The reference delegates its mesh engine to native code (VTK/VMTK/TetGen
// C++, DOLFIN's C++ connectivity + ParMETIS partitioning — SURVEY.md §2.2).
// This library is the TPU framework's native runtime counterpart: the
// host-side integer-heavy graph work that feeds the static arrays consumed
// by the JAX compute path —
//   * unique-edge extraction (P2 dof construction),
//   * facet tables with cell adjacency (boundary/interface measures),
//   * reverse Cuthill-McKee ordering and overlap-partitioning
//     (RAS preconditioner setup; the ParMETIS-at-runtime equivalent).
//
// Built with `make -C vasp_tpu/native` (g++ -O3 -shared), loaded via ctypes
// (vasp_tpu/native/__init__.py) with transparent numpy fallbacks.
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <queue>

extern "C" {

// Unique edges of a tet mesh.
// cells: (nc, 4) int64. Local edge order: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
// edges_out: capacity 6*nc rows of 2; cell_edges_out: (nc, 6).
// Returns the number of unique edges.
int64_t build_edges(const int64_t* cells, int64_t nc, int64_t nv,
                    int64_t* edges_out, int64_t* cell_edges_out) {
  static const int EP[6][2] = {{0, 1}, {0, 2}, {0, 3},
                               {1, 2}, {1, 3}, {2, 3}};
  std::unordered_map<uint64_t, int64_t> seen;
  seen.reserve(static_cast<size_t>(nc) * 4);
  int64_t ne = 0;
  for (int64_t c = 0; c < nc; ++c) {
    const int64_t* v = cells + 4 * c;
    for (int e = 0; e < 6; ++e) {
      int64_t a = v[EP[e][0]], b = v[EP[e][1]];
      if (a > b) std::swap(a, b);
      uint64_t key = static_cast<uint64_t>(a) * static_cast<uint64_t>(nv) +
                     static_cast<uint64_t>(b);
      auto it = seen.find(key);
      int64_t id;
      if (it == seen.end()) {
        id = ne++;
        seen.emplace(key, id);
        edges_out[2 * id] = a;
        edges_out[2 * id + 1] = b;
      } else {
        id = it->second;
      }
      cell_edges_out[6 * c + e] = id;
    }
  }
  return ne;
}

// All unique facets with cell adjacency.
// facets_out: capacity 4*nc rows of 3 (sorted vertex ids);
// cells_out: capacity 4*nc rows of 4: (cell0, lfacet0, cell1, lfacet1),
// cell1 = -1 for exterior. Returns the number of unique facets.
int64_t build_facets(const int64_t* cells, int64_t nc, int64_t nv,
                     int64_t* facets_out, int64_t* cells_out) {
  static const int FP[4][3] = {{1, 2, 3}, {0, 2, 3}, {0, 1, 3}, {0, 1, 2}};
  struct FacetRec { int64_t id; };
  std::unordered_map<uint64_t, int64_t> seen;
  seen.reserve(static_cast<size_t>(nc) * 3);
  int64_t nf = 0;
  for (int64_t c = 0; c < nc; ++c) {
    const int64_t* v = cells + 4 * c;
    for (int f = 0; f < 4; ++f) {
      int64_t a = v[FP[f][0]], b = v[FP[f][1]], d = v[FP[f][2]];
      if (a > b) std::swap(a, b);
      if (b > d) std::swap(b, d);
      if (a > b) std::swap(a, b);
      // exact unique key (valid for nv <= ~2.6M; the python wrapper guards)
      uint64_t key = (static_cast<uint64_t>(a) * static_cast<uint64_t>(nv) +
                      static_cast<uint64_t>(b)) * static_cast<uint64_t>(nv) +
                     static_cast<uint64_t>(d);
      auto it = seen.find(key);
      int64_t id = (it == seen.end()) ? -1 : it->second;
      if (id < 0) {
        id = nf++;
        seen.emplace(key, id);
        facets_out[3 * id] = a;
        facets_out[3 * id + 1] = b;
        facets_out[3 * id + 2] = d;
        cells_out[4 * id] = c;
        cells_out[4 * id + 1] = f;
        cells_out[4 * id + 2] = -1;
        cells_out[4 * id + 3] = -1;
      } else {
        cells_out[4 * id + 2] = c;
        cells_out[4 * id + 3] = f;
      }
    }
  }
  return nf;
}

// Reverse Cuthill-McKee ordering of a CSR graph (indptr/indices, n nodes).
// perm_out: (n,).
void rcm_order(const int64_t* indptr, const int64_t* indices, int64_t n,
               int64_t* perm_out) {
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = indptr[i + 1] - indptr[i];
  std::vector<char> visited(n, 0);
  std::vector<int64_t> order;
  order.reserve(n);
  std::vector<int64_t> nbrs;
  for (;;) {
    // next unvisited node of minimum degree
    int64_t start = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && degree[i] < best) { best = degree[i]; start = i; }
    if (start < 0) break;
    std::queue<int64_t> q;
    q.push(start);
    visited[start] = 1;
    while (!q.empty()) {
      int64_t u = q.front();
      q.pop();
      order.push_back(u);
      nbrs.clear();
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int64_t w = indices[k];
        if (!visited[w]) { visited[w] = 1; nbrs.push_back(w); }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int64_t x, int64_t y) { return degree[x] < degree[y]; });
      for (int64_t w : nbrs) q.push(w);
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm_out[i] = order[n - 1 - i];
}

// Overlap expansion: given membership (n,) in {0,1}, mark all graph
// neighbors reachable within `layers` hops. In/out via flags (n,) uint8.
void expand_overlap(const int64_t* indptr, const int64_t* indices, int64_t n,
                    int layers, uint8_t* flags) {
  std::vector<int64_t> frontier;
  for (int64_t i = 0; i < n; ++i)
    if (flags[i]) frontier.push_back(i);
  for (int layer = 0; layer < layers; ++layer) {
    std::vector<int64_t> next;
    for (int64_t u : frontier) {
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int64_t w = indices[k];
        if (!flags[w]) { flags[w] = 1; next.push_back(w); }
      }
    }
    frontier.swap(next);
  }
}

}  // extern "C"
