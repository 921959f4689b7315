// Native host-side runtime for pangulu_tpu.
//
// C++ implementations of the sequential, correctness-critical host
// pipeline pieces whose Python versions do not scale: elimination
// tree (Liu), symbolic fill enumeration (row-subtree traversal),
// approximate-minimum-degree ordering, and the MC64 job-5
// max-product bipartite matching with dual-variable scalings
// (functional counterpart of the reference's pangulu_mc64,
// pangulu_reordering.c:149-681, and pangulu_symbolic.c:132-248).
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this
// environment).  All index arrays are int64 unless noted.

#include <algorithm>
#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

extern "C" {

// ABI version stamp: the ctypes loader rebuilds the .so when this does
// not match (a stale binary from an older source otherwise survives
// because the loader only builds when the file is absent).
int64_t pangulu_abi_version() { return 2; }

// ---------------------------------------------------------------------------
// Elimination tree (Liu's algorithm) on a symmetric pattern in CSR.
// ---------------------------------------------------------------------------
void pangulu_etree(int64_t n, const int64_t* indptr, const int32_t* indices,
                   int64_t* parent) {
  std::vector<int64_t> ancestor(n, -1);
  for (int64_t i = 0; i < n; ++i) parent[i] = -1;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j >= i) continue;
      while (ancestor[j] != -1 && ancestor[j] != i) {
        int64_t t = ancestor[j];
        ancestor[j] = i;
        j = t;
      }
      if (ancestor[j] == -1) {
        ancestor[j] = i;
        parent[j] = i;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Fill enumeration: count |strict lower L| and mark nb-blocks.
// block_mark is a bl*bl row-major uint8 array (bl = ceil(n/nb)).
// Returns the strict-lower fill count.
// ---------------------------------------------------------------------------
int64_t pangulu_fill_walk(int64_t n, const int64_t* indptr,
                          const int32_t* indices, const int64_t* parent,
                          int64_t nb, uint8_t* block_mark, int64_t bl) {
  std::vector<int64_t> visited(n, -1);
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    visited[i] = i;
    const int64_t bi = i / nb;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j >= i) continue;
      while (visited[j] != i) {
        visited[j] = i;
        ++count;
        if (block_mark) block_mark[bi * bl + j / nb] = 1;
        j = parent[j];
        if (j == -1 || j >= i) break;
      }
    }
  }
  return count;
}

// Variant also filling colcnt[j] = |{i > j : L(i,j) != 0}| (strictly-
// lower per-column fill counts) — the inputs to the exact sparse LU
// flop model (reference counts the same intersections at run time,
// pangulu_kernel_interface.c:4-178; we count them once symbolically).
int64_t pangulu_fill_walk_counts(int64_t n, const int64_t* indptr,
                                 const int32_t* indices,
                                 const int64_t* parent, int64_t nb,
                                 uint8_t* block_mark, int64_t bl,
                                 int64_t* colcnt) {
  std::vector<int64_t> visited(n, -1);
  for (int64_t j = 0; j < n; ++j) colcnt[j] = 0;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    visited[i] = i;
    const int64_t bi = i / nb;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j >= i) continue;
      while (visited[j] != i) {
        visited[j] = i;
        ++count;
        ++colcnt[j];
        if (block_mark) block_mark[bi * bl + j / nb] = 1;
        j = parent[j];
        if (j == -1 || j >= i) break;
      }
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// Approximate minimum degree ordering (quotient graph, AMD-style
// approximate external degrees, element absorption).  Pattern must be
// symmetric CSR without requiring sorted rows; self loops ignored.
// ---------------------------------------------------------------------------
namespace {
struct MinDeg {
  int64_t n;
  // adjacency storage: per-vertex list of (live vertex) neighbours and
  // element ids; rebuilt lazily on elimination.
  std::vector<std::vector<int64_t>> adj;    // original live neighbours
  std::vector<std::vector<int64_t>> elems;  // adjacent element ids
  std::vector<std::vector<int64_t>> members; // element id -> reach
  std::vector<char> alive;
  std::vector<int64_t> degree;
  std::vector<int64_t> stamp;
  int64_t stamp_cur = 0;

  explicit MinDeg(int64_t n_) : n(n_), adj(n_), elems(n_), members(n_),
                                alive(n_, 1), degree(n_, 0), stamp(n_, -1) {}

  void mark_begin() { ++stamp_cur; }
  bool marked(int64_t v) const { return stamp[v] == stamp_cur; }
  void mark(int64_t v) { stamp[v] = stamp_cur; }
};
}  // namespace

void pangulu_mindeg(int64_t n, const int64_t* indptr, const int32_t* indices,
                    int64_t* order) {
  MinDeg g(n);
  for (int64_t i = 0; i < n; ++i) {
    auto& a = g.adj[i];
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t j = indices[p];
      if (j != i) a.push_back(j);
    }
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
    g.degree[i] = static_cast<int64_t>(a.size());
  }
  using Node = std::pair<int64_t, int64_t>;  // (degree, vertex)
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> heap;
  for (int64_t i = 0; i < n; ++i) heap.emplace(g.degree[i], i);

  std::vector<int64_t> reach;
  int64_t pos = 0;
  while (!heap.empty()) {
    auto [d, v] = heap.top();
    heap.pop();
    if (!g.alive[v] || d != g.degree[v]) continue;
    // Reach(v) = live adj(v) ∪ members of adjacent elements.
    g.mark_begin();
    g.mark(v);
    reach.clear();
    for (int64_t u : g.adj[v])
      if (g.alive[u] && !g.marked(u)) { g.mark(u); reach.push_back(u); }
    for (int64_t e : g.elems[v])
      for (int64_t u : g.members[e])
        if (g.alive[u] && !g.marked(u)) { g.mark(u); reach.push_back(u); }

    order[pos++] = v;
    g.alive[v] = 0;
    // v becomes element v absorbing its adjacent elements.
    for (int64_t e : g.elems[v]) { g.members[e].clear(); g.members[e].shrink_to_fit(); }
    g.members[v] = reach;
    for (int64_t u : reach) {
      // drop v and absorbed elements from u's lists
      auto& eu = g.elems[u];
      std::vector<int64_t> kept;
      kept.reserve(eu.size() + 1);
      for (int64_t e : eu) {
        bool absorbed = false;
        for (int64_t ev : g.elems[v]) if (e == ev) { absorbed = true; break; }
        if (!absorbed) kept.push_back(e);
      }
      kept.push_back(v);
      eu.swap(kept);
      // approximate degree: |live adj| + sum of member counts (AMD
      // overcount), minus self.
      int64_t deg = 0;
      for (int64_t w : g.adj[u]) if (g.alive[w]) ++deg;
      int64_t seen = 0;
      for (int64_t e : eu) seen += static_cast<int64_t>(g.members[e].size());
      g.degree[u] = deg + std::max<int64_t>(seen - 1, 0);
      heap.emplace(g.degree[u], u);
    }
    g.elems[v].clear();
    g.elems[v].shrink_to_fit();
  }
}

// ---------------------------------------------------------------------------
// MC64 job 5: max-product perfect matching + scalings.
//
// Cost c[i][j] = log(colmax_j) - log|a_ij| >= 0; find a perfect
// matching minimizing total cost via shortest augmenting paths with
// potentials (Dijkstra, binary heap) — the same optimization problem
// the reference solves (pangulu_reordering.c:387-587).  Outputs
// colperm (column j of the permuted matrix = original column
// colperm[j] pairing with row j), and dual-based scalings
// row_scale[i] = exp(u_i), col_scale[j] = exp(v_j)/colmax_j so the
// scaled+permuted matrix has unit diagonal and all |entries| <= 1
// (reference: exp() factors at pangulu_reordering.c:655-663).
// Returns 0 on success, 1 if structurally singular.
// ---------------------------------------------------------------------------
int pangulu_mc64(int64_t n, const int64_t* colptr, const int32_t* rowidx,
                 const double* absval, int64_t* colperm, double* row_scale,
                 double* col_scale) {
  const double INF = std::numeric_limits<double>::infinity();
  const int64_t nnz = colptr[n];
  // Build CSR with costs: c[i][j] = log(colmax_j) - log|a_ij|.
  std::vector<double> logmax(n, 0.0);
  for (int64_t j = 0; j < n; ++j) {
    double m = 0.0;
    for (int64_t p = colptr[j]; p < colptr[j + 1]; ++p)
      m = std::max(m, absval[p]);
    logmax[j] = (m > 0.0) ? std::log(m) : 0.0;
  }
  std::vector<int64_t> rptr(n + 1, 0);
  for (int64_t p = 0; p < nnz; ++p) ++rptr[rowidx[p] + 1];
  for (int64_t i = 0; i < n; ++i) rptr[i + 1] += rptr[i];
  std::vector<int32_t> rcol(nnz);
  std::vector<double> rcost(nnz);
  {
    std::vector<int64_t> w(rptr.begin(), rptr.end() - 1);
    for (int64_t j = 0; j < n; ++j)
      for (int64_t p = colptr[j]; p < colptr[j + 1]; ++p) {
        const int64_t i = rowidx[p];
        const int64_t q = w[i]++;
        rcol[q] = static_cast<int32_t>(j);
        rcost[q] = (absval[p] > 0.0) ? logmax[j] - std::log(absval[p]) : INF;
      }
  }

  // Sparse Jonker-Volgenant: assign each row via shortest augmenting
  // path over columns.  Only column potentials v are stored; a matched
  // row's potential is implicit from its tight edge
  // (u_r = c(r, j_match) - v[j_match]) — the lapjvsp formulation.
  std::vector<double> v(n, 0.0);
  std::vector<int64_t> row2col(n, -1), col2row(n, -1);
  std::vector<double> dist(n);
  std::vector<int64_t> pred(n);      // predecessor row of column j
  // timestamp validity instead of per-row O(n) refills (the refills
  // made the whole matching O(n^2): 35 s at n=262k, ~1 s with stamps)
  std::vector<int64_t> stamp_d(n, -1), stamp_f(n, -1);
  std::vector<int64_t> touched;
  using QN = std::pair<double, int64_t>;  // (dist, column)

  // Greedy zero-cost pre-match (the reference's initial-extreme-match
  // phase, pangulu_reordering.c:261-288): each column's max entry has
  // cost exactly 0, so matching it is optimal while columns are free.
  for (int64_t r = 0; r < n; ++r)
    for (int64_t p = rptr[r]; p < rptr[r + 1]; ++p) {
      const int64_t j = rcol[p];
      if (rcost[p] == 0.0 && col2row[j] == -1) {
        row2col[r] = j;
        col2row[j] = r;
        break;
      }
    }

  for (int64_t r0 = 0; r0 < n; ++r0) {
    if (row2col[r0] != -1) continue;  // pre-matched
    touched.clear();
    std::priority_queue<QN, std::vector<QN>, std::greater<QN>> pq;
    for (int64_t p = rptr[r0]; p < rptr[r0 + 1]; ++p) {
      const int64_t j = rcol[p];
      const double d = rcost[p] - v[j];
      if (stamp_d[j] != r0 || d < dist[j]) {
        dist[j] = d; stamp_d[j] = r0; pred[j] = r0; pq.emplace(d, j);
      }
    }
    int64_t sink = -1;
    double lsp = INF;
    while (!pq.empty()) {
      auto [d, j] = pq.top();
      pq.pop();
      if (stamp_f[j] == r0 || d > dist[j]) continue;
      stamp_f[j] = r0;
      touched.push_back(j);
      if (col2row[j] == -1) { sink = j; lsp = d; break; }
      const int64_t r = col2row[j];
      // implicit row potential from the tight matched edge (r, j)
      double ur = 0.0;
      for (int64_t p = rptr[r]; p < rptr[r + 1]; ++p)
        if (rcol[p] == j) { ur = rcost[p] - v[j]; break; }
      for (int64_t p = rptr[r]; p < rptr[r + 1]; ++p) {
        const int64_t j2 = rcol[p];
        if (stamp_f[j2] == r0) continue;
        const double nd = d + (rcost[p] - ur - v[j2]);
        if (stamp_d[j2] != r0 || nd < dist[j2]) {
          dist[j2] = nd; stamp_d[j2] = r0; pred[j2] = r;
          pq.emplace(nd, j2);
        }
      }
    }
    if (sink == -1) return 1;  // structurally singular
    // Dual update on finalized columns, then augment.
    for (int64_t j : touched)
      if (j != sink) v[j] += dist[j] - lsp;
    int64_t j = sink;
    while (true) {
      const int64_t r = pred[j];
      const int64_t jnext = row2col[r];
      row2col[r] = j;
      col2row[j] = r;
      if (r == r0) break;
      j = jnext;
    }
  }

  // Python-layer semantics: A2[:, i] = A1[:, colperm[i]] puts the
  // matched entry of row i on the diagonal -> colperm[i] = row2col[i].
  for (int64_t i = 0; i < n; ++i) colperm[i] = row2col[i];
  for (int64_t i = 0; i < n; ++i) {
    const int64_t jm = row2col[i];
    double ui = 0.0;
    for (int64_t p = rptr[i]; p < rptr[i + 1]; ++p)
      if (rcol[p] == jm) { ui = rcost[p] - v[jm]; break; }
    row_scale[i] = std::exp(ui);
  }
  for (int64_t j = 0; j < n; ++j) col_scale[j] = std::exp(v[j] - logmax[j]);
  return 0;
}

// ---------------------------------------------------------------------------
// Fast MatrixMarket coordinate reader (counterpart of the reference's
// vendored mmio_highlevel.h, examples/mmio*.h — C there, C++ here).
// Two-phase ctypes protocol:
//   pangulu_mmio_probe(path, hdr[5]) -> 0 ok / -1 error
//     hdr = {nrows, ncols, nnz_declared, field, symmetry}
//     field: 0 real, 1 integer, 2 pattern, 3 complex
//     symmetry: 0 general, 1 symmetric, 2 skew-symmetric, 3 hermitian
//   pangulu_mmio_read(path, nnz, rows, cols, re, im) -> count / -1
//     caller allocates nnz-sized arrays; im may be null for real data.
// Symmetry expansion happens in the Python layer (vectorized numpy).
// ---------------------------------------------------------------------------

static int mmio_parse_header(FILE* f, int64_t hdr[5]) {
  char line[1024];
  if (!fgets(line, sizeof line, f)) return -1;
  char obj[64] = {0}, fmt[64] = {0}, fld[64] = {0}, sym[64] = {0};
  if (sscanf(line, "%%%%MatrixMarket %63s %63s %63s %63s",
             obj, fmt, fld, sym) != 4) return -1;
  for (char* p = fld; *p; ++p) *p = (char)tolower(*p);
  for (char* p = sym; *p; ++p) *p = (char)tolower(*p);
  for (char* p = fmt; *p; ++p) *p = (char)tolower(*p);
  if (strcmp(fmt, "coordinate") != 0) return -1;  // dense: python path
  int64_t field;
  if (!strcmp(fld, "real")) field = 0;
  else if (!strcmp(fld, "integer")) field = 1;
  else if (!strcmp(fld, "pattern")) field = 2;
  else if (!strcmp(fld, "complex")) field = 3;
  else return -1;
  int64_t symmetry;
  if (!strcmp(sym, "general")) symmetry = 0;
  else if (!strcmp(sym, "symmetric")) symmetry = 1;
  else if (!strcmp(sym, "skew-symmetric")) symmetry = 2;
  else if (!strcmp(sym, "hermitian")) symmetry = 3;
  else return -1;
  // skip comments, read size line
  while (fgets(line, sizeof line, f)) {
    if (line[0] == '%') continue;
    long long m = 0, n = 0, nz = 0;
    if (sscanf(line, "%lld %lld %lld", &m, &n, &nz) != 3) return -1;
    hdr[0] = m; hdr[1] = n; hdr[2] = nz; hdr[3] = field; hdr[4] = symmetry;
    return 0;
  }
  return -1;
}

int pangulu_mmio_probe(const char* path, int64_t hdr[5]) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  const int rc = mmio_parse_header(f, hdr);
  fclose(f);
  return rc;
}

int64_t pangulu_mmio_read(const char* path, int64_t nnz, int32_t* rows,
                          int32_t* cols, double* re, double* im) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  int64_t hdr[5];
  if (mmio_parse_header(f, hdr) != 0) { fclose(f); return -1; }
  const int64_t field = hdr[3];
  static const size_t kBuf = 1 << 20;
  std::vector<char> buf(kBuf);
  setvbuf(f, buf.data(), _IOFBF, kBuf);
  char line[1024];
  int64_t k = 0;
  while (k < nnz && fgets(line, sizeof line, f)) {
    char* p = line;
    while (*p == ' ' || *p == '\t') ++p;
    if (*p == '%' || *p == '\n' || *p == '\0') continue;
    char* end;
    const long long r = strtoll(p, &end, 10);
    if (end == p) { fclose(f); return -1; }
    p = end;
    const long long c = strtoll(p, &end, 10);
    if (end == p) { fclose(f); return -1; }
    p = end;
    double vre = 1.0, vim = 0.0;
    if (field == 0 || field == 1) {
      vre = strtod(p, &end);
      if (end == p) { fclose(f); return -1; }
    } else if (field == 3) {
      vre = strtod(p, &end);
      if (end == p) { fclose(f); return -1; }
      p = end;
      vim = strtod(p, &end);
      if (end == p) { fclose(f); return -1; }
    }
    rows[k] = (int32_t)(r - 1);  // 1-based -> 0-based
    cols[k] = (int32_t)(c - 1);
    re[k] = vre;
    if (im) im[k] = vim;
    ++k;
  }
  fclose(f);
  return k;
}

}  // extern "C"
