// Host-side Clos/Beneš routing of static permutations (ihgnn_tpu).
//
// Factors out[j] = in[perm[j]] over E = R*C elements (viewed as an [R, C]
// row-major grid) into three row-local permutations around two block
// transposes:
//
//     out = P2_rows ∘ T ∘ P1_rows ∘ T ∘ P0_rows
//
// Existence: the demand multigraph between input rows and output rows is
// C-regular bipartite, hence C-edge-colorable (König); color classes give
// the middle-stage assignment. The coloring is computed by recursive Euler
// splits (C must be a power of two): orienting an Eulerian circuit of a
// 2k-regular bipartite multigraph splits it into two k-regular halves.
// O(E log C) total; runs once per graph at packing time.
//
// This is the native (C++) equivalent of the pure-NumPy reference
// implementation in ihgnn_tpu/ops/benes.py (which remains the test oracle).
// The reference framework has no counterpart: its hot path delegates to
// torch_sparse/dgl CUDA kernels (/root/reference/Models/GnnLayers.py:233);
// here the permutation routing is what lets the TPU Pallas stage kernels
// execute arbitrary static gathers at near-HBM bandwidth.
//
// Build: g++ -O2 -shared -fPIC -o libihgnn_routing.so routing.cc

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Split a bipartite multigraph with all-even degrees into two halves with
// equal per-vertex degree. Edges traversed left→right on the Eulerian
// circuits go to half A (mask=1).
void euler_split(const int32_t* u, const int32_t* v, int64_t e_count,
                 int32_t n_left, int32_t n_right, uint8_t* mask) {
  // CSR incidence lists per vertex side.
  std::vector<int64_t> lptr(n_left + 1, 0), rptr(n_right + 1, 0);
  for (int64_t e = 0; e < e_count; ++e) {
    ++lptr[u[e] + 1];
    ++rptr[v[e] + 1];
  }
  for (int32_t i = 0; i < n_left; ++i) lptr[i + 1] += lptr[i];
  for (int32_t i = 0; i < n_right; ++i) rptr[i + 1] += rptr[i];
  std::vector<int64_t> ledges(e_count), redges(e_count);
  {
    std::vector<int64_t> lfill(lptr.begin(), lptr.end() - 1);
    std::vector<int64_t> rfill(rptr.begin(), rptr.end() - 1);
    for (int64_t e = 0; e < e_count; ++e) {
      ledges[lfill[u[e]]++] = e;
      redges[rfill[v[e]]++] = e;
    }
  }
  // Per-vertex cursors into the incidence lists (skip-used iteration).
  std::vector<int64_t> lcur(lptr.begin(), lptr.end() - 1);
  std::vector<int64_t> rcur(rptr.begin(), rptr.end() - 1);
  std::vector<uint8_t> used(e_count, 0);

  auto next_unused = [&](int32_t vertex, bool on_left) -> int64_t {
    if (on_left) {
      while (lcur[vertex] < lptr[vertex + 1]) {
        int64_t e = ledges[lcur[vertex]++];
        if (!used[e]) return e;
      }
    } else {
      while (rcur[vertex] < rptr[vertex + 1]) {
        int64_t e = redges[rcur[vertex]++];
        if (!used[e]) return e;
      }
    }
    return -1;
  };

  for (int64_t start = 0; start < e_count; ++start) {
    if (used[start]) continue;
    int64_t e = start;
    bool at_left = true;  // traversing e from u[e] (left) to v[e] (right)
    while (e != -1 && !used[e]) {
      used[e] = 1;
      mask[e] = at_left ? 1 : 0;
      int32_t vertex = at_left ? v[e] : u[e];
      at_left = !at_left;
      e = next_unused(vertex, at_left);
    }
  }
}

// Recursively color a `degree`-regular bipartite multigraph (power-of-two
// degree) with `degree` colors; per vertex each color appears exactly once.
void color_recurse(const int32_t* u, const int32_t* v, int32_t n_vertices,
                   std::vector<int64_t>& edge_ids, int32_t degree,
                   int32_t base, int32_t* colors) {
  if (degree == 1) {
    for (int64_t e : edge_ids) colors[e] = base;
    return;
  }
  int64_t m = static_cast<int64_t>(edge_ids.size());
  std::vector<int32_t> su(m), sv(m);
  for (int64_t i = 0; i < m; ++i) {
    su[i] = u[edge_ids[i]];
    sv[i] = v[edge_ids[i]];
  }
  std::vector<uint8_t> mask(m);
  euler_split(su.data(), sv.data(), m, n_vertices, n_vertices, mask.data());
  std::vector<int64_t> half_a, half_b;
  half_a.reserve(m / 2);
  half_b.reserve(m / 2);
  for (int64_t i = 0; i < m; ++i) {
    (mask[i] ? half_a : half_b).push_back(edge_ids[i]);
  }
  color_recurse(u, v, n_vertices, half_a, degree / 2, base, colors);
  color_recurse(u, v, n_vertices, half_b, degree / 2, base + degree / 2,
                colors);
}

// Core of ihgnn_benes_route, reusable per row (see the extern "C" wrapper
// below for the stage semantics). perm values in [0, rows*cols).
int benes_route_core(const int64_t* perm, int64_t e_count, int32_t rows,
                     int32_t cols, int32_t* p0, int32_t* p1, int32_t* p2) {
  if (static_cast<int64_t>(rows) * cols != e_count) return 1;
  if (cols <= 0 || (cols & (cols - 1)) != 0) return 2;
  std::vector<int32_t> in_row(e_count), out_row(e_count);
  std::vector<int32_t> in_col(e_count);
  for (int64_t j = 0; j < e_count; ++j) {
    int64_t src = perm[j];
    if (src < 0 || src >= e_count) return 3;
    in_row[j] = static_cast<int32_t>(src / cols);
    in_col[j] = static_cast<int32_t>(src % cols);
    out_row[j] = static_cast<int32_t>(j / cols);
  }
  std::vector<int32_t> color(e_count);
  {
    std::vector<int64_t> all(e_count);
    for (int64_t e = 0; e < e_count; ++e) all[e] = e;
    color_recurse(in_row.data(), out_row.data(), rows, all, cols, 0,
                  color.data());
  }
  for (int64_t j = 0; j < e_count; ++j) {
    int64_t c_out = j % cols;
    p0[static_cast<int64_t>(in_row[j]) * cols + color[j]] = in_col[j];
    p1[static_cast<int64_t>(color[j]) * rows + out_row[j]] = in_row[j];
    p2[static_cast<int64_t>(out_row[j]) * cols + c_out] = color[j];
  }
  return 0;
}

// Beneš butterfly switch routing of a `len`-lane permutation (XOR pairing:
// stage with shift m swaps lanes k and k^m iff the switch bit at k is set;
// bits are pair-symmetric). Stage order 64,32,...,1,...,32,64 for len=128.
// Accumulates bit (1 << stage) into words[lane0 + lane].
void bfly_route(const int32_t* perm, int32_t len, int stage0, int lane0,
                int n_stages, int32_t* words) {
  if (len == 2) {
    if (perm[0] == 1) {
      words[lane0] |= 1 << stage0;
      words[lane0 + 1] |= 1 << stage0;
    }
    return;
  }
  const int32_t m = len / 2;
  std::vector<int32_t> inv(len);
  std::vector<int8_t> color(len, -1);
  for (int32_t j = 0; j < len; ++j) inv[perm[j]] = j;
  for (int32_t start = 0; start < len; ++start) {
    if (color[start] >= 0) continue;
    int32_t j = start;
    while (color[j] < 0) {
      color[j] = 0;                       // j rides the upper subnet
      int32_t jp = j ^ m;                 // output-pair partner → lower
      color[jp] = 1;
      // input-pair constraint: perm[jp]'s partner input rides upper
      j = inv[perm[jp] ^ m];
    }
  }
  const int exit_stage = n_stages - 1 - stage0;
  for (int32_t k = 0; k < m; ++k) {
    if (color[inv[k]] == 1) {             // input k belongs to lower: swap
      words[lane0 + k] |= 1 << stage0;
      words[lane0 + k + m] |= 1 << stage0;
    }
    if (color[k] == 1) {                  // output k served by lower: swap
      words[lane0 + k] |= 1 << exit_stage;
      words[lane0 + k + m] |= 1 << exit_stage;
    }
  }
  std::vector<int32_t> sub(len);
  for (int32_t j = 0; j < len; ++j) {
    sub[static_cast<int32_t>(color[j]) * m + (j % m)] = perm[j] % m;
  }
  bfly_route(sub.data(), m, stage0 + 1, lane0, n_stages, words);
  bfly_route(sub.data() + m, m, stage0 + 1, lane0 + m, n_stages, words);
}

}  // namespace

extern "C" {

// mask[e] = 1 iff edge e goes to half A. Degrees must all be even.
void ihgnn_euler_split(const int32_t* u, const int32_t* v, int64_t e_count,
                       int32_t n_left, int32_t n_right, uint8_t* mask) {
  euler_split(u, v, e_count, n_left, n_right, mask);
}

// colors[e] in [0, degree); per left/right vertex each color appears once.
// degree must be a power of two; u/v vertex ids in [0, n_vertices).
void ihgnn_color_regular_bipartite(const int32_t* u, const int32_t* v,
                                   int64_t e_count, int32_t degree,
                                   int32_t n_vertices, int32_t* colors) {
  std::vector<int64_t> all(e_count);
  for (int64_t e = 0; e < e_count; ++e) all[e] = e;
  color_recurse(u, v, n_vertices, all, degree, 0, colors);
}

// Factor out[j] = in[perm[j]] (E = rows*cols) into three row-local stages.
//   p0: [rows, cols]   a0[r, c] = in [r, p0[r, c]]
//   T                  t0[c, r] = a0[r, c]
//   p1: [cols, rows]   a1[c, r] = t0[c, p1[c, r]]
//   T                  t1[r, c] = a1[c, r]
//   p2: [rows, cols]   out[r, c] = t1[r, p2[r, c]]
// cols must be a power of two; rows arbitrary. Returns 0 on success.
int ihgnn_benes_route(const int64_t* perm, int64_t e_count, int32_t rows,
                      int32_t cols, int32_t* p0, int32_t* p1, int32_t* p2) {
  // stage 0: within input row r, the color-k element moves to column k
  // stage 1: within color-row k, the element bound for output row r_out
  //          moves to column r_out
  // stage 2: output (r_out, c_out) takes its element from color column
  return benes_route_core(perm, e_count, rows, cols, p0, p1, p2);
}

// Hierarchical in-row routing (second Clos level; see ops/benes.py
// route_rows_hier): each of n_rows rows of `perms` ([n_rows, length],
// every row a permutation of [0, length)) is routed through its own
// [B, W] grid (B = length/W) and the three stage tables are bit-packed as
//   packed = p0 | (s << 10) | (p2 << 20),  s[b, k] = p1[k, b].
// W must be a power of two; all fields must fit 10 bits. Threaded over
// row blocks. Returns 0 on success.
int ihgnn_route_rows(const int32_t* perms, int64_t n_rows, int32_t length,
                     int32_t w, int32_t* packed) {
  if (w <= 0 || (w & (w - 1)) != 0 || length % w != 0) return 2;
  const int32_t b = length / w;
  if (b > 1024 || w > 1024) return 4;

  std::atomic<int> status{0};
  int n_threads = static_cast<int>(
      std::min<int64_t>(n_rows, std::max(1u, std::thread::hardware_concurrency())));
  auto worker = [&](int64_t lo, int64_t hi) {
    std::vector<int64_t> row(length);
    std::vector<int32_t> p0(length), p1(length), p2(length);
    for (int64_t r = lo; r < hi; ++r) {
      const int32_t* src = perms + r * length;
      for (int32_t j = 0; j < length; ++j) row[j] = src[j];
      int rc = benes_route_core(row.data(), length, b, w, p0.data(),
                                p1.data(), p2.data());
      if (rc != 0) {
        status.store(rc);
        return;
      }
      int32_t* dst = packed + r * length;
      for (int32_t bb = 0; bb < b; ++bb) {
        for (int32_t k = 0; k < w; ++k) {
          int32_t s_bk = p1[static_cast<int64_t>(k) * b + bb];  // p1 is [W, B]
          dst[bb * w + k] = p0[bb * w + k] | (s_bk << 10)
                            | (p2[bb * w + k] << 20);
        }
      }
    }
  };
  std::vector<std::thread> threads;
  int64_t per = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n_rows, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
  return status.load();
}

// Butterfly variant of ihgnn_route_rows: each row routes through a
// [B, W=128] Clos whose in-block stages are Beneš switch words
// (13 stages, XOR pairing). Packed per element:
//   bits [0, 13)  stage-A switches of the SOURCE block, this lane
//   bits [13, 17) exchange delta = (src_block - out_block) mod B
//   bits [17, 30) stage-B switches of the OUTPUT block, this lane
// Requires w == 128 and B <= 16. Threaded over row blocks. Returns 0 on
// success.
int ihgnn_route_rows_bfly(const int32_t* perms, int64_t n_rows,
                          int32_t length, int32_t w, int32_t* packed) {
  if (w != 128 || length % w != 0) return 2;
  const int32_t b = length / w;
  if (b < 1 || b > 16) return 4;
  const int n_stages = 13;  // 2*log2(128) - 1

  std::atomic<int> status{0};
  int n_threads = static_cast<int>(std::min<int64_t>(
      n_rows, std::max(1u, std::thread::hardware_concurrency())));
  auto worker = [&](int64_t lo, int64_t hi) {
    std::vector<int64_t> row(length);
    std::vector<int32_t> p0(length), p1(length), p2(length);
    std::vector<int32_t> aw(length), bw(length), blk(w);
    for (int64_t r = lo; r < hi; ++r) {
      const int32_t* src = perms + r * length;
      for (int32_t j = 0; j < length; ++j) row[j] = src[j];
      int rc = benes_route_core(row.data(), length, b, w, p0.data(),
                                p1.data(), p2.data());
      if (rc != 0) {
        status.store(rc);
        return;
      }
      std::fill(aw.begin(), aw.end(), 0);
      std::fill(bw.begin(), bw.end(), 0);
      for (int32_t bb = 0; bb < b; ++bb) {
        bfly_route(p0.data() + static_cast<int64_t>(bb) * w, w, 0, bb * w,
                   n_stages, aw.data());
        bfly_route(p2.data() + static_cast<int64_t>(bb) * w, w, 0, bb * w,
                   n_stages, bw.data());
      }
      int32_t* dst = packed + r * length;
      for (int32_t bb = 0; bb < b; ++bb) {
        for (int32_t k = 0; k < w; ++k) {
          int32_t s_bk = p1[static_cast<int64_t>(k) * b + bb];  // [W, B]
          int32_t delta = ((s_bk - bb) % b + b) % b;
          dst[bb * w + k] = aw[bb * w + k] | (delta << n_stages)
                            | (bw[bb * w + k] << (n_stages + 4));
        }
      }
    }
  };
  std::vector<std::thread> threads;
  int64_t per = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n_rows, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
  return status.load();
}

// Plain per-block Beneš switch routing: each row of `perms` ([n_blocks,
// 128], a permutation of [0, 128)) → 13-bit switch words (bit t = stage t
// switch at that lane; see ops/bfly.py route_blocks). Threaded.
int ihgnn_bfly_route_blocks(const int32_t* perms, int64_t n_blocks,
                            int32_t* words) {
  const int32_t w = 128;
  const int n_stages = 13;
  std::atomic<int> status{0};
  int n_threads = static_cast<int>(std::min<int64_t>(
      n_blocks, std::max(1u, std::thread::hardware_concurrency())));
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      int32_t* dst = words + b * w;
      std::fill(dst, dst + w, 0);
      bfly_route(perms + b * w, w, 0, 0, n_stages, dst);
    }
  };
  std::vector<std::thread> threads;
  int64_t per = (n_blocks + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n_blocks, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
  return status.load();
}

}  // extern "C"
