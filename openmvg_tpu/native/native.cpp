// Native runtime components for openmvg_tpu.
//
// The reference's runtime (tracks/tracks.hpp union-find,
// matching/indMatch_utils.cpp codecs, features/descriptor.hpp IO) is all
// C++; these are the TPU framework's equivalents, exposed through a C ABI
// and loaded via ctypes (openmvg_tpu/native/__init__.py), with pure-python
// fallbacks when the shared library is unavailable.
//
// Build: make -C openmvg_tpu/native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Union-find with path halving + union by size.
struct UnionFind {
  std::vector<int64_t> parent;
  std::vector<int64_t> size;
  explicit UnionFind(int64_t n) : parent(n), size(n, 1) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }
  int64_t find(int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int64_t a, int64_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (size[a] < size[b]) std::swap(a, b);
    parent[b] = a;
    size[a] += size[b];
  }
};

}  // namespace

extern "C" {

// Connected components over n_nodes nodes given edges (a[i], b[i]).
// labels_out[n_nodes]: contiguous component ids (0..n_comp-1).
// Returns the number of components.
int64_t omt_connected_components(const int64_t* a, const int64_t* b,
                                 int64_t n_edges, int64_t n_nodes,
                                 int32_t* labels_out) {
  UnionFind uf(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) uf.unite(a[e], b[e]);
  std::unordered_map<int64_t, int32_t> remap;
  remap.reserve(n_nodes);
  int32_t next = 0;
  for (int64_t i = 0; i < n_nodes; ++i) {
    const int64_t r = uf.find(i);
    auto it = remap.find(r);
    if (it == remap.end()) {
      remap.emplace(r, next);
      labels_out[i] = next++;
    } else {
      labels_out[i] = it->second;
    }
  }
  return next;
}

// Full track building over (view, feat) nodes:
//   inputs: per-edge endpoint node indices (pre-compressed 0..n_nodes-1),
//           per-node view id and feat id
//   conflict filter: any track touching one view twice is dropped entirely
//   min-length filter, contiguous renumbering, rows sorted by
//   (track, view)
// Outputs are written to caller-provided arrays of capacity n_nodes;
// returns the number of emitted rows (<= n_nodes), or -1 on error.
int64_t omt_build_tracks(const int64_t* edge_a, const int64_t* edge_b,
                         int64_t n_edges, const int32_t* node_view,
                         const int32_t* node_feat, int64_t n_nodes,
                         int32_t min_length, int32_t* out_track,
                         int32_t* out_view, int32_t* out_feat) {
  UnionFind uf(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) uf.unite(edge_a[e], edge_b[e]);

  // order nodes by (root, view) to detect conflicts + group tracks
  std::vector<int64_t> order(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) order[i] = i;
  std::vector<int64_t> root(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) root[i] = uf.find(i);
  std::sort(order.begin(), order.end(), [&](int64_t x, int64_t y) {
    if (root[x] != root[y]) return root[x] < root[y];
    if (node_view[x] != node_view[y]) return node_view[x] < node_view[y];
    return node_feat[x] < node_feat[y];
  });

  // single pass: mark conflicted/short tracks
  std::vector<uint8_t> bad_root_flag(n_nodes, 0);
  {
    int64_t start = 0;
    while (start < n_nodes) {
      int64_t end = start;
      bool conflict = false;
      while (end < n_nodes && root[order[end]] == root[order[start]]) {
        if (end > start &&
            node_view[order[end]] == node_view[order[end - 1]])
          conflict = true;
        ++end;
      }
      if (conflict || (end - start) < min_length)
        bad_root_flag[root[order[start]]] = 1;
      start = end;
    }
  }

  // emit
  int64_t out = 0;
  int32_t track_id = -1;
  int64_t prev_root = -1;
  for (int64_t k = 0; k < n_nodes; ++k) {
    const int64_t node = order[k];
    const int64_t r = root[node];
    if (bad_root_flag[r]) continue;
    if (r != prev_root) {
      ++track_id;
      prev_root = r;
    }
    out_track[out] = track_id;
    out_view[out] = node_view[node];
    out_feat[out] = node_feat[node];
    ++out;
  }
  return out;
}

// matches.bin codec (PortableBinary layout, indMatch_utils.cpp):
// [u8 endian][u64 n_pairs] { [u32 i][u32 j][u64 m][m x (u32,u32)] }
// Parse: returns number of pairs, fills pair_ij (2 per pair) and
// counts (1 per pair); the match payload pointers are offsets into `data`
// recorded in offsets[] (byte offset of each pair's match block).
int64_t omt_parse_matches_header(const uint8_t* data, int64_t size,
                                 uint32_t* pair_ij, int64_t* counts,
                                 int64_t* offsets, int64_t max_pairs) {
  if (size < 9) return -1;
  int64_t pos = 1;
  uint64_t n_pairs;
  std::memcpy(&n_pairs, data + pos, 8);
  pos += 8;
  if ((int64_t)n_pairs > max_pairs) return -1;
  for (uint64_t p = 0; p < n_pairs; ++p) {
    if (pos + 16 > size) return -1;
    std::memcpy(&pair_ij[2 * p], data + pos, 8);
    pos += 8;
    uint64_t m;
    std::memcpy(&m, data + pos, 8);
    pos += 8;
    counts[p] = (int64_t)m;
    offsets[p] = pos;
    pos += (int64_t)m * 8;
    if (pos > size) return -1;
  }
  return (int64_t)n_pairs;
}

// .desc codec: [u64 count][count*dim bytes]
int64_t omt_desc_count(const uint8_t* data, int64_t size) {
  if (size < 8) return -1;
  uint64_t n;
  std::memcpy(&n, data, 8);
  return (int64_t)n;
}

// TBMR (tree-based Morse regions): exact max-tree via union-find over
// brightness-sorted pixels with incremental region moments, canonization,
// then selection of the largest topology-preserving region per critical
// branch (features/tbmr/tbmr.cpp semantics, own implementation of
// Xu/Monasse/Geraud/Najman, PAMI 2014).
//
// img: h*w uint8. invert!=0 detects dark regions (min-tree). Writes up to
// max_out rows of (x, y, a, b, c, area) into `out`; returns the count.
int64_t omt_tbmr(const uint8_t* img, int64_t w, int64_t h, int32_t invert,
                 int64_t min_size, double max_rel_size, double* out,
                 int64_t max_out) {
  const int64_t n = w * h;
  if (n == 0) return 0;

  // counting sort: S = pixel ids ordered so that the *tree root end*
  // (darkest for max-tree) comes first; we then scan S backwards.
  std::vector<int64_t> hist(257, 0);
  std::vector<uint8_t> key(n);
  for (int64_t i = 0; i < n; ++i) {
    key[i] = invert ? (uint8_t)(255 - img[i]) : img[i];
    ++hist[key[i] + 1];
  }
  for (int k = 0; k < 256; ++k) hist[k + 1] += hist[k];
  std::vector<int64_t> S(n);
  {
    std::vector<int64_t> cur(hist.begin(), hist.begin() + 256);
    for (int64_t i = 0; i < n; ++i) S[cur[key[i]]++] = i;
  }

  std::vector<int64_t> parent(n), zpar(n), comp_root(n);
  std::vector<int32_t> rank_(n, 0);
  std::vector<uint8_t> seen(n, 0);
  // region attributes, accumulated at the current component root pixel
  std::vector<int64_t> area(n, 0);
  std::vector<double> sx(n, 0), sy(n, 0), sxx(n, 0), syy(n, 0), sxy(n, 0);

  // path-halving find on zpar
  auto zfind = [&](int64_t p) {
    while (zpar[p] != p) {
      zpar[p] = zpar[zpar[p]];
      p = zpar[p];
    }
    return p;
  };

  for (int64_t i = n - 1; i >= 0; --i) {
    const int64_t p = S[i];
    parent[p] = p;
    zpar[p] = p;
    comp_root[p] = p;
    seen[p] = 1;
    const double px = (double)(p % w), py = (double)(p / w);
    area[p] = 1;
    sx[p] = px; sy[p] = py;
    sxx[p] = px * px; syy[p] = py * py; sxy[p] = px * py;

    int64_t x = p;
    const int64_t col = p % w;
    const int64_t nb[4] = {p - w, p + w, col > 0 ? p - 1 : -1,
                           col + 1 < w ? p + 1 : -1};
    for (int k = 0; k < 4; ++k) {
      const int64_t q = nb[k];
      if (q < 0 || q >= n || !seen[q]) continue;
      const int64_t r = zfind(q);
      if (r == x) continue;
      parent[comp_root[r]] = p;
      area[p] += area[comp_root[r]];
      sx[p] += sx[comp_root[r]];
      sy[p] += sy[comp_root[r]];
      sxx[p] += sxx[comp_root[r]];
      syy[p] += syy[comp_root[r]];
      sxy[p] += sxy[comp_root[r]];
      if (rank_[x] < rank_[r]) {
        zpar[x] = r;
        comp_root[r] = p;
        x = r;
      } else if (rank_[r] < rank_[x]) {
        zpar[r] = x;
      } else {
        zpar[r] = x;
        ++rank_[x];
      }
    }
  }

  // canonization: level-equal parents collapse to their canonical element
  for (int64_t i = 0; i < n; ++i) {
    const int64_t p = S[i];
    const int64_t q = parent[p];
    if (img[parent[q]] == img[q]) parent[p] = parent[q];
  }

  // canonical nodes + per-parent counts of large-enough sons
  std::vector<int32_t> num_sons(n, 0);
  std::vector<int64_t> nodes;
  nodes.reserve(n / 4);
  for (int64_t i = n - 1; i >= 0; --i) {
    const int64_t p = S[i];
    if (parent[p] == p || img[p] != img[parent[p]]) {
      nodes.push_back(p);
      if (area[p] >= min_size) ++num_sons[parent[p]];
    }
  }

  std::vector<uint8_t> is_parent_of_leaf(n, 0);
  for (const int64_t p : nodes)
    if (num_sons[p] == 0 && num_sons[parent[p]] == 1)
      is_parent_of_leaf[parent[p]] = 1;

  const int64_t max_area = (int64_t)(max_rel_size * (double)n);
  std::vector<uint8_t> visited(n, 0);
  int64_t count = 0;
  for (const int64_t p : nodes) {
    if (num_sons[p] != 1 || visited[p] || area[p] > max_area) continue;
    int64_t pt = p, po = p;
    int64_t ancestors = 0;
    while (num_sons[pt] == 1 && area[pt] <= max_area) {
      visited[pt] = 1;
      ++ancestors;
      po = pt;
      pt = parent[pt];
    }
    if (is_parent_of_leaf[p] && ancestors <= 1) continue;

    const double A = (double)area[po];
    const double cx = sx[po] / A, cy = sy[po] / A;
    const double i20 = sxx[po] - A * cx * cx;
    const double i02 = syy[po] - A * cy * cy;
    const double i11 = sxy[po] - A * cx * cy;
    const double det = i20 * i02 - i11 * i11;
    if (det == 0.0) continue;
    const double a = i02 / det * (A - 1.0) / 4.0;
    const double b = -i11 / det * (A - 1.0) / 4.0;
    const double c = i20 / det * (A - 1.0) / 4.0;
    // minor semi-axis (feature.cpp:104-107): reject thin/tiny ellipses
    const double disc = a * a + c * c + 4.0 * b * b - 2.0 * a * c;
    const double e_big = (a + c + std::sqrt(disc > 0 ? disc : 0)) / 2.0;
    if (e_big <= 0) continue;
    const double l_min = 1.0 / std::sqrt(e_big);
    if (l_min < 1.5) continue;
    if (count < max_out) {
      out[count * 6 + 0] = cx;
      out[count * 6 + 1] = cy;
      out[count * 6 + 2] = a;
      out[count * 6 + 3] = b;
      out[count * 6 + 4] = c;
      out[count * 6 + 5] = A;
      ++count;
    }
  }
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CPU baseline brute-force 2-NN matcher for bench.py.
//
// Functional equivalent of the reference's production matcher configuration
// (matching/matcher_brute_force.hpp rows + metric_simd.hpp AVX2 uint8 L2,
// OpenMP parallel-for as in Matcher_Regions.cpp): for every left
// descriptor, squared-L2 distances to all right descriptors, keep the two
// smallest, ratio-test d1 < r^2*d2.  This is the honest "openMVG-CPU"
// number the TPU kernel is compared against (the reference binaries cannot
// be built in this environment: the cereal/osi_clp submodules are empty
// and there is no network).
// ---------------------------------------------------------------------------

#if defined(__AVX2__)
#include <immintrin.h>
#endif

extern "C" {

int64_t omt_bench_match_2nn(const uint8_t* a, int64_t n, const uint8_t* b,
                            int64_t m, int64_t dim, double ratio,
                            int32_t* out_idx, int32_t* out_keep) {
  if (dim % 32 != 0) return -1;
  const double r2 = ratio * ratio;
  int64_t kept = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) reduction(+ : kept)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* ai = a + i * dim;
    int32_t best = INT32_MAX, second = INT32_MAX, arg = -1;
    for (int64_t j = 0; j < m; ++j) {
      const uint8_t* bj = b + j * dim;
      int32_t d = 0;
#if defined(__AVX2__)
      __m256i acc = _mm256_setzero_si256();
      for (int64_t k = 0; k < dim; k += 32) {
        const __m256i va = _mm256_loadu_si256((const __m256i*)(ai + k));
        const __m256i vb = _mm256_loadu_si256((const __m256i*)(bj + k));
        // |va - vb| per u8 lane, then widen and square-accumulate
        const __m256i df = _mm256_sub_epi8(_mm256_max_epu8(va, vb),
                                           _mm256_min_epu8(va, vb));
        const __m256i lo = _mm256_unpacklo_epi8(df, _mm256_setzero_si256());
        const __m256i hi = _mm256_unpackhi_epi8(df, _mm256_setzero_si256());
        acc = _mm256_add_epi32(acc, _mm256_madd_epi16(lo, lo));
        acc = _mm256_add_epi32(acc, _mm256_madd_epi16(hi, hi));
      }
      alignas(32) int32_t lanes[8];
      _mm256_store_si256((__m256i*)lanes, acc);
      d = lanes[0] + lanes[1] + lanes[2] + lanes[3] + lanes[4] + lanes[5] +
          lanes[6] + lanes[7];
#else
      for (int64_t k = 0; k < dim; ++k) {
        const int32_t df = (int32_t)ai[k] - (int32_t)bj[k];
        d += df * df;
      }
#endif
      if (d < best) {
        second = best;
        best = d;
        arg = (int32_t)j;
      } else if (d < second) {
        second = d;
      }
    }
    out_idx[i] = arg;
    const int k = (double)best < r2 * (double)second;
    out_keep[i] = k;
    kept += k;
  }
  return kept;
}

}  // extern "C"
