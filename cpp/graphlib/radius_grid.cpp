// Grid-hash fixed-radius neighbor search for the Point-GNN/TPU host
// pipeline.  Native replacement for the per-frame sklearn ball-tree the
// reference uses (/root/reference/models/graph_gen.py:197-220).
//
// Algorithm: CSR-by-sort spatial hashing.  Points are hashed into cubic
// cells with edge length = radius; the sorted (cell_key, point) layout
// gives per-cell ranges by binary search, so each center scans at most
// its 27 neighboring cells.  Neighbor capping uses per-center reservoir
// sampling (uniform without replacement), seeded deterministically per
// center so results are reproducible and thread-order independent.
//
// Exposed as a C ABI for ctypes.  Parallelized over centers with OpenMP.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// splitmix64 — tiny deterministic per-center PRNG stream.
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline uint64_t rand_below(uint64_t& s, uint64_t n) {
  // modulo bias is irrelevant at these magnitudes
  return splitmix64(s) % n;
}

struct Grid {
  std::vector<int64_t> sorted_keys;   // [n] cell key per point, sorted
  std::vector<int64_t> sorted_point;  // [n] original point index
  int64_t dims[3];
  double origin[3];
  double inv_cell;
};

static void build_grid(const float* pts, int64_t n, const float* centers,
                       int64_t m, double cell, Grid* g) {
  double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      double v = pts[i * 3 + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  for (int64_t i = 0; i < m; ++i)
    for (int d = 0; d < 3; ++d) {
      double v = centers[i * 3 + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  g->inv_cell = 1.0 / cell;
  for (int d = 0; d < 3; ++d) {
    g->origin[d] = lo[d];
    // +3 head-room: one for rounding, one so that center cells +-1 stay
    // inside the addressable range without wrap-around
    g->dims[d] = (int64_t)((hi[d] - lo[d]) * g->inv_cell) + 3;
  }
  g->sorted_keys.resize(n);
  g->sorted_point.resize(n);
  std::vector<std::pair<int64_t, int64_t>> kv(n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = (int64_t)((pts[i * 3 + 0] - g->origin[0]) * g->inv_cell) + 1;
    int64_t cy = (int64_t)((pts[i * 3 + 1] - g->origin[1]) * g->inv_cell) + 1;
    int64_t cz = (int64_t)((pts[i * 3 + 2] - g->origin[2]) * g->inv_cell) + 1;
    kv[i] = {(cx * g->dims[1] + cy) * g->dims[2] + cz, i};
  }
  std::sort(kv.begin(), kv.end());
  for (int64_t i = 0; i < n; ++i) {
    g->sorted_keys[i] = kv[i].first;
    g->sorted_point[i] = kv[i].second;
  }
}

}  // namespace

extern "C" {

// Count + emit (point, center) pairs with |p - c| <= radius.
//
// Two-phase contract driven by *out_count:
//   pass 1 (out_src == nullptr): writes per-center counts into
//     out_counts[m] (post-cap) and returns total.
//   pass 2: fills out_src/out_dst (size >= total from pass 1), grouped
//     by center ascending.
// Returns 0 on success.
int pgnn_radius_neighbors(const float* points, int64_t n_points,
                          const float* centers, int64_t n_centers,
                          float radius, int32_t max_neighbors, uint64_t seed,
                          int64_t* out_counts,  // [n_centers]
                          int64_t* out_offsets, // [n_centers+1], pass2 input
                          int64_t* out_src, int64_t* out_dst) {
  if (n_points == 0 || n_centers == 0) return 0;
  // Built during the counting pass, read-only in the fill pass.  The
  // two passes must be issued back-to-back by a single caller (the
  // Python wrapper holds the GIL around both), so a process-wide slot
  // is safe and avoids rebuilds.
  static Grid grid;
  const bool counting = (out_src == nullptr);
  if (counting) {
    build_grid(points, n_points, centers, n_centers, radius, &grid);
  }
  const double r2 = (double)radius * (double)radius;
  const int64_t* skeys = grid.sorted_keys.data();
  const int64_t* spoint = grid.sorted_point.data();
  const int64_t n = n_points;
  const int64_t d1 = grid.dims[1], d2g = grid.dims[2];

#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t c = 0; c < n_centers; ++c) {
    const double cx = centers[c * 3 + 0], cy = centers[c * 3 + 1],
                 cz = centers[c * 3 + 2];
    const int64_t gx = (int64_t)((cx - grid.origin[0]) * grid.inv_cell) + 1;
    const int64_t gy = (int64_t)((cy - grid.origin[1]) * grid.inv_cell) + 1;
    const int64_t gz = (int64_t)((cz - grid.origin[2]) * grid.inv_cell) + 1;
    int64_t found = 0;
    int64_t* dst_slot = counting ? nullptr : out_src + out_offsets[c];
    const int64_t cap =
        (max_neighbors > 0) ? (int64_t)max_neighbors : INT64_MAX;
    uint64_t rng_state = seed * 0x9e3779b97f4a7c15ULL + (uint64_t)c + 1;
    for (int64_t ox = -1; ox <= 1; ++ox)
      for (int64_t oy = -1; oy <= 1; ++oy)
        for (int64_t oz = -1; oz <= 1; ++oz) {
          const int64_t key =
              ((gx + ox) * d1 + (gy + oy)) * d2g + (gz + oz);
          const int64_t* lo = std::lower_bound(skeys, skeys + n, key);
          const int64_t* hi = std::upper_bound(lo, skeys + n, key);
          for (const int64_t* it = lo; it != hi; ++it) {
            const int64_t p = spoint[it - skeys];
            const double dx = points[p * 3 + 0] - cx;
            const double dy = points[p * 3 + 1] - cy;
            const double dz = points[p * 3 + 2] - cz;
            if (dx * dx + dy * dy + dz * dz <= r2) {
              if (counting) {
                ++found;
              } else {
                // reservoir sampling: first `cap` kept, later ones
                // replace a uniform slot with prob cap/found
                if (found < cap) {
                  dst_slot[found] = p;
                } else {
                  const uint64_t j = rand_below(rng_state, (uint64_t)found + 1);
                  if ((int64_t)j < cap) dst_slot[j] = p;
                }
                ++found;
              }
            }
          }
        }
    if (counting) {
      out_counts[c] = std::min(found, cap);
    } else {
      const int64_t kept = std::min(found, cap);
      int64_t* dsts = out_dst + out_offsets[c];
      for (int64_t i = 0; i < kept; ++i) dsts[i] = c;
    }
  }
  return 0;
}

// Voxel downsample, one uniformly random point index per occupied cell.
// Mirrors graph_gen.py:92-153 semantics with an optional random grid
// shift (shift in [0, 1) units of voxel_size, pre-sampled by caller).
// Returns the number of selected indices written to out_indices.
int64_t pgnn_voxel_random(const float* points, int64_t n, float voxel_size,
                          const float* shift3,  // nullptr or [3]
                          uint64_t seed, int64_t* out_indices) {
  if (n == 0) return 0;
  double lo[3] = {1e30, 1e30, 1e30};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d)
      lo[d] = std::min(lo[d], (double)points[i * 3 + d]);
  const double inv = 1.0 / voxel_size;
  std::vector<std::pair<int64_t, int64_t>> kv(n);
  double sh[3] = {0, 0, 0};
  if (shift3) {
    for (int d = 0; d < 3; ++d) sh[d] = shift3[d] * voxel_size;
  }
  // grid dims for key packing
  double hi[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d)
      hi[d] = std::max(hi[d], (double)points[i * 3 + d]);
  int64_t dims[3];
  for (int d = 0; d < 3; ++d)
    dims[d] = (int64_t)((hi[d] - lo[d] + sh[d]) * inv) + 2;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t cx =
        (int64_t)((points[i * 3 + 0] - lo[0] + sh[0]) * inv);
    const int64_t cy =
        (int64_t)((points[i * 3 + 1] - lo[1] + sh[1]) * inv);
    const int64_t cz =
        (int64_t)((points[i * 3 + 2] - lo[2] + sh[2]) * inv);
    kv[i] = {(cx * dims[1] + cy) * dims[2] + cz, i};
  }
  std::sort(kv.begin(), kv.end());
  int64_t out = 0;
  uint64_t rng_state = seed + 0x12345;
  int64_t group_start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || kv[i].first != kv[group_start].first) {
      const int64_t len = i - group_start;
      const int64_t pick =
          (len == 1) ? group_start
                     : group_start + (int64_t)rand_below(rng_state, len);
      out_indices[out++] = kv[pick].second;
      group_start = i;
    }
  }
  return out;
}

}  // extern "C"
