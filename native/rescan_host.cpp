// rescan_host — native host-side helpers for the rescan_tpu framework.
//
// TPU-native design note: device compute (scoring, ICP, energy, smoothing)
// lives in JAX/Pallas. What belongs here is the small set of inherently
// sequential host algorithms on the ingest path where a Python loop would
// dominate wall-clock:
//
//   * greedy first-in-index-order Poisson-disk subsampling used to build the
//     5-level LoD pyramid (reference semantics:
//     lib/rs/rs_pointcloud.h:985-1106 — pick first unmarked point in index
//     order, emit it, mark every point with dist^2 < voxel^2)
//   * a uniform hash-grid radius / nearest search used as a host oracle and
//     for host-side fallbacks (reference: lib/msh/msh_hash_grid.h — strict
//     `dist_sq < radius_sq` inclusion, capped results keep the k closest;
//     queries are OpenMP-parallel like the reference, msh_hash_grid.h:1120)
//   * RANSAC plane-candidate inlier counting / gathering (the host VM's
//     memory bandwidth makes the equivalent numpy broadcasts ~20x slower;
//     reference: rs_pointcloud_filters.cpp:162-176, :277-323)
//   * union-find connected components over a precomputed kNN edge list
//     (reference: the `universe` class, rs_pointcloud_filters.cpp:30-66)
//
// Exposed as a plain C ABI consumed via ctypes (core/native.py).
// Build: tools/build_native.sh (g++ -O3 -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <functional>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <chrono>

namespace {

inline double wall_sec() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

struct Grid {
  float ox, oy, oz;      // origin
  float inv_cell;
  int nx, ny, nz;
  std::vector<int32_t> cell_start;   // nx*ny*nz + 1
  std::vector<int32_t> order;        // point indices sorted by cell
  // cell-ordered SoA coordinate copies: the radius-search inner loop
  // reads them contiguously (vectorizable) instead of gathering
  // pts[3 * order[s]]
  std::vector<float> sx, sy, sz;
};

inline int64_t clampi(int64_t v, int64_t lo, int64_t hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Build a dense uniform grid over the points' bounding box.
void build_grid(const float* pts, int64_t n, float cell, Grid* g) {
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      float v = pts[3 * i + k];
      if (v < mn[k]) mn[k] = v;
      if (v > mx[k]) mx[k] = v;
    }
  }
  g->ox = mn[0]; g->oy = mn[1]; g->oz = mn[2];
  g->inv_cell = 1.0f / cell;
  g->nx = std::max(1, (int)std::floor((mx[0] - mn[0]) * g->inv_cell) + 1);
  g->ny = std::max(1, (int)std::floor((mx[1] - mn[1]) * g->inv_cell) + 1);
  g->nz = std::max(1, (int)std::floor((mx[2] - mn[2]) * g->inv_cell) + 1);
  int64_t ncells = (int64_t)g->nx * g->ny * g->nz;
  std::vector<int32_t> cnt(ncells + 1, 0);
  std::vector<int32_t> cid(n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = clampi((int64_t)((pts[3 * i + 0] - g->ox) * g->inv_cell), 0, g->nx - 1);
    int64_t cy = clampi((int64_t)((pts[3 * i + 1] - g->oy) * g->inv_cell), 0, g->ny - 1);
    int64_t cz = clampi((int64_t)((pts[3 * i + 2] - g->oz) * g->inv_cell), 0, g->nz - 1);
    cid[i] = (int32_t)((cy * g->nz + cz) * g->nx + cx);
    cnt[cid[i] + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) cnt[c + 1] += cnt[c];
  g->cell_start = cnt;
  g->order.resize(n);
  std::vector<int32_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g->order[cursor[cid[i]]++] = (int32_t)i;
  g->sx.resize(n); g->sy.resize(n); g->sz.resize(n);
  for (int64_t s = 0; s < n; ++s) {
    const int32_t j = g->order[s];
    g->sx[s] = pts[3 * j + 0];
    g->sy[s] = pts[3 * j + 1];
    g->sz[s] = pts[3 * j + 2];
  }
}

template <typename Fn>
inline void for_neighbors(const Grid& g, const float* pts, float qx, float qy,
                          float qz, float radius, Fn&& fn) {
  float r2 = radius * radius;
  int span = (int)std::ceil(radius * g.inv_cell);
  int cx = (int)clampi((int64_t)((qx - g.ox) * g.inv_cell), 0, g.nx - 1);
  int cy = (int)clampi((int64_t)((qy - g.oy) * g.inv_cell), 0, g.ny - 1);
  int cz = (int)clampi((int64_t)((qz - g.oz) * g.inv_cell), 0, g.nz - 1);
  for (int dy = -span; dy <= span; ++dy) {
    int yy = cy + dy;
    if (yy < 0 || yy >= g.ny) continue;
    for (int dz = -span; dz <= span; ++dz) {
      int zz = cz + dz;
      if (zz < 0 || zz >= g.nz) continue;
      for (int dx = -span; dx <= span; ++dx) {
        int xx = cx + dx;
        if (xx < 0 || xx >= g.nx) continue;
        int64_t c = ((int64_t)yy * g.nz + zz) * g.nx + xx;
        for (int32_t s = g.cell_start[c]; s < g.cell_start[c + 1]; ++s) {
          int32_t j = g.order[s];
          float vx = pts[3 * j + 0] - qx;
          float vy = pts[3 * j + 1] - qy;
          float vz = pts[3 * j + 2] - qz;
          float d2 = vx * vx + vy * vy + vz * vz;
          if (d2 < r2) fn(j, d2);
        }
      }
    }
  }
}

// --- msh_rand (PCG32, Gustavsson seeding) replica -------------------------
// Reference: lib/msh/msh_std.h:1424-1470. Needed so the mesh-resampling
// sample stream is bit-exact with the reference pipeline.
struct MshRand {
  uint64_t state, inc;
  static uint64_t avalanche(uint64_t h) {
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33; h *= 0xc4ceb9fe1a85ec53ULL;
    h ^= h >> 33; return h;
  }
  explicit MshRand(uint32_t seed) {
    uint64_t value = (((uint64_t)seed) << 1ULL) | 1ULL;
    value = avalanche(value);
    state = 0U; inc = (value << 1ULL) | 1ULL;
    next_u32();
    state += avalanche(value);
    next_u32();
  }
  uint32_t next_u32() {
    uint64_t old = state;
    state = old * 0x5851f42d4c957f2dULL + inc;
    uint32_t xs = (uint32_t)(((old >> 18ULL) ^ old) >> 27ULL);
    uint32_t rot = (uint32_t)(old >> 59ULL);
    return (xs >> rot) | (xs << ((-(int)rot) & 31));
  }
  float next_f32() {
    uint32_t v = next_u32();
    uint32_t bits = (127u << 23) | (v >> 9);
    float f; memcpy(&f, &bits, sizeof(float));
    return f - 1.0f;
  }
  int32_t next_range(int32_t lo, int32_t hi) {
    int32_t range = (hi - lo) + 1;
    if (range <= 0) return lo;
    return lo + (int32_t)(next_f32() * range);
  }
};

}  // namespace

extern "C" {

// Draw the reference's mesh-resampling sample stream: face indices from the
// msh alias-method distribution over triangle areas (seed 64321,
// msh_std.h:1863-1942) and barycentric coords from PCG32 (seed 12346) with
// the reflect-if-outside rule (rs_pointcloud.h:1114-1130, :1167-1173).
// out_face: n_samples int32; out_bary: n_samples*3 float32 (q, s, t).
void rescan_resample_stream(const double* areas, int64_t n_faces,
                            int64_t n_samples, uint32_t face_seed,
                            uint32_t bary_seed, int32_t* out_face,
                            float* out_bary) {
  // alias table construction (msh_discrete_distribution_update,
  // msh_std.h:1863-1916): stack order matters for exactness
  std::vector<double> pdf(n_faces);
  double total = 0.0;
  for (int64_t i = 0; i < n_faces; ++i) total += areas[i];
  // msh_distrib2pdf (msh_std.h:1843-1849) sums via msh_accumulated, which
  // returns FLOAT (msh_std.h:660) — replicate the f32 truncation and the
  // multiply-by-reciprocal form exactly.
  total = (double)(float)total;
  double inv_sum = 1.0 / total;
  for (int64_t i = 0; i < n_faces; ++i)
    pdf[i] = total > 1e-8 ? areas[i] * inv_sum : 0.0;
  double avg = 1.0 / (double)n_faces;
  std::vector<double> prob(n_faces, 1.0);
  std::vector<int32_t> alias(n_faces, 0);
  std::vector<int32_t> small, large;
  for (int64_t i = 0; i < n_faces; ++i) {
    if (pdf[i] >= avg) large.push_back((int32_t)i);
    else small.push_back((int32_t)i);
  }
  while (!small.empty() && !large.empty()) {
    int32_t l = small.back(); small.pop_back();
    int32_t g = large.back(); large.pop_back();
    prob[l] = pdf[l] * n_faces;
    alias[l] = g;
    pdf[g] = (pdf[g] + pdf[l]) - avg;
    if (pdf[g] >= avg) large.push_back(g);
    else small.push_back(g);
  }
  MshRand face_rng(face_seed);
  MshRand bary_rng(bary_seed);
  for (int64_t i = 0; i < n_samples; ++i) {
    int32_t col = face_rng.next_range(0, (int32_t)n_faces - 1);
    bool coin = face_rng.next_f32() < prob[col];
    out_face[i] = coin ? col : alias[col];
    double s = bary_rng.next_f32();
    double t = bary_rng.next_f32();
    if (s + t > 1.0) { s = 1.0 - s; t = 1.0 - t; }
    out_bary[3 * i + 0] = (float)(1.0 - s - t);
    out_bary[3 * i + 1] = (float)s;
    out_bary[3 * i + 2] = (float)t;
  }
}

// Greedy Poisson-disk subsample with exact reference semantics
// (rs_pointcloud__compute_level_poisson, lib/rs/rs_pointcloud.h:985-1106).
// Returns the number of sample indices written to out_idx (caller allocates n).
int64_t rescan_poisson_subsample(const float* pts, int64_t n, float voxel,
                                 int32_t* out_idx) {
  if (n <= 0) return 0;
  Grid g;
  build_grid(pts, n, 2.5f * voxel, &g);  // grid cell = 2.5*voxel (:990)
  std::vector<uint8_t> unmarked(n, 1);
  int64_t n_marked = 0, n_samples = 0, last = 0;
  while (n_marked < n) {
    int64_t s = last;
    while (unmarked[s] != 1) ++s;
    last = s;
    out_idx[n_samples++] = (int32_t)s;
    int64_t newly = 0;
    for_neighbors(g, pts, pts[3 * s], pts[3 * s + 1], pts[3 * s + 2], voxel,
                  [&](int32_t j, float) {
                    if (unmarked[j]) { unmarked[j] = 0; ++newly; }
                  });
    // NOTE: the sample itself is within radius of itself (d2 = 0 < r2),
    // so it is always marked by its own query, matching the reference.
    n_marked += newly;
  }
  return n_samples;
}

// Opaque host hash grid handles.
void* rescan_grid_build(const float* pts, int64_t n, float cell) {
  Grid* g = new Grid();
  build_grid(pts, n, cell, g);
  return g;
}

void rescan_grid_free(void* grid) { delete (Grid*)grid; }

// Fixed-K radius search: for each query, the K nearest points with
// dist^2 < radius^2, sorted ascending. out_idx/out_d2 are (m, k); missing
// slots get idx -1. Returns nothing; counts go to out_cnt (m).
void rescan_grid_radius_search(void* grid, const float* pts,
                               const float* queries, int64_t m, float radius,
                               int32_t k, int32_t* out_idx, float* out_d2,
                               int32_t* out_cnt) {
  // k closest within strict radius, ordered by (d2, idx) — identical
  // selection to a full sort of all candidates. The inner loop reads the
  // grid's cell-ordered SoA coordinates contiguously and computes a
  // chunk of distances branch-free (vectorized) before the (rare)
  // candidate insertions; the partial_sort + per-query heap allocation
  // of the previous version dominated the plane CC-split and smoothing
  // graph builds on the 1-core host VM.
  (void)pts;
  Grid* g = (Grid*)grid;
  const float r2 = radius * radius;
#pragma omp parallel
  {
    std::vector<float> bd(k);
    std::vector<int32_t> bi(k);
#pragma omp for schedule(dynamic, 256)
    for (int64_t q = 0; q < m; ++q) {
      const float qx = queries[3 * q], qy = queries[3 * q + 1],
                  qz = queries[3 * q + 2];
      int32_t cnt = 0;
      float cut = r2;
      int span = (int)std::ceil(radius * g->inv_cell);
      int cx = (int)clampi((int64_t)((qx - g->ox) * g->inv_cell), 0, g->nx - 1);
      int cy = (int)clampi((int64_t)((qy - g->oy) * g->inv_cell), 0, g->ny - 1);
      int cz = (int)clampi((int64_t)((qz - g->oz) * g->inv_cell), 0, g->nz - 1);
      float buf[128];
      for (int dy = -span; dy <= span; ++dy) {
        int yy = cy + dy;
        if (yy < 0 || yy >= g->ny) continue;
        for (int dz = -span; dz <= span; ++dz) {
          int zz = cz + dz;
          if (zz < 0 || zz >= g->nz) continue;
          {
            // cells are x-contiguous in memory: the whole [cx-span,
            // cx+span] run is ONE span of the cell-ordered arrays
            const int x_lo = (int)clampi(cx - span, 0, g->nx - 1);
            const int x_hi = (int)clampi(cx + span, 0, g->nx - 1);
            const int64_t row = ((int64_t)yy * g->nz + zz) * g->nx;
            const int32_t s0 = g->cell_start[row + x_lo];
            const int32_t s1 = g->cell_start[row + x_hi + 1];
            for (int32_t s = s0; s < s1; s += 128) {
              const int len = (int)std::min<int32_t>(128, s1 - s);
              const float* __restrict xs = g->sx.data() + s;
              const float* __restrict ys = g->sy.data() + s;
              const float* __restrict zs = g->sz.data() + s;
              for (int t = 0; t < len; ++t) {
                const float vx = xs[t] - qx, vy = ys[t] - qy, vz = zs[t] - qz;
                buf[t] = vx * vx + vy * vy + vz * vz;
              }
              for (int t = 0; t < len; ++t) {
                const float d2 = buf[t];
                // cut tightens to the current worst-of-k once the list is
                // full: in dense data the k nearest are far tighter than
                // the radius, so most candidates exit on this one compare
                if (d2 > cut) continue;
                const int32_t j = g->order[s + t];
                if (cnt == k) {
                  if (d2 >= r2 || d2 > bd[k - 1] ||
                      (d2 == bd[k - 1] && j >= bi[k - 1])) continue;
                  --cnt;
                } else if (d2 >= r2) {
                  continue;
                }
                int p = cnt;
                while (p > 0 && (bd[p - 1] > d2 ||
                                 (bd[p - 1] == d2 && bi[p - 1] > j))) {
                  bd[p] = bd[p - 1]; bi[p] = bi[p - 1]; --p;
                }
                bd[p] = d2; bi[p] = j; ++cnt;
                if (cnt == k) cut = bd[k - 1];
              }
            }
          }
        }
      }
      for (int32_t i = 0; i < k; ++i) {
        if (i < cnt) {
          out_idx[q * k + i] = bi[i];
          out_d2[q * k + i] = bd[i];
        } else {
          out_idx[q * k + i] = -1;
          out_d2[q * k + i] = 1e30f;
        }
      }
      out_cnt[q] = cnt;
    }
  }
}

// Inlier counts of C candidate planes over the ACTIVE points:
// counts[c] = |{ p active : |pts_p . n_c - off_c| < dist }|.
// (rs_pointcloud_filters.cpp:162-176 runs one serial pass per candidate.)
void rescan_plane_counts(const float* pts, const uint8_t* active, int64_t n,
                         const float* normals, const float* offs,
                         int64_t n_cand, float dist, int32_t* counts) {
  // Blocked GEMM shape: a ~2k point block is compacted to active-only SoA
  // (branchless strideless inner loop) and stays cache-resident while all
  // candidates scan it — the candidate-outer version streamed the full
  // point array n_cand times. SIMD is the only parallelism on the 1-core
  // host VM; this loop is the RANSAC wall-clock.
  for (int64_t c = 0; c < n_cand; ++c) counts[c] = 0;
  const int64_t BP = 2048;
  std::vector<float> bx(BP), by(BP), bz(BP);
  for (int64_t p0 = 0; p0 < n; p0 += BP) {
    const int64_t len = std::min(BP, n - p0);
    int64_t m = 0;
    for (int64_t t = 0; t < len; ++t) {
      if (active && !active[p0 + t]) continue;
      bx[m] = pts[3 * (p0 + t)];
      by[m] = pts[3 * (p0 + t) + 1];
      bz[m] = pts[3 * (p0 + t) + 2];
      ++m;
    }
    if (!m) continue;
#pragma omp parallel for schedule(static)
    for (int64_t c = 0; c < n_cand; ++c) {
      const float nx = normals[3 * c], ny = normals[3 * c + 1],
                  nz = normals[3 * c + 2], off = offs[c];
      const float* __restrict x = bx.data();
      const float* __restrict y = by.data();
      const float* __restrict z = bz.data();
      int32_t cnt = 0;
      for (int64_t t = 0; t < m; ++t) {
        float d = x[t] * nx + y[t] * ny + z[t] * nz - off;
        cnt += (int32_t)(std::fabs(d) < dist);
      }
      counts[c] += cnt;
    }
  }
}

// Alias-table construction replicating msh_discrete_distrib_t
// (lib/msh/msh_std.h:1863-1942) bit-exactly — same stack order, same f64
// arithmetic; only lifted from Python (it rebuilds per RANSAC round).
void rescan_alias_build(const double* weights, int64_t n, double* prob,
                        int64_t* alias) {
  double total = 0.0;
  for (int64_t i = 0; i < n; ++i) total += weights[i];
  std::vector<double> pdf(n);
  if (total > 1e-8)
    for (int64_t i = 0; i < n; ++i) pdf[i] = weights[i] / total;
  else
    for (int64_t i = 0; i < n; ++i) pdf[i] = 0.0;
  const double avg = 1.0 / (double)n;
  for (int64_t i = 0; i < n; ++i) { prob[i] = 1.0; alias[i] = 0; }
  std::vector<int64_t> small, large;
  small.reserve(n); large.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    (pdf[i] >= avg ? large : small).push_back(i);
  while (!small.empty() && !large.empty()) {
    int64_t l = small.back(); small.pop_back();
    int64_t g = large.back(); large.pop_back();
    prob[l] = pdf[l] * (double)n;
    alias[l] = g;
    pdf[g] = (pdf[g] + pdf[l]) - avg;
    (pdf[g] >= avg ? large : small).push_back(g);
  }
}

// Per-model inlier mask: out[c * n + p] = 1 iff |nrm_p . n_c| > dot_thr
// AND |(pts_p - center_c) . n_c| < dist_thr
// (rspf__gather_model_inliers, rs_pointcloud_filters.cpp:277-323).
void rescan_plane_gather(const float* pts, const float* nrm, int64_t n,
                         const float* centers, const float* normals,
                         int64_t n_models, float dot_thr, float dist_thr,
                         uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t c = 0; c < n_models; ++c) {
    const float nx = normals[3 * c], ny = normals[3 * c + 1],
                nz = normals[3 * c + 2];
    const float off = centers[3 * c] * nx + centers[3 * c + 1] * ny
                      + centers[3 * c + 2] * nz;
    uint8_t* row = out + c * n;
    for (int64_t p = 0; p < n; ++p) {
      float d = pts[3 * p] * nx + pts[3 * p + 1] * ny + pts[3 * p + 2] * nz
                - off;
      float a = nrm[3 * p] * nx + nrm[3 * p + 1] * ny + nrm[3 * p + 2] * nz;
      row[p] = (std::fabs(a) > dot_thr) && (std::fabs(d) < dist_thr);
    }
  }
}

// Voxel-overlap occupancy counts for the host greedy NMS
// (isect_get_overlap_factor, lib/rs/intersect.h:309-368; semantics
// identical to the numpy engine in ops/voxel.py — grid [y][z][x], f32
// subtract/divide/floor rasterization, per-slice even-odd scanline fill
// along x and z in both directions, INSIDE where both directions agree).
// out = {occupied_a, occupied_b, occupied_both}.
namespace {
void occ_from_points(const float* p, int64_t n, const float* origin,
                     int X, int Y, int Z, float voxel, bool fill,
                     std::vector<uint8_t>& g, std::vector<uint8_t>& occ) {
  const int64_t cells = (int64_t)X * Y * Z;
  g.assign(cells, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cx = clampi((int64_t)std::floor((p[3 * i] - origin[0]) / voxel),
                        0, X - 1);
    int64_t cy = clampi((int64_t)std::floor((p[3 * i + 1] - origin[1]) / voxel),
                        0, Y - 1);
    int64_t cz = clampi((int64_t)std::floor((p[3 * i + 2] - origin[2]) / voxel),
                        0, Z - 1);
    g[(cy * Z + cz) * X + cx] = 1;
  }
  occ.assign(cells, 0);
  if (!fill) {
    occ = g;
    return;
  }
  std::vector<uint8_t> ix(cells), iz(cells);
  for (int y = 0; y < Y; ++y) {
    for (int z = 0; z < Z; ++z) {       // x scans within the (y, z) row
      const int64_t base = ((int64_t)y * Z + z) * X;
      int cnt = 0; uint8_t prev = 0;
      for (int x = 0; x < X; ++x) {
        uint8_t cur = g[base + x];
        cnt += (cur == 0 && prev == 1);
        ix[base + x] = (uint8_t)(cnt & 1);
        prev = cur;
      }
      cnt = 0; prev = 0;
      for (int x = X - 1; x >= 0; --x) {
        uint8_t cur = g[base + x];
        cnt += (cur == 0 && prev == 1);
        ix[base + x] = ix[base + x] && (cnt & 1) && cur == 0;
        prev = cur;
      }
    }
    for (int x = 0; x < X; ++x) {       // z scans within the (y, x) column
      const int64_t base = (int64_t)y * Z * X + x;
      int cnt = 0; uint8_t prev = 0;
      for (int z = 0; z < Z; ++z) {
        uint8_t cur = g[base + (int64_t)z * X];
        cnt += (cur == 0 && prev == 1);
        iz[base + (int64_t)z * X] = (uint8_t)(cnt & 1);
        prev = cur;
      }
      cnt = 0; prev = 0;
      for (int z = Z - 1; z >= 0; --z) {
        uint8_t cur = g[base + (int64_t)z * X];
        cnt += (cur == 0 && prev == 1);
        iz[base + (int64_t)z * X] =
            iz[base + (int64_t)z * X] && (cnt & 1) && cur == 0;
        prev = cur;
      }
    }
  }
  for (int64_t i = 0; i < cells; ++i)
    occ[i] = g[i] || (ix[i] && iz[i]);
}
}  // namespace

void rescan_overlap_counts(const float* pa, int64_t na, const float* pb,
                           int64_t nb, const float* origin,
                           const int32_t* res, float voxel,
                           int32_t voxelize_inside, int64_t* out) {
  const int X = res[0], Y = res[1], Z = res[2];
  std::vector<uint8_t> g, occ_a, occ_b;
  occ_from_points(pa, na, origin, X, Y, Z, voxel, voxelize_inside, g, occ_a);
  occ_from_points(pb, nb, origin, X, Y, Z, voxel, voxelize_inside, g, occ_b);
  int64_t ca = 0, cb = 0, cnt = 0;
  const int64_t cells = (int64_t)X * Y * Z;
  for (int64_t i = 0; i < cells; ++i) {
    ca += occ_a[i];
    cb += occ_b[i];
    cnt += occ_a[i] && occ_b[i];
  }
  out[0] = ca; out[1] = cb; out[2] = cnt;
}

// Smoothing-graph post-pass (ops/labels.build_smoothing_graph): turn the
// (n, k) radius-kNN result into deduped unordered edges with the
// reference's weights w = (1 - (d2/(4 r^2))^dist_exp) * clip(dot,0,1)^
// angle_exp (rspf_compute_neighborhood, rs_pointcloud_filters.cpp:674-722).
// Skips each query's first (self) neighbor like the reference; dedup via
// an open-addressing set on the unordered pair key. Returns the edge count.
int64_t rescan_smooth_graph(const int32_t* idx, const float* d2,
                            const float* nrm, int64_t n, int32_t k,
                            float r2, int32_t dist_exp, int32_t angle_exp,
                            int32_t* out_src, int32_t* out_dst,
                            float* out_w) {
  uint64_t cap = 1;
  while (cap < (uint64_t)(n * k) * 2u) cap <<= 1;
  std::vector<uint64_t> table(cap, ~0ull);
  const uint64_t mask = cap - 1;
  const float denom = 4.0f * r2;
  int64_t e = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t c = 1; c < k; ++c) {   // c = 0 is the query itself
      const int32_t j = idx[i * k + c];
      if (j < 0) continue;
      const uint64_t a = (uint64_t)(i < j ? i : j);
      const uint64_t b = (uint64_t)(i < j ? j : i);
      const uint64_t key = a * (uint64_t)n + b;
      uint64_t h = (key * 0x9E3779B97F4A7C15ull) & mask;
      bool dup = false;
      while (table[h] != ~0ull) {
        if (table[h] == key) { dup = true; break; }
        h = (h + 1) & mask;
      }
      if (dup) continue;
      table[h] = key;
      const float dd = d2[i * k + c];
      float t = dd / denom;
      float dist_cost = 1.0f - std::pow(t, (float)dist_exp);
      float dot = nrm[3 * i] * nrm[3 * j] + nrm[3 * i + 1] * nrm[3 * j + 1]
                  + nrm[3 * i + 2] * nrm[3 * j + 2];
      dot = dot < 0.0f ? 0.0f : (dot > 1.0f ? 1.0f : dot);
      out_src[e] = (int32_t)i;
      out_dst[e] = j;
      out_w[e] = dist_cost * std::pow(dot, (float)angle_exp);
      ++e;
    }
  }
  return e;
}

// Symmetrized CSR from an unordered edge list: both directions of every
// edge, neighbors within a node in the stable order (all direction-1
// entries in edge order, then direction-2) — identical to the numpy
// concatenate + stable-argsort it replaces.
void rescan_csr_from_edges(const int32_t* src, const int32_t* dst,
                           const float* w, int64_t n_edges, int64_t n,
                           int64_t* off, int32_t* nbr, float* wout) {
  std::vector<int64_t> deg(n, 0);
  for (int64_t e = 0; e < n_edges; ++e) { ++deg[src[e]]; ++deg[dst[e]]; }
  off[0] = 0;
  for (int64_t i = 0; i < n; ++i) off[i + 1] = off[i] + deg[i];
  std::vector<int64_t> cur(off, off + n);
  for (int64_t e = 0; e < n_edges; ++e) {
    const int64_t p = cur[src[e]]++;
    nbr[p] = dst[e];
    wout[p] = w[e];
  }
  for (int64_t e = 0; e < n_edges; ++e) {
    const int64_t p = cur[dst[e]]++;
    nbr[p] = src[e];
    wout[p] = w[e];
  }
}

// FastEnergy hot helpers (ops/energy.py): one SA swap performs up to five
// set() calls, each recomputing a pair-penalty row and a coverage-count
// delta; at ~10-element sizes the numpy dispatch overhead (~35 us/row)
// IS the simulated-annealing wall-clock on the 1-core host.
// 0.5*(exp(-sqrt(qa)/(2s^2)) + exp(-sqrt(qb)/(2s^2))) of one placement
// gaussian vs a batch — formula of arrangement_optimization.cpp:248-310.
void rescan_pair_penalties(const double* cent, const double* sig_inv,
                           const double* cents, const double* sig_invs,
                           int64_t n, double mah_scale, double* out) {
  const double k = -1.0 / (2.0 * mah_scale * mah_scale);
  for (int64_t i = 0; i < n; ++i) {
    const double d0 = 0.5 * (cents[3 * i + 0] - cent[0]);
    const double d1 = 0.5 * (cents[3 * i + 1] - cent[1]);
    const double d2 = 0.5 * (cents[3 * i + 2] - cent[2]);
    const double* S = sig_invs + 9 * i;
    double qa = sig_inv[0] * d0 * d0 + sig_inv[4] * d1 * d1
                + sig_inv[8] * d2 * d2
                + 2.0 * (sig_inv[1] * d0 * d1 + sig_inv[2] * d0 * d2
                         + sig_inv[5] * d1 * d2);
    double qb = S[0] * d0 * d0 + S[4] * d1 * d1 + S[8] * d2 * d2
                + 2.0 * (S[1] * d0 * d1 + S[2] * d0 * d2 + S[5] * d1 * d2);
    double ea = std::exp(k * std::sqrt(qa > 0.0 ? qa : 0.0));
    double eb = std::exp(k * std::sqrt(qb > 0.0 ? qb : 0.0));
    out[i] = 0.5 * (ea + eb);
  }
}

// Coverage-count update over UNIQUE cell id lists: subtract the old
// placement's cells, add the new one's; returns the covered-cell delta
// (old cells count when they drop to 0, new cells when they rise from 0 —
// the exact order of FastEnergy.set()).
int64_t rescan_cov_update(int32_t* cnt, const int64_t* old_cells,
                          int64_t n_old, const int64_t* new_cells,
                          int64_t n_new) {
  int64_t delta = 0;
  for (int64_t i = 0; i < n_old; ++i)
    if (--cnt[old_cells[i]] == 0) --delta;
  for (int64_t i = 0; i < n_new; ++i)
    if (cnt[new_cells[i]]++ == 0) ++delta;
  return delta;
}

// RANSAC triplet stream: n_iter index triplets drawn from the alias-method
// distribution with the reference's rejection rules (walls resample b
// while b==a and c while c==b, rs_pointcloud_filters.cpp:146-154; the
// floor detector draws 3 independent samples, :214-218). Draw order is
// bit-exact with utils/rng.MshDiscreteDistribution.sample, which was a
// per-draw Python PCG32 step before.
void rescan_ransac_triplets(const double* prob, const int64_t* alias,
                            int64_t n, uint32_t seed, int64_t n_iter,
                            int32_t reject_equal, int64_t* out_tri) {
  MshRand rng(seed);
  auto sample = [&]() -> int64_t {
    int32_t col = rng.next_range(0, (int32_t)n - 1);
    bool coin = (double)rng.next_f32() < prob[col];
    return coin ? (int64_t)col : alias[col];
  };
  for (int64_t i = 0; i < n_iter; ++i) {
    int64_t a = sample();
    int64_t b = sample();
    if (reject_equal) while (b == a) b = sample();
    int64_t c = sample();
    if (reject_equal) while (c == b) c = sample();
    out_tri[3 * i] = a; out_tri[3 * i + 1] = b; out_tri[3 * i + 2] = c;
  }
}

// ---------------------------------------------------------------------------
// Native simulated-annealing action loop (ops/energy.simulated_annealing).
//
// The Python loop is oracle-exact vs the instrumented reference
// (PARITY_r03); at ~150-200 us/iteration its cost is pure interpreter
// dispatch, not math. This kernel replicates the loop BIT-EXACTLY —
// same PCG32 draw order, same float32/float64 promotion points, same
// numpy pairwise-summation for the one in-loop distrib2pdf — so the
// engine-agreement test can compare traces with ==. Reference semantics:
// apps/segment_transfer arrangement_optimization.cpp:494-935.
//
// All geometry is precomputed by the Python marshaller (ops/energy.py::
// simulated_annealing, engine="native"): per-proposal salient-cell lists,
// gaussians (centroid + inverse rotated covariance), translations, the
// static per-object ADD pdfs. The loop owns: action draws, the incremental
// FastEnergy state, hysteresis vs the (mutable) past windows, linearize-ids,
// commit/restart bookkeeping, and the per-iteration trace.
// ---------------------------------------------------------------------------

namespace {

// numpy 1-D float64 pairwise summation (umath pairwise_sum, blocksize 128)
// — replicated so the REPLACE action's distrib2pdf normalizer is bit-equal
// to np.sum on the candidate score array.
double np_pairwise_sum(const double* a, int64_t n) {
  if (n < 8) {
    double res = 0.0;
    for (int64_t i = 0; i < n; ++i) res += a[i];
    return res;
  }
  if (n <= 128) {
    double r[8];
    for (int j = 0; j < 8; ++j) r[j] = a[j];
    int64_t i = 8;
    for (; i + 8 <= n; i += 8)
      for (int j = 0; j < 8; ++j) r[j] += a[i + j];
    double res = ((r[0] + r[1]) + (r[2] + r[3]))
               + ((r[4] + r[5]) + (r[6] + r[7]));
    for (; i < n; ++i) res += a[i];
    return res;
  }
  int64_t n2 = n / 2;
  n2 -= n2 % 8;
  return np_pairwise_sum(a, n2) + np_pairwise_sum(a + n2, n - n2);
}

// msh_pdfsample_linear (msh_std.h:1967-1977): linear CDF walk. prob is a
// float64 (the f32 draw is exact in f64).
int64_t pdfsample_linear(const double* pdf, int64_t n, double prob) {
  int64_t idx = 0;
  while (idx < n && prob > pdf[idx]) {
    prob -= pdf[idx];
    ++idx;
  }
  return idx;
}

struct SAConfig {
  int32_t n_iter;
  uint32_t seed;
  double restart_prob, init_temp, min_temp;
  double w_cov, w_geom, w_isect, w_hyst, wsum;
  int32_t n_past;
  double swap_thr, replace_thr;
  double dup_pen, mismatch_pen, existed_bonus, novel_bonus;
  double decay_a, decay_b, base_scale, mah_scale;
};

struct SATables {
  int32_t n_obj;
  const uint8_t* obj_static;
  const int64_t* obj_uidx;
  const int64_t* obj_class;
  const double* obj_sigma;
  const double* obj_pdf;      // ADD object pdf (len n_obj)
  const int64_t* prop_off;    // (n_obj+1) global pose index ranges
  const float* prop_trans;    // (P,3)
  const double* prop_score;   // (P,)
  const double* prop_add_pdf; // (P,) per-object normalized score pdf
  const double* prop_cent;    // (P,3)
  const double* prop_sig;     // (P,9)
  const int64_t* cells_off;   // (P+1)
  const int64_t* cells;       // salient cells, concatenated
  int64_t n_extra;
  const float* ex_trans;      // (E,3)
  const double* ex_cent;      // (E,3)
  const double* ex_sig;       // (E,9)
  const int64_t* ex_cells_off;  // (E+1)
  const int64_t* ex_cells;
  int64_t n_cells_total, n_scn_valid;
  int32_t n_past_arr;         // arrangements BEFORE the current scene
  const int64_t* past_off;    // (n_past_arr+1)
  int64_t* past_uidx;         // mutable (linearize-ids)
  const int64_t* past_class;
  const float* past_pos;      // (sum,3)
  const int64_t* past_objidx;
  int32_t scene_idx, n_arr;
};

struct SAPl {
  int64_t uidx, arr_idx, objidx, ref;  // ref: global pose id, or -1-e extra
  double score;
  double f_best;
  uint8_t f_existed, f_mismatched;
};

struct SAState {
  const SAConfig& cfg;
  const SATables& t;
  std::vector<SAPl> items;
  std::vector<SAPl> committed;
  std::vector<double> cents;   // (cap,3)
  std::vector<double> sigs;    // (cap,9)
  std::vector<double> pen;     // (cap,cap)
  int64_t cap;
  std::vector<int32_t> cnt;    // coverage counts over global cell ids
  int64_t n_cov;

  SAState(const SAConfig& c, const SATables& tb)
      : cfg(c), t(tb), cap(64), cnt(tb.n_cells_total, 0), n_cov(0) {
    cents.resize(cap * 3);
    sigs.resize(cap * 9);
    pen.assign(cap * cap, 0.0);
  }

  const float* trans_of(const SAPl& p) const {
    return p.ref >= 0 ? t.prop_trans + 3 * p.ref
                      : t.ex_trans + 3 * (-1 - p.ref);
  }
  const double* cent_of(const SAPl& p) const {
    return p.ref >= 0 ? t.prop_cent + 3 * p.ref
                      : t.ex_cent + 3 * (-1 - p.ref);
  }
  const double* sig_of(const SAPl& p) const {
    return p.ref >= 0 ? t.prop_sig + 9 * p.ref
                      : t.ex_sig + 9 * (-1 - p.ref);
  }
  void cells_of(const SAPl& p, const int64_t** c, int64_t* n) const {
    // static objects cover nothing (coverage skips them); the marshaller
    // already filtered cells to salient ones
    if (t.obj_static[p.objidx]) { *c = nullptr; *n = 0; return; }
    if (p.ref >= 0) {
      *c = t.cells + t.cells_off[p.ref];
      *n = t.cells_off[p.ref + 1] - t.cells_off[p.ref];
    } else {
      int64_t e = -1 - p.ref;
      *c = t.ex_cells + t.ex_cells_off[e];
      *n = t.ex_cells_off[e + 1] - t.ex_cells_off[e];
    }
  }

  void grow(int64_t need) {
    int64_t nc = cap;
    while (nc < need) nc *= 2;
    if (nc == cap) return;
    std::vector<double> c2(nc * 3), s2(nc * 9), p2(nc * nc, 0.0);
    int64_t n = (int64_t)items.size();
    std::memcpy(c2.data(), cents.data(), n * 3 * sizeof(double));
    std::memcpy(s2.data(), sigs.data(), n * 9 * sizeof(double));
    for (int64_t i = 0; i < n; ++i)
      std::memcpy(&p2[i * nc], &pen[i * cap], n * sizeof(double));
    cents.swap(c2); sigs.swap(s2); pen.swap(p2);
    cap = nc;
  }

  // FastEnergy._placement_f: hysteresis best/existed/mismatched of one
  // placement vs the past window (float32 d2, float64 exp — the exact
  // promotion points of energy.py::_placement_f)
  void placement_f(const SAPl& p, double* best, uint8_t* existed,
                   uint8_t* mismatched) const {
    *best = 0.0; *existed = 0; *mismatched = 0;
    const int64_t cls = t.obj_class[p.objidx];
    const double sigma = t.obj_sigma[p.objidx];
    const float* pos = trans_of(p);
    for (int32_t past_idx = 1; past_idx <= cfg.n_past; ++past_idx) {
      int32_t ai = t.n_arr - (past_idx + 1);
      if (ai < 0) continue;
      const int64_t lo = t.past_off[ai], hi = t.past_off[ai + 1];
      if (hi == lo) continue;
      bool any_match = false;
      const double decay = cfg.decay_a * past_idx + cfg.decay_b;
      double m = -1.0;
      for (int64_t j = lo; j < hi; ++j) {
        if (t.past_uidx[j] != p.uidx) continue;
        if (t.past_class[j] != cls) { *mismatched = 1; continue; }
        any_match = true;
        const float dx = pos[0] - t.past_pos[3 * j + 0];
        const float dy = pos[1] - t.past_pos[3 * j + 1];
        const float dz = pos[2] - t.past_pos[3 * j + 2];
        const float d2 = dx * dx + dy * dy + dz * dz;
        const double s = std::exp(-(double)d2 / (2.0 * sigma * sigma))
                         * cfg.base_scale * decay;
        if (s > m) m = s;
      }
      if (any_match) {
        *existed = 1;
        if (m > *best) *best = m;
      }
    }
  }

  void refresh_f() {
    for (auto& p : items)
      placement_f(p, &p.f_best, &p.f_existed, &p.f_mismatched);
  }

  void add(SAPl p) {
    int64_t n = (int64_t)items.size();
    grow(n + 1);
    const int64_t* cl; int64_t ncl;
    cells_of(p, &cl, &ncl);
    if (ncl) n_cov += rescan_cov_update(cnt.data(), nullptr, 0, cl, ncl);
    const double* ce = cent_of(p);
    const double* si = sig_of(p);
    std::memcpy(&cents[n * 3], ce, 3 * sizeof(double));
    std::memcpy(&sigs[n * 9], si, 9 * sizeof(double));
    std::vector<double> row(n);
    rescan_pair_penalties(ce, si, cents.data(), sigs.data(), n,
                          cfg.mah_scale, row.data());
    for (int64_t j = 0; j < n; ++j) {
      pen[n * cap + j] = row[j];
      pen[j * cap + n] = row[j];
    }
    placement_f(p, &p.f_best, &p.f_existed, &p.f_mismatched);
    items.push_back(p);
  }

  SAPl remove_swap(int64_t idx) {
    int64_t n = (int64_t)items.size();
    SAPl removed = items[idx];
    const int64_t* cl; int64_t ncl;
    cells_of(removed, &cl, &ncl);
    if (ncl) n_cov += rescan_cov_update(cnt.data(), cl, ncl, nullptr, 0);
    int64_t last = n - 1;
    if (idx != last) {
      items[idx] = items[last];
      std::memcpy(&cents[idx * 3], &cents[last * 3], 3 * sizeof(double));
      std::memcpy(&sigs[idx * 9], &sigs[last * 9], 9 * sizeof(double));
      for (int64_t j = 0; j < n; ++j) pen[idx * cap + j] = pen[last * cap + j];
      for (int64_t j = 0; j < n; ++j) pen[j * cap + idx] = pen[j * cap + last];
      pen[idx * cap + idx] = 0.0;
    }
    items.pop_back();
    for (int64_t j = 0; j < n; ++j) pen[last * cap + j] = 0.0;
    for (int64_t j = 0; j < n; ++j) pen[j * cap + last] = 0.0;
    return removed;
  }

  void set(int64_t idx, SAPl p) {
    SAPl old = items[idx];
    const int64_t *ocl, *cl; int64_t nocl, ncl;
    cells_of(old, &ocl, &nocl);
    cells_of(p, &cl, &ncl);
    if (nocl || ncl)
      n_cov += rescan_cov_update(cnt.data(), ocl, nocl, cl, ncl);
    const double* ce = cent_of(p);
    const double* si = sig_of(p);
    std::memcpy(&cents[idx * 3], ce, 3 * sizeof(double));
    std::memcpy(&sigs[idx * 9], si, 9 * sizeof(double));
    int64_t n = (int64_t)items.size();
    std::vector<double> row(n);
    rescan_pair_penalties(ce, si, cents.data(), sigs.data(), n,
                          cfg.mah_scale, row.data());
    row[idx] = 0.0;
    for (int64_t j = 0; j < n; ++j) {
      pen[idx * cap + j] = row[j];
      pen[j * cap + idx] = row[j];
    }
    placement_f(p, &p.f_best, &p.f_existed, &p.f_mismatched);
    items[idx] = p;
  }

  void rebuild_from_committed() {
    while (!items.empty()) remove_swap((int64_t)items.size() - 1);
    for (const auto& p : committed) add(p);
  }

  double coverage() const {
    if (t.n_scn_valid == 0) return 0.0;
    return (double)n_cov / (double)t.n_scn_valid;
  }
  double intersection() const {
    int64_t n = (int64_t)items.size();
    if (n == 0) return 1.0;
    if (n == 1) return 1.0;
    double mx = pen[0];
    for (int64_t i = 0; i < n; ++i)
      for (int64_t j = 0; j < n; ++j)
        if (pen[i * cap + j] > mx) mx = pen[i * cap + j];
    return 1.0 - mx;
  }
  double geometry() const {
    if (items.empty()) return 0.0;
    double s = 0.0;
    for (const auto& p : items) s += p.score;
    return s / (double)items.size();
  }
  double hysteresis() const {
    int64_t n = (int64_t)items.size();
    if (n == 0) return 0.0;
    double total = 0.0;
    std::unordered_map<int64_t, int64_t> seen;
    int64_t n_dup = 0;
    for (const auto& p : items) {
      double v = p.f_mismatched ? cfg.mismatch_pen : p.f_best;
      v += p.f_existed ? cfg.existed_bonus : cfg.novel_bonus;
      total += v < 1.0 ? v : 1.0;
      int64_t c = 0;
      auto it = seen.find(p.uidx);
      if (it != seen.end()) c = it->second;
      n_dup += c;
      seen[p.uidx] = c + 1;
    }
    double out = total / (double)n - (double)n_dup * cfg.dup_pen;
    return out > 0.0 ? out : 0.0;
  }
  double score() const {
    double s = 0.0;
    if (cfg.w_geom > 0) s += cfg.w_geom * geometry();
    if (cfg.w_isect > 0) s += cfg.w_isect * intersection();
    if (cfg.w_hyst > 0) s += cfg.w_hyst * hysteresis();
    if (cfg.w_cov > 0) s += cfg.w_cov * coverage();
    return s / cfg.wsum;
  }
};

}  // namespace

// Run the full SA loop. Returns the number of iterations executed.
// follow: optional per-iteration forced accept decisions (n_follow entries);
// trace: (n_iter x 10) doubles [it, restarted, action, n, prev, cur, temp,
// accept_p, roll, accepted(computed)]. out_mut: (n_iter x 3) linearize-ids
// mutations (si, pi, new_uidx); past_uidx is ALSO mutated in place.
// out_arr: (cap_out x 4) int64 [uidx, arr_idx, objidx, ref] + out_scores.
int64_t rescan_sa_run(
    int32_t n_iter, uint32_t seed, double restart_prob, double init_temp,
    double min_temp, const double* weights4, double wsum, int32_t n_past,
    double swap_thr, double replace_thr, double dup_pen, double mismatch_pen,
    double existed_bonus, double novel_bonus, double decay_a, double decay_b,
    double base_scale, double mah_scale, const double* pdf_full,
    const double* pdf_noswap, int32_t n_obj, const uint8_t* obj_static,
    const int64_t* obj_uidx, const int64_t* obj_class,
    const double* obj_sigma, const double* obj_pdf, const int64_t* prop_off,
    const float* prop_trans, const double* prop_score,
    const double* prop_add_pdf, const double* prop_cent,
    const double* prop_sig, const int64_t* cells_off, const int64_t* cells,
    int64_t n_extra, const float* ex_trans, const double* ex_cent,
    const double* ex_sig, const int64_t* ex_cells_off, const int64_t* ex_cells,
    int64_t n_cells_total, int64_t n_scn_valid, int32_t n_past_arr,
    const int64_t* past_off, int64_t* past_uidx, const int64_t* past_class,
    const float* past_pos, const int64_t* past_objidx, int32_t n_init,
    const int64_t* init_uidx, const int64_t* init_arr_idx,
    const int64_t* init_objidx, const int64_t* init_ref,
    const double* init_score, int32_t scene_idx, int32_t n_arr,
    const uint8_t* follow, int32_t n_follow, double* trace, int64_t* out_mut,
    int64_t* out_n_mut, int64_t* out_arr, double* out_scores, int64_t* out_n,
    double* out_init_max) {
  SAConfig cfg{n_iter, seed, restart_prob, init_temp, min_temp,
               weights4[0], weights4[1], weights4[2], weights4[3], wsum,
               n_past, swap_thr, replace_thr, dup_pen, mismatch_pen,
               existed_bonus, novel_bonus, decay_a, decay_b, base_scale,
               mah_scale};
  SATables t{n_obj, obj_static, obj_uidx, obj_class, obj_sigma, obj_pdf,
             prop_off, prop_trans, prop_score, prop_add_pdf, prop_cent,
             prop_sig, cells_off, cells, n_extra, ex_trans, ex_cent, ex_sig,
             ex_cells_off, ex_cells, n_cells_total, n_scn_valid, n_past_arr,
             past_off, past_uidx, past_class, past_pos, past_objidx,
             scene_idx, n_arr};
  MshRand rand(seed);
  SAState st(cfg, t);
  for (int32_t i = 0; i < n_init; ++i) {
    SAPl p{init_uidx[i], init_arr_idx[i], init_objidx[i], init_ref[i],
           init_score[i], 0.0, 0, 0};
    st.committed.push_back(p);
    st.add(p);
  }

  // likelihoods[0] (ADD) < 0.001 and < 2 items -> no-op (energy.py:814);
  // the Python wrapper handles that gate before calling.

  const double init_sc = st.score();
  double prev_score = init_sc, max_score = init_sc;
  int64_t n_mut = 0;

  // _find_max_uidx over past arrangements + the committed current one
  auto find_max_uidx = [&](int64_t* si, int64_t* pi) -> int64_t {
    int64_t mx = 0; *si = -1; *pi = -1;
    for (int32_t a = 0; a < t.n_past_arr; ++a)
      for (int64_t j = t.past_off[a]; j < t.past_off[a + 1]; ++j)
        if (t.past_uidx[j] > mx && !t.obj_static[t.past_objidx[j]]) {
          mx = t.past_uidx[j]; *si = a; *pi = j - t.past_off[a];
        }
    for (int64_t j = 0; j < (int64_t)st.committed.size(); ++j) {
      const SAPl& p = st.committed[j];
      if (p.uidx > mx && !t.obj_static[p.objidx]) {
        mx = p.uidx; *si = t.scene_idx; *pi = j;
      }
    }
    return mx;
  };

  auto linearize_ids = [&]() -> bool {
    int64_t si, pi;
    int64_t mx = find_max_uidx(&si, &pi);
    int64_t second = 0;
    for (int32_t a = 0; a < t.n_past_arr; ++a)
      for (int64_t j = t.past_off[a]; j < t.past_off[a + 1]; ++j) {
        int64_t u = t.past_uidx[j];
        if (second < u && u < mx && !t.obj_static[t.past_objidx[j]])
          second = u;
      }
    for (const SAPl& p : st.committed) {
      if (second < p.uidx && p.uidx < mx && !t.obj_static[p.objidx])
        second = p.uidx;
    }
    if (mx - second > 1 && si >= 0) {
      if (si == t.scene_idx) st.committed[pi].uidx = second + 1;
      else t.past_uidx[t.past_off[si] + pi] = second + 1;
      out_mut[3 * n_mut + 0] = si;
      out_mut[3 * n_mut + 1] = pi;
      out_mut[3 * n_mut + 2] = second + 1;
      ++n_mut;
      return true;
    }
    return false;
  };

  // pick_near: the SWAP action's distance-gated proposal redraw
  auto pick_near = [&](int64_t obj, const float* target) -> int64_t {
    int64_t lo = t.prop_off[obj], hi = t.prop_off[obj + 1];
    if (hi == lo) return -1;  // trans[obj] is None
    // d = float32 norms; dmin float32, compares in double like numpy
    float dmin = 3.4e38f;
    int64_t np_ = hi - lo;
    std::vector<float> d(np_);
    for (int64_t k = 0; k < np_; ++k) {
      const float* tr = t.prop_trans + 3 * (lo + k);
      const float dx = tr[0] - target[0];
      const float dy = tr[1] - target[1];
      const float dz = tr[2] - target[2];
      d[k] = std::sqrt(dx * dx + dy * dy + dz * dz);
      if (d[k] < dmin) dmin = d[k];
    }
    double thr = cfg.swap_thr;
    if (thr < (double)dmin) thr = 2.0 * (double)dmin;
    std::vector<int64_t> idxs;
    for (int64_t k = 0; k < np_; ++k)
      if ((double)d[k] < thr) idxs.push_back(k);
    if (idxs.empty()) return -1;
    return idxs[rand.next_u32() % idxs.size()];
  };

  enum UndoKind { U_NONE, U_POP, U_READD, U_SET1, U_SET2 };

  for (int32_t it = 0; it < n_iter; ++it) {
    int32_t restarted = 0;
    if ((double)rand.next_f32() < cfg.restart_prob) {
      restarted = 1;
      st.rebuild_from_committed();
    }

    const double* pdf = (int64_t)st.items.size() < 2 ? pdf_noswap : pdf_full;
    int64_t action = pdfsample_linear(pdf, 5, (double)rand.next_f32());

    UndoKind undo = U_NONE;
    SAPl saved_a{}, saved_b{};
    int64_t undo_ia = -1, undo_ib = -1;

    if (action == 0) {  // ADD
      int64_t si_, pi_;
      int64_t max_uidx = find_max_uidx(&si_, &pi_);
      int64_t obj = pdfsample_linear(obj_pdf, n_obj, (double)rand.next_f32());
      if (obj < n_obj && t.prop_off[obj + 1] > t.prop_off[obj]) {
        int64_t lo = t.prop_off[obj], np_ = t.prop_off[obj + 1] - lo;
        int64_t k = pdfsample_linear(prop_add_pdf + lo, np_,
                                     (double)rand.next_f32());
        if (k > np_ - 1) k = np_ - 1;
        int64_t uidx = t.obj_uidx[obj];
        for (const SAPl& q : st.committed)
          if (q.uidx == uidx) { uidx = max_uidx + 1; break; }
        SAPl p{uidx, t.scene_idx, obj, lo + k, prop_score[lo + k],
               0.0, 0, 0};
        st.add(p);
        undo = U_POP;
      }
    } else if (action == 1) {  // REMOVE
      int64_t n = (int64_t)st.items.size();
      if (n > 0) {
        int64_t idx = rand.next_u32() % n;
        saved_a = st.remove_swap(idx);
        undo = U_READD;
      }
    } else if (action == 2) {  // REPLACE
      int64_t n = (int64_t)st.items.size();
      if (n > 0) {
        int64_t idx = rand.next_u32() % n;
        SAPl old = st.items[idx];
        const float* old_pos = st.trans_of(old);
        // candidate collection with the reference's 1024-cap quirk
        std::vector<int64_t> cand_ref;
        std::vector<double> cand_sc;
        for (int64_t i = 0; i < n_obj; ++i) {
          if (t.obj_static[i]) continue;
          int64_t lo = t.prop_off[i], hi = t.prop_off[i + 1];
          if (hi == lo) continue;
          int64_t np_ = hi - lo;
          std::vector<uint8_t> match(np_);
          int64_t n_match = 0;
          for (int64_t k = 0; k < np_; ++k) {
            const float* tr = t.prop_trans + 3 * (lo + k);
            const float dx = tr[0] - old_pos[0];
            const float dy = tr[1] - old_pos[1];
            const float dz = tr[2] - old_pos[2];
            float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
            // Compare in float32: the Python loop (NumPy 2/NEP-50 weak
            // scalar) and the reference (msh_vec3_norm(..) < 0.35f,
            // arrangement_optimization.cpp:753) both compare f32 < f32.
            // 0.35 is not f32-representable — a double compare admits
            // dist == f32(0.35) = 0.349999994 that both others reject.
            match[k] = dist < (float)cfg.replace_thr ? 1 : 0;
            n_match += match[k];
          }
          if ((int64_t)cand_ref.size() + n_match < 1024) {
            for (int64_t k = 0; k < np_; ++k)
              if (match[k]) {
                cand_ref.push_back(lo + k);
                cand_sc.push_back(prop_score[lo + k]);
              }
          } else {
            for (int64_t k = 0; k < np_; ++k) {
              if (match[k]) {
                cand_ref.push_back(lo + k);
                cand_sc.push_back(prop_score[lo + k]);
              }
              if ((int64_t)cand_ref.size() >= 1024) break;
            }
          }
        }
        if (!cand_ref.empty()) {
          // distrib2pdf with numpy's pairwise sum
          int64_t nc = (int64_t)cand_sc.size();
          double s = np_pairwise_sum(cand_sc.data(), nc);
          std::vector<double> pdf2(nc);
          if (s <= 1e-8) pdf2 = cand_sc;
          else for (int64_t j = 0; j < nc; ++j) pdf2[j] = cand_sc[j] / s;
          int64_t sel = pdfsample_linear(pdf2.data(), nc,
                                         (double)rand.next_f32());
          if (sel > nc - 1) sel = nc - 1;
          int64_t g = cand_ref[sel];
          // locate object of g
          int64_t oi = 0;
          while (t.prop_off[oi + 1] <= g) ++oi;
          SAPl p{t.obj_uidx[oi], (int64_t)t.n_arr, oi, g, prop_score[g],
                 0.0, 0, 0};
          saved_a = old;
          undo_ia = idx;
          st.set(idx, p);
          undo = U_SET1;
        }
      }
    } else if (action == 3) {  // SWAP
      int64_t n = (int64_t)st.items.size();
      int64_t ia = rand.next_u32() % n;
      int64_t ib = ia;
      while (ib == ia) ib = rand.next_u32() % n;
      SAPl a = st.items[ia], b = st.items[ib];
      saved_a = a; saved_b = b;
      undo_ia = ia; undo_ib = ib;
      int64_t ka = pick_near(a.objidx, st.trans_of(b));
      int64_t kb = pick_near(b.objidx, st.trans_of(a));
      if (ka >= 0) {
        int64_t g = t.prop_off[a.objidx] + ka;
        st.set(ia, SAPl{a.uidx, a.arr_idx, a.objidx, g, prop_score[g],
                        0.0, 0, 0});
      }
      if (kb >= 0) {
        int64_t g = t.prop_off[b.objidx] + kb;
        st.set(ib, SAPl{b.uidx, b.arr_idx, b.objidx, g, prop_score[g],
                        0.0, 0, 0});
      }
      undo = U_SET2;
    } else if (action == 4) {  // MOVE
      int64_t n = (int64_t)st.items.size();
      if (n > 0) {
        int64_t idx = rand.next_u32() % n;
        SAPl old = st.items[idx];
        int64_t lo = t.prop_off[old.objidx];
        int64_t np_ = t.prop_off[old.objidx + 1] - lo;
        if (np_ > 0) {
          int64_t k = rand.next_u32() % np_;
          saved_a = old;
          undo_ia = idx;
          st.set(idx, SAPl{old.uidx, old.arr_idx, old.objidx, lo + k,
                           prop_score[lo + k], 0.0, 0, 0});
          undo = U_SET1;
        }
      }
    }

    double cur_score = st.score();
    if (std::getenv("RESCAN_SA_DEBUG")) {
      std::printf("NADBG %d cur=%.17g hyst=%.17g n=%zd", it, cur_score,
                  st.hysteresis(), st.items.size());
      for (const auto& p : st.items)
        std::printf(" [u%lld o%lld r%lld f=%.17g e%d m%d]",
                    (long long)p.uidx, (long long)p.objidx,
                    (long long)p.ref, p.f_best, p.f_existed, p.f_mismatched);
      std::printf(" past=");
      for (int32_t a = 0; a < t.n_past_arr; ++a) {
        for (int64_t j = t.past_off[a]; j < t.past_off[a + 1]; ++j)
          std::printf("%s%lld", j == t.past_off[a] ? "" : ",",
                      (long long)t.past_uidx[j]);
        std::printf(";");
      }
      for (size_t j = 0; j < st.committed.size(); ++j)
        std::printf("%s%lld", j ? "," : "",
                    (long long)st.committed[j].uidx);
      std::printf("\n");
    }
    if (cur_score < 0.0) {
      st.committed = st.items;
      // Python writes no trace line for this iteration (break before write)
      *out_n_mut = n_mut;
      int64_t nout = (int64_t)st.committed.size();
      for (int64_t j = 0; j < nout; ++j) {
        out_arr[4 * j + 0] = st.committed[j].uidx;
        out_arr[4 * j + 1] = st.committed[j].arr_idx;
        out_arr[4 * j + 2] = st.committed[j].objidx;
        out_arr[4 * j + 3] = st.committed[j].ref;
        out_scores[j] = st.committed[j].score;
      }
      *out_n = nout;
      out_init_max[0] = init_sc;
      out_init_max[1] = max_score;
      return it;
    }
    double frac = 1.0 - (double)it / (double)n_iter;
    double temp = cfg.init_temp * frac;
    if (temp < cfg.min_temp) temp = cfg.min_temp;
    double accept_p = cur_score > prev_score
                          ? 1.0
                          : std::exp(-(prev_score - cur_score) / temp);
    double roll = (double)rand.next_f32();
    bool accepted = accept_p >= roll;
    double* tr = trace + 10 * it;
    tr[0] = it; tr[1] = restarted; tr[2] = (double)action;
    tr[3] = (double)st.items.size(); tr[4] = prev_score; tr[5] = cur_score;
    tr[6] = temp; tr[7] = accept_p; tr[8] = roll; tr[9] = accepted ? 1 : 0;
    if (follow && it < n_follow) accepted = follow[it] != 0;
    if (accepted) {
      prev_score = cur_score;
      if (cur_score > max_score) {
        max_score = cur_score;
        st.committed = st.items;
      }
    } else {
      switch (undo) {
        case U_POP:
          st.remove_swap((int64_t)st.items.size() - 1);
          break;
        case U_READD:
          st.add(saved_a);
          break;
        case U_SET1:
          st.set(undo_ia, saved_a);
          break;
        case U_SET2:
          st.set(undo_ia, saved_a);
          st.set(undo_ib, saved_b);
          break;
        default:
          break;
      }
    }
    if (linearize_ids()) st.refresh_f();
  }

  *out_n_mut = n_mut;
  int64_t nout = (int64_t)st.committed.size();
  for (int64_t j = 0; j < nout; ++j) {
    out_arr[4 * j + 0] = st.committed[j].uidx;
    out_arr[4 * j + 1] = st.committed[j].arr_idx;
    out_arr[4 * j + 2] = st.committed[j].objidx;
    out_arr[4 * j + 3] = st.committed[j].ref;
    out_scores[j] = st.committed[j].score;
  }
  *out_n = nout;
  out_init_max[0] = init_sc;
  out_init_max[1] = max_score;
  return n_iter;
}

// The reference's deterministic merge shuffle: Fisher-Yates driven by a
// fresh PCG32 (rs_pointcloud_merge, lib/rs/rs_pointcloud.h:383-446).
// Bit-exact with utils/rng.MshRand: next_f32 yields the same real number
// in f32 and f64 (23-bit mantissa), and the index product is computed in
// double like the Python reference path.
void rescan_merge_shuffle(int64_t n, uint32_t seed, int32_t* perm) {
  for (int64_t i = 0; i < n; ++i) perm[i] = (int32_t)i;
  MshRand g(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)((double)g.next_f32() * (double)i);
    int32_t t = perm[i]; perm[i] = perm[j]; perm[j] = t;
  }
}

namespace {
// exp(x) for the softmax's x <= 0 range via 2^(x*log2e) with a degree-6
// series for the fractional power; |rel err| < 3e-7 — far below the f32
// noise that separates mean-field beliefs, so engine agreement with the
// JAX path holds (tests/test_energy_labels.py). ~10x faster than libm
// expf on the 1-core host VM, which dominates the smoothing cost
// (n_points * n_labels * n_iters exps).
inline float fast_exp_neg(float x) {
  if (x < -87.0f) return 0.0f;
  float y = x * 1.44269504088896341f;
  float n = std::floor(y + 0.5f);
  float w = (y - n) * 0.69314718055994531f;  // |w| <= 0.3466
  float p = 1.0f + w * (1.0f + w * (0.5f + w * (1.0f / 6.0f + w *
            (1.0f / 24.0f + w * (1.0f / 120.0f + w * (1.0f / 720.0f))))));
  union { uint32_t u; float f; } s;
  s.u = (uint32_t)((int)n + 127) << 23;
  return p * s.f;
}
}  // namespace

// Mean-field + masked-ICM label smoothing over the Potts MRF — the host
// engine for ops/labels.smooth_labels (the rebuild's designated
// substitution for the reference's gco alpha-beta swap,
// lib/rs/rs_pointcloud_filters.cpp:882-989). The workload is a sparse
// row-gather over per-node beliefs — a scalar-gather pattern the TPU
// executes poorly and the remote tunnel taxes with compiles — so like the
// k-NN graph build it belongs on the host. Semantics MATCH the JAX
// reference implementation in ops/labels.py exactly:
//   E_i(l) = U_i(l) + sum_j w_ij * (1 - Q_j(l))        (mean-field)
//   Q <- 0.5*Q + 0.5*softmax(-E * inv_temp)            (Jacobi, damped)
//   ICM: best_i = argmin_l  U_i(l) + sum_j w_ij * [lab_j != l],
//        applied only where mask is set (Jacobi double-buffer).
// Ties: first index wins (argmax/argmin scan order), like jnp.
void rescan_meanfield_icm(const float* U, const int32_t* csr_off,
                          const int32_t* csr_nbr, const float* csr_w,
                          int64_t n, int32_t L, int32_t n_mf, float inv_temp,
                          const float* Q0, int32_t n_icm,
                          const uint8_t* icm_mask, int32_t* labels) {
#ifdef __SSE__
  // flush-to-zero + denormals-are-zero, like XLA's CPU float environment:
  // confident labels drive damped beliefs toward 1e-40 and the denormal
  // microcode penalty measured 3x on the whole kernel (values that tiny
  // are sub-noise for the energies). Restored before returning.
  const unsigned csr_saved = __builtin_ia32_stmxcsr();
  __builtin_ia32_ldmxcsr(csr_saved | 0x8040u);
#endif
  std::vector<float> Q(Q0, Q0 + n * L), Qn((size_t)n * L);
  std::vector<float> wsum(n, 0.0f);
  for (int64_t i = 0; i < n; ++i)
    for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e)
      wsum[i] += csr_w[e];

  // EXACT active-set Jacobi: Q_new[i] depends only on Q[i] and Q[nbr(i)],
  // so a node whose own and neighbor rows are bitwise unchanged since the
  // previous iteration recomputes to the bitwise-identical row — skip it.
  // Beliefs freeze bitwise within a few iterations under FTZ/float32, so
  // late sweeps touch only the label-boundary fringe (same final Q as the
  // fixed 30-sweep schedule; the whole loop exits once nothing changes).
  std::vector<uint8_t> changed(n, 1), changed_new(n, 0);
  std::vector<float> scratch(L);
  float* agree = scratch.data();
  for (int32_t it = 0; it < n_mf; ++it) {
    int64_t n_active = 0;
    for (int64_t i = 0; i < n; ++i) {
      uint8_t active = changed[i];
      for (int32_t e = csr_off[i]; !active && e < csr_off[i + 1]; ++e)
        active = changed[csr_nbr[e]];
      float* qo = &Qn[(size_t)i * L];
      const float* qi = &Q[(size_t)i * L];
      if (!active) {
        std::memcpy(qo, qi, L * sizeof(float));
        changed_new[i] = 0;
        continue;
      }
      ++n_active;
      for (int32_t l = 0; l < L; ++l) agree[l] = 0.0f;
      for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e) {
        const float w = csr_w[e];
        const float* qj = &Q[(size_t)csr_nbr[e] * L];
        for (int32_t l = 0; l < L; ++l) agree[l] += w * qj[l];
      }
      // s_l = -(U + wsum - agree) * inv_temp; stable softmax
      const float* ui = U + (size_t)i * L;
      float mx = -1e30f;
      for (int32_t l = 0; l < L; ++l) {
        agree[l] = -(ui[l] + wsum[i] - agree[l]) * inv_temp;
        if (agree[l] > mx) mx = agree[l];
      }
      float sum = 0.0f;
      for (int32_t l = 0; l < L; ++l) {
        agree[l] = fast_exp_neg(agree[l] - mx);
        sum += agree[l];
      }
      const float inv_sum = 1.0f / sum;
      for (int32_t l = 0; l < L; ++l)
        qo[l] = 0.5f * qi[l] + 0.5f * agree[l] * inv_sum;
      changed_new[i] =
          std::memcmp(qo, qi, L * sizeof(float)) != 0 ? 1 : 0;
    }
    Q.swap(Qn);
    changed.swap(changed_new);
    if (n_active == 0) break;  // fully converged: remaining sweeps no-op
  }

  std::vector<int32_t> lab(n), lab2(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* qi = &Q[(size_t)i * L];
    int32_t best = 0;
    for (int32_t l = 1; l < L; ++l)
      if (qi[l] > qi[best]) best = l;
    lab[i] = best;
  }

  // ICM with an exact staleness cache: a node's argmin depends only on its
  // neighbors' labels, so re-evaluate only when one changed since the last
  // evaluation; unmasked nodes keep their label without evaluation (the
  // masked-Jacobi semantics are unchanged — masks still gate application).
  std::vector<int32_t> best_cache(n, -1);
  std::vector<uint8_t> stale(n, 1);
  for (int32_t s = 0; s < n_icm; ++s) {
    const uint8_t* mask = icm_mask + (size_t)s * n;
    for (int64_t i = 0; i < n; ++i) {
      if (!mask[i]) { lab2[i] = lab[i]; continue; }
      if (stale[i]) {
        for (int32_t l = 0; l < L; ++l) agree[l] = 0.0f;
        for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e)
          agree[lab[csr_nbr[e]]] += csr_w[e];
        const float* ui = U + (size_t)i * L;
        int32_t best = 0;
        float bestE = ui[0] + wsum[i] - agree[0];
        for (int32_t l = 1; l < L; ++l) {
          float E = ui[l] + wsum[i] - agree[l];
          if (E < bestE) { bestE = E; best = l; }
        }
        best_cache[i] = best;
        stale[i] = 0;
      }
      lab2[i] = best_cache[i];
    }
    // propagate staleness from label flips (Jacobi: after the sweep)
    for (int64_t i = 0; i < n; ++i) {
      if (lab2[i] != lab[i]) {
        stale[i] = 1;
        for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e)
          stale[csr_nbr[e]] = 1;
      }
    }
    lab.swap(lab2);
  }
  std::memcpy(labels, lab.data(), n * sizeof(int32_t));
#ifdef __SSE__
  __builtin_ia32_ldmxcsr(csr_saved);
#endif
}

// ---------------------------------------------------------------------------
// alpha-beta-swap graph-cut smoothing ORACLE over the identical Potts
// energy the mean-field engine optimizes:
//   E(l) = sum_i U[i*L + l_i] + sum_{(i,j) in E} w_ij * [l_i != l_j]
// This is the move space the reference runs through gco (rspf_smooth_labels,
// lib/rs/rs_pointcloud_filters.cpp:955-968, gc->swap(2)); gco-v3.0 itself is
// not vendored, so the swap is reimplemented from the published move
// construction (Boykov-Veksler-Zabih): for each label pair (a, b), the
// optimal reassignment of the nodes currently labeled a or b is one min-cut
//   s->i cap D_i(b), i->t cap D_i(a), i-j cap w_ij (both directions);
// source side keeps a, sink side gets b. Potts terms against neighbors
// OUTSIDE {a,b} contribute equally to both labels and cancel. All costs are
// integers by construction (U in {0,1,15,30}, w = floor(.)*edge_cost), so
// the cut is exact in int64. Max-flow is Dinic's with the current-arc
// optimization — not gco's BK trees, but any max-flow gives the identical
// optimal swap move. Pair order: ascending (a < b), n_cycles passes (the
// reference runs 2); each move never increases E, so the result is a
// swap-local optimum to compare the production mean-field engine against.
// The per-pair RESULT is algorithm-independent: the set of nodes reachable
// from s in the residual graph of ANY max flow is the unique inclusion-
// minimal min-cut source side, so any correct max-flow (and any graph/arc
// construction order) yields the identical label trajectory. That licenses
// the three performance rewrites below without touching the contract:
//   1. per-label NODE BUCKETS (maintained ascending) replace the O(n) scan
//      per pair — gathering pair (a, b) costs O(|a| + |b|);
//   2. an EXACT trivial-pair skip: when every a-node has D(a)=0 < D(b),
//      every b-node has D(b)=0 < D(a), and no positive-weight edge joins
//      the two sets, the max flow is provably 0 and the cut keeps every
//      node on its current side — no graph is built. In production unaries
//      (0 for the point's own initial label, else a positive class cost)
//      this skips every non-adjacent region pair, leaving ~O(adjacent
//      pairs) real max-flows instead of L*(L-1)/2;
//   3. a FLAT-CSR Dinic arena (SoA arc arrays + iterative current-arc DFS)
//      reused across pairs replaces per-pair vector<vector<Arc>> and the
//      std::function recursion.
void rescan_abswap(const float* U, int64_t n, int32_t L,
                   const int32_t* csr_off, const int32_t* csr_nbr,
                   const float* csr_w, int32_t n_cycles, int32_t* labels) {
  const bool stats = std::getenv("RESCAN_ABSWAP_STATS") != nullptr;
  int64_t st_pairs = 0, st_skipped = 0, st_phases = 0, st_arcs = 0,
          st_paths = 0;
  double st_build = 0.0, st_flow = 0.0;
  std::vector<std::vector<int32_t>> bucket(L);
  for (int64_t i = 0; i < n; ++i) bucket[labels[i]].push_back((int32_t)i);
  std::vector<int32_t> local(n, -1), nodes;
  std::vector<int32_t> bfs_q, level, iter, first, narc, path;
  // flat arc arena (SoA): to / reverse-arc index / residual capacity
  std::vector<int32_t> ato, arev;
  std::vector<int64_t> acap;
  // quantize unaries and edge weights to int ONCE (the caps the reference
  // hands gco are integral by construction); the per-pair passes then read
  // plain ints instead of calling llroundf ~2(L-1) times per node per cycle
  const int64_t n_csr = n ? csr_off[n] : 0;
  std::vector<int32_t> Uq((size_t)n * L);
  for (size_t k = 0; k < (size_t)n * L; ++k) Uq[k] = (int32_t)llroundf(U[k]);
  std::vector<int32_t> wq(n_csr);
  for (int64_t e = 0; e < n_csr; ++e) wq[e] = (int32_t)llroundf(csr_w[e]);
  // pair convergence tracking: the (a, b) max-flow instance depends ONLY
  // on the node set labeled a or b (unaries are fixed, the a/b split
  // within the set does not enter the graph), and a solve is idempotent
  // (it ends at its own canonical cut). So a pair whose two labels'
  // MEMBERSHIPS are unchanged since its last visit would reproduce the
  // current labels exactly — skip it. ver[l] bumps whenever a node
  // enters or leaves label l; last_va/last_vb record the versions at
  // each pair's last visit. In practice this makes the second swap
  // cycle near-free once cycle 1 converges.
  std::vector<int64_t> ver(L, 1);
  std::vector<int64_t> last_va((size_t)L * L, -1), last_vb((size_t)L * L, -1);

  for (int32_t cycle = 0; cycle < n_cycles; ++cycle) {
    for (int32_t a = 0; a < L; ++a) {
      for (int32_t b = a + 1; b < L; ++b) {
        const size_t pk = (size_t)a * L + b;
        if (last_va[pk] == ver[a] && last_vb[pk] == ver[b]) {
          ++st_skipped;  // memberships unchanged since last visit
          continue;
        }
        const std::vector<int32_t>& ba = bucket[a];
        const std::vector<int32_t>& bb = bucket[b];
        if (ba.empty() && bb.empty()) {
          last_va[pk] = ver[a];
          last_vb[pk] = ver[b];
          continue;
        }

        // exact trivial-pair test (rewrite 2 above): unary conditions
        // first (O(|set|)), then an early-exit boundary-edge scan
        bool trivial = true;
        for (int pass = 0; pass < 2 && trivial; ++pass) {
          const std::vector<int32_t>& bk = pass ? bb : ba;
          for (const int32_t i : bk) {
            const int32_t* ui = Uq.data() + (size_t)i * L;
            const bool own_ok = pass ? (ui[b] == 0 && ui[a] > 0)
                                     : (ui[a] == 0 && ui[b] > 0);
            if (!own_ok) { trivial = false; break; }
          }
        }
        if (trivial) {
          for (const int32_t i : ba) {
            for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e)
              if (labels[csr_nbr[e]] == b && wq[e] > 0) {
                trivial = false;
                break;
              }
            if (!trivial) break;
          }
        }
        if (trivial) {  // max flow provably 0: nothing changes
          ++st_skipped;
          last_va[pk] = ver[a];
          last_vb[pk] = ver[b];
          continue;
        }
        ++st_pairs;
        const double t_b0 = stats ? wall_sec() : 0.0;

        // gather the pair set ascending (two-pointer bucket merge)
        nodes.clear();
        {
          size_t pa = 0, pb = 0;
          while (pa < ba.size() || pb < bb.size()) {
            if (pb >= bb.size() || (pa < ba.size() && ba[pa] < bb[pb]))
              nodes.push_back(ba[pa++]);
            else
              nodes.push_back(bb[pb++]);
          }
        }
        const int32_t m = (int32_t)nodes.size();
        const int32_t S = m, T = m + 1;
        for (int32_t li = 0; li < m; ++li) local[nodes[li]] = li;

        // flat-CSR graph build, SINGLE pass: per-vertex arc-count UPPER
        // bounds (2 unary arcs + CSR degree; m for S and T) avoid the
        // counting pass; narc[] tracks actual counts and every later loop
        // iterates [first[u], first[u] + narc[u]).
        first.assign(m + 3, 0);
        for (int32_t li = 0; li < m; ++li) {
          const int32_t i = nodes[li];
          first[li + 1] = first[li] + 2 + (csr_off[i + 1] - csr_off[i]);
        }
        first[S + 1] = first[S] + m;
        first[T + 1] = first[T] + m;
        const int32_t n_arcs = first[m + 2];
        ato.resize(n_arcs);
        arev.resize(n_arcs);
        acap.resize(n_arcs);
        narc.assign(m + 2, 0);
        auto add_arc = [&](int32_t u, int32_t v, int64_t cap, int64_t rc) {
          const int32_t pu = first[u] + narc[u]++;
          const int32_t pv = first[v] + narc[v]++;
          ato[pu] = v; acap[pu] = cap; arev[pu] = pv;
          ato[pv] = u; acap[pv] = rc; arev[pv] = pu;
        };
        for (int32_t li = 0; li < m; ++li) {
          const int32_t i = nodes[li];
          const int32_t* ui = Uq.data() + (size_t)i * L;
          if (ui[b] > 0) add_arc(S, li, ui[b], 0);
          if (ui[a] > 0) add_arc(li, T, ui[a], 0);
          for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e) {
            const int32_t j = csr_nbr[e];
            if ((labels[j] == a || labels[j] == b) && j > i && wq[e] > 0)
              add_arc(li, local[j], wq[e], wq[e]);
          }
        }

        const double t_f0 = stats ? wall_sec() : 0.0;
        if (stats) {
          st_build += t_f0 - t_b0;
          st_arcs += n_arcs;
        }

        // Dinic max-flow: BFS levels + iterative current-arc DFS. The
        // BFS stops expanding once a node could only reach levels past
        // level[T] (exact: admissible DFS arcs are checked against level
        // VALUES, so unlabeled too-deep nodes can never join a shortest
        // augmenting path). The TERMINAL phase (level[T] stays -1) runs
        // the full BFS, so its level array doubles as the final residual
        // reachability below.
        for (;;) {
          ++st_phases;
          level.assign(m + 2, -1);
          level[S] = 0;
          bfs_q.clear();
          bfs_q.push_back(S);
          for (size_t h = 0; h < bfs_q.size(); ++h) {
            const int32_t u = bfs_q[h];
            if (level[T] >= 0 && level[u] + 1 >= level[T]) continue;
            for (int32_t e = first[u]; e < first[u] + narc[u]; ++e)
              if (acap[e] > 0 && level[ato[e]] < 0) {
                level[ato[e]] = level[u] + 1;
                bfs_q.push_back(ato[e]);
              }
          }
          if (level[T] < 0) break;
          iter.assign(first.begin(), first.begin() + m + 2);
          // blocking flow: walk forward along admissible current arcs,
          // augment on reaching T (truncate the path at the first
          // saturated arc), retire dead vertices on retreat
          path.clear();
          int32_t u = S;
          for (;;) {
            if (u == T) {
              ++st_paths;
              int64_t f = INT64_MAX;
              for (const int32_t e : path) f = f < acap[e] ? f : acap[e];
              for (const int32_t e : path) {
                acap[e] -= f;
                acap[arev[e]] += f;
              }
              size_t k = 0;
              while (k < path.size() && acap[path[k]] > 0) ++k;
              path.resize(k);
              u = k ? ato[path[k - 1]] : S;
              continue;
            }
            bool advanced = false;
            for (int32_t& e = iter[u]; e < first[u] + narc[u]; ++e)
              if (acap[e] > 0 && level[ato[e]] == level[u] + 1) {
                path.push_back(e);
                u = ato[e];
                advanced = true;
                break;
              }
            if (advanced) continue;
            level[u] = -1;  // dead end: no admissible arc remains
            if (u == S) break;
            const int32_t e = path.back();
            path.pop_back();
            u = ato[arev[e]];
          }
        }

        if (stats) st_flow += wall_sec() - t_f0;

        // source-reachable nodes keep label a, the rest get b — the
        // terminal phase's FULL BFS above already computed residual
        // reachability from S (level >= 0), no extra pass needed
        bool moved = false;
        for (int32_t li = 0; li < m; ++li) {
          const int32_t lnew = level[li] >= 0 ? a : b;
          moved |= labels[nodes[li]] != lnew;
          labels[nodes[li]] = lnew;
        }
        for (const int32_t v : nodes) local[v] = -1;
        if (moved) {
          ++ver[a];
          ++ver[b];
          // rebuild the two touched buckets (ascending order preserved:
          // nodes is ascending and each bucket takes a subsequence)
          bucket[a].clear();
          bucket[b].clear();
          for (const int32_t v : nodes) bucket[labels[v]].push_back(v);
        }
        last_va[pk] = ver[a];
        last_vb[pk] = ver[b];
      }
    }
  }
  if (stats)
    std::fprintf(stderr,
                 "ABSWAP_STATS pairs=%lld skipped=%lld phases=%lld "
                 "arcs=%lld paths=%lld build_s=%.3f flow_s=%.3f\n",
                 (long long)st_pairs, (long long)st_skipped,
                 (long long)st_phases, (long long)st_arcs,
                 (long long)st_paths, st_build, st_flow);
}

// Union-find with path halving over an undirected edge list; labels_out
// gets each node's root (rs_pointcloud_filters.cpp:30-66 semantics).
void rescan_union_find(int64_t n, const int64_t* src, const int64_t* dst,
                       int64_t n_edges, int32_t* labels_out) {
  std::vector<int32_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;
  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  for (int64_t e = 0; e < n_edges; ++e) {
    int32_t a = find((int32_t)src[e]);
    int32_t b = find((int32_t)dst[e]);
    if (a != b) parent[a] = b;
  }
  for (int64_t i = 0; i < n; ++i) labels_out[i] = find((int32_t)i);
}

}  // extern "C"
