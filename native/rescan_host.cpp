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
#include <cmath>
#include <functional>
#include <vector>
#include <algorithm>

namespace {

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

  std::vector<float> scratch(L);
  float* agree = scratch.data();
  for (int32_t it = 0; it < n_mf; ++it) {
    for (int64_t i = 0; i < n; ++i) {
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
      const float* qi = &Q[(size_t)i * L];
      float* qo = &Qn[(size_t)i * L];
      for (int32_t l = 0; l < L; ++l)
        qo[l] = 0.5f * qi[l] + 0.5f * agree[l] * inv_sum;
    }
    Q.swap(Qn);
  }

  std::vector<int32_t> lab(n), lab2(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* qi = &Q[(size_t)i * L];
    int32_t best = 0;
    for (int32_t l = 1; l < L; ++l)
      if (qi[l] > qi[best]) best = l;
    lab[i] = best;
  }

  for (int32_t s = 0; s < n_icm; ++s) {
    const uint8_t* mask = icm_mask + (size_t)s * n;
    for (int64_t i = 0; i < n; ++i) {
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
      lab2[i] = mask[i] ? best : lab[i];
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
void rescan_abswap(const float* U, int64_t n, int32_t L,
                   const int32_t* csr_off, const int32_t* csr_nbr,
                   const float* csr_w, int32_t n_cycles, int32_t* labels) {
  struct Arc { int32_t to; int32_t rev; int64_t cap; };
  std::vector<std::vector<Arc>> g;
  std::vector<int32_t> level, iter;
  auto add_arc = [&](int32_t u, int32_t v, int64_t cap, int64_t rcap) {
    g[u].push_back({v, (int32_t)g[v].size(), cap});
    g[v].push_back({u, (int32_t)g[u].size() - 1, rcap});
  };
  std::vector<int32_t> local(n, -1), nodes;
  std::vector<int32_t> bfs_q;

  for (int32_t cycle = 0; cycle < n_cycles; ++cycle) {
    for (int32_t a = 0; a < L; ++a) {
      for (int32_t b = a + 1; b < L; ++b) {
        nodes.clear();
        for (int64_t i = 0; i < n; ++i)
          if (labels[i] == a || labels[i] == b) {
            local[i] = (int32_t)nodes.size();
            nodes.push_back((int32_t)i);
          }
        if (nodes.empty()) continue;
        const int32_t m = (int32_t)nodes.size();
        const int32_t S = m, T = m + 1;
        g.assign(m + 2, {});
        for (int32_t li = 0; li < m; ++li) {
          const int64_t i = nodes[li];
          const float* ui = U + (size_t)i * L;
          const int64_t da = llroundf(ui[a]), db_ = llroundf(ui[b]);
          if (db_ > 0) add_arc(S, li, db_, 0);
          if (da > 0) add_arc(li, T, da, 0);
          for (int32_t e = csr_off[i]; e < csr_off[i + 1]; ++e) {
            const int32_t j = csr_nbr[e];
            if ((labels[j] == a || labels[j] == b) && j > i) {
              const int64_t w = llroundf(csr_w[e]);
              if (w > 0) add_arc(li, local[j], w, w);
            }
          }
        }
        // Dinic max-flow
        level.assign(m + 2, -1);
        iter.assign(m + 2, 0);
        std::function<int64_t(int32_t, int64_t)> dfs =
            [&](int32_t u, int64_t f) -> int64_t {
          if (u == T) return f;
          for (int32_t& it = iter[u]; it < (int32_t)g[u].size(); ++it) {
            Arc& arc = g[u][it];
            if (arc.cap > 0 && level[arc.to] == level[u] + 1) {
              int64_t d = dfs(arc.to, f < arc.cap ? f : arc.cap);
              if (d > 0) {
                arc.cap -= d;
                g[arc.to][arc.rev].cap += d;
                return d;
              }
            }
          }
          return 0;
        };
        for (;;) {
          level.assign(m + 2, -1);
          level[S] = 0;
          bfs_q.clear();
          bfs_q.push_back(S);
          for (size_t h = 0; h < bfs_q.size(); ++h) {
            const int32_t u = bfs_q[h];
            for (const Arc& arc : g[u])
              if (arc.cap > 0 && level[arc.to] < 0) {
                level[arc.to] = level[u] + 1;
                bfs_q.push_back(arc.to);
              }
          }
          if (level[T] < 0) break;
          iter.assign(m + 2, 0);
          while (dfs(S, INT64_MAX) > 0) {}
        }
        // source-reachable nodes keep label a, the rest get b
        level.assign(m + 2, -1);
        level[S] = 0;
        bfs_q.clear();
        bfs_q.push_back(S);
        for (size_t h = 0; h < bfs_q.size(); ++h)
          for (const Arc& arc : g[bfs_q[h]])
            if (arc.cap > 0 && level[arc.to] < 0) {
              level[arc.to] = 0;
              bfs_q.push_back(arc.to);
            }
        for (int32_t li = 0; li < m; ++li)
          labels[nodes[li]] = level[li] == 0 ? a : b;
        for (int32_t v : nodes) local[v] = -1;
      }
    }
  }
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
