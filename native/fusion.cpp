// Native host-side fusion + evaluation kernels.
//
// TPU-native framework equivalents of the reference's native dependencies
// (SURVEY §2.6): the external CUDA "fusibile" fusion binary and the MATLAB
// DTU evaluation. The TPU path (infer/fusion_tpu.py) covers batched
// on-device fusion; this library accelerates the host (CPU) path — the
// dypcd per-(ref,src) consistency round trip and the chunked
// nearest-neighbor distances — fusing the numpy pipeline's dozen
// elementwise passes into single loops.
//
// Built as a plain shared library (no pybind11): see
// damvsnet_tpu/native_ext.py for the ctypes bindings and build recipe.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Invert a row-major 3x3 matrix.
static void inv3(const double* m, double* out) {
  double a = m[0], b = m[1], c = m[2];
  double d = m[3], e = m[4], f = m[5];
  double g = m[6], h = m[7], i = m[8];
  double det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
  double id = 1.0 / det;
  out[0] = (e * i - f * h) * id;
  out[1] = (c * h - b * i) * id;
  out[2] = (b * f - c * e) * id;
  out[3] = (f * g - d * i) * id;
  out[4] = (a * i - c * g) * id;
  out[5] = (c * d - a * f) * id;
  out[6] = (d * h - e * g) * id;
  out[7] = (b * g - a * h) * id;
  out[8] = (a * e - b * d) * id;
}

// Invert a row-major 4x4 rigid-ish matrix via Gauss-Jordan (general).
static void inv4(const double* m, double* out) {
  double a[4][8];
  for (int r = 0; r < 4; ++r) {
    for (int c = 0; c < 4; ++c) a[r][c] = m[r * 4 + c];
    for (int c = 0; c < 4; ++c) a[r][4 + c] = (r == c) ? 1.0 : 0.0;
  }
  for (int col = 0; col < 4; ++col) {
    int piv = col;
    for (int r = col + 1; r < 4; ++r)
      if (std::fabs(a[r][col]) > std::fabs(a[piv][col])) piv = r;
    for (int c = 0; c < 8; ++c) std::swap(a[col][c], a[piv][c]);
    double s = 1.0 / a[col][col];
    for (int c = 0; c < 8; ++c) a[col][c] *= s;
    for (int r = 0; r < 4; ++r) {
      if (r == col) continue;
      double f = a[r][col];
      for (int c = 0; c < 8; ++c) a[r][c] -= f * a[col][c];
    }
  }
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) out[r * 4 + c] = a[r][4 + c];
}

// dypcd consistency round trip for one (ref, src) pair.
// Inputs: depth maps [H*W] float32 row-major; K 3x3, E 4x4 float32
// row-major. Outputs:
//   mask_bits [H*W] uint16 — bit t set iff the dynamic threshold
//     (i = t + 2): dist < i*dist_base && rel_diff < i*rel_diff_base holds
//     (t in [0, n_thresh)).
//   depth_reproj [H*W] float32 — reprojected depth, zeroed where the
//     largest threshold fails (parity: filter/dypcd.py:139-159).
void dypcd_consistency(const float* depth_ref, const float* k_ref,
                       const float* e_ref, const float* depth_src,
                       const float* k_src, const float* e_src, int height,
                       int width, float dist_base, float rel_diff_base,
                       int n_thresh, uint16_t* mask_bits,
                       float* depth_reproj) {
  double kr[9], ks[9], kr_inv[9], ks_inv[9];
  double er[16], es[16], er_inv[16], es_inv[16];
  for (int i = 0; i < 9; ++i) {
    kr[i] = k_ref[i];
    ks[i] = k_src[i];
  }
  for (int i = 0; i < 16; ++i) {
    er[i] = e_ref[i];
    es[i] = e_src[i];
  }
  inv3(kr, kr_inv);
  inv3(ks, ks_inv);
  inv4(er, er_inv);
  inv4(es, es_inv);

  // rel = E_src @ inv(E_ref); rel_back = E_ref @ inv(E_src)
  double rel[16], rel_back[16];
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) {
      double s1 = 0, s2 = 0;
      for (int k = 0; k < 4; ++k) {
        s1 += es[r * 4 + k] * er_inv[k * 4 + c];
        s2 += er[r * 4 + k] * es_inv[k * 4 + c];
      }
      rel[r * 4 + c] = s1;
      rel_back[r * 4 + c] = s2;
    }

  for (int y = 0; y < height; ++y) {
    for (int x = 0; x < width; ++x) {
      int idx = y * width + x;
      double d = depth_ref[idx];
      // ref pixel -> ref cam
      double cx = (kr_inv[0] * x + kr_inv[1] * y + kr_inv[2]) * d;
      double cy = (kr_inv[3] * x + kr_inv[4] * y + kr_inv[5]) * d;
      double cz = (kr_inv[6] * x + kr_inv[7] * y + kr_inv[8]) * d;
      // -> src cam
      double sx = rel[0] * cx + rel[1] * cy + rel[2] * cz + rel[3];
      double sy = rel[4] * cx + rel[5] * cy + rel[6] * cz + rel[7];
      double sz = rel[8] * cx + rel[9] * cy + rel[10] * cz + rel[11];
      // -> src pixel
      double ux = (ks[0] * sx + ks[1] * sy + ks[2] * sz) / sz;
      double uy = (ks[3] * sx + ks[4] * sy + ks[5] * sz) / sz;
      // bilinear sample src depth (cv2.remap zero-border semantics)
      double sampled = 0.0;
      {
        double fx = std::floor(ux), fy = std::floor(uy);
        int x0 = (int)fx, y0 = (int)fy;
        double wx = ux - fx, wy = uy - fy;
        double acc = 0.0;
        for (int dy2 = 0; dy2 < 2; ++dy2) {
          for (int dx2 = 0; dx2 < 2; ++dx2) {
            int xi = x0 + dx2, yi = y0 + dy2;
            double w = (dx2 ? wx : 1 - wx) * (dy2 ? wy : 1 - wy);
            if (xi >= 0 && xi < width && yi >= 0 && yi < height)
              acc += w * depth_src[yi * width + xi];
          }
        }
        sampled = acc;
      }
      // src pixel + sampled depth -> src cam -> ref cam
      double bx = (ks_inv[0] * ux + ks_inv[1] * uy + ks_inv[2]) * sampled;
      double by = (ks_inv[3] * ux + ks_inv[4] * uy + ks_inv[5]) * sampled;
      double bz = (ks_inv[6] * ux + ks_inv[7] * uy + ks_inv[8]) * sampled;
      double rx = rel_back[0] * bx + rel_back[1] * by + rel_back[2] * bz + rel_back[3];
      double ry = rel_back[4] * bx + rel_back[5] * by + rel_back[6] * bz + rel_back[7];
      double rz = rel_back[8] * bx + rel_back[9] * by + rel_back[10] * bz + rel_back[11];
      // -> ref pixel
      double pz = kr[6] * rx + kr[7] * ry + kr[8] * rz;
      if (pz == 0.0) pz += 1e-5;
      double px = (kr[0] * rx + kr[1] * ry + kr[2] * rz) / pz;
      double py = (kr[3] * rx + kr[4] * ry + kr[5] * rz) / pz;

      double dist = std::sqrt((px - x) * (px - x) + (py - y) * (py - y));
      double rel_diff = std::fabs(rz - d) / d;

      uint16_t bits = 0;
      for (int t = 0; t < n_thresh; ++t) {
        int i = t + 2;
        if (dist < i * (double)dist_base && rel_diff < i * (double)rel_diff_base)
          bits |= (uint16_t)(1u << t);
      }
      mask_bits[idx] = bits;
      depth_reproj[idx] =
          (bits & (1u << (n_thresh - 1))) ? (float)rz : 0.0f;
    }
  }
}

// Capped nearest-neighbor distances via a uniform voxel grid
// (MaxDistCP.m semantics: exact NN below max_dist, max_dist otherwise).
// q_to: [n_to*3], q_from: [n_from*3], dist_out: [n_from].
void grid_nn_distances(const float* q_to, int64_t n_to, const float* q_from,
                       int64_t n_from, float max_dist, float* dist_out) {
  if (n_to == 0) {
    for (int64_t i = 0; i < n_from; ++i) dist_out[i] = max_dist;
    return;
  }
  // bounding box of q_to
  double lo[3] = {q_to[0], q_to[1], q_to[2]};
  double hi[3] = {q_to[0], q_to[1], q_to[2]};
  for (int64_t i = 0; i < n_to; ++i)
    for (int c = 0; c < 3; ++c) {
      double v = q_to[i * 3 + c];
      if (v < lo[c]) lo[c] = v;
      if (v > hi[c]) hi[c] = v;
    }
  double cell = max_dist;
  int64_t dims[3];
  for (int c = 0; c < 3; ++c)
    dims[c] = (int64_t)std::floor((hi[c] - lo[c]) / cell) + 1;
  int64_t n_cells = dims[0] * dims[1] * dims[2];

  // counting sort of q_to into cells
  std::vector<int32_t> counts(n_cells + 1, 0);
  std::vector<int32_t> cell_of(n_to);
  auto cell_idx = [&](double x, double y, double z) -> int64_t {
    int64_t ix = (int64_t)std::floor((x - lo[0]) / cell);
    int64_t iy = (int64_t)std::floor((y - lo[1]) / cell);
    int64_t iz = (int64_t)std::floor((z - lo[2]) / cell);
    if (ix < 0) ix = 0; if (ix >= dims[0]) ix = dims[0] - 1;
    if (iy < 0) iy = 0; if (iy >= dims[1]) iy = dims[1] - 1;
    if (iz < 0) iz = 0; if (iz >= dims[2]) iz = dims[2] - 1;
    return (ix * dims[1] + iy) * dims[2] + iz;
  };
  for (int64_t i = 0; i < n_to; ++i) {
    int64_t ci = cell_idx(q_to[i * 3], q_to[i * 3 + 1], q_to[i * 3 + 2]);
    cell_of[i] = (int32_t)ci;
    counts[ci + 1]++;
  }
  for (int64_t i = 0; i < n_cells; ++i) counts[i + 1] += counts[i];
  std::vector<int32_t> order(n_to);
  {
    std::vector<int32_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t i = 0; i < n_to; ++i) order[cursor[cell_of[i]]++] = (int32_t)i;
  }

  for (int64_t i = 0; i < n_from; ++i) {
    double qx = q_from[i * 3], qy = q_from[i * 3 + 1], qz = q_from[i * 3 + 2];
    int64_t ix = (int64_t)std::floor((qx - lo[0]) / cell);
    int64_t iy = (int64_t)std::floor((qy - lo[1]) / cell);
    int64_t iz = (int64_t)std::floor((qz - lo[2]) / cell);
    double best = (double)max_dist * (double)max_dist;
    for (int64_t gx = ix - 1; gx <= ix + 1; ++gx) {
      if (gx < 0 || gx >= dims[0]) continue;
      for (int64_t gy = iy - 1; gy <= iy + 1; ++gy) {
        if (gy < 0 || gy >= dims[1]) continue;
        for (int64_t gz = iz - 1; gz <= iz + 1; ++gz) {
          if (gz < 0 || gz >= dims[2]) continue;
          int64_t ci = (gx * dims[1] + gy) * dims[2] + gz;
          for (int32_t k = counts[ci]; k < counts[ci + 1]; ++k) {
            const float* p = q_to + (int64_t)order[k] * 3;
            double dx = p[0] - qx, dy = p[1] - qy, dz = p[2] - qz;
            double d2 = dx * dx + dy * dy + dz * dz;
            if (d2 < best) best = d2;
          }
        }
      }
    }
    dist_out[i] = (float)std::sqrt(best);
  }
}

// Stochastic minimum-distance thinning (reducePts_haa.m semantics):
// visit points in the given order; keep a point iff no previously-kept
// point lies within dst. order: [n] int32 permutation; keep_out: [n] u8.
void reduce_points_grid(const float* pts, int64_t n, const int32_t* order,
                        float dst, uint8_t* keep_out) {
  if (n == 0) return;
  double lo[3] = {pts[0], pts[1], pts[2]};
  double hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c) {
      double v = pts[i * 3 + c];
      if (v < lo[c]) lo[c] = v;
      if (v > hi[c]) hi[c] = v;
    }
  double cell = dst;
  int64_t dims[3];
  for (int c = 0; c < 3; ++c)
    dims[c] = (int64_t)std::floor((hi[c] - lo[c]) / cell) + 1;
  int64_t n_cells = dims[0] * dims[1] * dims[2];
  std::vector<std::vector<int32_t>> grid(n_cells);
  auto cell_idx = [&](const float* p) -> int64_t {
    int64_t ix = (int64_t)((p[0] - lo[0]) / cell);
    int64_t iy = (int64_t)((p[1] - lo[1]) / cell);
    int64_t iz = (int64_t)((p[2] - lo[2]) / cell);
    if (ix >= dims[0]) ix = dims[0] - 1;
    if (iy >= dims[1]) iy = dims[1] - 1;
    if (iz >= dims[2]) iz = dims[2] - 1;
    return (ix * dims[1] + iy) * dims[2] + iz;
  };
  std::memset(keep_out, 0, n);
  double dst2 = (double)dst * (double)dst;
  for (int64_t oi = 0; oi < n; ++oi) {
    int32_t i = order[oi];
    const float* p = pts + (int64_t)i * 3;
    int64_t ix = (int64_t)((p[0] - lo[0]) / cell);
    int64_t iy = (int64_t)((p[1] - lo[1]) / cell);
    int64_t iz = (int64_t)((p[2] - lo[2]) / cell);
    bool blocked = false;
    for (int64_t gx = ix - 1; gx <= ix + 1 && !blocked; ++gx) {
      if (gx < 0 || gx >= dims[0]) continue;
      for (int64_t gy = iy - 1; gy <= iy + 1 && !blocked; ++gy) {
        if (gy < 0 || gy >= dims[1]) continue;
        for (int64_t gz = iz - 1; gz <= iz + 1 && !blocked; ++gz) {
          if (gz < 0 || gz >= dims[2]) continue;
          for (int32_t j : grid[(gx * dims[1] + gy) * dims[2] + gz]) {
            const float* q = pts + (int64_t)j * 3;
            double dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
            if (dx * dx + dy * dy + dz * dz < dst2) {
              blocked = true;
              break;
            }
          }
        }
      }
    }
    if (!blocked) {
      keep_out[i] = 1;
      grid[cell_idx(p)].push_back(i);
    }
  }
}

}  // extern "C"
