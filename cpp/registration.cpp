// Native point-cloud registration baselines.
//
// C++ re-implementation of the capabilities the reference obtains from
// external native dependencies (SURVEY.md section 2.1):
//   * the Super4PCS executable (reference baselines.py:10-35) -> a
//     4PCS-style congruent-set global registration with an LCP score;
//   * Open3D registration (baselines.py:37-168) -> voxel downsampling,
//     k-NN normal estimation, FPFH features, RANSAC global registration
//     with edge-length pruning, fast global registration (scaled
//     Geman-McClure), and multi-scale colored ICP.
//
// Exposed through a small C ABI (rp_* functions at the bottom) consumed by
// ctypes bindings in relativepose_tpu/native/registration.py.  All
// transforms are row-major 4x4, mapping source points into the target
// frame (p_t = R p_s + t).

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

using Vec3 = std::array<double, 3>;
using Mat3 = std::array<std::array<double, 3>, 3>;

struct Mat4 {
  double m[4][4];
  static Mat4 identity() {
    Mat4 out{};
    for (int i = 0; i < 4; ++i) out.m[i][i] = 1.0;
    return out;
  }
};

inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
}
inline Vec3 add(const Vec3& a, const Vec3& b) {
  return {a[0] + b[0], a[1] + b[1], a[2] + b[2]};
}
inline Vec3 scale(const Vec3& a, double s) {
  return {a[0] * s, a[1] * s, a[2] * s};
}
inline double dot(const Vec3& a, const Vec3& b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]};
}
inline double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }
inline Vec3 normalized(const Vec3& a) {
  double n = norm(a);
  return n > 1e-12 ? scale(a, 1.0 / n) : Vec3{0, 0, 0};
}
inline Vec3 xform(const Mat4& T, const Vec3& p) {
  Vec3 out;
  for (int i = 0; i < 3; ++i)
    out[i] = T.m[i][0] * p[0] + T.m[i][1] * p[1] + T.m[i][2] * p[2] +
             T.m[i][3];
  return out;
}
inline Vec3 rotate(const Mat4& T, const Vec3& p) {
  Vec3 out;
  for (int i = 0; i < 3; ++i)
    out[i] = T.m[i][0] * p[0] + T.m[i][1] * p[1] + T.m[i][2] * p[2];
  return out;
}
inline Mat4 compose(const Mat4& A, const Mat4& B) {  // A * B
  Mat4 out{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += A.m[i][k] * B.m[k][j];
      out.m[i][j] = s;
    }
  return out;
}

// --------------------------------------------------------------------------
// 3x3 symmetric eigen (Jacobi) — for PCA normals + Horn alignment.
// --------------------------------------------------------------------------
void eigh3(const Mat3& A_in, Vec3* evals, Mat3* evecs_cols) {
  Mat3 A = A_in;
  Mat3 V{{{1, 0, 0}, {0, 1, 0}, {0, 0, 1}}};
  for (int sweep = 0; sweep < 24; ++sweep) {
    for (int p = 0; p < 3; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(A[p][q]) < 1e-15) continue;
        double theta = (A[q][q] - A[p][p]) / (2.0 * A[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(1.0 + theta * theta));
        double c = 1.0 / std::sqrt(1.0 + t * t), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][p], akq = A[k][q];
          A[k][p] = c * akp - s * akq;
          A[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[p][k], aqk = A[q][k];
          A[p][k] = c * apk - s * aqk;
          A[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V[k][p], vkq = V[k][q];
          V[k][p] = c * vkp - s * vkq;
          V[k][q] = s * vkp + c * vkq;
        }
      }
  }
  for (int i = 0; i < 3; ++i) (*evals)[i] = A[i][i];
  *evecs_cols = V;
}

// Horn-style closed-form rigid alignment via quaternion of the 4x4 N matrix
// (power iteration on a shifted matrix for the max eigenvector).
Mat4 rigid_align(const std::vector<Vec3>& src, const std::vector<Vec3>& tgt,
                 const std::vector<double>* w = nullptr) {
  size_t n = src.size();
  double wsum = 0;
  Vec3 cs{0, 0, 0}, ct{0, 0, 0};
  for (size_t i = 0; i < n; ++i) {
    double wi = w ? (*w)[i] : 1.0;
    cs = add(cs, scale(src[i], wi));
    ct = add(ct, scale(tgt[i], wi));
    wsum += wi;
  }
  if (wsum < 1e-12) return Mat4::identity();
  cs = scale(cs, 1.0 / wsum);
  ct = scale(ct, 1.0 / wsum);
  double M[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  for (size_t i = 0; i < n; ++i) {
    double wi = w ? (*w)[i] : 1.0;
    Vec3 a = sub(src[i], cs), b = sub(tgt[i], ct);
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) M[r][c] += wi * a[r] * b[c];
  }
  double N[4][4] = {
      {M[0][0] + M[1][1] + M[2][2], M[1][2] - M[2][1], M[2][0] - M[0][2],
       M[0][1] - M[1][0]},
      {M[1][2] - M[2][1], M[0][0] - M[1][1] - M[2][2], M[0][1] + M[1][0],
       M[0][2] + M[2][0]},
      {M[2][0] - M[0][2], M[0][1] + M[1][0], M[1][1] - M[0][0] - M[2][2],
       M[1][2] + M[2][1]},
      {M[0][1] - M[1][0], M[2][0] + M[0][2], M[1][2] + M[2][1],
       M[2][2] - M[0][0] - M[1][1]}};
  // shift to make dominant eigenvalue the max one, then power-iterate
  double shift = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) shift += N[i][j] * N[i][j];
  shift = std::sqrt(shift) + 1e-9;
  double q[4] = {1, 0, 0, 0};
  for (int it = 0; it < 100; ++it) {
    double y[4];
    for (int i = 0; i < 4; ++i) {
      y[i] = shift * q[i];
      for (int j = 0; j < 4; ++j) y[i] += N[i][j] * q[j];
    }
    double nn = std::sqrt(y[0] * y[0] + y[1] * y[1] + y[2] * y[2] +
                          y[3] * y[3]);
    if (nn < 1e-15) break;
    for (int i = 0; i < 4; ++i) q[i] = y[i] / nn;
  }
  double w0 = q[0], x = q[1], y = q[2], z = q[3];
  Mat4 T = Mat4::identity();
  T.m[0][0] = w0 * w0 + x * x - y * y - z * z;
  T.m[0][1] = 2 * (x * y - w0 * z);
  T.m[0][2] = 2 * (x * z + w0 * y);
  T.m[1][0] = 2 * (y * x + w0 * z);
  T.m[1][1] = w0 * w0 - x * x + y * y - z * z;
  T.m[1][2] = 2 * (y * z - w0 * x);
  T.m[2][0] = 2 * (z * x - w0 * y);
  T.m[2][1] = 2 * (z * y + w0 * x);
  T.m[2][2] = w0 * w0 - x * x - y * y + z * z;
  Vec3 Rc = rotate(T, cs);
  for (int i = 0; i < 3; ++i) T.m[i][3] = ct[i] - Rc[i];
  return T;
}

// --------------------------------------------------------------------------
// Spatial grid hash for NN queries (replaces sklearn KDTree / Open3D trees).
// --------------------------------------------------------------------------
struct GridNN {
  double cell;
  std::unordered_map<int64_t, std::vector<int>> grid;
  const std::vector<Vec3>* pts;

  // lossless packed cell key (21 bits per signed coordinate)
  static int64_t key(int64_t x, int64_t y, int64_t z) {
    const int64_t B = 1 << 20;
    return ((x + B) << 42) | ((y + B) << 21) | (z + B);
  }

  void build(const std::vector<Vec3>& p, double cell_size) {
    cell = cell_size;
    pts = &p;
    grid.clear();
    grid.reserve(p.size());
    for (size_t i = 0; i < p.size(); ++i) {
      int64_t x = (int64_t)std::floor(p[i][0] / cell);
      int64_t y = (int64_t)std::floor(p[i][1] / cell);
      int64_t z = (int64_t)std::floor(p[i][2] / cell);
      grid[key(x, y, z)].push_back((int)i);
    }
  }

  // nearest neighbour within `radius`; returns -1 if none
  int nearest(const Vec3& q, double radius, double* out_d2 = nullptr) const {
    int reach = (int)std::ceil(radius / cell);
    int64_t cx = (int64_t)std::floor(q[0] / cell);
    int64_t cy = (int64_t)std::floor(q[1] / cell);
    int64_t cz = (int64_t)std::floor(q[2] / cell);
    double best = radius * radius;
    int best_i = -1;
    for (int dx = -reach; dx <= reach; ++dx)
      for (int dy = -reach; dy <= reach; ++dy)
        for (int dz = -reach; dz <= reach; ++dz) {
          auto it = grid.find(key(cx + dx, cy + dy, cz + dz));
          if (it == grid.end()) continue;
          for (int i : it->second) {
            Vec3 d = sub((*pts)[i], q);
            double d2 = dot(d, d);
            if (d2 < best) {
              best = d2;
              best_i = i;
            }
          }
        }
    if (out_d2) *out_d2 = best;
    return best_i;
  }

  void radius_search(const Vec3& q, double radius,
                     std::vector<int>* out) const {
    out->clear();
    int reach = (int)std::ceil(radius / cell);
    int64_t cx = (int64_t)std::floor(q[0] / cell);
    int64_t cy = (int64_t)std::floor(q[1] / cell);
    int64_t cz = (int64_t)std::floor(q[2] / cell);
    double r2 = radius * radius;
    for (int dx = -reach; dx <= reach; ++dx)
      for (int dy = -reach; dy <= reach; ++dy)
        for (int dz = -reach; dz <= reach; ++dz) {
          auto it = grid.find(key(cx + dx, cy + dy, cz + dz));
          if (it == grid.end()) continue;
          for (int i : it->second) {
            Vec3 d = sub((*pts)[i], q);
            if (dot(d, d) <= r2) out->push_back(i);
          }
        }
  }
};

// --------------------------------------------------------------------------
// Voxel downsample (Open3D voxel_down_sample semantics: centroid per voxel).
// --------------------------------------------------------------------------
void voxel_downsample(const std::vector<Vec3>& pts,
                      const std::vector<Vec3>* colors, double voxel,
                      std::vector<Vec3>* out_pts,
                      std::vector<Vec3>* out_colors) {
  struct Acc {
    Vec3 p{0, 0, 0};
    Vec3 c{0, 0, 0};
    int n = 0;
  };
  std::unordered_map<int64_t, Acc> map;
  map.reserve(pts.size());
  for (size_t i = 0; i < pts.size(); ++i) {
    int64_t x = (int64_t)std::floor(pts[i][0] / voxel);
    int64_t y = (int64_t)std::floor(pts[i][1] / voxel);
    int64_t z = (int64_t)std::floor(pts[i][2] / voxel);
    Acc& a = map[GridNN::key(x, y, z)];
    a.p = add(a.p, pts[i]);
    if (colors) a.c = add(a.c, (*colors)[i]);
    a.n += 1;
  }
  out_pts->clear();
  if (out_colors) out_colors->clear();
  for (auto& kv : map) {
    out_pts->push_back(scale(kv.second.p, 1.0 / kv.second.n));
    if (out_colors)
      out_colors->push_back(scale(kv.second.c, 1.0 / kv.second.n));
  }
}

// --------------------------------------------------------------------------
// Normal estimation: PCA over a radius neighbourhood.
// --------------------------------------------------------------------------
void estimate_normals(const std::vector<Vec3>& pts, double radius,
                      std::vector<Vec3>* normals) {
  GridNN nn;
  nn.build(pts, radius);
  normals->assign(pts.size(), Vec3{0, 0, 1});
  std::vector<int> idx;
  for (size_t i = 0; i < pts.size(); ++i) {
    nn.radius_search(pts[i], radius, &idx);
    if (idx.size() < 3) continue;
    Vec3 mean{0, 0, 0};
    for (int j : idx) mean = add(mean, pts[j]);
    mean = scale(mean, 1.0 / idx.size());
    Mat3 C{{{0, 0, 0}, {0, 0, 0}, {0, 0, 0}}};
    for (int j : idx) {
      Vec3 d = sub(pts[j], mean);
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 3; ++c) C[r][c] += d[r] * d[c];
    }
    Vec3 evals;
    Mat3 evecs;
    eigh3(C, &evals, &evecs);
    int k = 0;
    if (evals[1] < evals[k]) k = 1;
    if (evals[2] < evals[k]) k = 2;
    Vec3 n{evecs[0][k], evecs[1][k], evecs[2][k]};
    // orient towards the origin (camera), like Open3D's default tangent
    // plane orientation for scans
    if (dot(n, pts[i]) > 0) n = scale(n, -1.0);
    (*normals)[i] = normalized(n);
  }
}

// --------------------------------------------------------------------------
// FPFH features (33 bins), Rusu et al., as used by Open3D baselines.
// --------------------------------------------------------------------------
void compute_fpfh(const std::vector<Vec3>& pts,
                  const std::vector<Vec3>& normals, double radius,
                  std::vector<std::array<float, 33>>* feats) {
  const int B = 11;
  size_t n = pts.size();
  GridNN nn;
  nn.build(pts, radius);
  std::vector<std::array<float, 33>> spfh(n);
  for (auto& f : spfh) f.fill(0.f);
  std::vector<std::vector<int>> neigh(n);
  std::vector<int> idx;
  for (size_t i = 0; i < n; ++i) {
    nn.radius_search(pts[i], radius, &idx);
    for (int j : idx)
      if ((size_t)j != i) neigh[i].push_back(j);
    int cnt = 0;
    for (int j : neigh[i]) {
      // Darboux frame angles between (p_i, n_i) and (p_j, n_j)
      Vec3 d = sub(pts[j], pts[i]);
      double dist = norm(d);
      if (dist < 1e-9) continue;
      Vec3 u = normals[i];
      Vec3 v = normalized(cross(d, u));
      Vec3 w = cross(u, v);
      double f1 = dot(v, normals[j]);                      // alpha in [-1,1]
      double f2 = dot(u, d) / dist;                        // phi in [-1,1]
      double f3 = std::atan2(dot(w, normals[j]), dot(u, normals[j]));
      int b1 = std::min(B - 1, (int)((f1 + 1.0) * 0.5 * B));
      int b2 = std::min(B - 1, (int)((f2 + 1.0) * 0.5 * B));
      int b3 = std::min(B - 1, (int)((f3 + M_PI) / (2 * M_PI) * B));
      spfh[i][b1] += 1.f;
      spfh[i][B + b2] += 1.f;
      spfh[i][2 * B + b3] += 1.f;
      ++cnt;
    }
    if (cnt > 0)
      for (auto& v : spfh[i]) v *= 100.f / cnt;
  }
  feats->assign(n, {});
  for (size_t i = 0; i < n; ++i) {
    std::array<double, 33> acc{};
    for (int k = 0; k < 33; ++k) acc[k] = spfh[i][k];
    double wsum = 0;
    for (int j : neigh[i]) {
      Vec3 d = sub(pts[j], pts[i]);
      double dist2 = dot(d, d);
      if (dist2 < 1e-12) continue;
      double w = 1.0 / dist2;
      for (int k = 0; k < 33; ++k) acc[k] += w * spfh[j][k];
      wsum += w;
    }
    (void)wsum;
    for (int k = 0; k < 33; ++k) (*feats)[i][k] = (float)acc[k];
  }
}

double feat_dist2(const std::array<float, 33>& a,
                  const std::array<float, 33>& b) {
  double s = 0;
  for (int k = 0; k < 33; ++k) {
    double d = a[k] - b[k];
    s += d * d;
  }
  return s;
}

// mutual-ish FPFH correspondences: nearest target feature per source
void feature_matches(const std::vector<std::array<float, 33>>& fs,
                     const std::vector<std::array<float, 33>>& ft,
                     std::vector<std::pair<int, int>>* out) {
  out->clear();
  for (size_t i = 0; i < fs.size(); ++i) {
    double best = std::numeric_limits<double>::max();
    int bj = -1;
    for (size_t j = 0; j < ft.size(); ++j) {
      double d = feat_dist2(fs[i], ft[j]);
      if (d < best) {
        best = d;
        bj = (int)j;
      }
    }
    if (bj >= 0) out->push_back({(int)i, bj});
  }
}

struct Cloud {
  std::vector<Vec3> pts;
  std::vector<Vec3> colors;
  std::vector<Vec3> normals;
  std::vector<std::array<float, 33>> fpfh;
};

// preprocess_point_cloud (reference baselines.py:37-50): voxel 0.05,
// normals at 2*voxel, FPFH at 5*voxel.
void preprocess(const double* pts, const double* colors, int n, double voxel,
                Cloud* out) {
  std::vector<Vec3> p(n), c;
  for (int i = 0; i < n; ++i) p[i] = {pts[3 * i], pts[3 * i + 1],
                                      pts[3 * i + 2]};
  if (colors) {
    c.resize(n);
    for (int i = 0; i < n; ++i)
      c[i] = {colors[3 * i], colors[3 * i + 1], colors[3 * i + 2]};
  }
  voxel_downsample(p, colors ? &c : nullptr, voxel, &out->pts,
                   colors ? &out->colors : nullptr);
  estimate_normals(out->pts, voxel * 2.0, &out->normals);
  compute_fpfh(out->pts, out->normals, voxel * 5.0, &out->fpfh);
}

// --------------------------------------------------------------------------
// RANSAC global registration with edge-length + distance checks
// (Open3D registration_ransac_based_on_feature_matching semantics;
// reference baselines.py:62-77: 3-point samples, edge length 0.9,
// max_dist 1.5 * voxel).
// --------------------------------------------------------------------------
Mat4 ransac_registration(const Cloud& s, const Cloud& t, double voxel,
                         int max_iters, std::mt19937* rng,
                         double* out_fitness = nullptr) {
  std::vector<std::pair<int, int>> corr;
  feature_matches(s.fpfh, t.fpfh, &corr);
  if (corr.size() < 3) return Mat4::identity();
  double max_dist = voxel * 1.5;
  GridNN tnn;
  tnn.build(t.pts, max_dist);
  std::uniform_int_distribution<int> pick(0, (int)corr.size() - 1);
  Mat4 best = Mat4::identity();
  double best_score = -1;
  for (int it = 0; it < max_iters; ++it) {
    int a = pick(*rng), b = pick(*rng), c = pick(*rng);
    if (a == b || b == c || a == c) continue;
    std::vector<Vec3> ps{s.pts[corr[a].first], s.pts[corr[b].first],
                         s.pts[corr[c].first]};
    std::vector<Vec3> pt{t.pts[corr[a].second], t.pts[corr[b].second],
                         t.pts[corr[c].second]};
    // edge-length check (CorrespondenceCheckerBasedOnEdgeLength 0.9)
    bool ok = true;
    for (int e = 0; e < 3 && ok; ++e) {
      double ls = norm(sub(ps[e], ps[(e + 1) % 3]));
      double lt = norm(sub(pt[e], pt[(e + 1) % 3]));
      if (ls < 1e-9 || lt < 1e-9 || std::min(ls, lt) / std::max(ls, lt) < 0.9)
        ok = false;
    }
    if (!ok) continue;
    Mat4 T = rigid_align(ps, pt);
    // inlier count on a subsample
    int inliers = 0;
    int step = std::max<size_t>(1, s.pts.size() / 400);
    for (size_t i = 0; i < s.pts.size(); i += step) {
      Vec3 q = xform(T, s.pts[i]);
      if (tnn.nearest(q, max_dist) >= 0) ++inliers;
    }
    if (inliers > best_score) {
      best_score = inliers;
      best = T;
    }
  }
  if (out_fitness) *out_fitness = best_score;
  return best;
}

// --------------------------------------------------------------------------
// Point-to-plane ICP with optional color term (colored ICP,
// baselines.py:110-168) — Gauss-Newton on se(3).
// --------------------------------------------------------------------------
void solve6x6(double H[6][6], double g[6], double dx[6]) {
  // Gaussian elimination with partial pivoting
  double A[6][7];
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j < 6; ++j) A[i][j] = H[i][j];
    A[i][6] = -g[i];
  }
  for (int col = 0; col < 6; ++col) {
    int piv = col;
    for (int r = col + 1; r < 6; ++r)
      if (std::fabs(A[r][col]) > std::fabs(A[piv][col])) piv = r;
    std::swap(A[col], A[piv]);
    if (std::fabs(A[col][col]) < 1e-12) {
      for (int i = 0; i < 6; ++i) dx[i] = 0;
      return;
    }
    for (int r = 0; r < 6; ++r) {
      if (r == col) continue;
      double f = A[r][col] / A[col][col];
      for (int j = col; j < 7; ++j) A[r][j] -= f * A[col][j];
    }
  }
  for (int i = 0; i < 6; ++i) dx[i] = A[i][6] / A[i][i];
}

Mat4 se3_exp(const double xi[6]) {
  // xi = [omega, v]
  Vec3 w{xi[0], xi[1], xi[2]};
  double th = norm(w);
  Mat4 T = Mat4::identity();
  Mat3 R{{{1, 0, 0}, {0, 1, 0}, {0, 0, 1}}};
  if (th > 1e-12) {
    Vec3 a = scale(w, 1.0 / th);
    double c = std::cos(th), s = std::sin(th);
    double K[3][3] = {{0, -a[2], a[1]}, {a[2], 0, -a[0]}, {-a[1], a[0], 0}};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double kk = 0;
        for (int k = 0; k < 3; ++k) kk += K[i][k] * K[k][j];
        R[i][j] = (i == j ? 1.0 : 0.0) + s * K[i][j] + (1 - c) * kk;
      }
  }
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) T.m[i][j] = R[i][j];
  T.m[0][3] = xi[3];
  T.m[1][3] = xi[4];
  T.m[2][3] = xi[5];
  return T;
}

Mat4 icp_point_to_plane(const Cloud& s, const Cloud& t, double max_dist,
                        const Mat4& init, int iters, double color_weight) {
  Mat4 T = init;
  GridNN tnn;
  tnn.build(t.pts, max_dist);
  for (int it = 0; it < iters; ++it) {
    double H[6][6] = {}, g[6] = {};
    int n_corr = 0;
    for (size_t i = 0; i < s.pts.size(); ++i) {
      Vec3 q = xform(T, s.pts[i]);
      int j = tnn.nearest(q, max_dist);
      if (j < 0) continue;
      const Vec3& nt = t.normals[j];
      double r = dot(sub(q, t.pts[j]), nt);
      // J = [ (q x n)^T, n^T ]
      Vec3 qxn = cross(q, nt);
      double J[6] = {qxn[0], qxn[1], qxn[2], nt[0], nt[1], nt[2]};
      double wgt = 1.0;
      for (int a = 0; a < 6; ++a) {
        g[a] += wgt * J[a] * r;
        for (int b = 0; b < 6; ++b) H[a][b] += wgt * J[a] * J[b];
      }
      if (color_weight > 0 && !s.colors.empty() && !t.colors.empty()) {
        // luma difference as an extra scalar residual on translation-free
        // channel: pulls correspondences toward photo-consistency.
        double ls = (s.colors[i][0] + s.colors[i][1] + s.colors[i][2]) / 3;
        double lt2 = (t.colors[j][0] + t.colors[j][1] + t.colors[j][2]) / 3;
        double rc = (ls - lt2) * color_weight;
        (void)rc;  // color residual has no pose Jacobian in this simplified
                   // variant; it instead gates the geometric weight:
        double gate = std::exp(-(ls - lt2) * (ls - lt2) / 0.01);
        for (int a = 0; a < 6; ++a) {
          g[a] += (gate - 1.0) * J[a] * r;
          for (int b = 0; b < 6; ++b)
            H[a][b] += (gate - 1.0) * J[a] * J[b];
        }
      }
      ++n_corr;
    }
    if (n_corr < 6) break;
    double dx[6];
    solve6x6(H, g, dx);
    T = compose(se3_exp(dx), T);
  }
  return T;
}

// --------------------------------------------------------------------------
// Fast global registration (Zhou et al.): FPFH correspondences + scaled
// Geman-McClure with a graduated mu (baselines.py:83-103).
// --------------------------------------------------------------------------
Mat4 fast_global_registration(const Cloud& s, const Cloud& t, double voxel) {
  std::vector<std::pair<int, int>> c_st, c_ts;
  feature_matches(s.fpfh, t.fpfh, &c_st);
  feature_matches(t.fpfh, s.fpfh, &c_ts);
  // reciprocity test
  std::vector<std::pair<int, int>> corr;
  for (auto& pr : c_st)
    if (c_ts[pr.second].second == pr.first) corr.push_back(pr);
  if (corr.size() < 10) corr = c_st;
  if (corr.size() < 3) return Mat4::identity();

  Mat4 T = Mat4::identity();
  double mu = voxel * 16.0;
  for (int outer = 0; outer < 64; ++outer) {
    if (outer > 0 && outer % 4 == 0) mu = std::max(mu / 2.0, voxel * 0.5);
    double H[6][6] = {}, g[6] = {};
    for (auto& pr : corr) {
      Vec3 p = xform(T, s.pts[pr.first]);
      Vec3 q = t.pts[pr.second];
      Vec3 r = sub(p, q);
      double r2 = dot(r, r);
      double lw = mu / (mu + r2);
      double w = lw * lw;
      // 3 residual rows: J_k = [ (p x e_k)^T, e_k^T ]
      for (int k = 0; k < 3; ++k) {
        double J[6] = {0, 0, 0, 0, 0, 0};
        // p x e_k rows of skew: d(Rp)/domega = -[p]_x
        // using J = [-[p]_x | I] row k
        if (k == 0) {
          J[1] = p[2];
          J[2] = -p[1];
        } else if (k == 1) {
          J[0] = -p[2];
          J[2] = p[0];
        } else {
          J[0] = p[1];
          J[1] = -p[0];
        }
        J[3 + k] = 1.0;
        for (int a = 0; a < 6; ++a) {
          g[a] += w * J[a] * r[k];
          for (int b = 0; b < 6; ++b) H[a][b] += w * J[a] * J[b];
        }
      }
    }
    double dx[6];
    solve6x6(H, g, dx);
    T = compose(se3_exp(dx), T);
  }
  return T;
}

// --------------------------------------------------------------------------
// 4PCS-style congruent-set registration (Super4PCS replacement,
// baselines.py:10-35).  Coplanar 4-point base in the source; congruent
// candidates in the target found via pair-distance matching and the two
// intersection-ratio invariants; verified by LCP.
// --------------------------------------------------------------------------
Mat4 four_pcs(const std::vector<Vec3>& src, const std::vector<Vec3>& tgt,
              double delta, double time_budget_s, int n_sample,
              std::mt19937* rng, double overlap_est = 0.5) {
  auto t_start = std::chrono::steady_clock::now();
  auto elapsed = [&]() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now() - t_start)
        .count();
  };
  // subsample both clouds
  auto subsample = [&](const std::vector<Vec3>& p, int n) {
    std::vector<Vec3> out;
    if ((int)p.size() <= n) return p;
    std::uniform_int_distribution<int> pick(0, (int)p.size() - 1);
    out.reserve(n);
    for (int i = 0; i < n; ++i) out.push_back(p[pick(*rng)]);
    return out;
  };
  std::vector<Vec3> S = subsample(src, n_sample * 4);
  std::vector<Vec3> Q = subsample(tgt, n_sample * 4);
  if (S.size() < 4 || Q.size() < 4) return Mat4::identity();

  GridNN qnn;
  qnn.build(Q, delta * 2);
  std::uniform_int_distribution<int> pick(0, (int)S.size() - 1);

  Mat4 best = Mat4::identity();
  double best_lcp = -1;
  int step = std::max<size_t>(1, S.size() / 200);

  auto lcp_score = [&](const Mat4& T) {
    int inl = 0;
    for (size_t i = 0; i < S.size(); i += step)
      if (qnn.nearest(xform(T, S[i]), delta * 2) >= 0) ++inl;
    return (double)inl;
  };
  // Early exits: the real Super4PCS terminates when the LCP explains the
  // expected overlap (its -o argument) rather than burning the whole
  // time budget; without these every pair costs the full budget and a
  // 256-pair campaign is intractable on one host core.
  //   1. near-total LCP (95% of sampled points — conservative: symmetric
  //      scenes can score an expected-overlap-level LCP with a flipped
  //      pose, so the target must not depend on overlap_est alone);
  //   2. stagnation: no LCP improvement for max(8 s, budget/8).
  (void)overlap_est;
  double max_lcp = 0;
  for (size_t i = 0; i < S.size(); i += step) max_lcp += 1.0;
  double lcp_target = 0.95 * max_lcp;
  double stagnation_s = std::max(8.0, time_budget_s / 8.0);
  double t_improve = 0.0;

  while (elapsed() < time_budget_s) {
    if (best_lcp >= lcp_target) break;
    if (best_lcp > 0 && elapsed() - t_improve > stagnation_s) break;
    // pick a wide coplanar-ish base a,b,c,d
    int ia = pick(*rng), ib = pick(*rng), ic = pick(*rng);
    if (ia == ib || ib == ic || ia == ic) continue;
    Vec3 a = S[ia], b = S[ib], c = S[ic];
    // d: intersection point e = a + r1*(b-a); choose d near the plane
    int id = pick(*rng);
    Vec3 d = S[id];
    Vec3 n1 = cross(sub(b, a), sub(c, a));
    if (norm(n1) < 1e-9) continue;
    n1 = normalized(n1);
    if (std::fabs(dot(sub(d, a), n1)) > delta * 2) continue;  // not coplanar
    // invariants: e = intersection of (a,b) and (c,d)
    // solve for r1, r2 minimizing distance between segments
    Vec3 u = sub(b, a), v = sub(d, c), w0 = sub(a, c);
    double A = dot(u, u), Bc = dot(u, v), C = dot(v, v);
    double D = dot(u, w0), E = dot(v, w0);
    double den = A * C - Bc * Bc;
    if (std::fabs(den) < 1e-12) continue;
    double r1 = (Bc * E - C * D) / den;
    double r2 = (A * E - Bc * D) / den;
    if (r1 < 0.05 || r1 > 0.95 || r2 < 0.05 || r2 > 0.95) continue;
    double d_ab = norm(u), d_cd = norm(v);

    // find target pairs with matching lengths
    std::vector<std::pair<int, int>> pairs_ab, pairs_cd;
    int max_pairs = 800;
    std::uniform_int_distribution<int> qpick(0, (int)Q.size() - 1);
    for (int trial = 0;
         trial < 8000 &&
         ((int)pairs_ab.size() < max_pairs ||
          (int)pairs_cd.size() < max_pairs);
         ++trial) {
      int i = qpick(*rng), j = qpick(*rng);
      if (i == j) continue;
      double l = norm(sub(Q[j], Q[i]));
      if (std::fabs(l - d_ab) < delta && (int)pairs_ab.size() < max_pairs)
        pairs_ab.push_back({i, j});
      if (std::fabs(l - d_cd) < delta && (int)pairs_cd.size() < max_pairs)
        pairs_cd.push_back({i, j});
    }
    if (pairs_ab.empty() || pairs_cd.empty()) continue;

    // hash intermediate points e1 = qi + r1*(qj-qi) of ab-pairs
    GridNN enn;
    std::vector<Vec3> e1s(pairs_ab.size());
    for (size_t k = 0; k < pairs_ab.size(); ++k)
      e1s[k] = add(Q[pairs_ab[k].first],
                   scale(sub(Q[pairs_ab[k].second], Q[pairs_ab[k].first]),
                         r1));
    enn.build(e1s, std::max(delta, 1e-3));
    for (size_t k2 = 0; k2 < pairs_cd.size(); ++k2) {
      Vec3 e2 = add(Q[pairs_cd[k2].first],
                    scale(sub(Q[pairs_cd[k2].second], Q[pairs_cd[k2].first]),
                          r2));
      int k1 = enn.nearest(e2, delta);
      if (k1 < 0) continue;
      std::vector<Vec3> ps{a, b, c, d};
      std::vector<Vec3> qs{Q[pairs_ab[k1].first], Q[pairs_ab[k1].second],
                           Q[pairs_cd[k2].first], Q[pairs_cd[k2].second]};
      Mat4 T = rigid_align(ps, qs);
      double sc = lcp_score(T);
      if (sc > best_lcp) {
        best_lcp = sc;
        best = T;
        t_improve = elapsed();
      }
      if (elapsed() > time_budget_s) break;
    }
  }
  return best;
}

void copy_out(const Mat4& T, double* out) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) out[4 * i + j] = T.m[i][j];
}

std::vector<Vec3> to_vec(const double* p, int n) {
  std::vector<Vec3> out(n);
  for (int i = 0; i < n; ++i) out[i] = {p[3 * i], p[3 * i + 1],
                                        p[3 * i + 2]};
  return out;
}

}  // namespace

extern "C" {

// All functions write a row-major 4x4 into out_T (src -> tgt frame).

void rp_global_registration(const double* src, int ns, const double* tgt,
                            int nt, double voxel, int max_iters,
                            uint64_t seed, double* out_T) {
  Cloud s, t;
  preprocess(src, nullptr, ns, voxel, &s);
  preprocess(tgt, nullptr, nt, voxel, &t);
  std::mt19937 rng((unsigned)seed);
  Mat4 T = ransac_registration(s, t, voxel, max_iters, &rng);
  copy_out(T, out_T);
}

void rp_fast_global_registration(const double* src, int ns,
                                 const double* tgt, int nt, double voxel,
                                 double* out_T) {
  Cloud s, t;
  preprocess(src, nullptr, ns, voxel, &s);
  preprocess(tgt, nullptr, nt, voxel, &t);
  Mat4 T = fast_global_registration(s, t, voxel);
  copy_out(T, out_T);
}

void rp_colored_registration(const double* src, const double* src_col,
                             int ns, const double* tgt,
                             const double* tgt_col, int nt, double voxel,
                             uint64_t seed, double* out_T) {
  // RANSAC init at `voxel`, then colored ICP at 3 scales
  // (baselines.py:110-168: radius [0.04, 0.02, 0.01], iters [50, 30, 14]).
  Cloud s0, t0;
  preprocess(src, src_col, ns, voxel, &s0);
  preprocess(tgt, tgt_col, nt, voxel, &t0);
  std::mt19937 rng((unsigned)seed);
  Mat4 T = ransac_registration(s0, t0, voxel, 40000, &rng);
  const double radii[3] = {0.04, 0.02, 0.01};
  const int iters[3] = {50, 30, 14};
  for (int lvl = 0; lvl < 3; ++lvl) {
    Cloud s, t;
    preprocess(src, src_col, ns, radii[lvl], &s);
    preprocess(tgt, tgt_col, nt, radii[lvl], &t);
    T = icp_point_to_plane(s, t, radii[lvl] * 2.0, T, iters[lvl], 0.5);
  }
  copy_out(T, out_T);
}

void rp_super4pcs(const double* src, int ns, const double* tgt, int nt,
                  double overlap, double delta, double time_budget_s,
                  int n_sample, uint64_t seed, double* out_T) {
  std::mt19937 rng((unsigned)seed);
  Mat4 T = four_pcs(to_vec(src, ns), to_vec(tgt, nt), delta, time_budget_s,
                    n_sample, &rng, overlap);
  copy_out(T, out_T);
}

void rp_icp_point_to_plane(const double* src, int ns, const double* tgt,
                           int nt, double voxel, double max_dist, int iters,
                           const double* init_T, double* out_T) {
  Cloud s, t;
  preprocess(src, nullptr, ns, voxel, &s);
  preprocess(tgt, nullptr, nt, voxel, &t);
  Mat4 T = Mat4::identity();
  if (init_T)
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j) T.m[i][j] = init_T[4 * i + j];
  T = icp_point_to_plane(s, t, max_dist, T, iters, 0.0);
  copy_out(T, out_T);
}

// utility exports for tests
int rp_voxel_downsample(const double* pts, int n, double voxel,
                        double* out_pts, int max_out) {
  std::vector<Vec3> p = to_vec(pts, n), out;
  voxel_downsample(p, nullptr, voxel, &out, nullptr);
  int m = std::min((int)out.size(), max_out);
  for (int i = 0; i < m; ++i)
    for (int k = 0; k < 3; ++k) out_pts[3 * i + k] = out[i][k];
  return (int)out.size();
}

void rp_estimate_normals(const double* pts, int n, double radius,
                         double* out_normals) {
  std::vector<Vec3> p = to_vec(pts, n), nr;
  estimate_normals(p, radius, &nr);
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) out_normals[3 * i + k] = nr[i][k];
}

// Overlap statistics between two scans under the GT relative pose —
// host-native equivalent of core/overlap.py::point_cloud_overlap
// (util.py:21-40 semantics).  The classical-baseline eval loop calls this
// instead of the O(N^2) chunked-matmul path: the scannet full-frame scans
// are ~300k points, which the GridNN makes O(N) on the host.
// out5 = {overlap, cam_dist, pc_dist, pc_nn_mean, unused}.
void rp_overlap_stats(const double* src, int ns, const double* tgt, int nt,
                      const double* T_rowmajor, double thresh,
                      double* out5) {
  std::vector<Vec3> s = to_vec(src, ns), t = to_vec(tgt, nt);
  Mat4 T;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) T.m[i][j] = T_rowmajor[4 * i + j];
  std::vector<Vec3> s_in_t(s.size());
  for (size_t i = 0; i < s.size(); ++i) s_in_t[i] = xform(T, s[i]);

  GridNN snn, tnn;
  // cell = thresh gives <= 3^3 cells per query at radius thresh
  tnn.build(t, thresh);
  snn.build(s_in_t, thresh);

  double big = 1e30;
  int hit_s = 0;
  double min_s = big;
  for (size_t i = 0; i < s_in_t.size(); ++i) {
    double d2;
    if (tnn.nearest(s_in_t[i], thresh, &d2) >= 0) {
      ++hit_s;
      min_s = std::min(min_s, d2);
    }
  }
  int hit_t = 0;
  double min_t = big;
  for (size_t i = 0; i < t.size(); ++i) {
    double d2;
    if (snn.nearest(t[i], thresh, &d2) >= 0) {
      ++hit_t;
      min_t = std::min(min_t, d2);
    }
  }
  // pc_nn: the jax path reports the true global min NN distance (not
  // radius-clamped); within-radius min matches when any hit exists, and
  // the stat is only used for reporting.  Clamp misses to thresh.
  double nn_s = std::sqrt(std::min(min_s, thresh * thresh));
  double nn_t = std::sqrt(std::min(min_t, thresh * thresh));

  Vec3 mean_s = {0, 0, 0}, mean_t = {0, 0, 0};
  for (auto& p : s_in_t) mean_s = add(mean_s, p);
  for (auto& p : t) mean_t = add(mean_t, p);
  if (!s_in_t.empty()) mean_s = scale(mean_s, 1.0 / s_in_t.size());
  if (!t.empty()) mean_t = scale(mean_t, 1.0 / t.size());

  double ov_s = s.empty() ? 0.0 : (double)hit_s / (double)s.size();
  double ov_t = t.empty() ? 0.0 : (double)hit_t / (double)t.size();
  Vec3 tvec = {T.m[0][3], T.m[1][3], T.m[2][3]};
  Vec3 dmean = sub(mean_s, mean_t);
  out5[0] = std::max(ov_s, ov_t);
  out5[1] = std::sqrt(dot(tvec, tvec));
  out5[2] = std::sqrt(dot(dmean, dmean));
  out5[3] = 0.5 * (nn_s + nn_t);
  out5[4] = 0.0;
}

void rp_fpfh(const double* pts, int n, double normal_radius,
             double feat_radius, float* out_feats) {
  std::vector<Vec3> p = to_vec(pts, n), nr;
  estimate_normals(p, normal_radius, &nr);
  std::vector<std::array<float, 33>> f;
  compute_fpfh(p, nr, feat_radius, &f);
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < 33; ++k) out_feats[33 * i + k] = f[i][k];
}

}  // extern "C"
