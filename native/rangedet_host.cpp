// rangedet_tpu native host library.
//
// C++ twins of the host-side ops the reference ships as its pybind11
// processing_cxx lib (operator_cxx/src_cxx/{assigner.h,nms.h}): point-in-box
// assignment, per-box point counts, and weighted NMS. The TPU training/eval
// paths run these on device (rangedet_tpu/ops/*); this library serves
// host-side pipelines (offline dataset builders, CPU-only preprocessing at
// scale) and acts as an independent cross-check oracle for the device ops.
//
// Fresh implementation of the classical algorithms (convex polygon clip via
// candidate-vertex collection + angular sort); exposed through a plain C ABI
// for ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kEps = 1e-8f;

struct Pt {
  float x, y;
};

inline float cross(const Pt &o, const Pt &a, const Pt &b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

inline float polygon_area_abs(const Pt *p, int n) {
  float s = 0.f;
  for (int i = 0; i < n; ++i) {
    int j = (i + 1) % n;
    s += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return std::fabs(s) * 0.5f;
}

// segment p0-p1 vs q0-q1 intersection (inclusive endpoints)
bool seg_intersect(const Pt &p0, const Pt &p1, const Pt &q0, const Pt &q1,
                   Pt *out) {
  const float a1 = p1.y - p0.y, b1 = p0.x - p1.x;
  const float c1 = a1 * p0.x + b1 * p0.y;
  const float a2 = q1.y - q0.y, b2 = q0.x - q1.x;
  const float c2 = a2 * q0.x + b2 * q0.y;
  const float det = a1 * b2 - a2 * b1;
  if (std::fabs(det) <= kEps) return false;
  const float x = (b2 * c1 - b1 * c2) / det;
  const float y = (a1 * c2 - a2 * c1) / det;
  auto on = [&](const Pt &s0, const Pt &s1) {
    return std::min(s0.x, s1.x) <= x + kEps && std::max(s0.x, s1.x) >= x - kEps &&
           std::min(s0.y, s1.y) <= y + kEps && std::max(s0.y, s1.y) >= y - kEps;
  };
  if (!on(p0, p1) || !on(q0, q1)) return false;
  out->x = x;
  out->y = y;
  return true;
}

// boundary-inclusive convex-quad containment (matches ops/rotated_iou.py)
bool in_quad(const Pt *quad, const Pt &p) {
  bool any_pos = false, any_neg = false;
  for (int i = 0; i < 4; ++i) {
    const float c = cross(quad[i], quad[(i + 1) % 4], p);
    any_pos |= c > kEps;
    any_neg |= c < -kEps;
  }
  return !(any_pos && any_neg);
}

float quad_intersection_area(const Pt *a, const Pt *b) {
  Pt cand[24];
  int n = 0;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      Pt r;
      if (seg_intersect(a[i], a[(i + 1) % 4], b[j], b[(j + 1) % 4], &r))
        cand[n++] = r;
    }
  for (int k = 0; k < 4; ++k) {
    if (in_quad(a, b[k])) cand[n++] = b[k];
    if (in_quad(b, a[k])) cand[n++] = a[k];
  }
  if (n < 3) return 0.f;
  Pt c{0.f, 0.f};
  for (int i = 0; i < n; ++i) {
    c.x += cand[i].x;
    c.y += cand[i].y;
  }
  c.x /= n;
  c.y /= n;
  std::sort(cand, cand + n, [&](const Pt &u, const Pt &v) {
    return std::atan2(u.y - c.y, u.x - c.x) < std::atan2(v.y - c.y, v.x - c.x);
  });
  float area = 0.f;
  for (int k = 1; k + 1 < n; ++k)
    area += cross(cand[0], cand[k], cand[k + 1]);
  return std::fabs(area) * 0.5f;
}

float iou_bev(const float *ca, const float *cb) {
  Pt a[4], b[4];
  for (int i = 0; i < 4; ++i) {
    a[i] = {ca[2 * i], ca[2 * i + 1]};
    b[i] = {cb[2 * i], cb[2 * i + 1]};
  }
  const float sa = polygon_area_abs(a, 4);
  const float sb = polygon_area_abs(b, 4);
  if (sa < kEps || sb < kEps) return 0.f;
  const float inter = quad_intersection_area(a, b);
  return inter / std::max(sa + sb - inter, kEps);
}

float iou_det(const float *da, const float *db, bool use_3d) {
  const float bev = iou_bev(da, db);
  if (!use_3d) return bev;
  Pt a[4], b[4];
  for (int i = 0; i < 4; ++i) {
    a[i] = {da[2 * i], da[2 * i + 1]};
    b[i] = {db[2 * i], db[2 * i + 1]};
  }
  const float sa = polygon_area_abs(a, 4), sb = polygon_area_abs(b, 4);
  const float inter_bev = bev * (sa + sb) / (1.f + bev);
  const float z_ov = std::max(
      0.f, std::min(da[9] + da[10], db[9] + db[10]) - std::max(da[9], db[9]));
  const float inter = inter_bev * z_ov;
  const float uni = sa * da[10] + sb * db[10] - inter;
  return inter / std::max(uni, kEps);
}

}  // namespace

extern "C" {

// Point-in-box assignment. pc: (n_pts, 3); corners8: (n_box, 8, 3) bottom 4
// then top 4; mask: (n_pts,). out_idx: (n_pts,) first containing box or -1.
void rd_assign_points(const float *pc, int64_t n_pts, const float *corners8,
                      int64_t n_box, const float *mask, float radius_sq,
                      float max_dist_sq, int32_t *out_idx) {
  if (n_box == 0) {
    std::fill(out_idx, out_idx + n_pts, -1);
    return;
  }
  std::vector<float> cx(n_box), cy(n_box), cz(n_box);
  float min_x = 1e30f, max_x = -1e30f, min_y = 1e30f, max_y = -1e30f,
        min_z = 1e30f, max_z = -1e30f;
  for (int64_t j = 0; j < n_box; ++j) {
    float sx = 0, sy = 0, sz = 0;
    for (int k = 0; k < 8; ++k) {
      const float *c = corners8 + (j * 8 + k) * 3;
      sx += c[0];
      sy += c[1];
      sz += c[2];
      min_x = std::min(min_x, c[0]);
      max_x = std::max(max_x, c[0]);
      min_y = std::min(min_y, c[1]);
      max_y = std::max(max_y, c[1]);
      min_z = std::min(min_z, c[2]);
      max_z = std::max(max_z, c[2]);
    }
    cx[j] = sx / 8;
    cy[j] = sy / 8;
    cz[j] = sz / 8;
  }
  for (int64_t i = 0; i < n_pts; ++i) {
    out_idx[i] = -1;
    if (mask[i] < 0.5f) continue;
    const float px = pc[i * 3], py = pc[i * 3 + 1], pz = pc[i * 3 + 2];
    if (px < min_x || px > max_x || py < min_y || py > max_y || pz < min_z ||
        pz > max_z)
      continue;
    float best = 1e30f;
    for (int64_t j = 0; j < n_box; ++j) {
      const float dx = px - cx[j], dy = py - cy[j], dz = pz - cz[j];
      best = std::min(best, dx * dx + dy * dy + dz * dz);
    }
    if (best > max_dist_sq) continue;
    for (int64_t j = 0; j < n_box; ++j) {
      const float dx = px - cx[j], dy = py - cy[j], dz = pz - cz[j];
      if (dx * dx + dy * dy + dz * dz > radius_sq) continue;
      const float *A = corners8 + (j * 8 + 0) * 3;
      const float *B = corners8 + (j * 8 + 1) * 3;
      const float *C = corners8 + (j * 8 + 2) * 3;
      const float *D = corners8 + (j * 8 + 3) * 3;
      const float *E = corners8 + (j * 8 + 4) * 3;
      if (pz <= A[2] || pz >= E[2]) continue;
      const float bpx = px - B[0], bpy = py - B[1];
      if ((A[0] - B[0]) * bpx + (A[1] - B[1]) * bpy <= 0) continue;
      if ((C[0] - B[0]) * bpx + (C[1] - B[1]) * bpy <= 0) continue;
      const float dpx = px - D[0], dpy = py - D[1];
      if ((A[0] - D[0]) * dpx + (A[1] - D[1]) * dpy <= 0) continue;
      if ((C[0] - D[0]) * dpx + (C[1] - D[1]) * dpy <= 0) continue;
      out_idx[i] = static_cast<int32_t>(j);
      break;
    }
  }
}

// Per-box point counts from an assignment vector.
void rd_points_per_box(const int32_t *idx, int64_t n_pts, int64_t n_box,
                       float *counts) {
  std::fill(counts, counts + n_box, 0.f);
  for (int64_t i = 0; i < n_pts; ++i)
    if (idx[i] >= 0 && idx[i] < n_box) counts[idx[i]] += 1.f;
}

// Weighted NMS. dets12: (n, 12) rows [8 corners, yaw, bottom, height, score]
// in any order. Writes up to max_keep 12-dim rows [weighted 11-dim geometry,
// survivor score] and their input indices; returns the kept count.
int32_t rd_weighted_nms(const float *dets12, int64_t n, float thresh,
                        float thresh_vote, int32_t use_3d, int32_t max_keep,
                        float *out12, int32_t *out_inds) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return dets12[a * 12 + 11] > dets12[b * 12 + 11];
  });
  std::vector<char> suppressed(n, 0);
  std::vector<int64_t> voters;
  std::vector<float> voter_yaw;
  int32_t kept = 0;
  for (int64_t oi = 0; oi < n && kept < max_keep; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    const float *di = dets12 + i * 12;
    voters.clear();
    voters.push_back(i);
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float ov = iou_det(di, dets12 + j * 12, use_3d != 0);
      if (ov >= thresh) suppressed[j] = 1;
      if (ov > thresh_vote) voters.push_back(j);
    }
    // median yaw with the even-count tie-break (insert survivor's yaw)
    const float yaw_i = di[8];
    float median = yaw_i;
    if (voters.size() > 2) {
      voter_yaw.clear();
      for (int64_t v : voters) voter_yaw.push_back(dets12[v * 12 + 8]);
      if (voter_yaw.size() % 2 == 0) voter_yaw.push_back(yaw_i);
      std::sort(voter_yaw.begin(), voter_yaw.end());
      median = voter_yaw[voter_yaw.size() / 2];
    }
    float sum[11] = {0};
    float wsum = 0.f;
    for (int64_t v : voters) {
      const float *dv = dets12 + v * 12;
      if (std::fmod(std::fabs(dv[8] - median), 6.2831852f) >= 0.3f) continue;
      const float w = dv[11];
      for (int k = 0; k < 11; ++k) sum[k] += w * dv[k];
      wsum += w;
    }
    wsum = std::max(wsum, 1e-12f);
    for (int k = 0; k < 11; ++k) out12[kept * 12 + k] = sum[k] / wsum;
    out12[kept * 12 + 11] = di[11];
    out_inds[kept] = static_cast<int32_t>(i);
    suppressed[i] = 1;
    ++kept;
  }
  return kept;
}

// All-pairs BEV IoU matrix of 4-corner quads: a (n,8), b (m,8) -> out (n,m).
void rd_iou_bev_matrix(const float *a, int64_t n, const float *b, int64_t m,
                       float *out) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < m; ++j) out[i * m + j] = iou_bev(a + i * 8, b + j * 8);
}

}  // extern "C"
