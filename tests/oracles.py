"""Numpy oracles: direct, readable transcriptions of the reference algorithms'
*semantics* (CUDA rotated IoU, C++ assigner, C++ weighted NMS, decode), used to
validate the vectorized jnp implementations. Sequential and slow on purpose.
"""
import numpy as np

EPS = 1e-8


# ----------------------------------------------------------------------------
# rotated IoU oracle (reference: operator_cxx/contrib/rotated_iou-inl.h:388-493)
# ----------------------------------------------------------------------------
def _seg_intersection(p0, p1, q0, q1):
    A1 = p1[1] - p0[1]
    B1 = p0[0] - p1[0]
    C1 = A1 * p0[0] + B1 * p0[1]
    A2 = q1[1] - q0[1]
    B2 = q0[0] - q1[0]
    C2 = A2 * q0[0] + B2 * q0[1]
    det = A1 * B2 - A2 * B1
    if abs(det) <= EPS:
        return None
    x = (B2 * C1 - B1 * C2) / det
    y = (A1 * C2 - A2 * C1) / det

    def on(x, y, s0, s1):
        return (
            min(s0[0], s1[0]) <= x + EPS
            and max(s0[0], s1[0]) >= x - EPS
            and min(s0[1], s1[1]) <= y + EPS
            and max(s0[1], s1[1]) >= y - EPS
        )

    if on(x, y, p0, p1) and on(x, y, q0, q1):
        return np.array([x, y])
    return None


def _in_quad(quad, p):
    flag = None
    for i in range(4):
        j = (i + 1) % 4
        pos = (quad[j, 0] - quad[i, 0]) * (p[1] - quad[i, 1]) - (
            quad[j, 1] - quad[i, 1]
        ) * (p[0] - quad[i, 0])
        s = pos >= 0
        if flag is None:
            flag = s
        elif flag != s:
            return False
    return True


def quad_intersection_area_oracle(a, b):
    pts = []
    for i in range(4):
        for j in range(4):
            r = _seg_intersection(a[i], a[(i + 1) % 4], b[j], b[(j + 1) % 4])
            if r is not None:
                pts.append(r)
    for k in range(4):
        if _in_quad(a, b[k]):
            pts.append(b[k])
        if _in_quad(b, a[k]):
            pts.append(a[k])
    if len(pts) == 0:
        return 0.0
    pts = np.array(pts)
    center = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    pts = pts[np.argsort(ang)]
    area = 0.0
    for k in range(len(pts) - 1):
        area += np.cross(pts[k] - pts[0], pts[k + 1] - pts[0])
    return abs(area) / 2.0


def polygon_area_oracle(c):
    x, y = c[:, 0], c[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def iou_bev_oracle(a, b):
    sa = polygon_area_oracle(a)
    sb = polygon_area_oracle(b)
    if sa < EPS or sb < EPS:
        return 0.0
    inter = quad_intersection_area_oracle(a, b)
    return inter / max(sa + sb - inter, EPS)


# ----------------------------------------------------------------------------
# decode oracle (reference: operator_cxx/contrib/decode_3d_bbox-inl.h:169-277)
# ----------------------------------------------------------------------------
def decode_oracle(delta, pc):
    azim = np.arctan2(pc[1], pc[0])
    dx, dy, log_w, log_l, cy_, sy_, z0, log_h = delta
    dx = dx * abs(dx)
    dy = dy * abs(dy)
    w, l, h = np.exp(log_w), np.exp(log_l), np.exp(log_h)
    ca, sa = np.cos(azim), np.sin(azim)
    dxl = dx * ca - dy * sa
    dyl = dx * sa + dy * ca
    cx, cyc = pc[0] + dxl, pc[1] + dyl
    yaw = np.arctan2(sy_, cy_) + azim
    s, c = np.sin(yaw), np.cos(yaw)
    local = np.array(
        [[0.5 * l, -0.5 * w], [-0.5 * l, -0.5 * w], [-0.5 * l, 0.5 * w], [0.5 * l, 0.5 * w]]
    )
    rot = np.stack(
        [local[:, 0] * c - local[:, 1] * s, local[:, 0] * s + local[:, 1] * c], axis=1
    )
    corners = rot + np.array([cx, cyc])
    return np.concatenate([corners.reshape(-1), [z0, z0 + h]])


# ----------------------------------------------------------------------------
# assigner oracle (reference: operator_cxx/src_cxx/assigner.h:11-87)
# ----------------------------------------------------------------------------
def assign_oracle(pc, corners8, mask, radius_sq=100.0, max_dist_sq=20.0):
    n = pc.shape[0]
    m = corners8.shape[0]
    center = corners8.mean(axis=1)
    A, B, C, D, E = (corners8[:, k] for k in range(5))
    min_xyz = corners8.reshape(-1, 3).min(axis=0)
    max_xyz = corners8.reshape(-1, 3).max(axis=0)
    out = np.full(n, -1, np.int32)
    for i in range(n):
        if mask[i] < 0.5:
            continue
        P = pc[i]
        if (P < min_xyz).any() or (P > max_xyz).any():
            continue
        d2 = ((center - P) ** 2).sum(axis=1)
        if d2.min() > max_dist_sq:
            continue
        for j in range(m):
            if d2[j] > radius_sq:
                continue
            if P[2] <= A[j, 2] or P[2] >= E[j, 2]:
                continue
            BP = P[:2] - B[j, :2]
            if np.dot(A[j, :2] - B[j, :2], BP) <= 0:
                continue
            if np.dot(C[j, :2] - B[j, :2], BP) <= 0:
                continue
            DP = P[:2] - D[j, :2]
            if np.dot(A[j, :2] - D[j, :2], DP) <= 0:
                continue
            if np.dot(C[j, :2] - D[j, :2], DP) <= 0:
                continue
            out[i] = j
            break
    return out


# ----------------------------------------------------------------------------
# weighted NMS oracle (reference: operator_cxx/src_cxx/nms.h:452-577)
# ----------------------------------------------------------------------------
def wnms_oracle(dets12, thresh, thresh_vote):
    """dets12: (N, 12) [8 corners, yaw, bottom, height, score], any order.
    Returns (keep_dets (K, 12), keep_inds list)."""
    n = dets12.shape[0]
    order = np.argsort(-dets12[:, 11], kind="stable")
    suppressed = np.zeros(n, bool)
    yaw = dets12[:, 8]
    scores = dets12[:, 11]
    keep, keep_inds = [], []
    for _i in range(n):
        i = order[_i]
        if suppressed[i]:
            continue
        neigh = [i]
        for _j in range(_i + 1, n):
            j = order[_j]
            if suppressed[j]:
                continue
            a = dets12[i, :8].reshape(4, 2)
            b = dets12[j, :8].reshape(4, 2)
            ovr = iou_bev_oracle(a, b)
            if ovr >= thresh:
                suppressed[j] = True
            if ovr > thresh_vote:
                neigh.append(j)
        ny = [yaw[l] for l in neigh]
        if len(neigh) <= 2:
            median = yaw[i]
        else:
            if len(neigh) % 2 == 0:
                ny.append(yaw[i])
            ny.sort()
            median = ny[len(ny) // 2]
        sum1 = np.zeros(11)
        sum3 = np.zeros(11)
        for l in neigh:
            if np.fmod(abs(yaw[l] - median), 2 * 3.1415926) >= 0.3:
                continue
            p = scores[l]
            sum1 += p * dets12[l, :11]
            sum3 += p
        keep.append(np.concatenate([sum1 / sum3, [scores[i]]]))
        keep_inds.append(i)
        suppressed[i] = True
    return np.array(keep), keep_inds
