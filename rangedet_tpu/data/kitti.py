"""KITTI range-image construction + calibration.

Rebuilds the reference's offline KITTI path
(datasets/create_range_image_in_kitti.py, datasets/kitti_utils/
calibration_kitti.py) as vectorized numpy:

  * 64×2048 range image from a velodyne scan by nearest-inclination row +
    azimuth column scatter, far-to-near ordering so near points win;
  * per-laser height/zenith tables (physical HDL-64E sensor constants the
    reference measured via Hough transform — data, not code);
  * KITTI calib parsing and camera-frame→lidar-frame box conversion.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# HDL-64E per-laser mount heights and zenith angles (Hough-fitted sensor
# constants; reference create_range_image_in_kitti.py:211-240)
KITTI_LASER_HEIGHT = np.array([
    0.20966667, 0.2092, 0.2078, 0.2078, 0.2078,
    0.20733333, 0.20593333, 0.20546667, 0.20593333, 0.20546667,
    0.20453333, 0.205, 0.2036, 0.20406667, 0.2036,
    0.20313333, 0.20266667, 0.20266667, 0.20173333, 0.2008,
    0.2008, 0.2008, 0.20033333, 0.1994, 0.20033333,
    0.19986667, 0.1994, 0.1994, 0.19893333, 0.19846667,
    0.19846667, 0.19846667, 0.12566667, 0.1252, 0.1252,
    0.12473333, 0.12473333, 0.1238, 0.12333333, 0.1238,
    0.12286667, 0.1224, 0.12286667, 0.12146667, 0.12146667,
    0.121, 0.12053333, 0.12053333, 0.12053333, 0.12006667,
    0.12006667, 0.1196, 0.11913333, 0.11866667, 0.1182,
    0.1182, 0.1182, 0.11773333, 0.11726667, 0.11726667,
    0.1168, 0.11633333, 0.11633333, 0.1154,
], dtype=np.float32)

KITTI_LASER_ZENITH = np.array([
    0.03373091, 0.02740409, 0.02276443, 0.01517224, 0.01004049,
    0.00308099, -0.00155868, -0.00788549, -0.01407172, -0.02103122,
    -0.02609267, -0.032068, -0.03853542, -0.04451074, -0.05020488,
    -0.0565317, -0.06180405, -0.06876355, -0.07361411, -0.08008152,
    -0.08577566, -0.09168069, -0.09793721, -0.10398284, -0.11052055,
    -0.11656618, -0.12219002, -0.12725147, -0.13407038, -0.14067839,
    -0.14510716, -0.15213696, -0.1575499, -0.16711043, -0.17568678,
    -0.18278688, -0.19129293, -0.20247031, -0.21146846, -0.21934183,
    -0.22763699, -0.23536977, -0.24528179, -0.25477201, -0.26510582,
    -0.27326038, -0.28232882, -0.28893683, -0.30004392, -0.30953414,
    -0.31993824, -0.32816311, -0.33723155, -0.34447224, -0.352908,
    -0.36282001, -0.37216965, -0.38292524, -0.39164219, -0.39895318,
    -0.40703745, -0.41835542, -0.42777535, -0.43621111,
], dtype=np.float32)

KITTI_INCLINATION = -KITTI_LASER_ZENITH  # reference :240

KITTI_WIDTH = 2048
KITTI_HEIGHT = 64

KITTI_NAME_TO_CLS = {"Car": 1, "Pedestrian": 2, "Cyclist": 4}


def build_range_image(
    pc: np.ndarray,
    width: int = KITTI_WIDTH,
    inclination: np.ndarray = KITTI_INCLINATION,
    height_table: np.ndarray = KITTI_LASER_HEIGHT,
) -> np.ndarray:
    """Velodyne scan (N, 4+) [x, y, z, intensity, ...] -> (64, W, 5)
    [range, x, y, z, intensity]; unobserved pixels are -1.

    Vectorized equivalent of get_range_image
    (create_range_image_in_kitti.py:107-137): row = nearest laser by elevation
    angle relative to each laser's mount height; col from azimuth; scatter in
    far-to-near order so the nearest return wins each pixel.
    """
    pc = np.asarray(pc, np.float32)
    xy_norm = np.linalg.norm(pc[:, :2], axis=1)
    # (N, 64) elevation error against every laser
    elev = np.arctan2(height_table[None, :] - pc[:, 2:3], xy_norm[:, None])
    row_inds = np.argmin(np.abs(inclination[None, :] - elev), axis=1)

    azi = np.arctan2(pc[:, 1], pc[:, 0])
    col_inds = width - 1.0 + 0.5 - (azi + np.pi) / (2.0 * np.pi) * width
    col_inds = np.round(col_inds).astype(np.int32)
    col_inds = np.clip(col_inds, 0, width - 1)

    point_range = np.linalg.norm(pc[:, :3], axis=1)
    order = np.argsort(-point_range)  # far first; near overwrites

    image = np.full((len(inclination), width, 5), -1.0, np.float32)
    vals = np.concatenate([point_range[:, None], pc[:, :4]], axis=1)[order]
    image[row_inds[order], col_inds[order], :] = vals
    return image


class Calibration:
    """Minimal KITTI calib (P2 / R0_rect / Tr_velo_to_cam) with the standard
    rect<->lidar transforms (reference kitti_utils/calibration_kitti.py)."""

    def __init__(self, calib_file: str):
        data: Dict[str, np.ndarray] = {}
        with open(calib_file) as f:
            for line in f:
                if ":" not in line:
                    continue
                key, vals = line.split(":", 1)
                try:
                    data[key.strip()] = np.array(
                        [float(v) for v in vals.split()], np.float32
                    )
                except ValueError:
                    continue
        self.P2 = data["P2"].reshape(3, 4)
        self.R0 = data["R0_rect"].reshape(3, 3)
        self.V2C = data["Tr_velo_to_cam"].reshape(3, 4)

    def rect_to_lidar(self, pts_rect: np.ndarray) -> np.ndarray:
        """(N, 3) rect-camera frame -> lidar frame."""
        pts_ref = pts_rect @ np.linalg.inv(self.R0).T
        # invert [R|t]: x_ref = R x_lidar + t  =>  x_lidar = R^T (x_ref - t)
        R, t = self.V2C[:, :3], self.V2C[:, 3]
        return (pts_ref - t) @ R

    def lidar_to_rect(self, pts_lidar: np.ndarray) -> np.ndarray:
        ref = pts_lidar @ self.V2C[:, :3].T + self.V2C[:, 3]
        return ref @ self.R0.T


def boxes_camera_to_lidar_csa(boxes_cam: np.ndarray, calib: Calibration) -> np.ndarray:
    """KITTI camera-frame boxes [x, y, z, l, h, w, ry] (bottom-center) ->
    lidar-frame csa7 [cx, cy, cz(center), l, w, h, yaw]."""
    boxes_cam = np.asarray(boxes_cam, np.float32).reshape(-1, 7)
    xyz_cam = boxes_cam[:, :3]
    l, h, w = boxes_cam[:, 3], boxes_cam[:, 4], boxes_cam[:, 5]
    ry = boxes_cam[:, 6]
    xyz = calib.rect_to_lidar(xyz_cam)
    xyz[:, 2] += h / 2.0  # bottom center -> geometric center
    yaw = -(ry + np.pi / 2.0)
    return np.stack([xyz[:, 0], xyz[:, 1], xyz[:, 2], l, w, h, yaw], axis=1)


def points_in_boxes_csa(pc: np.ndarray, csa: np.ndarray) -> np.ndarray:
    """Host-side points-per-box count for roidb metadata (the reference's
    builder stores num_lidar_points_in_box per label;
    create_range_image_roidb.py:180-186 keeps it for difficulty rules).

    pc (N, 3) lidar frame; csa (M, 7) [cx, cy, cz, l, w, h, yaw] -> (M,)
    counts, boundary-inclusive (matches ops/assigner.py semantics).
    """
    pc = np.asarray(pc, np.float32).reshape(-1, 3)
    csa = np.asarray(csa, np.float32).reshape(-1, 7)
    if len(csa) == 0:
        return np.zeros((0,), np.float32)
    d = pc[None, :, :] - csa[:, None, :3]  # (M, N, 3)
    c, s = np.cos(csa[:, 6]), np.sin(csa[:, 6])
    lx = d[..., 0] * c[:, None] + d[..., 1] * s[:, None]
    ly = -d[..., 0] * s[:, None] + d[..., 1] * c[:, None]
    inside = (
        (np.abs(lx) <= csa[:, 3:4] / 2)
        & (np.abs(ly) <= csa[:, 4:5] / 2)
        & (np.abs(d[..., 2]) <= csa[:, 5:6] / 2)
    )
    return inside.sum(axis=1).astype(np.float32)


def kitti_frame_to_inputs(
    velodyne: np.ndarray,
    pad_field,
    max_gt: int,
    gt_csa: Optional[np.ndarray] = None,
    gt_class: Optional[np.ndarray] = None,
    width: int = KITTI_WIDTH,
) -> Dict[str, np.ndarray]:
    """Raw KITTI scan -> the framework's padded batch-entry dict.

    KITTI has no elongation channel; it is zero-filled (the whitening then
    yields a constant, which the first conv absorbs).
    """
    from .normalization import CHANNELS, clip_and_norm

    image = build_range_image(velodyne, width=width)
    H, W = image.shape[:2]
    mask = (image[..., 0] > -1).astype(np.float32)
    rng_v = np.where(mask > 0, image[..., 0], 0.0)
    pc = np.where(mask[..., None] > 0, image[..., 1:4], 0.0)
    intensity = np.where(mask > 0, image[..., 4], 0.0)

    raw = {
        "range_value": rng_v,
        "intensity": intensity,
        "elongation": np.zeros_like(rng_v),
        "x": pc[..., 0],
        "y": pc[..., 1],
        "z": pc[..., 2],
        "inclination": np.broadcast_to(KITTI_INCLINATION[:, None], (H, W)).astype(
            np.float32
        ),
        "azimuth": np.arctan2(pc[..., 1], pc[..., 0]).astype(np.float32),
    }
    chans = [clip_and_norm(n, raw[n]) for n in CHANNELS]
    input_data = np.stack(chans, axis=-1).astype(np.float32)
    coord = input_data[..., 3:6].copy()

    Hp, Wp = pad_field

    def pad(a):
        out = np.zeros((Hp, Wp) + a.shape[2:], np.float32)
        out[:H, : min(W, Wp)] = a[:, : min(W, Wp)]
        return out

    out_csa = np.zeros((max_gt, 7), np.float32)
    out_cls = np.zeros((max_gt,), np.float32)
    out_valid = np.zeros((max_gt,), np.float32)
    if gt_csa is not None and len(gt_csa):
        n = min(len(gt_csa), max_gt)
        out_csa[:n] = gt_csa[:n]
        out_cls[:n] = gt_class[:n]
        out_valid[:n] = 1.0

    return dict(
        input_data=pad(input_data),
        coord=pad(coord),
        pc=pad(pc),
        mask=pad(mask[..., None]),
        unnorm_range=pad((rng_v * mask)[..., None]),
        gt_csa=out_csa,
        gt_class=out_cls,
        gt_valid=out_valid,
    )
