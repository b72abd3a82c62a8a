"""Training-time augmentations on range-image frames.

The reference defines (but ships disabled) RandomWorldFlip / RandomRotation
and a ped-pasting AugParam block (config/rangedet/...:223-239,351-352 —
commented out of every shipped transform list). We provide the two geometric
augmentations as host-side numpy ops on the raw frame dict (before
normalization/stacking); both remap the range image columns so the projective
structure stays consistent.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def world_flip(frame: Dict[str, np.ndarray], rng: np.random.RandomState,
               prob: float = 0.5) -> Dict[str, np.ndarray]:
    """Mirror the world across the x-z plane (y -> -y).

    In the range image this is a left-right column flip (azimuth -> -azimuth);
    GT boxes flip cy and yaw.
    """
    if rng.uniform() >= prob:
        return frame
    out = dict(frame)
    for k in ("range_value", "intensity", "elongation", "mask", "inclination"):
        if k in out:
            out[k] = out[k][:, ::-1].copy()
    pc = frame["pc"][:, ::-1].copy()
    pc[..., 1] = -pc[..., 1]
    out["pc"] = pc
    out["azimuth"] = np.arctan2(pc[..., 1], pc[..., 0]).astype(np.float32)
    gt = frame["gt_csa"].copy()
    gt[:, 1] = -gt[:, 1]
    gt[:, 6] = -gt[:, 6]
    out["gt_csa"] = gt
    return out


def world_rotation(frame: Dict[str, np.ndarray], rng: np.random.RandomState,
                   interval=(-np.pi / 4, np.pi / 4)) -> Dict[str, np.ndarray]:
    """Rotate the world about z by a random angle.

    A z-rotation is a *circular column shift* of the range image (azimuth
    offset), so all image-space channels roll; points and boxes rotate.
    """
    theta = float(rng.uniform(*interval))
    W = frame["mask"].shape[1]
    shift = int(round(theta / (2 * np.pi) * W))
    theta = shift * 2 * np.pi / W  # quantize so image and geometry agree

    out = dict(frame)
    # columns scan azimuth from +pi to -pi: +theta rotation shifts right
    for k in ("range_value", "intensity", "elongation", "mask", "inclination"):
        if k in out:
            out[k] = np.roll(out[k], shift, axis=1)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    pc = np.roll(frame["pc"], shift, axis=1) @ rot.T
    out["pc"] = pc.astype(np.float32)
    out["azimuth"] = np.arctan2(pc[..., 1], pc[..., 0]).astype(np.float32)
    gt = frame["gt_csa"].copy()
    gt[:, :3] = gt[:, :3] @ rot.T
    gt[:, 6] = gt[:, 6] + theta
    out["gt_csa"] = gt
    return out
