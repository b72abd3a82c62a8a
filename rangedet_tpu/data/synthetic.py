"""Synthetic range-image scenes with consistent geometry: lidar-like frames
whose painted "objects" really contain their pixels' 3D points, so the full
assignment → target → loss path behaves like real data. Used by unit tests,
the loss-decrease test, bench.py, and __graft_entry__.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .normalization import CHANNELS, clip_and_norm


def make_frame(
    rng: np.random.RandomState,
    H: int = 64,
    W: int = 2650,
    num_boxes: int = 10,
    class_choices=(1,),
) -> Dict[str, np.ndarray]:
    """One unpadded frame: range_image channels, pc, mask, gt boxes."""
    inclination = np.linspace(0.03, -0.3, H).astype(np.float32)  # top row up
    azimuth = np.linspace(np.pi, -np.pi, W, endpoint=False).astype(np.float32)

    # smooth-ish background range field
    base = rng.uniform(12.0, 70.0, (H, 1)).astype(np.float32)
    wobble = rng.uniform(-2, 2, (H, W)).astype(np.float32)
    rng_img = base + wobble
    mask = (rng.uniform(0, 1, (H, W)) > 0.05).astype(np.float32)

    # paint boxes: each is a rectangular pixel patch at a chosen range
    gt_csa = np.zeros((num_boxes, 7), np.float32)
    gt_class = np.zeros((num_boxes,), np.float32)
    for b in range(num_boxes):
        r = rng.uniform(5.0, 60.0)
        az_c = rng.uniform(-np.pi * 0.9, np.pi * 0.9)
        col = int((np.pi - az_c) / (2 * np.pi) * W) % W
        row = rng.randint(H // 4, 3 * H // 4)
        half_w = max(2, int(120.0 / r))
        half_h = 3
        r0, r1 = max(0, row - half_h), min(H, row + half_h)
        c0, c1 = col - half_w, col + half_w
        cols = np.arange(c0, c1) % W
        rows = np.arange(r0, r1)
        rr = r + rng.uniform(-0.3, 0.3, (len(rows), len(cols))).astype(np.float32)
        rng_img[np.ix_(rows, cols)] = rr
        mask[np.ix_(rows, cols)] = 1.0

        # box parameters chosen to contain all painted points
        incl_c = inclination[rows].mean()
        cx = r * np.cos(incl_c) * np.cos(az_c)
        cy = r * np.cos(incl_c) * np.sin(az_c)
        cz = r * np.sin(incl_c)
        ang_w = half_w * 2 * np.pi / W
        extent_xy = 2 * (r * np.tan(ang_w) + 1.5)
        extent_z = 2 * (
            r * np.tan((inclination[r0] - inclination[r1 - 1]) / 2) + 1.0
        )
        gt_csa[b] = [cx, cy, cz, extent_xy, extent_xy, abs(extent_z) + 1.0,
                     rng.uniform(-np.pi, np.pi)]
        gt_class[b] = rng.choice(class_choices)

    rng_img = np.clip(rng_img, 1.0, 79.0)
    incl_grid = np.broadcast_to(inclination[:, None], (H, W))
    az_grid = np.broadcast_to(azimuth[None, :], (H, W))
    x = rng_img * np.cos(incl_grid) * np.cos(az_grid)
    y = rng_img * np.cos(incl_grid) * np.sin(az_grid)
    z = rng_img * np.sin(incl_grid)
    pc = np.stack([x, y, z], axis=-1).astype(np.float32) * mask[..., None]

    return dict(
        range_value=rng_img.astype(np.float32) * mask,
        intensity=rng.uniform(0, 1, (H, W)).astype(np.float32),
        elongation=rng.uniform(0, 0.3, (H, W)).astype(np.float32),
        pc=pc,
        mask=mask,
        inclination=incl_grid.astype(np.float32),
        azimuth=np.arctan2(pc[..., 1], pc[..., 0]).astype(np.float32),
        gt_csa=gt_csa,
        gt_class=gt_class,
    )


def frame_to_inputs(frame: Dict[str, np.ndarray], pad_w: int) -> Dict[str, np.ndarray]:
    """Normalize + stack the 8 input channels and pad W (PadData equivalent)."""
    H, W = frame["mask"].shape
    raw = {
        "range_value": frame["range_value"],
        "intensity": frame["intensity"],
        "elongation": frame["elongation"],
        "x": frame["pc"][..., 0],
        "y": frame["pc"][..., 1],
        "z": frame["pc"][..., 2],
        "inclination": frame["inclination"],
        "azimuth": frame["azimuth"],
    }
    chans = [clip_and_norm(n, raw[n]) for n in CHANNELS]
    input_data = np.stack(chans, axis=-1).astype(np.float32)
    coord = input_data[..., 3:6].copy()  # normalized xyz (GetCoordinates)

    def pad(a):
        out = np.zeros((H, pad_w) + a.shape[2:], np.float32)
        out[:, :W] = a
        return out

    return dict(
        input_data=pad(input_data),
        coord=pad(coord),
        pc=pad(frame["pc"]),
        mask=pad(frame["mask"][..., None]),
        unnorm_range=pad((frame["range_value"] * frame["mask"])[..., None]),
        is_in_nlz=pad(frame.get(
            "is_in_nlz", np.full((H, W), -1.0, np.float32))[..., None]),
    )


def make_batch(
    cfg, batch_size: int = None, seed: int = 0, num_boxes: int = 10
) -> Dict[str, np.ndarray]:
    """Batched, padded training batch matching build_train_targets' contract."""
    rng = np.random.RandomState(seed)
    B = batch_size or cfg.batch_image
    H, W = cfg.feat_size
    pad_w = cfg.pad_field[1]
    M = cfg.max_gt_boxes

    out = {k: [] for k in
           ("input_data", "coord", "pc", "mask", "unnorm_range", "is_in_nlz",
            "gt_csa", "gt_class", "gt_valid")}
    for _ in range(B):
        frame = make_frame(rng, H, W, num_boxes, tuple(cfg.label_set))
        inputs = frame_to_inputs(frame, pad_w)
        for k, v in inputs.items():
            out[k].append(v)
        gt_csa = np.zeros((M, 7), np.float32)
        gt_class = np.zeros((M,), np.float32)
        gt_valid = np.zeros((M,), np.float32)
        n = min(num_boxes, M)
        gt_csa[:n] = frame["gt_csa"][:n]
        gt_class[:n] = frame["gt_class"][:n]
        gt_valid[:n] = 1.0
        out["gt_csa"].append(gt_csa)
        out["gt_class"].append(gt_class)
        out["gt_valid"].append(gt_valid)
    return {k: np.stack(v) for k, v in out.items()}
