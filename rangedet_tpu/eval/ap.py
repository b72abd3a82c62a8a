"""Standalone BEV/3D average-precision evaluation.

The reference relies entirely on the offline Waymo evaluator (`metrics_pb2`
bins + the WOD tooling). That dependency is preserved via eval/waymo_bin.py,
but the framework also ships its own evaluator so detection quality is
measurable anywhere (KITTI, synthetic, CI): greedy score-ordered matching at
an IoU threshold + 101-point interpolated AP (COCO/WOD style).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _iou_matrix_np(det_csa: np.ndarray, gt_csa: np.ndarray, mode: str) -> np.ndarray:
    import jax.numpy as jnp

    from ..ops import boxes as ops_boxes
    from ..ops import rotated_iou as ops_iou

    if len(det_csa) == 0 or len(gt_csa) == 0:
        return np.zeros((len(det_csa), len(gt_csa)), np.float32)
    if mode == "bev":
        a = ops_boxes.csa_to_corners_bev(jnp.asarray(det_csa))
        b = ops_boxes.csa_to_corners_bev(jnp.asarray(gt_csa))
        return np.asarray(ops_iou.iou_bev_matrix(a, b))
    return np.asarray(
        ops_iou.iou_3d_csa(
            jnp.asarray(det_csa)[:, None, :], jnp.asarray(gt_csa)[None, :, :]
        )
    )


def match_frame(
    det_csa: np.ndarray,
    det_scores: np.ndarray,
    gt_csa: np.ndarray,
    iou_thresh: float,
    mode: str = "3d",
) -> Tuple[np.ndarray, int]:
    """Greedy matching in score order. Returns (tp flags per det, num_gt)."""
    order = np.argsort(-det_scores)
    iou = _iou_matrix_np(det_csa[order], gt_csa, mode)
    matched = np.zeros(len(gt_csa), bool)
    tp = np.zeros(len(det_csa), bool)
    for i in range(len(det_csa)):
        if len(gt_csa) == 0:
            break
        row = np.where(matched, -1.0, iou[i])
        j = int(np.argmax(row))
        if row[j] >= iou_thresh:
            matched[j] = True
            tp[i] = True
    # un-permute
    out = np.zeros_like(tp)
    out[order] = tp
    return out, len(gt_csa)


def average_precision(
    frames: Sequence[Dict[str, np.ndarray]],
    iou_thresh: float = 0.7,
    mode: str = "3d",
) -> Dict[str, float]:
    """frames: list of dicts with det_csa (N,7), det_scores (N,), gt_csa (M,7).

    Returns {"ap": 101-pt interpolated AP, "recall": max recall,
    "precision": precision at max recall}.
    """
    all_scores: List[np.ndarray] = []
    all_tp: List[np.ndarray] = []
    total_gt = 0
    for fr in frames:
        tp, n_gt = match_frame(
            np.asarray(fr["det_csa"], np.float32).reshape(-1, 7),
            np.asarray(fr["det_scores"], np.float32).reshape(-1),
            np.asarray(fr["gt_csa"], np.float32).reshape(-1, 7),
            iou_thresh,
            mode,
        )
        all_scores.append(np.asarray(fr["det_scores"]).reshape(-1))
        all_tp.append(tp)
        total_gt += n_gt

    if total_gt == 0 or not all_scores:
        return {"ap": 0.0, "recall": 0.0, "precision": 0.0}

    scores = np.concatenate(all_scores)
    tps = np.concatenate(all_tp)
    order = np.argsort(-scores)
    tps = tps[order]
    cum_tp = np.cumsum(tps)
    cum_fp = np.cumsum(~tps)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)

    # 101-point interpolation
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        p = precision[recall >= r].max() if (recall >= r).any() else 0.0
        ap += p / 101.0
    return {
        "ap": float(ap),
        "recall": float(recall[-1]) if len(recall) else 0.0,
        "precision": float(precision[-1]) if len(precision) else 0.0,
    }
