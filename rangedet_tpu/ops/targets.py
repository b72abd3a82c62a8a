"""Dense per-pixel target generation — TPU-native replacement of the host
numpy/numba/C++ pipeline stage ``GenerateTarget`` + ``GenerateFPNTarget``
(rangedet/core/input.py:323-607, rangedet/core/util_func.py:10-53).

The reference generates targets on CPU worker threads; here everything is pure
jnp so the whole target generation runs *inside the jitted train step on
device*, fed only by the raw range image, point cloud, and (padded) GT boxes.

Target layout (8 regression dims, observation/azimuth frame,
rangedet/core/input.py:452-506):

  [ sqrt-signed Δx, sqrt-signed Δy, log w, log l, cos Δyaw, sin Δyaw,
    bottom-z, log h ]

where Δx/Δy are the box-center offsets rotated into the pixel's azimuth frame
and compressed via sqrt(|d|)·sign(d), and Δyaw = yaw − azimuth.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from .assigner import normalization_weight


def reg_targets(
    points: jnp.ndarray,
    gt_csa: jnp.ndarray,
    assignment: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point 8-dim regression target.

    Args:
      points: (N, 3) vehicle-frame points.
      gt_csa: (M, 7) GT boxes [cx, cy, cz, l, w, h, yaw].
      assignment: (N,) box index per point (-1 = background).

    Returns:
      (N, 8) targets; zero rows for unassigned points.
    """
    points = points.astype(jnp.float32)
    gt_csa = gt_csa.astype(jnp.float32)

    idx = jnp.maximum(assignment, 0)
    box = gt_csa[idx]  # (N, 7)
    return _reg_targets_from_box(points, box, assignment >= 0)


def _reg_targets_from_box(
    points: jnp.ndarray, box: jnp.ndarray, assigned: jnp.ndarray
) -> jnp.ndarray:
    """reg_targets body with the per-point box rows already looked up —
    background rows may be anything (they are masked at the end)."""
    azimuth = jnp.arctan2(points[:, 1], points[:, 0])
    delta_yaw = box[:, 6] - azimuth
    yaw_sin = jnp.sin(delta_yaw)
    yaw_cos = jnp.cos(delta_yaw)

    # rotate (box center - point) clockwise by azimuth into the observation frame
    dx = box[:, 0] - points[:, 0]
    dy = box[:, 1] - points[:, 1]
    cos_a, sin_a = jnp.cos(azimuth), jnp.sin(azimuth)
    dx_obs = cos_a * dx + sin_a * dy
    dy_obs = -sin_a * dx + cos_a * dy

    dx_obs = jnp.sqrt(jnp.abs(dx_obs)) * jnp.sign(dx_obs)
    dy_obs = jnp.sqrt(jnp.abs(dy_obs)) * jnp.sign(dy_obs)

    safe = lambda v: jnp.log(jnp.maximum(v, 1e-6))
    log_l = safe(box[:, 3])
    log_w = safe(box[:, 4])
    log_h = safe(box[:, 5])
    bottom = box[:, 2] - box[:, 5] / 2.0

    target = jnp.stack(
        [dx_obs, dy_obs, log_w, log_l, yaw_cos, yaw_sin, bottom, log_h], axis=1
    )
    return jnp.where(assigned[:, None], target, 0.0)


def reg_weights(
    assignment: jnp.ndarray, reg_dim_weights: Sequence[float]
) -> jnp.ndarray:
    """(N,) assignment -> (N, 8) per-dim loss weights (0 for background).

    Mirrors GenerateTarget.get_rpn_reg_weight (input.py:440-450); the shipped
    config weights the Δx dim 3× ([3,1,1,1,1,1,1,1]).
    """
    w = jnp.asarray(reg_dim_weights, jnp.float32)
    return jnp.where((assignment >= 0)[:, None], w[None, :], 0.0)


def cls_targets(
    gt_class: jnp.ndarray,
    assignment: jnp.ndarray,
    label_set: Sequence[int],
) -> jnp.ndarray:
    """Per-point class index in [0, num_classes]; num_classes = background.

    Mirrors GenerateTarget.get_rpn_cls_target (input.py:417-429): GT class ids
    (Waymo enum values) are mapped through ``label_set`` order.
    """
    num_classes = len(label_set)
    mapping = jnp.zeros((8,), jnp.int32)  # Waymo type enum ≤ 4; margin to 8
    for i, label in enumerate(label_set):
        mapping = mapping.at[label].set(i)
    gt_mapped = mapping[jnp.clip(gt_class.astype(jnp.int32), 0, 7)]  # (M,)
    per_point = gt_mapped[jnp.maximum(assignment, 0)]
    return jnp.where(assignment >= 0, per_point, num_classes).astype(jnp.int32)


def class_aware_expand(
    data: jnp.ndarray, cls_target: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Scatter per-point rows into their class slot: (N, C) -> (N, K*C).

    Mirrors jit_class_aware_expand (util_func.py:41-53); identity when K == 1
    (background rows are already zero in ``data``).
    """
    if num_classes == 1:
        return data
    onehot = (
        cls_target[:, None] == jnp.arange(num_classes, dtype=jnp.int32)[None, :]
    ).astype(data.dtype)  # (N, K)
    expanded = onehot[:, :, None] * data[:, None, :]  # (N, K, C)
    return expanded.reshape(data.shape[0], num_classes * data.shape[1])


def interval_masks(
    unnormalized_range: jnp.ndarray,
    intervals: Dict[int, tuple],
    strides: Sequence[int],
) -> Dict[int, jnp.ndarray]:
    """Range-conditioned pyramid masks {stride: (H, W, 1) float}.

    Mirrors GenerateFPNTarget.get_mask_by_range (input.py:587-597):
    stride s keeps pixels with lower <= range < upper.
    """
    out = {}
    for s in strides:
        lo, hi = intervals[s]
        out[s] = ((unnormalized_range >= lo) & (unnormalized_range < hi)).astype(
            jnp.float32
        )
    return out


def stride_slice(data: jnp.ndarray, stride: int, w_axis: int = 1) -> jnp.ndarray:
    """Width-strided subsampling with the reference's phase: begin = stride//2.

    Mirrors util_func.sample_data (util_func.py:10-25) as used by
    GenerateFPNTarget (input.py:599-607). Static slicing — free under XLA.
    """
    if stride == 1:
        return data
    index = [slice(None)] * data.ndim
    index[w_axis] = slice(stride // 2, None, stride)
    return data[tuple(index)]


def generate_dense_targets(
    points_hw3: jnp.ndarray,
    gt_csa: jnp.ndarray,
    gt_class: jnp.ndarray,
    assignment: jnp.ndarray,
    label_set: Sequence[int],
    reg_dim_weights: Sequence[float],
    count_sync_axis=None,
) -> Dict[str, jnp.ndarray]:
    """Full-resolution dense targets for one frame (channels-last (H, W, C)).

    Combines reg targets, per-dim weights, 1/N normalization weights and the
    class-aware expansion, mirroring GenerateTarget.apply (input.py:346-393).

    count_sync_axis: bound mesh axis the frame WIDTH is sharded over — the
    per-box point counts (the 1/N weights' denominators) are then psum'd so
    every shard normalizes by the box's GLOBAL point count.
    """
    H, W = points_hw3.shape[:2]
    N = H * W
    pts = points_hw3.reshape(N, 3)
    num_classes = len(label_set)
    num_reg = len(reg_dim_weights)
    M = gt_csa.shape[0]
    gt_csa = gt_csa.astype(jnp.float32)

    # Every per-box lookup (box row, class id, per-box point count) rides
    # ONE one-hot matmul on the MXU: the v5e gather/scatter emitters cost
    # ~10 ms/step on the (340k points × 200 boxes) shapes (profiled), the
    # matmul + one-hot construction ~1 ms. Precision.HIGHEST below keeps the
    # csa coords exact: default TPU matmul precision rounds f32 operands to
    # bf16 (~0.4% rel, up to ~0.3 m on far box centers), which would corrupt
    # reg targets and 1/N weights on TPU only — invisible to the CPU oracles.
    assigned = assignment >= 0
    onehot_box = (
        (assignment[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :])
        & assigned[:, None]
    ).astype(jnp.float32)  # (N, M)
    counts = jnp.sum(onehot_box, axis=0)  # (M,) points per box
    if count_sync_axis is not None:
        counts = jax.lax.psum(counts, count_sync_axis)

    mapping = jnp.zeros((8,), jnp.int32)
    for i, label in enumerate(label_set):
        mapping = mapping.at[label].set(i)
    gt_mapped = mapping[jnp.clip(gt_class.astype(jnp.int32), 0, 7)]  # (M,)

    table = jnp.concatenate(
        [gt_csa, counts[:, None], gt_mapped.astype(jnp.float32)[:, None]],
        axis=1,
    )  # (M, 9)
    per_point = jnp.matmul(
        onehot_box, table, precision=jax.lax.Precision.HIGHEST
    )  # (N, 9)
    box = per_point[:, :7]

    tgt = _reg_targets_from_box(pts, box, assigned)  # (N, 8)
    norm_w = jnp.where(assigned, 1.0 / jnp.maximum(per_point[:, 7], 1.0), 0.0)
    norm_w = jnp.tile(norm_w[:, None], (1, num_reg))  # (N, 8)
    dim_w = reg_weights(assignment, reg_dim_weights)  # (N, 8)
    cls_t = jnp.where(
        assigned, jnp.round(per_point[:, 8]).astype(jnp.int32), num_classes
    )  # (N,) class index, num_classes = background

    tgt = class_aware_expand(tgt, cls_t, num_classes)
    norm_w = class_aware_expand(norm_w, cls_t, num_classes)
    dim_w = class_aware_expand(dim_w, cls_t, num_classes)

    onehot = class_aware_expand(jnp.ones((N, 1), jnp.float32), cls_t, num_classes)
    if num_classes == 1:
        onehot = (cls_t[:, None] == 0).astype(jnp.float32)

    C = num_classes * num_reg
    return {
        "rpn_reg_target": tgt.reshape(H, W, C),
        "reg_normalize_weight": norm_w.reshape(H, W, C),
        "rpn_reg_weight": dim_w.reshape(H, W, C),
        "rpn_cls_target": onehot.reshape(H, W, num_classes),
    }
