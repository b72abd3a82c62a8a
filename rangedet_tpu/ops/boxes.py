"""Box format conversions (pure jnp, fully vmappable).

Formats used throughout the framework (all mirror the reference semantics):

  csa7       [cx, cy, cz, length, width, height, yaw]
             ("center-size-angle"; length along heading).
  box10      [x1,y1, x2,y2, x3,y3, x4,y4, z0, z1]
             4 BEV corners + bottom/top z. This is the decoded-box format of the
             reference CUDA op Decode3DBbox
             (reference: operator_cxx/contrib/decode_3d_bbox-inl.h:169-277).
  box11      [x1..y4 (8), yaw, z0(bottom), height]
             geometry part of the weighted-NMS det format
             (reference: tools/test.py:56-81 bbox3d_10dim_to_11dim).
  box12      box11 + [score] — full WNMS det row
             (reference: operator_cxx/src_cxx/nms.h:453-456).
  box8_eval  [cx, cy, cz, length, width, height, heading, score]
             final eval output (reference: tools/test.py:43-53).
  corners4   (..., 4, 2) BEV corner array; clockwise, corner 0 at
             (+l/2, -w/2) in the box frame (matches Decode3DBbox's A,B,C,D).
  corners8   (..., 8, 3) 3D corners: bottom 4 then top 4
             (matches the reference assigner's A..E usage,
             operator_cxx/src_cxx/assigner.h:29-51).
"""
from __future__ import annotations

import jax.numpy as jnp

# Box-frame BEV corner template (clockwise, as the reference decode emits):
# A(+l,-w) B(-l,-w) C(-l,+w) D(+l,+w) (×1/2).
_CORNER_SIGNS = jnp.asarray(
    [[0.5, -0.5], [-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]], dtype=jnp.float32
)


def csa_to_corners_bev(csa: jnp.ndarray) -> jnp.ndarray:
    """csa7 (..., 7) -> BEV corners (..., 4, 2)."""
    cx, cy = csa[..., 0], csa[..., 1]
    length, width, yaw = csa[..., 3], csa[..., 4], csa[..., 6]
    lx = _CORNER_SIGNS[:, 0] * length[..., None]  # (..., 4)
    wy = _CORNER_SIGNS[:, 1] * width[..., None]
    cos, sin = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    x = lx * cos - wy * sin + cx[..., None]
    y = lx * sin + wy * cos + cy[..., None]
    return jnp.stack([x, y], axis=-1)


def csa_to_corners3d(csa: jnp.ndarray) -> jnp.ndarray:
    """csa7 (..., 7) -> 3D corners (..., 8, 3), bottom 4 then top 4."""
    bev = csa_to_corners_bev(csa)  # (..., 4, 2)
    cz, h = csa[..., 2], csa[..., 5]
    z_bot = (cz - 0.5 * h)[..., None]
    z_top = (cz + 0.5 * h)[..., None]
    bot = jnp.concatenate([bev, jnp.broadcast_to(z_bot[..., None], bev[..., :1].shape)], -1)
    top = jnp.concatenate([bev, jnp.broadcast_to(z_top[..., None], bev[..., :1].shape)], -1)
    return jnp.concatenate([bot, top], axis=-2)


def box10_to_corners_bev(box10: jnp.ndarray) -> jnp.ndarray:
    """box10 (..., 10) -> BEV corners (..., 4, 2)."""
    return box10[..., :8].reshape(box10.shape[:-1] + (4, 2))


def box10_to_box11(box10: jnp.ndarray) -> jnp.ndarray:
    """box10 -> box11, mirroring tools/test.py:56 bbox3d_10dim_to_11dim.

    yaw = atan2(y1 - y2, x1 - x2) (first-edge direction = heading).
    """
    c = box10[..., :8]
    z0 = box10[..., 8:9]
    z1 = box10[..., 9:10]
    yaw = jnp.arctan2(c[..., 1] - c[..., 3], c[..., 0] - c[..., 2])[..., None]
    height = z1 - z0
    return jnp.concatenate([c, yaw, z0, height], axis=-1)


def box12_to_box8_eval(box12: jnp.ndarray) -> jnp.ndarray:
    """box12 -> [cx, cy, cz, length, width, height, heading, score].

    Mirrors tools/test.py:43 bbox3d_12dim_to_8dim.
    """
    cx = jnp.mean(box12[..., 0:8:2], axis=-1)
    cy = jnp.mean(box12[..., 1:8:2], axis=-1)
    z0 = box12[..., 9]
    height = box12[..., 10]
    cz = z0 + height / 2.0
    length = jnp.sqrt(
        (box12[..., 2] - box12[..., 0]) ** 2 + (box12[..., 3] - box12[..., 1]) ** 2
    )
    width = jnp.sqrt(
        (box12[..., 2] - box12[..., 4]) ** 2 + (box12[..., 3] - box12[..., 5]) ** 2
    )
    heading = box12[..., 8]
    score = box12[..., 11]
    return jnp.stack([cx, cy, cz, length, width, height, heading, score], axis=-1)


def box10_to_csa7(box10: jnp.ndarray) -> jnp.ndarray:
    """box10 -> csa7, mirroring operator_py/batch_rotated_iou.py:51-68 to_box_type_7.

    Note the reference emits [cx, cy, cz, L, W, H, yaw] where L is |corner0-corner1|
    (the length edge) — consistent with csa7 here.
    """
    pts = box10_to_corners_bev(box10)  # (..., 4, 2)
    center_xy = pts.mean(axis=-2)
    center_z = box10[..., 8:10].mean(axis=-1, keepdims=True)
    length = jnp.linalg.norm(pts[..., 0, :] - pts[..., 1, :], axis=-1, keepdims=True)
    width = jnp.linalg.norm(pts[..., 1, :] - pts[..., 2, :], axis=-1, keepdims=True)
    height = box10[..., 9:10] - box10[..., 8:9]
    yaw = jnp.arctan2(
        pts[..., 0, 1] - pts[..., 1, 1], pts[..., 0, 0] - pts[..., 1, 0]
    )[..., None]
    return jnp.concatenate([center_xy, center_z, length, width, height, yaw], axis=-1)


def polygon_area(corners: jnp.ndarray) -> jnp.ndarray:
    """Signed shoelace area of a polygon (..., K, 2); CCW positive, CW negative."""
    x, y = corners[..., 0], corners[..., 1]
    x2 = jnp.roll(x, -1, axis=-1)
    y2 = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.sum(x * y2 - x2 * y, axis=-1)


def canonicalize_ccw(corners: jnp.ndarray) -> jnp.ndarray:
    """Reorder quad corners (..., 4, 2) to counter-clockwise if needed."""
    area = polygon_area(corners)
    reversed_ = corners[..., jnp.asarray([0, 3, 2, 1]), :]
    return jnp.where((area < 0)[..., None, None], reversed_, corners)
