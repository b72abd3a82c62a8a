"""Per-point 3D box decode — TPU-native replacement of the reference CUDA op
``mx.sym.contrib.Decode3DBbox`` (operator_cxx/contrib/decode_3d_bbox-inl.h:169-277).

The network predicts, at every range-image pixel, an 8-dim delta in the pixel's
*observation (azimuth) frame*:

  [dx, dy, log_width, log_length, cos_yaw, sin_yaw, z0, log_height]

where dx, dy are signed-sqrt compressed (target used sqrt(|d|)*sign(d), so the
decode un-squares: d = p*|p|), cos/sin encode yaw relative to the point azimuth,
and z0 is the absolute bottom height. The decode recovers the azimuth from the
point's xy, rotates the delta back into the vehicle frame, and emits the box10
format [4 BEV corners (A,B,C,D), z0, z1].

Pure jnp elementwise math: XLA fuses this into neighbours; no kernel needed.
"""
from __future__ import annotations

import jax.numpy as jnp


def decode_boxes(deltas: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Decode per-point box deltas into box10.

    Args:
      deltas: (..., 8) predicted deltas (see module docstring for layout).
      points: (..., 3) per-pixel Cartesian points in the vehicle frame.

    Returns:
      (..., 10) decoded boxes [x1,y1,x2,y2,x3,y3,x4,y4, z0, z1].
    """
    deltas = deltas.astype(jnp.float32)
    points = points.astype(jnp.float32)

    pc_x, pc_y = points[..., 0], points[..., 1]
    azimuth = jnp.arctan2(pc_y, pc_x)
    cos_azi, sin_azi = jnp.cos(azimuth), jnp.sin(azimuth)

    dx = deltas[..., 0]
    dy = deltas[..., 1]
    log_width = deltas[..., 2]
    log_length = deltas[..., 3]
    cos_yaw = deltas[..., 4]
    sin_yaw = deltas[..., 5]
    z0 = deltas[..., 6]
    log_height = deltas[..., 7]

    # un-square the signed-sqrt compression
    dx = dx * jnp.abs(dx)
    dy = dy * jnp.abs(dy)

    width = jnp.exp(log_width)
    length = jnp.exp(log_length)
    height = jnp.exp(log_height)

    # rotate the azimuth-frame delta back into the vehicle frame
    dx_veh = dx * cos_azi - dy * sin_azi
    dy_veh = dx * sin_azi + dy * cos_azi
    cx = pc_x + dx_veh
    cy = pc_y + dy_veh

    yaw = jnp.arctan2(sin_yaw, cos_yaw) + azimuth
    sin_y, cos_y = jnp.sin(yaw), jnp.cos(yaw)

    # box-frame corners A(+l,-w) B(-l,-w) C(-l,+w) D(+l,+w) (×1/2), CCW
    half_l, half_w = 0.5 * length, 0.5 * width
    lx = jnp.stack([half_l, -half_l, -half_l, half_l], axis=-1)
    wy = jnp.stack([-half_w, -half_w, half_w, half_w], axis=-1)
    x = lx * cos_y[..., None] - wy * sin_y[..., None] + cx[..., None]
    y = lx * sin_y[..., None] + wy * cos_y[..., None] + cy[..., None]

    corners = jnp.stack([x, y], axis=-1).reshape(deltas.shape[:-1] + (8,))
    return jnp.concatenate(
        [corners, z0[..., None], (z0 + height)[..., None]], axis=-1
    )
