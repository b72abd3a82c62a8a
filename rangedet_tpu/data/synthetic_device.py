"""ON-DEVICE raytraced synthetic scenes: the jnp twin of
``synthetic.make_frame_vehicles`` that renders inside jit, so a training step
can consume a genuinely fresh scene every step with ZERO host↔device traffic
(on the tunneled dev backend a host-generated 2-frame batch costs ~2 s/step
in transfer alone — 20× the train step).

Same scene family as the numpy generator: vehicle-scale oriented cuboids
(l≠w, so yaw is identifiable from the range profile) rendered by exact
slab-method ray-OBB intersection, z-buffered against each other, standing in
front of a background wall. Same invariants, tested by the same census check
(tests/test_data.py): every painted pixel's 3D point lies strictly inside its
GT box and gt_num_points equals the assigner's count.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from .normalization import CHANNELS, CLIP, NORM


def _clip_and_norm_jnp(name: str, v: jnp.ndarray) -> jnp.ndarray:
    if name in CLIP:
        lo, hi = CLIP[name]
        v = jnp.clip(v, lo, hi)
    mean, var = NORM[name]
    return (v - mean) / jnp.sqrt(var)


VEHICLE_DIMS = ((3.6, 5.4), (1.7, 2.1), (1.5, 2.0))  # (l, w, h) ranges
# unlabeled clutter families (poles / wall segments): rendered and
# z-buffered like objects — they occlude and add vertical structure — but
# excluded from GT and painted with BACKGROUND intensity, so geometry (not
# an intensity shortcut) must separate them from real objects. Used by the
# far-range / hard-scene probes (VERDICT r4 weak #2).
CLUTTER_DIMS = (
    ((0.15, 0.4), (0.15, 0.4), (2.0, 6.0)),   # pole
    ((3.0, 10.0), (0.2, 0.5), (1.5, 3.5)),    # wall / fence segment
)
# mildly rectangular footprint so yaw stays identifiable under the
# canonical [-pi/2, pi/2) convention (a square footprint would be
# pi/2-symmetric and make even canonical yaw bimodal); heights are
# walking-adult scale. Matches the reference's ped recipe scale
# (config/rangedet/rangedet_ped_wo_aug_4_18e.py operating at 3D IoU 0.5).
PED_DIMS = ((0.9, 1.2), (0.6, 0.85), (1.6, 1.9))
# bicycle + rider: long/narrow footprint, rider-height
CYC_DIMS = ((1.6, 2.0), (0.5, 0.8), (1.4, 1.8))


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "pad_w", "max_gt", "num_boxes", "B",
        "dims", "r_range", "class_value", "families",
        "num_clutter", "clutter_r",
    ),
)
def make_batch_device(
    key: jax.Array,
    B: int,
    H: int,
    W: int,
    pad_w: int,
    max_gt: int,
    num_boxes: int = 10,
    dims=VEHICLE_DIMS,
    r_range=(8.0, 50.0),
    class_value: float = 1.0,
    families=None,
    num_clutter: int = 0,
    clutter_r=(5.0, 70.0),
) -> Dict[str, jnp.ndarray]:
    """Batched training dict matching build_train_targets' contract, rendered
    on device. All outputs f32 (inputs are cast to bf16 by the model).

    ``dims`` gives (length, width, height) uniform ranges — VEHICLE_DIMS /
    PED_DIMS / CYC_DIMS select the scene family; ``class_value`` is written
    into gt_class (Waymo enum: 1=veh, 2=ped, 4=cyc). For MIXED scenes pass
    ``families`` — a tuple of (dims, r_range, class_value) triples — and each
    box independently draws a family (multiclass recipes).

    ``num_clutter`` adds that many UNLABELED clutter cuboids (CLUTTER_DIMS:
    poles / wall segments over ``clutter_r``): z-buffered into the scene like
    objects (they occlude real boxes) but excluded from GT and painted with
    background intensity — the hard-scene knob for the far-range probes."""
    if families is None:
        families = ((dims, r_range, class_value),)

    def one_frame(key):
        ks = jax.random.split(key, 14)
        inclination = jnp.linspace(0.03, -0.3, H, dtype=jnp.float32)
        azimuth = (
            jnp.pi - (2 * jnp.pi / W) * jnp.arange(W, dtype=jnp.float32)
        )
        incl_g = jnp.broadcast_to(inclination[:, None], (H, W))
        az_g = jnp.broadcast_to(azimuth[None, :], (H, W))

        bg = (
            jax.random.uniform(ks[0], (H, 1), jnp.float32, 25.0, 75.0)
            + jax.random.uniform(ks[1], (H, W), jnp.float32, -2.0, 2.0)
        )
        mask = (jax.random.uniform(ks[2], (H, W)) > 0.05).astype(jnp.float32)

        d = jnp.stack(
            [
                jnp.cos(incl_g) * jnp.cos(az_g),
                jnp.cos(incl_g) * jnp.sin(az_g),
                jnp.sin(incl_g),
            ],
            axis=-1,
        )  # (H, W, 3) unit rays

        M = num_boxes
        # per-box family (uniform over `families`); lo/hi tables indexed by
        # the drawn family id keep everything shape-static under jit
        F = len(families)
        fam_lo = jnp.asarray(
            [[d[0][0], d[1][0], d[2][0], rr[0]] for d, rr, _ in families],
            jnp.float32,
        )  # (F, 4): l, w, h, r lower bounds
        fam_hi = jnp.asarray(
            [[d[0][1], d[1][1], d[2][1], rr[1]] for d, rr, _ in families],
            jnp.float32,
        )
        fam_cls = jnp.asarray([c for _, _, c in families], jnp.float32)
        fam = jax.random.randint(ks[3], (M,), 0, F)
        u = jax.random.uniform(ks[6], (M, 4), jnp.float32)
        lwhr = fam_lo[fam] + u * (fam_hi[fam] - fam_lo[fam])  # (M, 4)
        length, width, height, r = (lwhr[:, i] for i in range(4))
        box_cls = fam_cls[fam]
        az_c = jax.random.uniform(
            ks[4], (M,), jnp.float32, -jnp.pi * 0.9, jnp.pi * 0.9
        )
        row = jax.random.randint(ks[5], (M,), H // 4, 3 * H // 4)
        # canonical yaw in [-pi/2, pi/2) — see synthetic.py:make_frame_vehicles:
        # cuboids are pi-symmetric, so a full-circle yaw label is unlearnable
        # (bimodal Δyaw target) and held-out AP collapses; the canonical
        # convention poses the same boxes with a well-defined target.
        yaw = jax.random.uniform(
            ks[9], (M,), jnp.float32, -jnp.pi / 2, jnp.pi / 2
        )

        if num_clutter:
            kc = jax.random.split(ks[7], 5)
            C = num_clutter
            c_lo = jnp.asarray(
                [[d[0][0], d[1][0], d[2][0], clutter_r[0]]
                 for d in CLUTTER_DIMS], jnp.float32)
            c_hi = jnp.asarray(
                [[d[0][1], d[1][1], d[2][1], clutter_r[1]]
                 for d in CLUTTER_DIMS], jnp.float32)
            cf = jax.random.randint(kc[0], (C,), 0, len(CLUTTER_DIMS))
            cu = jax.random.uniform(kc[1], (C, 4), jnp.float32)
            clwhr = c_lo[cf] + cu * (c_hi[cf] - c_lo[cf])
            length = jnp.concatenate([length, clwhr[:, 0]])
            width = jnp.concatenate([width, clwhr[:, 1]])
            height = jnp.concatenate([height, clwhr[:, 2]])
            r = jnp.concatenate([r, clwhr[:, 3]])
            az_c = jnp.concatenate([az_c, jax.random.uniform(
                kc[2], (C,), jnp.float32, -jnp.pi * 0.9, jnp.pi * 0.9)])
            row = jnp.concatenate([row, jax.random.randint(
                kc[3], (C,), H // 4, 3 * H // 4)])
            yaw = jnp.concatenate([yaw, jax.random.uniform(
                kc[4], (C,), jnp.float32, -jnp.pi / 2, jnp.pi / 2)])

        incl_c = inclination[row]
        cx = r * jnp.cos(incl_c) * jnp.cos(az_c)
        cy = r * jnp.cos(incl_c) * jnp.sin(az_c)
        cz = r * jnp.sin(incl_c)
        gt_csa = jnp.stack(
            [cx, cy, cz, length, width, height, yaw], axis=1)[:M]

        # slab ray-OBB intersection, all pixels × all boxes
        cos_y, sin_y = jnp.cos(yaw), jnp.sin(yaw)
        # rotate rays/origin into each box frame (rotation by -yaw)
        dx = cos_y[:, None, None] * d[None, ..., 0] + sin_y[:, None, None] * d[None, ..., 1]
        dy = -sin_y[:, None, None] * d[None, ..., 0] + cos_y[:, None, None] * d[None, ..., 1]
        dz = jnp.broadcast_to(d[None, ..., 2], dx.shape)
        ox = -(cos_y * cx + sin_y * cy)
        oy = -(-sin_y * cx + cos_y * cy)
        oz = -cz

        def slab(o, dd, e):
            dd = jnp.where(jnp.abs(dd) < 1e-9, 1e-9, dd)
            t1 = (-e[:, None, None] - o[:, None, None]) / dd
            t2 = (e[:, None, None] - o[:, None, None]) / dd
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        n1, f1 = slab(ox, dx, length / 2)
        n2, f2 = slab(oy, dy, width / 2)
        n3, f3 = slab(oz, dz, height / 2)
        t_enter = jnp.maximum(jnp.maximum(n1, n2), n3)  # (M, H, W)
        t_exit = jnp.minimum(jnp.minimum(f1, f2), f3)
        hit = (t_exit >= t_enter) & (t_enter > 0.5)
        # nudge strictly inside (the assigner's containment is strict)
        t_hit = jnp.minimum(t_enter + 5e-3, 0.5 * (t_enter + t_exit))
        box_t = jnp.where(hit, t_hit, jnp.inf)

        # background wall a few meters behind each object's silhouette
        wall_gap = jax.random.uniform(
            ks[10], (M + num_clutter,), jnp.float32, 2.0, 8.0)
        wall = jnp.where(hit, t_exit, 0.0).max(axis=(1, 2)) + wall_gap  # (M,)
        bg = jnp.maximum(
            bg, jnp.max(jnp.where(hit, wall[:, None, None], 0.0), axis=0)
        )

        owner = jnp.argmin(box_t, axis=0)  # (H, W); clutter ids are >= M
        t_best = jnp.min(box_t, axis=0)
        object_px = jnp.isfinite(t_best) & (t_best < bg)
        rng_img = jnp.where(object_px, t_best, bg)
        mask = jnp.where(object_px, 1.0, mask)
        owner = jnp.where(object_px, owner, -1)
        onehot = (
            owner[None, :, :] == jnp.arange(M, dtype=jnp.int32)[:, None, None]
        )
        gt_num_points = jnp.sum(onehot, axis=(1, 2)).astype(jnp.float32)

        rng_img = jnp.clip(rng_img, 1.0, 79.0)
        pc = rng_img[..., None] * d * mask[..., None]

        # clutter pixels deliberately take the BACKGROUND intensity band
        intensity = jnp.where(
            object_px & (owner < M),
            jax.random.uniform(ks[11], (H, W), jnp.float32, 0.4, 1.0),
            jax.random.uniform(ks[12], (H, W), jnp.float32, 0.0, 0.4),
        )
        elong = jax.random.uniform(ks[13], (H, W), jnp.float32, 0.0, 0.3)

        raw = {
            "range_value": rng_img * mask,
            "intensity": intensity,
            "elongation": elong,
            "x": pc[..., 0],
            "y": pc[..., 1],
            "z": pc[..., 2],
            "inclination": incl_g,
            "azimuth": jnp.arctan2(pc[..., 1], pc[..., 0]),
        }
        input_data = jnp.stack(
            [_clip_and_norm_jnp(n, raw[n]) for n in CHANNELS], axis=-1
        )
        coord = input_data[..., 3:6]

        def pad(a):
            cfgpad = [(0, 0)] * a.ndim
            cfgpad[1] = (0, pad_w - W)
            return jnp.pad(a, cfgpad)

        gt_pad = jnp.zeros((max_gt, 7), jnp.float32).at[:M].set(gt_csa)
        cls_pad = jnp.zeros((max_gt,), jnp.float32).at[:M].set(box_cls)
        valid_pad = jnp.zeros((max_gt,), jnp.float32).at[:M].set(1.0)
        np_pad = jnp.zeros((max_gt,), jnp.float32).at[:M].set(gt_num_points)
        return {
            "input_data": pad(input_data),
            "coord": pad(coord),
            "pc": pad(pc),
            "mask": pad(mask[..., None]),
            "unnorm_range": pad((rng_img * mask)[..., None]),
            "is_in_nlz": pad(jnp.full((H, W, 1), -1.0, jnp.float32)),
            "gt_csa": gt_pad,
            "gt_class": cls_pad,
            "gt_valid": valid_pad,
            "gt_num_points": np_pad,
        }

    keys = jax.random.split(key, B)
    return jax.vmap(one_frame)(keys)
