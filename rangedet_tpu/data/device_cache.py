"""Compact device ingest + HBM-resident dataset cache.

The tunneled dev backend moves host batches at single-digit MB/s, so feeding
the file-backed loader path (data/waymo.py:record_to_inputs) at full size is
transfer-bound: one full f32 frame is ~11.6 MB. This module packs a frame's
*raw* fields into ~1.9 MB (u16/i16/u8 quantization) and reconstructs the
exact training-batch contract on device inside jit — a 6x transfer cut — and,
for datasets that fit HBM (a few thousand range-image frames), stages the
whole packed dataset on device ONCE so every later epoch trains with zero
host↔device traffic (the TPU-native answer to the reference's
many-CPU-threads-per-GPU loader, utils/detection_input.py:147-178).

Quantization error budget (all well under target noise):
  pc        i16, 1/409.5 m    -> 2.4 mm absolute, uniform over ±80 m
  range     u16, 80/65535 m   -> 0.6 mm
  intensity u8 over clip [0,1]-> 0.004 (0.04 sigma of the whitening stats)
  elongation u8 over clip     -> 0.004
  azimuth   recomputed on device from quantized pc: <1e-3 rad at r>=1 m
GT boxes/classes stay f32 untouched (the r3 lesson: GT coords must never be
rounded — BENCH.md round-3 quality fix).

Field semantics mirror data/waymo.py exactly; the round-trip contract
(expand(pack(x)) ≈ x) is pinned by tests/test_device_cache.py.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .normalization import CHANNELS, CLIP, NORM

PC_SCALE = 409.5          # i16 per meter (±80 m fits ±32760)
RANGE_SCALE = 65535.0 / 80.0

# flag bits of the u8 flags plane
_BIT_MASK = 1      # valid return (mask == 1)
_BIT_NLZ = 2       # is_in_nlz > 0
_BIT_ZERO = 4      # mask-0 pixel whose filled range is 0 (car window); the
#                    other mask-0 real pixels carry background fill 80

PACKED_KEYS = ("pc_q", "range_q", "intensity_q", "elongation_q", "flags",
               "inclination", "gt_csa", "gt_class", "gt_valid")


def pack_inputs(full: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pack ONE record_to_inputs output dict (unbatched, padded) into the
    compact transfer form. ``full`` must carry the full-range channel in
    input_data (channel 0) so mask-0 pixels' 0-vs-80 fill is recoverable."""
    mask = full["mask"][..., 0] > 0.5
    nlz = full["is_in_nlz"][..., 0] > 0.0
    H, Wp = mask.shape

    # un-whiten channel 0 to recover the pre-normalization clipped range for
    # every pixel (input_data keeps range 80/0 fills where mask == 0)
    mean, var = NORM["range_value"]
    rng_full = full["input_data"][..., 0] * np.sqrt(var) + mean
    rng_full = np.clip(rng_full, 0.0, 80.0)
    zero_fill = (~mask) & (rng_full < 40.0)  # mask-0 pixels: 0 or 80 fill

    # un-whiten intensity / elongation (clipped to [0,1] on the way in, so
    # u8 over the clip interval is lossless to 1/255)
    def unwhiten(name, ch):
        m, v = NORM[name]
        lo, hi = CLIP[name]
        return np.clip(full["input_data"][..., ch] * np.sqrt(v) + m, lo, hi)

    intensity = unwhiten("intensity", 1)
    elongation = unwhiten("elongation", 2)

    flags = (
        mask.astype(np.uint8) * _BIT_MASK
        + nlz.astype(np.uint8) * _BIT_NLZ
        + zero_fill.astype(np.uint8) * _BIT_ZERO
    )
    # inclination per row (channel 6 is constant across a row by
    # construction — broadcast table); un-whiten from any valid column
    m_i, v_i = NORM["inclination"]
    incl_row = full["input_data"][:, :, 6] * np.sqrt(v_i) + m_i
    inclination = incl_row[:, 0].astype(np.float32)  # (H,)

    return dict(
        pc_q=np.round(
            full["pc"].transpose(2, 0, 1) * PC_SCALE
        ).astype(np.int16),                                   # (3, H, Wp)
        range_q=np.round(rng_full * RANGE_SCALE).astype(np.uint16),
        intensity_q=np.round(intensity * 255.0).astype(np.uint8),
        elongation_q=np.round(elongation * 255.0).astype(np.uint8),
        flags=flags,
        inclination=inclination,
        gt_csa=full["gt_csa"].astype(np.float32),
        gt_class=full["gt_class"].astype(np.float32),
        gt_valid=full["gt_valid"].astype(np.float32),
    )


def _norm(name, v):
    if name in CLIP:
        lo, hi = CLIP[name]
        v = jnp.clip(v, lo, hi)
    mean, var = NORM[name]
    return (v - mean) / np.sqrt(var)


def unpack_raw(packed: Dict[str, jnp.ndarray], valid_w: int,
               valid_h: int = 0) -> Dict[str, jnp.ndarray]:
    """Dequantize a BATCHED packed dict to the raw per-pixel fields (on
    device). Padded pixels (beyond ``valid_w``/``valid_h``) are forced to
    exact zeros, matching record_to_inputs' zero padding."""
    flags = packed["flags"]
    B, H, Wp = flags.shape
    col_ok = (jnp.arange(Wp) < valid_w)[None, None, :]
    if valid_h and valid_h < H:
        col_ok = col_ok & (jnp.arange(H) < valid_h)[None, :, None]

    mask = ((flags & _BIT_MASK) > 0) & col_ok
    nlz_bit = (flags & _BIT_NLZ) > 0
    zero_bit = (flags & _BIT_ZERO) > 0

    pc = packed["pc_q"].astype(jnp.float32).transpose(0, 2, 3, 1) / PC_SCALE
    pc = jnp.where(col_ok[..., None], pc, 0.0)
    rng = packed["range_q"].astype(jnp.float32) / RANGE_SCALE
    # mask-0 pixels: car-window fill 0 or background fill 80
    rng = jnp.where(mask, rng, jnp.where(zero_bit, 0.0, 80.0))
    rng = jnp.where(col_ok, rng, 0.0)
    return dict(
        range_value=rng,
        intensity=packed["intensity_q"].astype(jnp.float32) / 255.0,
        elongation=packed["elongation_q"].astype(jnp.float32) / 255.0,
        pc=pc,
        mask=mask,
        is_in_nlz=jnp.where(nlz_bit, 1.0, -1.0),
        inclination=jnp.broadcast_to(
            packed["inclination"][:, :, None], (B, H, Wp)),
        col_ok=col_ok,
        gt_csa=packed["gt_csa"],
        gt_class=packed["gt_class"],
        gt_valid=packed["gt_valid"],
        **({"gt_num_points": packed["gt_num_points"]}
           if "gt_num_points" in packed else {}),
    )


def finalize_inputs(raw: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Normalize/stack/zero-pad the raw fields into the training-batch
    contract — the device twin of record_to_inputs' tail (data/waymo.py)."""
    col_ok = raw["col_ok"]
    pc = raw["pc"]
    rng = raw["range_value"]
    maskf = raw["mask"].astype(jnp.float32)
    chans = {
        "range_value": rng,
        "intensity": raw["intensity"],
        "elongation": raw["elongation"],
        "x": pc[..., 0],
        "y": pc[..., 1],
        "z": pc[..., 2],
        "inclination": raw["inclination"],
        "azimuth": jnp.arctan2(pc[..., 1], pc[..., 0]),
    }
    input_data = jnp.stack([_norm(n, chans[n]) for n in CHANNELS], axis=-1)
    input_data = jnp.where(col_ok[..., None], input_data, 0.0)

    out = dict(
        input_data=input_data,
        coord=input_data[..., 3:6],
        pc=pc,
        mask=maskf[..., None],
        unnorm_range=(jnp.clip(rng, 0.0, 80.0) * maskf)[..., None],
        # padded pixels carry 0.0 (record_to_inputs zero-pads every plane)
        is_in_nlz=jnp.where(col_ok, raw["is_in_nlz"], 0.0)[..., None],
        gt_csa=raw["gt_csa"],
        gt_class=raw["gt_class"],
        gt_valid=raw["gt_valid"],
    )
    if "gt_num_points" in raw:
        out["gt_num_points"] = raw["gt_num_points"]
    return out


def expand_inputs(packed: Dict[str, jnp.ndarray], valid_w: int,
                  valid_h: int = 0) -> Dict[str, jnp.ndarray]:
    """Reconstruct the full training-batch dict from a BATCHED packed dict
    (leading batch dim on every field) on device, inside jit."""
    return finalize_inputs(unpack_raw(packed, valid_w, valid_h))


def augment_raw(raw: Dict[str, jnp.ndarray], valid_w: int, key=None,
                names=("flip", "rotation"), do_flip=None, shift=None
                ) -> Dict[str, jnp.ndarray]:
    """ON-DEVICE geometric augmentation — the jnp twin of data/augment.py
    (world_flip :34-56 / world_rotation :59-86), applied to unpack_raw's raw
    fields inside the jitted train step so HBM-cached datasets still see
    fresh geometry every epoch. Column ops wrap within the valid_w image
    columns only (padding is untouched).

    Randomness: pass ``key`` to draw per-frame (flip ~ Bernoulli(0.5),
    rotation theta ~ U(-pi/4, pi/4) quantized to whole columns, exactly the
    host op's lattice), or pass explicit ``do_flip`` (B,) bool / ``shift``
    (B,) int32 for deterministic twins (the equality tests)."""
    B, H, Wp = raw["mask"].shape
    W = valid_w
    if key is not None:
        kf, kr = jax.random.split(key)
        if do_flip is None and "flip" in names:
            do_flip = jax.random.uniform(kf, (B,)) < 0.5
        if shift is None and "rotation" in names:
            theta = jax.random.uniform(
                kr, (B,), jnp.float32, -jnp.pi / 4, jnp.pi / 4)
            shift = jnp.round(theta / (2 * jnp.pi) * W).astype(jnp.int32)
    if do_flip is None:
        do_flip = jnp.zeros((B,), bool)
    if shift is None:
        shift = jnp.zeros((B,), jnp.int32)
    theta = shift.astype(jnp.float32) * (2 * jnp.pi / W)

    j = jnp.arange(Wp)
    # host order is flip THEN rotation (apply_augmentations names order), so
    # the composed source map is flip((j - shift) mod W); padding identity
    src = jnp.where(j < W, (j[None, :] - shift[:, None]) % W, j[None, :])
    src = jnp.where(do_flip[:, None] & (src < W), W - 1 - src, src)

    def take_cols(a):  # (B, H, Wp, ...) gather along the column axis
        return jnp.take_along_axis(
            a, src[:, None, :].reshape((B, 1, Wp) + (1,) * (a.ndim - 3)),
            axis=2,
        )

    out = dict(raw)
    for k in ("range_value", "intensity", "elongation", "mask",
              "is_in_nlz", "inclination"):
        out[k] = take_cols(raw[k])
    pc = take_cols(raw["pc"])
    # flip: y -> -y; then rotate about z by theta
    y = jnp.where(do_flip[:, None, None], -pc[..., 1], pc[..., 1])
    c, s = jnp.cos(theta)[:, None, None], jnp.sin(theta)[:, None, None]
    out["pc"] = jnp.stack(
        [c * pc[..., 0] - s * y, s * pc[..., 0] + c * y, pc[..., 2]],
        axis=-1,
    )

    gt = raw["gt_csa"]
    gy = jnp.where(do_flip[:, None], -gt[:, :, 1], gt[:, :, 1])
    gyaw = jnp.where(do_flip[:, None], -gt[:, :, 6], gt[:, :, 6])
    cb, sb = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    # padded (invalid) rows stay all-zero, as the host pads AFTER augmenting
    gvalid = raw["gt_valid"]
    out["gt_csa"] = jnp.stack(
        [cb * gt[:, :, 0] - sb * gy, sb * gt[:, :, 0] + cb * gy,
         gt[:, :, 2], gt[:, :, 3], gt[:, :, 4], gt[:, :, 5],
         (gyaw + theta[:, None]) * gvalid],
        axis=-1,
    )
    return out


def stack_packed(frames) -> Dict[str, np.ndarray]:
    """Stack per-frame packed dicts into one arrays-of-all-frames dict
    (the HBM cache layout; frame axis leading on every field)."""
    return {k: np.stack([f[k] for f in frames]) for k in frames[0]}


def gather_packed(cache: Dict[str, jnp.ndarray], idx) -> Dict[str, jnp.ndarray]:
    """Select a minibatch (device-side) from the stacked packed cache."""
    return {k: jnp.take(v, idx, axis=0) for k, v in cache.items()}
