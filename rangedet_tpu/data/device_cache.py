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


def expand_inputs(packed: Dict[str, jnp.ndarray], valid_w: int,
                  valid_h: int = 0) -> Dict[str, jnp.ndarray]:
    """Reconstruct the full training-batch dict from a BATCHED packed dict
    (leading batch dim on every field) on device, inside jit.

    ``valid_w`` (and ``valid_h`` when the row axis is padded too) is the
    unpadded image extent: pixels beyond it are forced to exact zeros,
    matching record_to_inputs' zero padding.
    """
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
    intensity = packed["intensity_q"].astype(jnp.float32) / 255.0
    elongation = packed["elongation_q"].astype(jnp.float32) / 255.0
    incl = jnp.broadcast_to(packed["inclination"][:, :, None], (B, H, Wp))
    azimuth = jnp.arctan2(pc[..., 1], pc[..., 0])

    maskf = mask.astype(jnp.float32)
    raw = {
        "range_value": rng,
        "intensity": intensity,
        "elongation": elongation,
        "x": pc[..., 0],
        "y": pc[..., 1],
        "z": pc[..., 2],
        "inclination": incl,
        "azimuth": azimuth,
    }
    input_data = jnp.stack([_norm(n, raw[n]) for n in CHANNELS], axis=-1)
    input_data = jnp.where(col_ok[..., None], input_data, 0.0)

    out = dict(
        input_data=input_data,
        coord=input_data[..., 3:6],
        pc=pc,
        mask=maskf[..., None],
        unnorm_range=(jnp.clip(rng, 0.0, 80.0) * maskf)[..., None],
        # padded pixels carry 0.0 (record_to_inputs zero-pads every plane)
        is_in_nlz=jnp.where(
            col_ok, jnp.where(nlz_bit, 1.0, -1.0), 0.0)[..., None],
        gt_csa=packed["gt_csa"],
        gt_class=packed["gt_class"],
        gt_valid=packed["gt_valid"],
    )
    if "gt_num_points" in packed:
        out["gt_num_points"] = packed["gt_num_points"]
    return out


def stack_packed(frames) -> Dict[str, np.ndarray]:
    """Stack per-frame packed dicts into one arrays-of-all-frames dict
    (the HBM cache layout; frame axis leading on every field)."""
    return {k: np.stack([f[k] for f in frames]) for k in frames[0]}


def gather_packed(cache: Dict[str, jnp.ndarray], idx) -> Dict[str, jnp.ndarray]:
    """Select a minibatch (device-side) from the stacked packed cache."""
    return {k: jnp.take(v, idx, axis=0) for k, v in cache.items()}
