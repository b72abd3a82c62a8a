"""Loss functions — jnp re-design of rangedet/symbol/head/loss.py and the loss
assembly in RangeRpnHead.get_vfl_loss / get_normalize_reg_loss
(rangedet/symbol/head/builder.py:350-422).

No fp16 loss scaling: TPU training runs bf16 compute with fp32 loss math, so
the reference's ×128 grad_scale / rescale_grad pair collapses to plain
weighting (cls ×10, reg ×8 in shipped configs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross-entropy from logits (elementwise).

    Equals the reference sigmoid_bce_loss_with_logits with alpha=0.5 scaled by
    2 (loss.py:4-24), i.e. the standard BCE.
    """
    # max(l, 0) - l*y + log(1 + exp(-|l|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def varifocal_loss(
    logits: jnp.ndarray,
    iou_score: jnp.ndarray,
    alpha: float = 1.0,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """IoU-aware varifocal loss (loss.py:22-30).

    Positives (iou_score > 0) are weighted by the IoU score itself; negatives
    by alpha * |score - p|^gamma == alpha * p^gamma (score = 0).
    """
    p = jax.nn.sigmoid(logits)
    bce = sigmoid_bce_with_logits(logits, iou_score)
    positive = (iou_score > 0).astype(logits.dtype)
    negative = (iou_score == 0).astype(logits.dtype)
    weight = iou_score * positive + alpha * jnp.abs(iou_score - p) ** gamma * negative
    return bce * weight


def smooth_l1(x: jnp.ndarray, scalar: float = 1.0) -> jnp.ndarray:
    """MXNet smooth_l1 with sigma=scalar: 0.5*(s*x)^2 for |x| < 1/s^2, else
    |x| - 0.5/s^2 (mxnext/simple.py smooth_l1 alias of mx.sym.smooth_l1)."""
    s2 = scalar * scalar
    absx = jnp.abs(x)
    return jnp.where(absx < 1.0 / s2, 0.5 * s2 * x * x, absx - 0.5 / s2)


def vfl_cls_loss(
    cls_logit: jnp.ndarray,
    iou_target: jnp.ndarray,
    valid_mask: jnp.ndarray,
    alpha: float = 1.0,
    gamma: float = 2.0,
    sync_axis=None,
) -> jnp.ndarray:
    """Per-level classification loss (builder.py:350-379): masked VFL summed
    and normalized by (#valid pixels + 1). ``sync_axis``: psum numerator and
    normalizer over the mesh axis — global-batch normalization inside
    shard_map (matches the GSPMD step exactly)."""
    loss = varifocal_loss(cls_logit, jax.lax.stop_gradient(iou_target), alpha, gamma)
    mask = jax.lax.stop_gradient(valid_mask)
    num = jnp.sum(loss * mask)
    den = jnp.sum(mask)
    if sync_axis is not None:
        # numerator stays LOCAL (each shard's grad is a clean partial of the
        # global objective; the trailing psum of grads completes the sum);
        # only the stop-gradient normalizer is made global
        den = jax.lax.psum(den, sync_axis)
    return num / (den + 1.0)


def normalized_reg_loss(
    reg_delta: jnp.ndarray,
    reg_target: jnp.ndarray,
    reg_weight: jnp.ndarray,
    reg_norm_weight: jnp.ndarray,
    smooth_l1_scalar: float = 3.0,
    l1: bool = False,
    sync_axis=None,
) -> jnp.ndarray:
    """Per-level regression loss (builder.py:381-422): per-dim weighted
    smooth-L1, normalized by (sum of 1/N-points weights + 1); ``sync_axis``
    as in vfl_cls_loss."""
    diff = reg_delta - jax.lax.stop_gradient(reg_target)
    loss = jnp.abs(diff) if l1 else smooth_l1(diff, smooth_l1_scalar)
    w = jax.lax.stop_gradient(reg_weight)
    nw = jax.lax.stop_gradient(reg_norm_weight)
    num = jnp.sum(loss * w * nw)
    den = jnp.sum(nw)
    if sync_axis is not None:
        den = jax.lax.psum(den, sync_axis)  # see vfl_cls_loss
    return num / (den + 1.0)
