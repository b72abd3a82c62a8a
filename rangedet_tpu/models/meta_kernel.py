"""Meta-Kernel: coordinate-conditioned dynamic convolution — the signature op
of RangeDet (reference: rangedet/symbol/backbone/meta_kernel.py:166-240,
``meta_baseline_bias``).

For every pixel, the 3x3 neighborhood's *relative Cartesian coordinates*
(neighbor xyz − center xyz) are pushed through a shared 2-layer MLP to produce
per-tap, per-channel weights, which multiply the im2col'd features; the K²·C
products are flattened into channels and aggregated by the caller's 1x1 conv.

This module is the pure-XLA formulation (gather via 9 static slices + two
einsum matmuls that map straight onto the MXU). It doubles as the numerical
oracle for the fused Pallas kernel in ops/meta_kernel_pallas.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import extract_patches_3x3


class MetaKernel(nn.Module):
    """Args mirror the reference config's meta_kernel_units entry
    (config/rangedet/rangedet_veh_wo_aug_4_18e.py:95-103): channel_list is the
    MLP width list (last entry must equal the input feature channels).
    """

    channel_list: Sequence[int] = (32, 64)
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """feat: (B, H, W, C); coords: (B, H, W, 3) normalized xyz.

        Returns (B, H, W, 9*C) weighted neighborhood features.
        """
        B, H, W, C = feat.shape
        assert self.channel_list[-1] == C, (
            f"MetaKernel MLP must end at the feature width ({C}), "
            f"got {self.channel_list}"
        )
        coords = coords.astype(self.dtype)

        # per-tap MLP params (fc-relu-fc, with bias, no norm — reference
        # meta_kernel.py:209-215 passes no_bias=False, use_norm default False)
        dense_layers = []
        for i, ch in enumerate(self.channel_list):
            dense_layers.append(
                nn.Dense(
                    ch,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"mlp{i}",
                )
            )

        if self.use_pallas and not self.is_initializing():
            from ..ops.meta_kernel_pallas import meta_kernel_fused

            w0 = self.variables["params"]["mlp0"]
            w1 = self.variables["params"]["mlp1"]
            return meta_kernel_fused(
                feat,
                coords,
                w0["kernel"].astype(self.dtype),
                w0["bias"].astype(self.dtype),
                w1["kernel"].astype(self.dtype),
                w1["bias"].astype(self.dtype),
                32,
                jax.default_backend() != "tpu",  # interpret off-TPU
            )

        nb_coords = extract_patches_3x3(coords)  # (B, H, W, 9, 3)
        rel = nb_coords - coords[:, :, :, None, :]  # (B, H, W, 9, 3)

        w = rel
        for i, layer in enumerate(dense_layers):
            w = layer(w)
            if i != len(dense_layers) - 1:
                w = nn.relu(w)
        # w: (B, H, W, 9, C) dynamic per-tap weights

        nb_feat = extract_patches_3x3(feat.astype(self.dtype))  # (B, H, W, 9, C)
        out = nb_feat * w
        return out.reshape(B, H, W, 9 * C)
