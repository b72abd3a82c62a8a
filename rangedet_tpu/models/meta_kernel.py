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
    # layout="bhcw": feat is (B, H, C, W) and the output is (B, H, 9C, W) —
    # computed natively in that layout (no NHWC transposes; profiling showed
    # the boundary copies cost more than the op itself). The parameter tree
    # is identical across layouts: init always runs the NHWC formulation.
    layout: str = "nhwc"
    width_axis: Any = None  # see layers.ConvNormRelu.width_axis

    @nn.compact
    def __call__(self, feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """feat: (B, H, W, C) [nhwc] or (B, H, C, W) [bhcw]; coords is always
        (B, H, W, 3) normalized xyz.

        Returns (B, H, W, 9*C) [nhwc] or (B, H, 9*C, W) [bhcw] weighted
        neighborhood features (tap-major, channel-minor — matching the
        reference im2col channel order).
        """
        if self.layout == "bhcw":
            if self.is_initializing():
                # create the identical Dense params via the NHWC math
                out = self._nhwc(jnp.transpose(feat, (0, 1, 3, 2)), coords)
                return jnp.transpose(out, (0, 1, 3, 2))
            if self.width_axis is not None:
                # width shard: 1-col halo on feat AND coords (the neighbor
                # taps and their relative coordinates cross the boundary),
                # run the unmodified op, slice the interior — exact
                from .layers import width_halo_exchange

                cb = jnp.transpose(coords, (0, 1, 3, 2))
                feat_e = width_halo_exchange(feat, self.width_axis)
                cb_e = width_halo_exchange(cb, self.width_axis)
                out = self._bhcw(feat_e, jnp.transpose(cb_e, (0, 1, 3, 2)))
                return out[..., 1:-1]
            return self._bhcw(feat, coords)
        assert self.width_axis is None, "width sharding is bhcw-only"
        return self._nhwc(feat, coords)

    def _bhcw(self, feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        import jax.lax as lax

        B, H, C, W = feat.shape
        C_mid = self.channel_list[0]
        p = self.variables["params"]
        w0 = p["mlp0"]["kernel"].astype(self.dtype)  # (3, C_mid)
        b0 = p["mlp0"]["bias"].astype(self.dtype)
        w1 = p["mlp1"]["kernel"].astype(self.dtype)  # (C_mid, C)
        b1 = p["mlp1"]["bias"].astype(self.dtype)

        cb = jnp.transpose(coords, (0, 1, 3, 2)).astype(self.dtype)
        cp = jnp.pad(cb, ((0, 0), (1, 1), (0, 0), (1, 1)))
        fp = jnp.pad(feat, ((0, 0), (1, 1), (0, 0), (1, 1)))
        outs = []
        for dy in range(3):
            for dx in range(3):
                rel = lax.slice(
                    cp, (0, dy, 0, dx), (B, dy + H, 3, dx + W)
                ) - cb  # (B, H, 3, W)
                h = jnp.einsum(
                    "bhcw,cd->bhdw", rel, w0,
                    preferred_element_type=self.dtype,
                ) + b0[None, None, :, None]
                h = nn.relu(h)
                wt = jnp.einsum(
                    "bhdw,dc->bhcw", h, w1,
                    preferred_element_type=self.dtype,
                ) + b1[None, None, :, None]
                nb = lax.slice(fp, (0, dy, 0, dx), (B, dy + H, C, dx + W))
                outs.append(nb.astype(self.dtype) * wt)
        return jnp.concatenate(outs, axis=2)  # (B, H, 9C, W)

    def _nhwc(self, feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
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
