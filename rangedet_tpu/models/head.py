"""Per-level detection head towers — re-design of RangeRpnHead.get_fpn_output
(rangedet/symbol/head/builder.py:198-266).

Each FPN level gets its own cls and reg towers (4 × 3x3 conv-BN-relu @128 in
the shipped configs) topped by 1x1 projections to ``num_classes`` logits and
``num_classes * num_reg_delta`` box deltas. Outputs are cast to fp32 exactly
like the reference (builder.py:257-261) — the decode/loss math is fp32.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    PLANAR_LAYOUTS,
    ConvNormRelu,
    channel_axis_of,
    conv1x1_bhcw,
    conv1x1_planar,
    materialize,
)


class RangeRpnHead(nn.Module):
    num_classes: int = 1
    num_reg_delta: int = 8
    cls_conv_layers: int = 4
    cls_conv_channel: int = 128
    reg_conv_layers: int = 4
    reg_conv_channel: int = 128
    dtype: Any = jnp.bfloat16
    layout: str = "nhwc"
    use_pallas_conv: bool = True
    bn_sync_axis: Any = None
    width_axis: Any = None  # see layers.ConvNormRelu.width_axis

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = True
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """feats: list of NHWC feature maps (one per FPN level).

        Returns (cls_logits, reg_deltas): per level, fp32,
        shapes (B, H, W_s, num_classes) and (B, H, W_s, num_classes * 8).
        """
        gauss = nn.initializers.normal(0.01)
        planar = self.layout in PLANAR_LAYOUTS
        # bhcw towers chain PendingBN: each conv's BN apply + relu is fused
        # into the next conv's kernel ingest; the 1x1 projections fuse the
        # final materialize into their XLA matmul read
        pend = self.layout == "bhcw"
        cls_out, reg_out = [], []
        for level, feat in enumerate(feats):
            cls_feat = reg_feat = feat.astype(self.dtype)
            for i in range(self.cls_conv_layers):
                cls_feat = ConvNormRelu(
                    self.cls_conv_channel,
                    dtype=self.dtype,
                    use_running_average=not train,
                    kernel_init=gauss,
                    layout=self.layout,
                    use_pallas=self.use_pallas_conv,
                    emit_pending=pend,
                    bn_sync_axis=self.bn_sync_axis,
                    width_axis=self.width_axis,
                    name=f"cls_conv_{i}_lvl_{level}",
                )(cls_feat)
            for i in range(self.reg_conv_layers):
                reg_feat = ConvNormRelu(
                    self.reg_conv_channel,
                    dtype=self.dtype,
                    use_running_average=not train,
                    kernel_init=gauss,
                    layout=self.layout,
                    use_pallas=self.use_pallas_conv,
                    emit_pending=pend,
                    bn_sync_axis=self.bn_sync_axis,
                    width_axis=self.width_axis,
                    name=f"reg_conv_{i}_lvl_{level}",
                )(reg_feat)
            cls_feat = materialize(cls_feat)
            reg_feat = materialize(reg_feat)

            if planar:
                cls_logit = self._head_1x1(
                    cls_feat, self.num_classes, gauss, f"cls_logit_lvl_{level}"
                )
                reg_delta = self._head_1x1(
                    reg_feat, self.num_classes * self.num_reg_delta, gauss,
                    f"reg_delta_lvl_{level}",
                )
                # external contract stays NHWC fp32
                perm = (0, 2, 3, 1) if self.layout == "planar" else (0, 1, 3, 2)
                cls_logit = jnp.transpose(cls_logit, perm)
                reg_delta = jnp.transpose(reg_delta, perm)
            else:
                cls_logit = nn.Conv(
                    self.num_classes, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=gauss,
                    name=f"cls_logit_lvl_{level}",
                )(cls_feat)
                reg_delta = nn.Conv(
                    self.num_classes * self.num_reg_delta, (1, 1), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, kernel_init=gauss,
                    name=f"reg_delta_lvl_{level}",
                )(reg_feat)

            cls_out.append(cls_logit.astype(jnp.float32))
            reg_out.append(reg_delta.astype(jnp.float32))
        return cls_out, reg_out

    def _head_1x1(self, x, features, init, name):
        ch_ax = channel_axis_of(self.layout)
        k = self.param(
            f"{name}_kernel", init, (x.shape[ch_ax], features), jnp.float32
        )
        b = self.param(
            f"{name}_bias", nn.initializers.zeros, (features,), jnp.float32
        )
        if self.layout == "planar":
            out = conv1x1_planar(x, k.astype(self.dtype))
            return out + b.astype(self.dtype)[None, :, None, None]
        out = conv1x1_bhcw(x, k.astype(self.dtype))
        return out + b.astype(self.dtype)[None, None, :, None]
