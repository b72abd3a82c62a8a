"""DLA-style backbone over the range image — Flax/NHWC re-design of the
reference symbol builder (rangedet/symbol/backbone/dla_backbone.py:13-175).

Key property preserved: the network downsamples the *width only* (strides
(1,2) at res2a/res2/res3a/res3) — range images are 64 px tall and 2650 px
wide — and re-aggregates with deconv "agg" nodes into per-stride outputs
{1: agg3(+input skip), 2: agg2a, 4: agg2, 16: res3}.

The Meta-Kernel replaces the first conv of a configurable unit (shipped
config: res1_unit2) followed by a 1x1 aggregation conv
(dla_backbone.py:59-103).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    PLANAR_LAYOUTS,
    BatchNorm,
    BatchNormFold,
    ConvNormRelu,
    DeconvNormRelu,
    PendingBN,
    channel_axis_of,
    conv1x1_bhcw,
    conv1x1_planar,
    conv3x3_bhcw_consume,
    conv3x3_bhcw_width_sharded,
    conv3x3_planar_core,
)
from .meta_kernel import MetaKernel

DEFAULT_NUM_BLOCK = {
    "res1": 2, "res2a": 3, "res2": 3, "res3a": 5, "res3": 5,
    "agg1": 2, "agg2": 2, "agg2a": 1, "agg3": 2,
}
DEFAULT_NUM_FILTER = {
    "res1": 64, "res2a": 64, "res2": 128, "res3a": 128, "res3": 128,
    "agg1": 64, "agg2": 128, "agg2a": 64, "agg3": 64,
}
DEFAULT_META_UNITS = {
    "res1_unit2": dict(channel_list=(32, 64)),
}


class BhcwMetaAggBN(nn.Module):
    """meta_agg's BN applied in (B, H, C, W) — scoped so the param path is
    exactly meta_agg/bn, identical to the nhwc ConvNormRelu tree."""

    use_running_average: bool
    dtype: Any
    bn_sync_axis: Any = None

    @nn.compact
    def __call__(self, x):
        return BatchNorm(
            self.use_running_average, self.dtype, channel_axis=2,
            sync_axis=self.bn_sync_axis, name="bn",
        )(x)


class MetaBlock(nn.Module):
    """Meta-Kernel -> BN -> relu -> 1x1 aggregation conv-BN-relu
    (dla_backbone.py:59-103's meta_kernel_conv). Separate module so it can be
    wrapped in nn.remat: the (B, H, W, 9C) weighted-neighborhood tensor is by
    far the largest activation in the net and is cheap to recompute."""

    channel_list: Sequence[int]
    features: int
    dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    # pallas_eval: run the fused block at eval time too. Off by default —
    # pass B recomputes the taps (2x the MXU work of the materialized
    # einsum), which wins in training (it replaces 3-4 HBM traversals of
    # the 782 MB 9C tensor; grad 47->39 ms measured) but loses at eval
    # (one write + one fused read; 37->53 ms measured). Tests force it on
    # to cover the eval kernel path.
    pallas_eval: bool = False
    # layout="bhcw" computes the whole block in (B, H, C, W) with a param
    # tree IDENTICAL to the nhwc one (profiled: the nhwc round-trip cost
    # ~7 ms/step in pure layout copies of the 9C tensor). Other layouts take
    # (B, H, W, C) input (BasicBlock transposes for "planar").
    layout: str = "nhwc"
    bn_sync_axis: Any = None
    width_axis: Any = None  # see layers.ConvNormRelu.width_axis

    @nn.compact
    def __call__(self, x, coords, train: bool = True):
        ura = not train
        bhcw = self.layout == "bhcw"
        if (
            bhcw
            and self.use_pallas
            and self.width_axis is None
            and not self.is_initializing()
            and (train or self.pallas_eval)
        ):
            return self._bhcw_fused(x, coords, ura)
        mk = MetaKernel(
            channel_list=tuple(self.channel_list),
            dtype=self.dtype,
            use_pallas=self.use_pallas and not bhcw,
            layout="bhcw" if bhcw else "nhwc",
            width_axis=self.width_axis,
            name="meta_kernel",
        )(x, coords)
        mk = BatchNorm(
            ura, self.dtype, channel_axis=2 if bhcw else -1,
            sync_axis=self.bn_sync_axis, name="meta_bn",
        )(mk)
        mk = nn.relu(mk)
        if bhcw and not self.is_initializing():
            # same nn.Conv("conv")+BN("bn") params as nhwc, applied natively
            agg = self.variables["params"]["meta_agg"]["conv"]["kernel"]
            y = conv1x1_bhcw(mk, agg[0, 0].astype(self.dtype))
            y = BhcwMetaAggBN(
                ura, self.dtype, self.bn_sync_axis, name="meta_agg"
            )(y)
            return nn.relu(y)
        if bhcw:  # init: create the identical nhwc param tree
            mk = jnp.transpose(mk, (0, 1, 3, 2))
            out = ConvNormRelu(
                self.features, kernel=(1, 1), dtype=self.dtype,
                use_running_average=ura, name="meta_agg",
            )(mk)
            return jnp.transpose(out, (0, 1, 3, 2))
        return ConvNormRelu(
            self.features, kernel=(1, 1), dtype=self.dtype,
            use_running_average=ura, bn_sync_axis=self.bn_sync_axis,
            name="meta_agg",
        )(mk)

    def _bhcw_fused(self, x, coords, ura):
        """Fully-fused block: the (B, H, 9C, W) weighted-neighborhood tensor
        never touches HBM (ops/meta_block_pallas.py). Pass A accumulates the
        meta_bn statistic sums in-kernel; the fold runs in BatchNormFold
        (same param paths as the unfused BatchNorm, checkpoints
        interchangeable); pass B recomputes the taps and contracts straight
        into the meta_agg 1×1 conv."""
        from ..ops.meta_block_pallas import meta_agg_bhcw, meta_stats_bhcw

        B, H, C, W = x.shape
        interpret = jax.default_backend() != "tpu"
        p = self.variables["params"]["meta_kernel"]
        d = self.dtype
        w0 = p["mlp0"]["kernel"].astype(d)
        b0 = p["mlp0"]["bias"].astype(d)
        w1 = p["mlp1"]["kernel"].astype(d)
        b1 = p["mlp1"]["bias"].astype(d)
        agg = self.variables["params"]["meta_agg"]["conv"]["kernel"]
        agg = agg[0, 0].astype(d)  # (9C, Co)
        cb = jnp.transpose(coords, (0, 1, 3, 2)).astype(x.dtype)
        if ura:
            s1 = s2 = jnp.zeros((9 * C,), jnp.float32)
        else:
            s1, s2 = meta_stats_bhcw(x, cb, w0, b0, w1, b1, interpret)
        s9, b9 = BatchNormFold(
            ura, sync_axis=self.bn_sync_axis, name="meta_bn"
        )(s1, s2, float(B * H * W))
        y = meta_agg_bhcw(x, cb, w0, b0, w1, b1, s9, b9, agg, interpret)
        y = BhcwMetaAggBN(
            ura, self.dtype, self.bn_sync_axis, name="meta_agg"
        )(y)
        return nn.relu(y)


class BasicBlock(nn.Module):
    """Residual basic block; first conv optionally replaced by a Meta-Kernel
    (+BN+relu+1x1 agg conv+BN+relu), mirroring DLABackboneBuilder.basicblock /
    meta_kernel_conv (dla_backbone.py:18-103)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    proj: bool = False
    meta_channel_list: Optional[Sequence[int]] = None
    dtype: Any = jnp.bfloat16
    use_pallas_meta: bool = False
    use_pallas_conv: bool = True
    remat_meta: bool = True
    layout: str = "nhwc"
    bn_sync_axis: Any = None
    width_axis: Any = None  # see layers.ConvNormRelu.width_axis

    @nn.compact
    def __call__(self, x, coords=None, train: bool = True):
        ura = not train
        planar = self.layout in PLANAR_LAYOUTS
        ch_ax = channel_axis_of(self.layout)
        if self.meta_channel_list is not None:
            # the fused bhcw block needs no remat: its custom VJP saves only
            # the block INPUTS (ops/meta_block_pallas.py:_agg_fwd residuals)
            # and the 9C tensor never materializes, so nn.remat would only
            # re-run both Pallas passes in the backward for no memory win
            fused_meta = (
                self.use_pallas_meta
                and self.layout == "bhcw"
                and self.width_axis is None
            )
            block_cls = (
                nn.remat(MetaBlock, static_argnums=(3,))
                if self.remat_meta and not fused_meta
                else MetaBlock
            )
            if self.layout == "planar":
                mk_in = jnp.transpose(x, (0, 2, 3, 1))
            else:  # nhwc and bhcw: MetaBlock handles both natively
                mk_in = x
            y = block_cls(
                channel_list=tuple(self.meta_channel_list),
                features=self.features,
                dtype=self.dtype,
                use_pallas=self.use_pallas_meta,
                layout="bhcw" if self.layout == "bhcw" else "nhwc",
                bn_sync_axis=self.bn_sync_axis,
                width_axis=self.width_axis,
                name="meta_block",
            )(mk_in, coords, train)
            if self.layout == "planar":
                y = jnp.transpose(y, (0, 3, 1, 2))
        else:
            y = ConvNormRelu(
                self.features, dtype=self.dtype, use_running_average=ura,
                layout=self.layout, use_pallas=self.use_pallas_conv,
                # bhcw: conv1's BN apply + relu fuses into conv2's ingest
                emit_pending=self.layout == "bhcw",
                bn_sync_axis=self.bn_sync_axis,
                width_axis=self.width_axis,
                name="conv1",
            )(x)

        sums2 = None
        if planar:
            yc = y.y if isinstance(y, PendingBN) else y
            k2 = self.param(
                "conv2_kernel", nn.initializers.lecun_normal(),
                (3, 3, yc.shape[ch_ax], self.features), jnp.float32,
            )
            if self.layout == "planar":
                y = conv3x3_planar_core(
                    y.astype(self.dtype), k2.astype(self.dtype),
                    self.strides[1]
                )
            else:
                if not isinstance(y, PendingBN):
                    y = y.astype(self.dtype)
                if self.width_axis is not None and not self.is_initializing():
                    y = conv3x3_bhcw_width_sharded(
                        y, k2.astype(self.dtype), self.strides[1],
                        self.use_pallas_conv, self.width_axis,
                    )
                else:
                    y, sums2 = conv3x3_bhcw_consume(
                        y, k2.astype(self.dtype),
                        self.strides[1], self.use_pallas_conv,
                        want_stats=train and not self.is_initializing(),
                    )
        else:
            y = nn.Conv(
                self.features, (3, 3), strides=self.strides, padding="SAME",
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name="conv2",
            )(y)
        y = BatchNorm(
            ura, self.dtype, channel_axis=ch_ax,
            sync_axis=self.bn_sync_axis, name="bn2",
        )(y, sums2)

        if self.proj:
            if planar:
                ks = self.param(
                    "sc_kernel", nn.initializers.lecun_normal(),
                    (x.shape[ch_ax], self.features), jnp.float32,
                )
                c1 = (
                    conv1x1_planar if self.layout == "planar" else conv1x1_bhcw
                )
                sc = c1(
                    x.astype(self.dtype), ks.astype(self.dtype), self.strides[1]
                )
            else:
                sc = nn.Conv(
                    self.features, (1, 1), strides=self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="sc_conv",
                )(x)
            sc = BatchNorm(
                ura, self.dtype, channel_axis=ch_ax,
                sync_axis=self.bn_sync_axis, name="sc_bn",
            )(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class ResStage(nn.Module):
    """num_block BasicBlocks; unit1 projects (+stride), rest are identity
    (dla_backbone.py:106-114)."""

    name_key: str
    num_block: int
    features: int
    strides: Tuple[int, int] = (1, 1)
    meta_units: Mapping[str, dict] = None
    dtype: Any = jnp.bfloat16
    use_pallas_meta: bool = False
    use_pallas_conv: bool = True
    remat_meta: bool = True
    layout: str = "nhwc"
    bn_sync_axis: Any = None
    width_axis: Any = None  # see layers.ConvNormRelu.width_axis

    @nn.compact
    def __call__(self, x, coords=None, train: bool = True):
        meta_units = self.meta_units or {}
        for i in range(1, self.num_block + 1):
            unit_name = f"{self.name_key}_unit{i}"
            meta_cfg = meta_units.get(unit_name)
            x = BasicBlock(
                self.features,
                strides=self.strides if i == 1 else (1, 1),
                proj=(i == 1),
                meta_channel_list=(
                    meta_cfg["channel_list"] if meta_cfg else None
                ),
                dtype=self.dtype,
                use_pallas_meta=self.use_pallas_meta,
                use_pallas_conv=self.use_pallas_conv,
                remat_meta=self.remat_meta,
                layout=self.layout,
                bn_sync_axis=self.bn_sync_axis,
                width_axis=self.width_axis,
                name=unit_name,
            )(x, coords, train)
        return x


class DLABackbone(nn.Module):
    """Full backbone: returns {stride: NHWC feature} for the requested
    fpn_strides (dla_backbone.py:130-161)."""

    fpn_strides: Sequence[int] = (1, 2, 4)
    num_block: Mapping[str, int] = None
    num_filter: Mapping[str, int] = None
    meta_units: Mapping[str, dict] = None
    add_data_sc: bool = True
    dtype: Any = jnp.bfloat16
    use_pallas_meta: bool = False
    use_pallas_conv: bool = True
    remat_meta: bool = True
    # gradient checkpointing over res/agg stages — the jax.checkpoint
    # equivalent of the reference's memonger mirror planning
    # (utils/memonger_v2.py:172-273; off in shipped configs, config:169)
    remat: bool = False
    layout: str = "nhwc"  # "planar": internal (B, C, H, W), see layers.py
    bn_sync_axis: Any = None
    width_axis: Any = None  # see layers.ConvNormRelu.width_axis

    @nn.compact
    def __call__(self, data, coords, train: bool = True):
        nb = dict(self.num_block or DEFAULT_NUM_BLOCK)
        nf = dict(self.num_filter or DEFAULT_NUM_FILTER)
        meta = self.meta_units if self.meta_units is not None else DEFAULT_META_UNITS

        data = data.astype(self.dtype)
        planar = self.layout in PLANAR_LAYOUTS
        if self.layout == "planar":
            data = jnp.transpose(data, (0, 3, 1, 2))
        elif self.layout == "bhcw":
            data = jnp.transpose(data, (0, 1, 3, 2))

        def res(name, x, strides, coords=None):
            stage_cls = ResStage
            if self.remat:
                stage_cls = nn.remat(ResStage, static_argnums=(3,))
            return stage_cls(
                name_key=name,
                num_block=nb[name],
                features=nf[name],
                strides=strides,
                meta_units=meta,
                dtype=self.dtype,
                use_pallas_meta=self.use_pallas_meta,
                use_pallas_conv=self.use_pallas_conv,
                remat_meta=self.remat_meta,
                layout=self.layout,
                bn_sync_axis=self.bn_sync_axis,
                width_axis=self.width_axis,
                name=name,
            )(x, coords, train)

        def agg(name, x_const, x_up, deconv_kernel, deconv_strides):
            up = DeconvNormRelu(
                nf[name], deconv_kernel, deconv_strides, dtype=self.dtype,
                use_running_average=not train, layout=self.layout,
                bn_sync_axis=self.bn_sync_axis,
                width_axis=self.width_axis,
                name=f"{name}_deconv",
            )(x_up)
            return res(name, x_const + up, (1, 1))

        res1 = res("res1", data, (1, 1), coords)
        res2a = res("res2a", res1, (1, 2))
        res2 = res("res2", res2a, (1, 2))
        res3a = res("res3a", res2, (1, 2))
        res3 = res("res3", res3a, (1, 2))

        agg2 = agg("agg2", res2, res3, (3, 8), (1, 4))
        agg1 = agg("agg1", res1, res2, (3, 8), (1, 4))
        agg2a = agg("agg2a", res2a, agg2, (3, 4), (1, 2))
        agg3 = agg("agg3", agg1, agg2a, (3, 4), (1, 2))

        if self.add_data_sc:
            agg3 = jnp.concatenate(
                [data, agg3], axis=channel_axis_of(self.layout)
            )

        out: Dict[int, jnp.ndarray] = {1: agg3, 2: agg2a, 4: agg2, 16: res3}
        return [out[s] for s in self.fpn_strides]
