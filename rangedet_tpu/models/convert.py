"""Cross-layout parameter conversion: layout="planar" and layout="nhwc"
models are numerically identical but store their conv kernels under different
pytree paths (planar modules own their kernels directly; NHWC uses nn.Conv /
nn.ConvTranspose submodules) and 1x1 kernels with different ranks.

This enables the fastest mix: train with the planar conv stack (~9% faster
step), evaluate/serve with the NHWC stack (~20% faster at batch 1), moving
checkpoints freely between them.
"""
from __future__ import annotations

from typing import Any, Dict

import flax
import jax.numpy as jnp


def _walk(tree: Dict[str, Any], planar_to_nhwc: bool) -> Dict[str, Any]:
    out = {}
    for key, val in tree.items():
        if not isinstance(val, dict):
            out[key] = val
            continue
        val = dict(val)
        if planar_to_nhwc:
            # ConvNormRelu / DeconvNormRelu planar: own "kernel" leaf next to
            # a "bn" submodule -> nn.Conv/nn.ConvTranspose submodule. (1x1
            # convs inside MetaBlock stay nn.Conv in both layouts.)
            if "kernel" in val and "bn" in val:
                k = val.pop("kernel")
                sub = "conv" if k.shape[:2] == (3, 3) else "deconv"
                val[sub] = {"kernel": k}
            # BasicBlock direct kernels
            if "conv2_kernel" in val:
                val["conv2"] = {"kernel": val.pop("conv2_kernel")}
            if "sc_kernel" in val:
                val["sc_conv"] = {"kernel": val.pop("sc_kernel")[None, None]}
            # head 1x1 projections
            for name in list(val):
                if name.endswith("_kernel") and not isinstance(val[name], dict):
                    base = name[: -len("_kernel")]
                    bias = val.pop(base + "_bias")
                    val[base] = {"kernel": val.pop(name)[None, None], "bias": bias}
        else:
            # nhwc -> planar (1x1 nn.Conv submodules stay as-is: MetaBlock)
            if "conv" in val and set(val["conv"]) == {"kernel"} and "bn" in val:
                if val["conv"]["kernel"].shape[:2] == (3, 3):
                    val["kernel"] = val.pop("conv")["kernel"]
            if "deconv" in val and set(val["deconv"]) == {"kernel"} and "bn" in val:
                val["kernel"] = val.pop("deconv")["kernel"]
            if "conv2" in val and set(val["conv2"]) == {"kernel"}:
                val["conv2_kernel"] = val.pop("conv2")["kernel"]
            if "sc_conv" in val and set(val["sc_conv"]) == {"kernel"}:
                val["sc_kernel"] = val.pop("sc_conv")["kernel"][0, 0]
            for name in list(val):
                if (
                    isinstance(val[name], dict)
                    and set(val[name]) == {"kernel", "bias"}
                    and ("logit" in name or "delta" in name)
                ):
                    leaf = val.pop(name)
                    val[name + "_kernel"] = leaf["kernel"][0, 0]
                    val[name + "_bias"] = leaf["bias"]
        out[key] = _walk(val, planar_to_nhwc)
    return out


def convert_params(params, to_layout: str):
    """Convert a RangeDet params pytree between layouts.

    "planar" and "bhcw" share an identical parameter tree (the layouts
    differ only in activation axis order), so conversion is only needed to
    or from "nhwc"; planar<->bhcw checkpoints are interchangeable as-is.
    """
    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    return _walk(tree, planar_to_nhwc=(to_layout == "nhwc"))
