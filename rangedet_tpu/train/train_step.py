"""Jitted train / eval steps.

The whole reference per-batch path — CPU target generation threads
(utils/detection_input.py:147-178) + GPU forward/backward + Horovod allreduce
(utils/detection_module.py:1089-1124) — becomes ONE jitted function: on-device
target generation, forward, loss, backward, optimizer update. Data parallelism
is GSPMD: batch arrays are sharded over the mesh's "data" axis (and optionally
the range-image width over "model"), parameters are replicated, and XLA
inserts the gradient all-reduce over ICI.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.detector import (
    build_train_targets,
    compute_losses,
    run_inference,
)
from .state import TrainState


def make_train_step(model, cfg, tx=None):
    """Returns train_step(state, batch) -> (state, metrics), ready to jit."""

    def loss_fn(params, batch_stats, batch):
        targets = build_train_targets(batch, cfg)
        (cls_logits, reg_deltas), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["input_data"],
            batch["coord"],
            True,
            mutable=["batch_stats"],
        )
        total, metrics = compute_losses(cls_logits, reg_deltas, targets, cfg)
        return total, (metrics, mut["batch_stats"])

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    return train_step


def build_train_step_fn(model, cfg, mesh=None):
    """Select the train step for the mesh:

    * single device (or no mesh): the plain jitted step above;
    * multi-device, data(-only) sharding: the shard_map step — manual
      sharding is required for the Pallas kernels (pallas_call cannot ride
      GSPMD's auto partitioner), gradients psum like Horovod's allreduce,
      and BN statistics follow cfg.sync_bn: True → in-model psum of the
      stat sums (build the model with cfg.bn_sync_axis="data"); False → the
      reference's per-replica "localbn" (mxnext/complicate.py:55-66);
    * width-sharded ("model" axis) meshes: with ``cfg.width_axis`` set the
      shard_map step handles these too — every conv/deconv/Meta-Kernel
      exchanges explicit width halos (layers.width_halo_exchange), so the
      Pallas kernels keep running; without it, the GSPMD step — XLA inserts
      the conv halo exchanges automatically (Pallas must be off; the trainer
      clears use_pallas_* for that mesh shape).

    Returns an unjitted step tagged with ``.bn_semantics``."""
    multi = mesh is not None and mesh.size > 1
    width_sharded = multi and mesh.shape.get("model", 1) > 1
    width_manual = width_sharded and getattr(cfg, "width_axis", None)
    if width_manual:
        from ..parallel.shard_map_step import make_shard_map_train_step

        want = tuple(mesh.axis_names)
        if tuple(getattr(model, "bn_sync_axis", ()) or ()) != want:
            raise ValueError(
                "width-sharded shard_map path: build the model from "
                f"cfg.replace(bn_sync_axis={want!r}, width_axis="
                f"{cfg.width_axis!r}) (tools/train.py does this)"
            )
        fn = make_shard_map_train_step(model, cfg, mesh)
        fn.bn_semantics = "sync"
        return fn
    if not multi or width_sharded:
        if not cfg.sync_bn:
            if not multi:
                fn = make_train_step(model, cfg)
                fn.bn_semantics = "local"  # single device: identical
                return fn
            raise ValueError(
                "cfg.sync_bn=False (local BN) requires a data-only mesh"
            )
        fn = make_train_step(model, cfg)
        fn.bn_semantics = "sync"
        return fn
    from ..parallel.shard_map_step import make_shard_map_train_step

    want_axis = "data" if cfg.sync_bn else None
    if getattr(model, "bn_sync_axis", None) != want_axis:
        raise ValueError(
            "shard_map multi-chip path: build the model from "
            f"cfg.replace(bn_sync_axis={want_axis!r}) so BatchNorm "
            "statistics match cfg.sync_bn (tools/train.py does this)"
        )
    fn = make_shard_map_train_step(model, cfg, mesh)
    fn.bn_semantics = "sync" if want_axis else "local"
    return fn


def make_eval_step(model, cfg):
    """Returns eval_step(state, batch) -> {class: {boxes, valid}} running the
    fused forward + decode + weighted-NMS path; batch must carry per-stride
    pc_s{s} / mask_s{s} (built by build_eval_inputs)."""

    def eval_step(state: TrainState, batch):
        cls_logits, reg_deltas = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input_data"],
            batch["coord"],
            False,
        )
        return run_inference(cls_logits, reg_deltas, batch, cfg)

    return eval_step


def build_eval_inputs(batch: Dict[str, jnp.ndarray], cfg) -> Dict[str, Any]:
    """Add per-stride pc/mask slices to a raw batch for inference — the eval
    analogue of GenerateFPNTarget (valid ∧ range-interval masks, then width
    stride slicing; rangedet/core/input.py:561-607)."""
    from ..ops import targets as ops_targets

    out = dict(batch)
    strides = tuple(cfg.fpn_strides)

    def per_frame(pc, mask, unnorm_range):
        imasks = ops_targets.interval_masks(unnorm_range, cfg.fpn_intervals, strides)
        o = {}
        for s in strides:
            o[f"pc_s{s}"] = ops_targets.stride_slice(pc, s, w_axis=1)
            o[f"mask_s{s}"] = ops_targets.stride_slice(mask * imasks[s], s, w_axis=1)
        return o

    extra = jax.vmap(per_frame)(batch["pc"], batch["mask"], batch["unnorm_range"])
    out.update(extra)
    return out
