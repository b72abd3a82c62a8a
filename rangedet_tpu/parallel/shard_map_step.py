"""shard_map train step — the multi-chip data-parallel path.

Manual (shard_map) sharding is what the Pallas kernels require: pallas_call
cannot ride GSPMD's auto partitioner, so each data shard runs the kernels on
its local batch and gradients are psum-averaged over the "data" axis exactly
like Horovod's DistributedOptimizer allreduce (reference
tools/train.py:67-79).

BatchNorm semantics follow how the model was built:

* ``cfg.bn_sync_axis="data"`` (cfg.sync_bn=True): every BatchNorm psums its
  per-shard (sum, sum-sq, count) over the axis — exact global sync-BN, fed
  by the conv kernels' in-kernel stat sums where available;
* ``bn_sync_axis=None`` (cfg.sync_bn=False): per-shard statistics — the
  reference's "localbn" (mxnext/complicate.py:55-66); running aux stats are
  pmean-synced every step (the reference synced them at epoch end,
  utils/detection_module.py:1164-1170 — they only matter at eval).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.detector import build_train_targets, compute_losses
from .mesh import batch_spec


def make_shard_map_train_step(model, cfg, mesh: Mesh):
    """Returns train_step(state, batch) with batch sharded over "data" (and,
    when the mesh has a "model" axis with cfg.width_axis set, the range-image
    WIDTH sharded over "model" — the convs exchange explicit halos, see
    layers.width_halo_exchange); jit-compatible; params replicated. BN
    semantics per the model's bn_sync_axis (see module docstring)."""
    from jax.experimental.shard_map import shard_map

    # sync mode: the model was built with bn_sync_axis covering the mesh
    # axes; losses then also normalize over the GLOBAL batch (psum'd
    # numerator/denominator), and each shard's grad is a partial of the same
    # global objective — so gradients pSUM (not pmean). The result is
    # bit-equivalent (up to psum reassociation) to the GSPMD sync-BN step
    # (tests/test_shard_map_bn.py, tests/test_width_shard.py).
    sync = getattr(model, "bn_sync_axis", None)
    width = getattr(model, "width_axis", None)
    axes = tuple(mesh.axis_names) if width is not None else ("data",)
    if width is not None:
        assert sync is not None, (
            "width-sharded shard_map requires sync BN/loss semantics "
            "(per-shard localbn over a partial frame is not the reference's "
            "per-replica BN)"
        )

    def loss_fn(params, batch_stats, batch):
        targets = build_train_targets(batch, cfg)
        (cls_logits, reg_deltas), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["input_data"],
            batch["coord"],
            True,
            mutable=["batch_stats"],
        )
        total, metrics = compute_losses(
            cls_logits, reg_deltas, targets, cfg, sync_axis=sync
        )
        return total, (metrics, mut["batch_stats"])

    def per_shard(state, batch):
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        if sync is not None:
            # per-shard grads/metrics are partials of the global objective
            # (local numerators over the psum'd normalizer) — sum them
            grads = jax.lax.psum(grads, axes)
            metrics = jax.lax.psum(metrics, axes)
        else:
            grads = jax.lax.pmean(grads, axes)
            metrics = jax.lax.pmean(metrics, axes)
        # epoch-end aux allreduce of the reference, done per step (identical
        # across shards already in sync mode)
        new_stats = jax.lax.pmean(new_stats, axes)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, metrics

    def train_step(state, batch: Dict[str, jnp.ndarray]):
        batch_specs = {k: batch_spec(mesh, v.ndim) for k, v in batch.items()}
        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), batch_specs),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return fn(state, batch)

    return train_step


# back-compat name: the localbn parity path is this same step with a model
# built without bn_sync_axis
make_local_bn_train_step = make_shard_map_train_step
