"""shard_map train step with per-replica ("local") BatchNorm — the strict
parity path for the reference's localbn + allreduced gradients.

The default GSPMD step (train/train_step.py) lets XLA reduce BN statistics
globally (sync-BN). The reference instead normalizes with *per-GPU* batch
statistics (mxnext/complicate.py:55-66 "localbn") and only allreduces the
running aux stats at epoch end (utils/detection_module.py:1164-1170). Under
shard_map each data shard computes its own BN statistics (local semantics),
gradients are psum-averaged over the "data" axis exactly like Horovod's
DistributedOptimizer allreduce, and the running stats are pmean-synced every
step (strictly more often than the reference's epoch-end sync — running stats
only matter at eval).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.detector import build_train_targets, compute_losses
from .mesh import batch_spec


def make_local_bn_train_step(model, cfg, mesh: Mesh):
    """Returns train_step(state, batch) with batch sharded over "data" and
    per-shard BN statistics. Jit-compatible; params replicated."""
    from jax.experimental.shard_map import shard_map

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

    def per_shard(state, batch):
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        grads = jax.lax.pmean(grads, "data")
        metrics = jax.lax.pmean(metrics, "data")
        # epoch-end aux allreduce of the reference, done per step
        new_stats = jax.lax.pmean(new_stats, "data")
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
