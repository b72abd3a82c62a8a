"""Orbax checkpointing — replaces the reference's epoch-end
mx.model.save_checkpoint / load_checkpoint pair (utils/callback.py:102-106,
utils/load_model.py:5-51). The reference's checkpoint is a flat dict of
arg/aux NDArrays; here the whole TrainState pytree (params, batch_stats,
optimizer state, step) round-trips, so resume restores optimizer momentum too
(which the reference saved but never wired up, detection_module.py:904-933).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def checkpoint_dir(cfg) -> str:
    return os.path.abspath(os.path.join(cfg.experiment_dir, cfg.name, "checkpoints"))


def save_checkpoint(state, cfg, epoch: int) -> str:
    path = checkpoint_dir(cfg)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(path, f"epoch_{epoch:04d}")
    state = jax.device_get(state)
    ckptr.save(target, state, force=True)
    ckptr.wait_until_finished()
    return target


def latest_epoch(cfg) -> Optional[int]:
    """get_latest_ckpt_epoch equivalent (utils/load_model.py:5-15)."""
    path = checkpoint_dir(cfg)
    if not os.path.isdir(path):
        return None
    epochs = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("epoch_") and d.split("_")[1].isdigit()
    ]
    return max(epochs) if epochs else None


def restore_checkpoint(state_template, cfg, epoch: Optional[int] = None):
    """Restore a TrainState; ``state_template`` provides the pytree structure
    (abstract shapes). Returns (state, epoch) or (template, None)."""
    if epoch is None:
        epoch = latest_epoch(cfg)
    if epoch is None:
        return state_template, None
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(checkpoint_dir(cfg), f"epoch_{epoch:04d}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
    state = ckptr.restore(target, abstract)
    return state, epoch
