"""LR schedules — replaces utils/lr_scheduler.py + the OneCycle variants in
utils/train_utils.py. The shipped recipes use cosine decay with a 2-epoch
gradual (linear) warmup from 0 (config:184,194-197; tools/train.py:243-304).
"""
from __future__ import annotations

import optax


def build_schedule(cfg, steps_per_epoch: int):
    total_steps = max(1, (cfg.end_epoch - cfg.begin_epoch) * steps_per_epoch)
    # clamp: short smoke runs can have warmup >= total, which optax rejects
    warmup_steps = min(int(cfg.warmup_epochs * steps_per_epoch), total_steps - 1)

    if cfg.lr_mode == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.warmup_lr,
            peak_value=cfg.base_lr,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=0.0,
        )
    if cfg.lr_mode == "step":
        boundaries = {
            int(e * steps_per_epoch): 0.1 for e in cfg.lr_steps
        }
        step_fn = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)
        if warmup_steps == 0:
            return step_fn
        warm = optax.linear_schedule(cfg.warmup_lr, cfg.base_lr, warmup_steps)
        return optax.join_schedules([warm, step_fn], [warmup_steps])
    if cfg.lr_mode == "poly":
        sched = optax.polynomial_schedule(
            cfg.base_lr, 0.0, power=2, transition_steps=total_steps - warmup_steps
        )
        if warmup_steps == 0:
            return sched
        warm = optax.linear_schedule(cfg.warmup_lr, cfg.base_lr, warmup_steps)
        return optax.join_schedules([warm, sched], [warmup_steps])
    if cfg.lr_mode == "constant":
        return optax.constant_schedule(cfg.base_lr)
    if cfg.lr_mode == "onecycle":
        # OneCycleScheduler equivalent (utils/train_utils.py:28-62):
        # linear ramp to peak over warmup fraction, cosine down to ~0
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=cfg.base_lr,
            pct_start=max(0.05, min(0.5, warmup_steps / total_steps)),
            div_factor=25.0,
            final_div_factor=1e4,
        )
    raise ValueError(f"unknown lr_mode {cfg.lr_mode}")


def build_optimizer(cfg, steps_per_epoch: int):
    """SGD-momentum with MXNet-style elementwise gradient clipping and coupled
    weight decay (tools/train.py:330-368: clip_gradient=35, wd=1e-5,
    momentum=0.9). Also supports AdamW (utils/train_utils.py:140-302)."""
    sched = build_schedule(cfg, steps_per_epoch)
    clip_mode = getattr(cfg, "clip_mode", "elementwise")
    if clip_mode == "global_norm":  # clip_global_norm (train_utils.py:96-137)
        clip = optax.clip_by_global_norm(cfg.clip_gradient)
    else:  # MXNet clip_gradient is elementwise
        clip = optax.clip(cfg.clip_gradient)
    if cfg.optimizer == "sgd":
        tx = optax.chain(
            clip,
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(learning_rate=sched, momentum=cfg.momentum),
        )
    elif cfg.optimizer == "adamw":
        tx = optax.chain(
            clip,
            optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    return tx, sched
