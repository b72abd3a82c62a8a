"""LR / momentum schedules + optimizers — replaces utils/lr_scheduler.py and
utils/train_utils.py (OneCycleScheduler :28-62, OneCycleMomentumScheduler
:65-93, clip_global_norm :96-137, registered AdamW/AdamWS optimizers
:140-302). The shipped recipes use cosine decay with a 2-epoch gradual
(linear) warmup from 0 (config:184,194-197; tools/train.py:243-304).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def _annealing_cos(start, end, pct):
    """Cosine anneal start→end as pct goes 0→1 — the reference's
    OneCycleScheduler.annealing_cos (utils/train_utils.py:46-52), exactly."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_schedule(total_steps: int, peak: float, div_factor: float = 10.0,
                      pct_start: float = 0.4, final_div: float = 1e4):
    """The reference's OneCycleScheduler (utils/train_utils.py:28-62):
    cosine low→peak over the first pct_start of training, then cosine
    peak→low/final_div for the rest, with low = peak / div_factor."""
    warmup = max(1, int(total_steps * pct_start))
    low = peak / div_factor

    def sched(count):
        count = jnp.asarray(count, jnp.float32)
        up = _annealing_cos(low, peak, count / warmup)
        down = _annealing_cos(
            peak, low / final_div,
            (count - warmup) / max(total_steps - warmup, 1),
        )
        return jnp.where(count <= warmup, up, down)

    return sched


def onecycle_momentum_schedule(total_steps: int, moms=(0.95, 0.85),
                               pct_start: float = 0.4):
    """OneCycleMomentumScheduler (utils/train_utils.py:65-93): momentum
    anneals HIGH→LOW while the LR ramps up, then LOW→HIGH during the decay
    (the fastai recipe — large steps get less inertia)."""
    warmup = max(1, int(total_steps * pct_start))

    def sched(count):
        count = jnp.asarray(count, jnp.float32)
        down = _annealing_cos(moms[0], moms[1], count / warmup)
        up = _annealing_cos(
            moms[1], moms[0], (count - warmup) / max(total_steps - warmup, 1)
        )
        return jnp.where(count <= warmup, down, up)

    return sched


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
        return onecycle_schedule(
            total_steps, cfg.base_lr,
            div_factor=getattr(cfg, "onecycle_div_factor", 10.0),
            pct_start=getattr(cfg, "onecycle_pct_start", 0.4),
        )
    raise ValueError(f"unknown lr_mode {cfg.lr_mode}")


def weight_standardize_after_update(eps: float = 1e-10):
    """AdamWS's post-update weight standardization
    (utils/train_utils.py:289-302): after every optimizer step, each 4-D conv
    kernel is re-centered/scaled to per-output-filter mean 0 / std 1. The
    reference reduces over OIHW axes (1,2,3) = everything but the output
    channel; Flax kernels are HWIO, so we reduce (0,1,2). Implemented as a
    trailing optax transform that rewrites the incremental update so
    params + update' equals standardize(params + update)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("weight_standardize_after_update needs params")
        import jax

        def std_one(u, p):
            if u is None or p is None or jnp.ndim(p) != 4:
                return u
            new_w = p + u
            mean = new_w.mean(axis=(0, 1, 2), keepdims=True)
            std = jnp.sqrt(
                ((new_w - mean) ** 2).mean(axis=(0, 1, 2), keepdims=True)
            ) + eps
            return (new_w - mean) / std - p

        return jax.tree_util.tree_map(std_one, updates, params), state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg, steps_per_epoch: int):
    """SGD-momentum with MXNet-style elementwise gradient clipping and coupled
    weight decay (tools/train.py:330-368: clip_gradient=35, wd=1e-5,
    momentum=0.9). Also AdamW and AdamWS (utils/train_utils.py:140-302).
    With lr_mode="onecycle", the momentum/beta1 ALSO cycles against the LR
    (OneCycleMomentumScheduler, train_utils.py:65-93) via inject_hyperparams.
    """
    sched = build_schedule(cfg, steps_per_epoch)
    clip_mode = getattr(cfg, "clip_mode", "elementwise")
    if clip_mode == "global_norm":  # clip_global_norm (train_utils.py:96-137)
        clip = optax.clip_by_global_norm(cfg.clip_gradient)
    else:  # MXNet clip_gradient is elementwise
        clip = optax.clip(cfg.clip_gradient)

    mom_sched = None
    if cfg.lr_mode == "onecycle":
        total_steps = max(
            1, (cfg.end_epoch - cfg.begin_epoch) * steps_per_epoch
        )
        mom_sched = onecycle_momentum_schedule(
            total_steps,
            moms=getattr(cfg, "onecycle_moms", (0.95, 0.85)),
            pct_start=getattr(cfg, "onecycle_pct_start", 0.4),
        )

    if cfg.optimizer == "sgd":
        if mom_sched is not None:
            sgd = optax.inject_hyperparams(optax.sgd)(
                learning_rate=sched, momentum=mom_sched
            )
        else:
            sgd = optax.sgd(learning_rate=sched, momentum=cfg.momentum)
        tx = optax.chain(
            clip,
            optax.add_decayed_weights(cfg.weight_decay),
            sgd,
        )
    elif cfg.optimizer in ("adamw", "adamws"):
        b2 = getattr(cfg, "adam_beta2", 0.999)
        if mom_sched is not None:
            adam = optax.inject_hyperparams(optax.adamw)(
                learning_rate=sched, b1=mom_sched, b2=b2,
                weight_decay=cfg.weight_decay,
            )
        else:
            adam = optax.adamw(
                learning_rate=sched, b2=b2, weight_decay=cfg.weight_decay
            )
        parts = [clip, adam]
        if cfg.optimizer == "adamws":
            parts.append(weight_standardize_after_update())
        tx = optax.chain(*parts)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    return tx, sched
