#!/usr/bin/env python
"""Train-STEP-level A/B of tail formulations on real hardware.

The knockout profiles (tools/profile_tail.py) attribute fwd-graph time, but
bare jax.grad graphs time unreliably on the tunneled backend (no donation =>
different XLA scheduling; 148-824 ms for a graph whose donated train step
runs 94 ms). The decisive comparison is the full donated train step, timed
steady-state exactly like bench.py, with the loss assembly swapped:

  current  compute_losses as shipped
  planar   same math, trailing dims merged into W before elementwise+reduce
  noskip   IoU-target Pallas kernel with the far-block candidate skip OFF

Usage: python -u tools/profile_step_ab.py [--iters 20] [--variants a,b]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--variants", default="current,planar,noskip")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rangedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.models import losses as L
    from rangedet_tpu.models.detector import (
        build_train_targets,
        compute_losses,
        iou_targets_per_level,
    )
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state

    if args.tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from tiny import tiny_config

        cfg = tiny_config(args.config, True)
    else:
        from rangedet_tpu.configs import load_config

        cfg = load_config(args.config, True)

    batch_np = make_batch(cfg, cfg.batch_image, seed=0, num_boxes=20)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, 1000)
    state0 = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    interp = jax.default_backend() != "tpu"
    N = args.iters

    def planar_compute_losses(cl, rd, targets):
        iou_t = iou_targets_per_level(rd, targets, cfg)
        total = 0.0
        for level, s in enumerate(cfg.fpn_strides):
            B, H, Ws, K = cl[level].shape
            logit = cl[level].reshape(B, H, Ws * K)
            iou = iou_t[level].reshape(B, H, Ws * K)
            mraw = targets[f"mask_s{s}"]
            mask = jnp.broadcast_to(mraw, (B, H, Ws, K)).reshape(B, H, Ws * K)
            vfl = L.varifocal_loss(logit, jax.lax.stop_gradient(iou),
                                   cfg.vfl_alpha, cfg.vfl_gamma)
            cls_loss = jnp.sum(vfl * jax.lax.stop_gradient(mask)) / (
                jnp.sum(jax.lax.stop_gradient(mraw)) + 1.0)
            Bq, Hq, Wq, C = rd[level].shape
            delta = rd[level].reshape(Bq, Hq, Wq * C)
            rt = targets[f"reg_target_s{s}"].reshape(Bq, Hq, Wq * C)
            rw = targets[f"reg_weight_s{s}"].reshape(Bq, Hq, Wq * C)
            nwt = targets[f"reg_norm_weight_s{s}"]
            nw = nwt.reshape(Bq, Hq, Wq * C) if nwt.shape[-1] == C else \
                jnp.broadcast_to(nwt, (Bq, Hq, Wq, C)).reshape(Bq, Hq, Wq * C)
            diff = delta - jax.lax.stop_gradient(rt)
            rl = jnp.abs(diff) if cfg.l1_loss else L.smooth_l1(
                diff, cfg.smooth_l1_scalar)
            reg_loss = jnp.sum(
                rl * jax.lax.stop_gradient(rw) * jax.lax.stop_gradient(nw)
            ) / (jnp.sum(jax.lax.stop_gradient(nwt)) + 1.0)
            total = total + cfg.cls_loss_weight * cls_loss \
                + cfg.reg_loss_weight * reg_loss
        return total

    def make_step(kind):
        def loss_fn(params, batch_stats, b):
            targets = build_train_targets(b, cfg)
            (cl, rd), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b["input_data"], b["coord"], True, mutable=["batch_stats"],
            )
            if kind == "planar":
                total = planar_compute_losses(cl, rd, targets)
            elif kind == "noskip" or kind.startswith("skip_"):
                from rangedet_tpu.ops import iou_target_pallas as itp
                orig = itp.iou_target_fused
                mode = False if kind == "noskip" else kind[len("skip_"):]
                # trace-time switch: wrap with the chosen skip strategy
                def forced(d, pc, gc, topk_gt=32, interpret=interp,
                           skip_far=True, _o=orig, _m=mode):
                    return _o(d, pc, gc, topk_gt, interpret, _m)
                itp.iou_target_fused = forced
                try:
                    total, _ = compute_losses(cl, rd, targets, cfg)
                finally:
                    itp.iou_target_fused = orig
            else:
                total, _ = compute_losses(cl, rd, targets, cfg)
            return total, (total, mut["batch_stats"])

        def step(state, b):
            grads, (total, new_stats) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, b
            )
            state = state.apply_gradients(grads=grads, batch_stats=new_stats)
            return state, total

        return jax.jit(step, donate_argnums=0)

    # NOTE on the noskip monkeypatch: detector imports iou_target_fused
    # lazily inside iou_targets_per_level, so swapping the module attribute
    # at TRACE time is sufficient; the wrapper restores it right after.
    for kind in args.variants.split(","):
        step = make_step(kind)
        state = jax.tree_util.tree_map(jnp.copy, state0)
        for _ in range(3):
            state, total = step(state, batch)
        float(total)
        t0 = time.perf_counter()
        for _ in range(N):
            state, total = step(state, batch)
        float(total)
        dt = (time.perf_counter() - t0) / N * 1000
        print(json.dumps({"step": kind, "ms": round(dt, 2),
                          "loss": round(float(total), 4)}), flush=True)


if __name__ == "__main__":
    main()
