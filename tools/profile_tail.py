#!/usr/bin/env python
"""Knockout profiling of the train-step target/loss tail on real hardware.

The BENCH.md profile shows forward-only 24.8 ms vs forward+targets+IoU+loss
36.5 ms at B=2 — an ~12 ms non-matmul tail (VERDICT r3 weak #5). This script
measures each piece's *incremental* cost inside the fused graph by knocking
it out and re-timing, which is the honest way to attribute time under XLA
fusion (isolated timings force materialization and overcount).

Variants (all jitted, chained through a data dependency, synced once):
  full        targets + forward + IoU target + losses      (baseline)
  no_iou      IoU target replaced by zeros                  (Δ = IoU kernel)
  pre_tgt     dense targets precomputed outside the graph   (Δ = target gen)
  no_tail     forward only + trivial reduction              (Δ = whole tail)
and the same for grad() of each, to see what the tail costs in backward.

Usage: python -u tools/profile_tail.py [--iters 15] [--grad] [--cpu --tiny]
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
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--grad", action="store_true", help="also profile grads")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--variants", default=None,
                   help="comma-separated subset to run (bounds compile time)")
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
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    N = args.iters

    def timeit(name, fn, *fargs):
        # warm with eps as a TRACED ARRAY — the loop's chained eps is one, and
        # a float default would compile a different signature inside the loop
        eps = jnp.zeros(())
        out = fn(*fargs, eps=eps)
        out = fn(*fargs, eps=eps)
        jax.block_until_ready(out)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(fargs[0], *fargs[1:], eps=eps)
            eps = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / N * 1000
        print(json.dumps({"part": name, "ms": round(dt, 2)}), flush=True)
        return dt

    def apply_model(params, b):
        (cl, rd), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["input_data"], b["coord"], True, mutable=["batch_stats"],
        )
        return cl, rd

    # --- variants -----------------------------------------------------------
    def full(params, b, eps=0.0):
        targets = build_train_targets(b, cfg)
        cl, rd = apply_model(params, b)
        total, _ = compute_losses(cl, rd, targets, cfg)
        return total + eps

    import rangedet_tpu.models.detector as det

    def no_iou(params, b, eps=0.0):
        targets = build_train_targets(b, cfg)
        cl, rd = apply_model(params, b)
        # same losses, IoU target knocked out to zeros
        iou_t = [jnp.zeros(c.shape[:3] + (cfg.num_classes,), c.dtype) for c in cl]
        total = 0.0
        from rangedet_tpu.models import losses as L

        for level, s in enumerate(cfg.fpn_strides):
            total = total + cfg.cls_loss_weight * L.vfl_cls_loss(
                cl[level], iou_t[level], targets[f"mask_s{s}"],
                alpha=cfg.vfl_alpha, gamma=cfg.vfl_gamma,
            ) + cfg.reg_loss_weight * L.normalized_reg_loss(
                rd[level], targets[f"reg_target_s{s}"],
                targets[f"reg_weight_s{s}"], targets[f"reg_norm_weight_s{s}"],
                smooth_l1_scalar=cfg.smooth_l1_scalar, l1=cfg.l1_loss,
            )
        return total + eps

    pre_targets = jax.jit(lambda b: build_train_targets(b, cfg))(batch)
    pre_targets = jax.tree_util.tree_map(jnp.asarray, pre_targets)

    def pre_tgt(params, b, eps=0.0):
        cl, rd = apply_model(params, b)
        total, _ = compute_losses(cl, rd, pre_targets, cfg)
        return total + eps

    def no_tail(params, b, eps=0.0):
        cl, rd = apply_model(params, b)
        return cl[0].sum() + sum(r.sum() for r in rd) + eps

    # --- loss-formulation A/B: same math, layout-friendly shapes ------------
    # v5e tiles the two minor dims (8,128); materialized (B,H,W,1) / (B,H,W,8)
    # tensors pad the trailing dim to 128 (up to 128x/16x traffic). These
    # variants merge the trailing dims into W before the loss elementwise+
    # reduce to see whether any fusion boundary actually pays that tax.
    from rangedet_tpu.models import losses as L

    def planar_losses(cl, rd, targets, iou_t):
        total = 0.0
        for level, s in enumerate(cfg.fpn_strides):
            B, H, Ws, K = cl[level].shape
            logit = cl[level].reshape(B, H, Ws * K)
            iou = iou_t[level].reshape(B, H, Ws * K)
            mask = jnp.broadcast_to(
                targets[f"mask_s{s}"], (B, H, Ws, K)
            ).reshape(B, H, Ws * K)
            loss = L.varifocal_loss(logit, jax.lax.stop_gradient(iou),
                                    cfg.vfl_alpha, cfg.vfl_gamma)
            cls_loss = jnp.sum(loss * mask) / (jnp.sum(mask) + 1.0)

            Bq, Hq, Wq, C = rd[level].shape
            delta = rd[level].reshape(Bq, Hq, Wq * C)
            rt = targets[f"reg_target_s{s}"].reshape(Bq, Hq, Wq * C)
            rw = targets[f"reg_weight_s{s}"].reshape(Bq, Hq, Wq * C)
            nwt = targets[f"reg_norm_weight_s{s}"]
            nw = jnp.broadcast_to(nwt, (Bq, Hq, Wq, C)).reshape(Bq, Hq, Wq * C) \
                if nwt.shape[-1] != C else nwt.reshape(Bq, Hq, Wq * C)
            diff = delta - jax.lax.stop_gradient(rt)
            rl = jnp.abs(diff) if cfg.l1_loss else L.smooth_l1(
                diff, cfg.smooth_l1_scalar)
            # denominator matches normalized_reg_loss: sum of the ORIGINAL
            # (un-broadcast) norm-weight tensor
            den = jnp.sum(jax.lax.stop_gradient(nwt))
            reg_loss = jnp.sum(
                rl * jax.lax.stop_gradient(rw) * jax.lax.stop_gradient(nw)
            ) / (den + 1.0)
            total = total + cfg.cls_loss_weight * cls_loss \
                + cfg.reg_loss_weight * reg_loss
        return total

    def planar(params, b, eps=0.0):
        targets = build_train_targets(b, cfg)
        cl, rd = apply_model(params, b)
        iou_t = iou_targets_per_level(rd, targets, cfg)
        return planar_losses(cl, rd, targets, iou_t) + eps

    def cls_only(params, b, eps=0.0):
        targets = build_train_targets(b, cfg)
        cl, rd = apply_model(params, b)
        iou_t = iou_targets_per_level(rd, targets, cfg)
        total = 0.0
        for level, s in enumerate(cfg.fpn_strides):
            total = total + cfg.cls_loss_weight * L.vfl_cls_loss(
                cl[level], iou_t[level], targets[f"mask_s{s}"],
                alpha=cfg.vfl_alpha, gamma=cfg.vfl_gamma,
            )
        return total + sum(r.sum() * 0.0 for r in rd) + eps

    def reg_only(params, b, eps=0.0):
        targets = build_train_targets(b, cfg)
        cl, rd = apply_model(params, b)
        total = 0.0
        for level, s in enumerate(cfg.fpn_strides):
            total = total + cfg.reg_loss_weight * L.normalized_reg_loss(
                rd[level], targets[f"reg_target_s{s}"],
                targets[f"reg_weight_s{s}"], targets[f"reg_norm_weight_s{s}"],
                smooth_l1_scalar=cfg.smooth_l1_scalar, l1=cfg.l1_loss,
            )
        return total + sum(c.sum() * 0.0 for c in cl) + eps

    def raw_sums(params, b, eps=0.0):
        # floor: read every loss input once, no transcendentals/masks
        targets = build_train_targets(b, cfg)
        cl, rd = apply_model(params, b)
        iou_t = iou_targets_per_level(rd, targets, cfg)
        total = 0.0
        for level, s in enumerate(cfg.fpn_strides):
            total = total + cl[level].sum() + rd[level].sum() \
                + iou_t[level].sum() + targets[f"mask_s{s}"].sum() \
                + targets[f"reg_target_s{s}"].sum() \
                + targets[f"reg_weight_s{s}"].sum() \
                + targets[f"reg_norm_weight_s{s}"].sum()
        return total + eps

    variants = [("full", full), ("no_iou", no_iou), ("pre_tgt", pre_tgt),
                ("no_tail", no_tail), ("planar", planar),
                ("cls_only", cls_only), ("reg_only", reg_only),
                ("raw_sums", raw_sums)]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [(n, f) for n, f in variants if n in keep]

    null = jax.jit(lambda x, eps=0.0: x + 1.0 + eps)
    timeit("null_dispatch", null, jnp.zeros(()))

    res = {}
    for name, fn in variants:
        res[name] = timeit(name, jax.jit(fn), state.params, batch)
    # attribution: full = fwd + targets + iou + losses; no_iou drops iou;
    # pre_tgt drops target-gen (its compute_losses still runs the iou
    # target); no_tail = fwd only. So iou = full-no_iou, targets =
    # full-pre_tgt, losses = remainder.
    if all(k in res for k in ("full", "no_iou", "pre_tgt", "no_tail")):
        print(json.dumps({
            "iou_target_ms": round(res["full"] - res["no_iou"], 2),
            "target_gen_ms": round(res["full"] - res["pre_tgt"], 2),
            "loss_ms": round(
                res["pre_tgt"] - res["no_tail"]
                - (res["full"] - res["no_iou"]), 2
            ),
            "tail_total_ms": round(res["full"] - res["no_tail"], 2),
        }), flush=True)

    if args.grad:
        gres = {}
        for name, fn in variants:
            g = jax.jit(lambda p, b, eps=0.0, _f=fn: jax.grad(
                lambda pp: _f(pp, b, eps=eps))(p))
            gres[name] = timeit(f"grad_{name}", g, state.params, batch)
        if not all(k in gres for k in ("full", "no_iou", "pre_tgt", "no_tail")):
            return
        print(json.dumps({
            "grad_iou_target_ms": round(gres["full"] - gres["no_iou"], 2),
            "grad_target_gen_ms": round(gres["full"] - gres["pre_tgt"], 2),
            "grad_loss_ms": round(
                gres["pre_tgt"] - gres["no_tail"]
                - (gres["full"] - gres["no_iou"]), 2
            ),
            "grad_tail_total_ms": round(gres["full"] - gres["no_tail"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
