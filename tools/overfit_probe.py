#!/usr/bin/env python
"""Overfit probe: train the full-size shipped path on a few FIXED synthetic
frames and trace the memorization AP curve until saturation.

A correct train → decode → WNMS → eval loop memorizing 2 frames must drive
AP toward 1.0; a plateau well below that indicates a semantic/numeric bug in
the shipped path (the round-2 ceiling of BEV AP@0.5 = 0.56 was exactly such
a signal — traced to the default-precision one-hot target matmul rounding
f32 GT coords to bf16 on TPU, ops/targets.py).

Prints one JSON line per eval point:
  {"step": N, "loss": L, "bev_ap_05": x, "ap3d_07": y, "l1": {...}, ...}

Usage (TPU, background):
  python -u tools/overfit_probe.py --steps 3000 --eval-every 500
CPU debug: --tiny (small model, small frames).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--boxes", type=int, default=10)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--lr-mode", default="constant",
                   help="constant | cosine (decay over --steps)")
    p.add_argument("--optimizer", default="adamw")
    p.add_argument("--style", default="paint", help="paint | vehicles")
    p.add_argument("--min-score", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--tiny", action="store_true", help="CPU-sized debug run")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--layout", default=None,
                   help="override train layout (e.g. nhwc to bisect vs bhcw)")
    p.add_argument("--no-pallas", action="store_true",
                   help="disable Pallas kernels (bisect vs the XLA path)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from rangedet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from rangedet_tpu.configs import load_config
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.eval.ap import average_precision, waymo_metrics
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.models.convert import convert_params
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state
    from rangedet_tpu.train.train_step import (
        build_eval_inputs,
        make_eval_step,
        make_train_step,
    )

    if args.tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from tiny import tiny_config

        cfg = tiny_config(args.config, True)
        cfg_t = tiny_config(args.config, False)
    else:
        cfg = load_config(args.config, True)
        cfg_t = load_config(args.config, False)
    overrides = {}
    if args.layout:
        overrides["layout"] = args.layout
    if args.no_pallas:
        overrides.update(use_pallas_conv=False, use_pallas_meta=False)
    if overrides:
        cfg = cfg.replace(**overrides)
    cfg_t = cfg_t.replace(
        min_score={k: args.min_score for k in cfg_t.min_score}
    )

    batch_np = make_batch(cfg, args.frames, seed=args.seed,
                          num_boxes=args.boxes, style=args.style)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(
        cfg.replace(optimizer=args.optimizer, base_lr=args.lr,
                    warmup_epochs=0, lr_mode=args.lr_mode,
                    auto_scale_lr=False, begin_epoch=0,
                    end_epoch=max(1, args.steps // 1000)),
        steps_per_epoch=1000,
    )
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    train_step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

    eval_model = (
        RangeDet(**cfg_t.model_kwargs()) if cfg_t.layout != cfg.layout else model
    )
    eval_step = jax.jit(make_eval_step(eval_model, cfg_t))
    ebatch = jax.jit(lambda b: build_eval_inputs(b, cfg_t))(batch)

    gt_frames = []
    for b in range(args.frames):
        keep = batch_np["gt_valid"][b] > 0
        gt_frames.append(batch_np["gt_csa"][b][keep])

    def run_eval(state):
        if cfg_t.layout != cfg.layout:
            est = state.replace(params=convert_params(state.params, cfg_t.layout))
        else:
            est = state
        out = jax.device_get(eval_step(est, ebatch))
        frames = []
        for b in range(args.frames):
            boxes = np.asarray(out["veh"]["boxes"][b])
            valid = np.asarray(out["veh"]["valid"][b])
            kept = boxes[valid]
            frames.append(dict(det_csa=kept[:, :7], det_scores=kept[:, 7],
                               gt_csa=gt_frames[b]))
        bev = average_precision(frames, iou_thresh=0.5, mode="bev")
        d3 = average_precision(frames, iou_thresh=0.7, mode="3d")
        wod = waymo_metrics(frames, iou_thresh=0.7, mode="3d")
        return {
            "bev_ap_05": round(bev["ap"], 4),
            "bev_recall": round(bev["recall"], 4),
            "ap3d_07": round(d3["ap"], 4),
            "recall3d_07": round(d3["recall"], 4),
            "l1_ap": round(wod["L1"]["ap"], 4),
            "l1_aph": round(wod["L1"]["aph"], 4),
        }

    t0 = time.time()
    for step_i in range(1, args.steps + 1):
        state, m = train_step(state, batch)
        if step_i % args.log_every == 0:
            loss = float(m["total_loss"])
            rec = {"step": step_i, "loss": round(loss, 4),
                   "s_per_step": round((time.time() - t0) / step_i, 3)}
            if step_i % args.eval_every == 0 or step_i == args.steps:
                rec.update(run_eval(state))
            print(json.dumps(rec), flush=True)
    print(json.dumps({"done": True, "total_s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
