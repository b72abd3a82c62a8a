#!/usr/bin/env python
"""Score a saved training checkpoint at arbitrary operating points.

The deploy-time score threshold (cfg.min_score, reference config:98-106)
filters candidates ON DEVICE before WNMS, so an undertrained checkpoint can
legitimately report AP 0.0 at the shipped operating point while already
ranking true boxes above noise at a looser one. This CLI reloads the latest
(or a chosen) checkpoint from an experiment dir and reports the in-training
validation metric (tools/train.py:run_validation — 3D IoU, WOD operating
points) at one or more score thresholds / IoU thresholds, so a short run's
learning signal is visible without retraining.

Usage:
  python tools/eval_checkpoint.py --config rangedet_veh_wo_aug_4_18e \
      --experiment-dir experiments/loader_fullsize \
      --data-root experiments/loader_fullsize_data/built \
      --min-scores 0.5,0.25,0.1 --ious 0.7,0.5
"""
import argparse
import json
import os
import sys
import types

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))  # repo root
sys.path.insert(0, _TOOLS)  # tools/ (for `from train import ...`)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--experiment-dir", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch (default: latest)")
    p.add_argument("--min-scores", default="0.5,0.25,0.1")
    p.add_argument("--ious", default=None,
                   help="comma list; default: the config's per-class points")
    p.add_argument("--n-frames", type=int, default=8)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rangedet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from rangedet_tpu.configs import load_config
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.train.checkpoint import restore_checkpoint
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state
    from train import make_sample, run_validation  # tools/train.py

    cfg = load_config(args.config, True)
    if args.data_root:
        cfg = cfg.replace(data_root=args.data_root)
    if args.experiment_dir:
        cfg = cfg.replace(experiment_dir=args.experiment_dir)

    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    if args.synthetic or not cfg.data_root:
        sample = make_sample(cfg, cfg.batch_image)
    else:
        from rangedet_tpu.data.waymo import load_roidbs, record_to_inputs

        rec = load_roidbs(cfg.data_root, "validation", 1, cfg.filter_class)[0]
        sample = {k: v[None] for k, v in
                  record_to_inputs(rec, cfg.pad_field, cfg.max_gt_boxes).items()}
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), sample)
    state, ep = restore_checkpoint(state, cfg, epoch=args.epoch)
    if ep is None:
        print(json.dumps({"error": "no checkpoint found"}))
        return 1

    val_args = types.SimpleNamespace(synthetic=args.synthetic,
                                     data_root=cfg.data_root)
    ious = ([float(x) for x in args.ious.split(",")]
            if args.ious else [None])
    for ms in (float(x) for x in args.min_scores.split(",")):
        for iou in ious:
            c = cfg.replace(min_score={k: ms for k in cfg.min_score})
            if iou is not None:
                c = c.replace(
                    eval_iou_thresh={k: iou for k in c.eval_iou_thresh})
            m = run_validation(state, model, c, val_args, ep,
                               n_frames=args.n_frames)
            m = {cls: {k: round(float(v), 4) for k, v in d.items()}
                 for cls, d in m.items()}
            print(json.dumps({"epoch": ep, "min_score": ms,
                              "iou": iou or c.eval_iou_thresh,
                              "metrics": m}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
