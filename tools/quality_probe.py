#!/usr/bin/env python
"""Held-out quality probe: train the full-size shipped path on STREAMING
raytraced vehicle scenes (a fresh scene every step — nothing is memorized)
and evaluate held-out scenes with the WOD-style evaluator at the reference's
operating point (3D IoU 0.7, L1/L2 AP + APH; eval/ap.py:waymo_metrics).

This is the generalization half of the quality evidence the reference claims
via its published WOD table (reference README.md:73-76): the model must learn
range-image -> oriented-cuboid detection from geometry alone and transfer to
unseen scenes. The raytraced generator (data/synthetic.py:make_frame_vehicles)
makes yaw/extent/center all recoverable from the range profile, so 3D IoU 0.7
and APH are meaningful.

Prints one JSON line per eval point. Usage (TPU, background):
  python -u tools/quality_probe.py --steps 6000 --eval-every 1000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HOLDOUT_SEED0 = 1_000_000  # train seeds are step indices; disjoint by design


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--log-every", type=int, default=200)
    p.add_argument("--batch", type=int, default=None, help="train batch size")
    p.add_argument("--boxes", type=int, default=10)
    p.add_argument("--far", action="store_true",
                   help="far-range scene family: vehicles out to 68 m "
                        "(ped 50 / cyc 55) so the stride-1 far field and "
                        "the [50,inf) RANGE bucket are exercised "
                        "(VERDICT r4 weak #2)")
    p.add_argument("--clutter", type=int, default=0,
                   help="unlabeled clutter cuboids per scene (poles/walls, "
                        "background intensity) — occlusion + hard negatives")
    p.add_argument("--holdout-frames", type=int, default=16)
    p.add_argument("--eval-batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", default="adamw")
    p.add_argument("--warmup-steps", type=int, default=500)
    p.add_argument("--min-score", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--save", default=None, help="save final params .npz here")
    p.add_argument("--resume", default=None,
                   help="pickle from a prior --save to continue training from")
    p.add_argument("--step0", type=int, default=0,
                   help="first train-scene seed offset when resuming (keeps "
                        "the fresh-scene stream disjoint from the prior run)")
    p.add_argument("--stop-after", type=int, default=None,
                   help="execute only this many steps in this process, then "
                        "save and exit cleanly (the LR schedule still spans "
                        "the full --steps horizon; the resumed optimizer "
                        "count keeps the cosine position). Lets a long run "
                        "be chained as short bounded TPU clients — axon "
                        "claim hygiene, BENCH.md")
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
    from rangedet_tpu.data.synthetic_device import make_batch_device
    from rangedet_tpu.eval.ap import (
        average_precision,
        range_breakdown,
        waymo_metrics,
    )
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
    if args.batch:
        cfg = cfg.replace(batch_image=args.batch)
    cfg_t = cfg_t.replace(min_score={k: args.min_score for k in cfg_t.min_score})
    B = cfg.batch_image

    # warmup expressed in epochs of steps_per_epoch=1000 below
    cfg_opt = cfg.replace(
        optimizer=args.optimizer, base_lr=args.lr, lr_mode="cosine",
        warmup_epochs=args.warmup_steps / 1000.0, auto_scale_lr=False,
        begin_epoch=0, end_epoch=max(1, args.steps // 1000),
    )

    # scenes are RAYTRACED ON DEVICE (data/synthetic_device.py): the fused
    # generate+train step consumes a genuinely fresh scene every step with
    # zero host↔device traffic (a host-generated batch costs ~2 s/step in
    # transfer alone on the tunneled dev backend, 20× the train step)
    from rangedet_tpu.data.synthetic_device import (
        CYC_DIMS,
        PED_DIMS,
        VEHICLE_DIMS,
    )

    # scene families follow the recipe's classes: each box draws one of the
    # recipe's families; the WOD operating point is per-class
    # (cfg.eval_iou_thresh — the reference reports veh at 3D IoU 0.7,
    # ped/cyc at 0.5, README.md:73-76)
    FAMILY = {
        "veh": (VEHICLE_DIMS, (8.0, 50.0), 1.0),
        "ped": (PED_DIMS, (5.0, 35.0), 2.0),
        "cyc": (CYC_DIMS, (5.0, 40.0), 4.0),
    }
    if args.far:
        # stretch each family into the far field (the reference's
        # range-conditioned pyramid assigns 30-100 m to stride 1:
        # config/rangedet/rangedet_veh_wo_aug_4_18e.py:71)
        FAR_HI = {"veh": 68.0, "ped": 50.0, "cyc": 55.0}
        FAMILY = {c: (d, (rr[0], FAR_HI[c]), v)
                  for c, (d, rr, v) in FAMILY.items()}
    families = tuple(FAMILY[c] for c in cfg_t.class_names)
    H, W = cfg.feat_size
    gen_kw = dict(B=B, H=H, W=W, pad_w=cfg.pad_field[1],
                  max_gt=cfg.max_gt_boxes, num_boxes=args.boxes,
                  families=families, num_clutter=args.clutter)

    def gen(key):
        return make_batch_device(key, **gen_kw)

    batch0 = jax.device_get(gen(jax.random.PRNGKey(999_999)))
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg_opt, steps_per_epoch=1000)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch0)
    if args.resume:
        import pickle

        with open(args.resume, "rb") as f:
            saved = pickle.load(f)
        state = state.replace(
            params=jax.device_put(saved["params"]),
            batch_stats=jax.device_put(saved["batch_stats"]),
        )
        if "opt_state" in saved:
            # warm adamw moments: the resumed run continues the optimizer
            # trajectory instead of re-estimating second moments from zero
            opt0 = jax.device_get(state.opt_state)
            opt = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt0),
                [jax.device_put(v) for v in saved["opt_state"]],
            )
            state = state.replace(opt_state=opt)
    base_step = make_train_step(model, cfg)

    base_key = jax.random.PRNGKey(args.seed)

    def step_with_data(state, step_i):
        key = jax.random.fold_in(base_key, step_i + args.step0)
        return base_step(state, make_batch_device(key, **gen_kw))

    train_step = jax.jit(step_with_data, donate_argnums=0)

    eval_model = (
        RangeDet(**cfg_t.model_kwargs()) if cfg_t.layout != cfg.layout else model
    )
    eval_step = jax.jit(make_eval_step(eval_model, cfg_t))
    prep = jax.jit(lambda b: build_eval_inputs(b, cfg_t))

    # fixed held-out scenes (device-generated with reserved keys disjoint
    # from the training stream), batched for the eval step
    EB = args.eval_batch
    holdout = []
    ekw = dict(gen_kw, B=EB)
    for i in range(0, args.holdout_frames, EB):
        hb_dev = make_batch_device(
            jax.random.PRNGKey(HOLDOUT_SEED0 + i), **ekw
        )
        hb = jax.device_get(hb_dev)  # gt arrays for the AP evaluator
        holdout.append((prep(hb_dev), hb))

    def run_eval(state, buckets=False):
        if cfg_t.layout != cfg.layout:
            est = state.replace(params=convert_params(state.params, cfg_t.layout))
        else:
            est = state
        per_class = {c: [] for c in cfg_t.class_names}
        enum_of = {c: FAMILY[c][2] for c in cfg_t.class_names}
        outs = [jax.device_get(eval_step(est, ebatch)) for ebatch, _ in holdout]
        for (_, hb), out in zip(holdout, outs):
            for b in range(EB):
                for c in cfg_t.class_names:
                    boxes = np.asarray(out[c]["boxes"][b])
                    valid = np.asarray(out[c]["valid"][b])
                    kept = boxes[valid]
                    keep_gt = (hb["gt_valid"][b] > 0) & (
                        hb["gt_class"][b] == enum_of[c]
                    )
                    per_class[c].append(dict(
                        det_csa=kept[:, :7], det_scores=kept[:, 7],
                        gt_csa=hb["gt_csa"][b][keep_gt],
                        gt_num_points=hb["gt_num_points"][b][keep_gt],
                    ))
        rec = {}
        multi = len(cfg_t.class_names) > 1
        for c in cfg_t.class_names:
            frames = per_class[c]
            # operating point from the recipe (veh 0.7 / ped+cyc 0.5, the
            # reference's published WOD thresholds); secondary 0.2 looser
            iou_op = cfg_t.eval_iou_thresh[c]
            iou_lo = round(iou_op - 0.2, 1)
            s_op = f"{int(round(iou_op * 10)):02d}"
            s_lo = f"{int(round(iou_lo * 10)):02d}"
            p = f"{c}_" if multi else ""
            bev = average_precision(frames, iou_thresh=0.5, mode="bev")
            wod_op = waymo_metrics(frames, iou_thresh=iou_op, mode="3d")
            wod_lo = waymo_metrics(frames, iou_thresh=iou_lo, mode="3d")
            rec.update({
                f"{p}bev_ap_05": round(bev["ap"], 4),
                f"{p}l1_ap_{s_op}": round(wod_op["L1"]["ap"], 4),
                f"{p}l1_aph_{s_op}": round(wod_op["L1"]["aph"], 4),
                f"{p}l2_ap_{s_op}": round(wod_op["L2"]["ap"], 4),
                f"{p}l2_aph_{s_op}": round(wod_op["L2"]["aph"], 4),
                f"{p}l1_ap_{s_lo}": round(wod_lo["L1"]["ap"], 4),
                f"{p}l1_recall_{s_op}": round(wod_op["L1"]["recall"], 4),
            })
            if buckets:
                # final-eval WOD RANGE breakdown (eval/ap.py:range_breakdown)
                rb = range_breakdown(frames, iou_thresh=iou_op, mode="3d")
                for label, r in rb.items():
                    rec[f"{p}l1_ap_{s_op}_r{label}"] = round(r["ap"], 4)
        return rec

    t0 = time.time()
    n_run = (args.steps if args.stop_after is None
             else min(args.steps, args.stop_after))
    for step_i in range(1, n_run + 1):
        state, m = train_step(state, np.int32(step_i))
        # the segment's last step ALWAYS logs + evals, even when log_every
        # does not divide it — otherwise a chain whose segment length is not
        # a multiple of log_every silently drops its terminal eval (this bit
        # the ped 3500->6000 segment: no step-6000 record was printed)
        last = step_i == n_run
        if step_i % args.log_every == 0 or last:
            rec = {"step": step_i + args.step0,
                   "loss": round(float(m["total_loss"]), 4),
                   "s_per_step": round((time.time() - t0) / step_i, 3)}
            rec.update({k: round(float(v), 4) for k, v in m.items()
                        if k != "total_loss"})
            if step_i % args.eval_every == 0 or last:
                rec.update(run_eval(
                    state, buckets=step_i + args.step0 >= args.steps))
            print(json.dumps(rec), flush=True)
    if n_run == 0:
        # eval-only invocation (--stop-after 0 with --resume): report the
        # held-out metrics of the resumed checkpoint at step0, with the
        # RANGE buckets when the checkpoint is at/after the horizon
        rec = {"step": args.step0}
        rec.update(run_eval(state, buckets=args.step0 >= args.steps))
        print(json.dumps(rec), flush=True)

    if args.save:
        import pickle

        with open(args.save, "wb") as f:
            pickle.dump(jax.device_get({
                "params": state.params,
                "batch_stats": state.batch_stats,
                # flat leaves: structure is rebuilt from a fresh state on
                # resume, so the pickle stays optax-class-agnostic
                "opt_state": jax.tree_util.tree_leaves(state.opt_state),
            }), f)
        print(json.dumps({"saved": args.save}), flush=True)
    print(json.dumps({"done": True, "total_s": round(time.time() - t0, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
