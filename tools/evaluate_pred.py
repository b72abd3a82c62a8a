#!/usr/bin/env python
"""Score a predictions.pkl (written by tools/test.py) with the built-in
WOD-construction evaluator (eval/ap.py) — AP/APH at L1/L2 plus the RANGE
breakdown, per class at its recipe operating point.

This is the in-repo analogue of running the official Waymo metrics tool on
the .bin produced by tools/create_prediction_bin_3d.py (the reference's only
scoring path, reference tools/create_prediction_bin_3d.py:26-75 — it has no
evaluator of its own). Output: one JSON line per class.

  python tools/evaluate_pred.py --config rangedet_veh_wo_aug_4_18e \
      --pred experiments/rangedet_veh_wo_aug_4_18e/predictions.pkl
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--pred", required=True, help="predictions.pkl from test.py")
    p.add_argument("--iou", type=float, default=None,
                   help="override the recipe per-class operating point")
    p.add_argument("--mode", default="3d", choices=("3d", "bev"))
    p.add_argument("--buckets", action="store_true",
                   help="add the RANGE (distance-bucket) breakdown")
    p.add_argument("--out", default=None, help="also write the JSON here")
    return p.parse_args()


def load_frames(pred_path, class_names, name_to_type):
    """predictions.pkl holds two sequential dumps: annotation dict then
    output dict (the reference pickle contract, reference tools/test.py)."""
    with open(pred_path, "rb") as f:
        annotations = pickle.load(f)
        outputs = pickle.load(f)
    per_class = {c: [] for c in class_names}
    for rec_id, out in outputs.items():
        anno = annotations.get(rec_id, {})
        gt_csa = np.asarray(anno.get("gt_bbox_csa", np.zeros((0, 7), np.float32)))
        gt_cls = np.asarray(anno.get("gt_class", np.zeros((0,), np.float32)))
        gt_pts = np.asarray(anno.get("points_in_box", np.zeros((0,), np.float32)))
        for c in class_names:
            det = np.asarray(out["det_xyzlwhyaws"].get(c, np.zeros((0, 8))))
            keep = gt_cls == float(name_to_type[c])
            per_class[c].append(dict(
                det_csa=det[:, :7], det_scores=det[:, 7],
                gt_csa=gt_csa[keep],
                gt_num_points=gt_pts[keep] if gt_pts.size == gt_cls.size
                else np.zeros(int(keep.sum()), np.float32),
            ))
    return per_class


def main():
    args = parse_args()
    from rangedet_tpu.configs import load_config
    from rangedet_tpu.eval.ap import range_breakdown, waymo_metrics

    cfg = load_config(args.config, is_train=False)
    name_to_type = dict(zip(cfg.class_names, cfg.label_set))
    per_class = load_frames(args.pred, cfg.class_names, name_to_type)

    records = []
    for c in cfg.class_names:
        iou = args.iou if args.iou is not None else cfg.eval_iou_thresh[c]
        wod = waymo_metrics(per_class[c], iou_thresh=iou, mode=args.mode)
        rec = {
            "class": c, "iou": iou, "mode": args.mode,
            "frames": len(per_class[c]),
            "l1_ap": round(wod["L1"]["ap"], 4),
            "l1_aph": round(wod["L1"]["aph"], 4),
            "l2_ap": round(wod["L2"]["ap"], 4),
            "l2_aph": round(wod["L2"]["aph"], 4),
            "l1_recall": round(wod["L1"]["recall"], 4),
        }
        if args.buckets:
            rb = range_breakdown(per_class[c], iou_thresh=iou, mode=args.mode)
            for label, r in rb.items():
                rec[f"l1_ap_r{label}"] = round(r["ap"], 4)
        records.append(rec)
        print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
    return records


if __name__ == "__main__":
    main()
