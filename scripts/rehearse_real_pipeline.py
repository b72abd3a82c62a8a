#!/usr/bin/env python
"""One-command REAL-SCHEMA pipeline rehearsal: the full reference workflow —
offline dataset builder → train (checkpoint + resume across an epoch
boundary) → test → Waymo .bin export → AP scoring — executed end-to-end on
synthesized real-schema data, with every step the actual shipped CLI.

The chain (mirrors the reference scripts/train_rangedet.sh +
datasets/create_range_image_roidb.py, which this repo re-implements):

  1. synthesize genuine .tfrecord segments of serialized Frame protos whose
     range images are RAYTRACED scenes (data/synthetic.py) rendered in the
     builder's exact sensor convention (waymo_builder.azimuth_table) — only
     the absent waymo wheel's proto classes are mirrored
     (tests/fake_waymo_protos.py);
  2. tools/create_range_image_roidb.py  — tfrecords → npz + roidb
     (real tf.io.TFRecordDataset IO), training + validation splits;
  3. tools/train.py --data-root ... (epochs 0..N/2, orbax checkpoints), then
     tools/train.py --resume (epochs N/2..N) — proves mid-run restart
     across an epoch boundary on the loader path;
  4. tools/test.py --image-set validation → predictions.pkl;
  5. tools/create_prediction_bin_3d.py → submission.bin (metrics_pb2 bytes);
  6. tools/evaluate_pred.py → WOD-style AP/APH table (eval/ap.py).

Usage (CPU, tiny geometry — the CI heavy-tier invocation):
  python scripts/rehearse_real_pipeline.py --workdir /tmp/rehearsal
Prints one summary JSON line; exits nonzero if any stage fails.
"""
import argparse
import json
import os
import subprocess
import sys
import types

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/rangedet_rehearsal")
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--frames-train", type=int, default=48)
    p.add_argument("--frames-val", type=int, default=8)
    p.add_argument("--frames-per-segment", type=int, default=8)
    p.add_argument("--height", type=int, default=16)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--boxes", type=int, default=5)
    p.add_argument("--epochs", type=int, default=24,
                   help="total epochs; the first train stage runs half, the "
                        "resumed stage the rest")
    p.add_argument("--devices", type=int, default=2,
                   help="virtual CPU devices for the train/test children "
                        "(exercises the data-parallel shard_map path)")
    p.add_argument("--full-size", action="store_true",
                   help="skip the tiny overrides (real TPU geometry; slow)")
    p.add_argument("--stop-after-build", action="store_true",
                   help="synthesize tfrecords and build the roidb, then exit "
                        "— used to stage a dataset for a separate (e.g. real-"
                        "TPU) tools/train.py --data-root run")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def synthesize_tfrecords(args, split_dir, n_frames, seed0):
    """Write .tfrecord segments of serialized Frame protos carrying raytraced
    scenes; returns {timestamp: (H, W, 4) range image} for the parse shim."""
    import tensorflow as tf

    from fake_waymo_protos import install
    from rangedet_tpu.data.synthetic import make_frame_vehicles
    from rangedet_tpu.data.waymo_builder import azimuth_table

    msgs = install()  # permanent in this process (no pytest monkeypatch)
    Frame = msgs["Frame"]
    H, W = args.height, args.width
    # builder conventions: per-column azimuth is half-pixel-centered
    # (azimuth_table), per-row inclination is the REVERSED calibration list
    incl_desc = np.linspace(0.03, -0.3, H).astype(np.float32)  # row 0 = top
    az = azimuth_table(W).astype(np.float32)

    ris = {}

    def serialize(ts, rng):
        fr = make_frame_vehicles(
            rng, H=H, W=W, num_boxes=args.boxes, class_choices=(1,),
            inclination=incl_desc, azimuth=az,
        )
        # Waymo TOP range image channels: [range, intensity, elongation,
        # is_in_nlz]; no-return pixels carry range <= 0
        rng_ch = np.where(fr["mask"] > 0, fr["range_value"], -1.0)
        ris[ts] = np.stack(
            [rng_ch, fr["intensity"], fr["elongation"],
             -np.ones((H, W), np.float32)], -1,
        ).astype(np.float32)

        f = Frame()
        f.context.name = f"rehearsal_seg_{ts // 1000}"
        f.timestamp_micros = ts
        cal = f.context.laser_calibrations.add()
        cal.name = 1
        cal.beam_inclinations.extend(incl_desc[::-1].tolist())  # ascending
        cal.extrinsic.transform.extend(np.eye(4).ravel().tolist())
        for b in range(args.boxes):
            cx, cy, cz, l, w, h, yaw = fr["gt_csa"][b].tolist()
            lab = f.laser_labels.add()
            lab.box.center_x, lab.box.center_y, lab.box.center_z = cx, cy, cz
            lab.box.length, lab.box.width, lab.box.height = l, w, h
            lab.box.heading = yaw
            lab.type = int(fr["gt_class"][b])
            lab.num_lidar_points_in_box = int(fr["gt_num_points"][b])
        return f.SerializeToString()

    os.makedirs(split_dir, exist_ok=True)
    n_seg = (n_frames + args.frames_per_segment - 1) // args.frames_per_segment
    n_written = 0
    for seg in range(n_seg):
        path = os.path.join(split_dir, f"segment-{seed0}-{seg}.tfrecord")
        with tf.io.TFRecordWriter(path) as w:
            for i in range(args.frames_per_segment):
                if n_written >= n_frames:
                    break
                ts = (seed0 + seg) * 1000 + i
                w.write(serialize(ts, np.random.RandomState(ts)))
                n_written += 1
    return ris


def install_parse_shim(ris):
    """The one piece the absent waymo wheel provides that has no pure-python
    mirror: frame_utils.parse_range_image_and_camera_projection (zlib range
    image decompression). The shim returns the synthesized arrays keyed by
    frame timestamp — every byte around it (tfrecord IO, proto parsing,
    projection math) runs the real code."""
    from types import SimpleNamespace as NS

    fu = types.ModuleType("waymo_open_dataset.utils.frame_utils")
    fu.parse_range_image_and_camera_projection = lambda frame: (
        {1: [NS(data=ris[frame.timestamp_micros].ravel().tolist(),
                shape=NS(dims=list(ris[frame.timestamp_micros].shape)))]},
        None, None, None,
    )
    utils_mod = types.ModuleType("waymo_open_dataset.utils")
    utils_mod.frame_utils = fu
    sys.modules["waymo_open_dataset.utils"] = utils_mod
    sys.modules["waymo_open_dataset.utils.frame_utils"] = fu


def run_cli(argv, log_path, env=None):
    with open(log_path, "w") as log:
        rc = subprocess.call(
            [sys.executable, "-u"] + argv, stdout=log, stderr=subprocess.STDOUT,
            env=env, cwd=REPO,
        )
    if rc != 0:
        with open(log_path) as f:
            tail = "".join(f.readlines()[-25:])
        raise SystemExit(
            f"stage failed (rc={rc}): {' '.join(argv)}\n--- log tail ---\n{tail}"
        )


def main():
    args = parse_args()
    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    built = os.path.join(wd, "built")
    exp = os.path.join(wd, "experiments")

    # children: CPU platform via the CLIs' --cpu flag (env vars can't
    # override the force-registered TPU plugin); device COUNT via XLA_FLAGS
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={args.devices}"]
    )

    # ---------------------------------------------------- 1. synthesize
    print("[rehearsal] synthesizing real-schema tfrecords...", flush=True)
    ris = {}
    ris.update(synthesize_tfrecords(
        args, os.path.join(wd, "tfrecords_train"), args.frames_train, seed0=1))
    ris.update(synthesize_tfrecords(
        args, os.path.join(wd, "tfrecords_val"), args.frames_val, seed0=500))
    install_parse_shim(ris)

    # ------------------------------------------------------- 2. builder
    print("[rehearsal] building roidb via tools/create_range_image_roidb.py...",
          flush=True)
    import create_range_image_roidb as builder_cli

    builder_cli.main(["--tfrecord-dir", os.path.join(wd, "tfrecords_train"),
                      "--out-dir", built, "--split", "training",
                      "--workers", "2"])
    builder_cli.main(["--tfrecord-dir", os.path.join(wd, "tfrecords_val"),
                      "--out-dir", built, "--split", "validation",
                      "--workers", "2"])
    n_npz = len(os.listdir(os.path.join(built, "training", "npz")))
    assert n_npz == args.frames_train, (n_npz, args.frames_train)
    if args.stop_after_build:
        print(json.dumps({"built": built, "frames_train": args.frames_train,
                          "frames_val": args.frames_val}))
        return {"built": built}

    tiny = [] if args.full_size else ["--tiny"]
    half = max(1, args.epochs // 2)

    # ------------------------------------------- 3. train, then resume
    common = ["tools/train.py", "--config", args.config, "--cpu", *tiny,
              "--data-root", built, "--experiment-dir", exp,
              "--num-workers", "2", "--seed", str(args.seed)]
    print(f"[rehearsal] training epochs 0..{half - 1}...", flush=True)
    run_cli(common + ["--epochs", str(half)],
            os.path.join(wd, "train_stage1.log"), env)
    print(f"[rehearsal] resuming epochs {half}..{args.epochs - 1}...",
          flush=True)
    run_cli(common + ["--epochs", str(args.epochs), "--resume",
                      "--eval-every", str(max(1, args.epochs // 2))],
            os.path.join(wd, "train_stage2.log"), env)
    with open(os.path.join(wd, "train_stage2.log")) as f:
        stage2 = f.read()
    assert "resumed from epoch" in stage2, "resume did not restore a checkpoint"

    # ------------------------------------------------------- 4. test
    print("[rehearsal] running inference on the validation split...",
          flush=True)
    pred = os.path.join(wd, "predictions.pkl")
    run_cli(["tools/test.py", "--config", args.config, "--cpu", *tiny,
             "--data-root", built, "--experiment-dir", exp,
             "--image-set", "validation", "--output", pred],
            os.path.join(wd, "test.log"), env)
    assert os.path.getsize(pred) > 0

    # -------------------------------------------------- 5. .bin export
    # in-process: the metrics_pb2 branch needs the (mirrored) waymo protos,
    # which are installed in THIS process — same CLI code path either way
    print("[rehearsal] exporting the Waymo submission bin...", flush=True)
    bin_path = os.path.join(wd, "submission.bin")
    import create_prediction_bin_3d as bin_cli

    bin_cli.main(["--pred", pred, "--out", bin_path])
    # the gate is the CHAIN, not the detection count: an 8-epoch tiny model
    # may legitimately emit zero detections above min_score (the serialized
    # empty metrics_pb2.Objects is zero bytes — the reference would write
    # the same); a non-empty prediction set must serialize non-empty
    import pickle as _pickle

    with open(pred, "rb") as f:
        _pickle.load(f)            # annotation_dict (dump 1 of 2)
        _od = _pickle.load(f)      # output_dict (reference 2-dump layout)
    n_objects = sum(
        len(arr) for rec in _od.values()
        for arr in rec["det_xyzlwhyaws"].values()
    )
    assert os.path.exists(bin_path)
    if n_objects > 0:
        assert os.path.getsize(bin_path) > 0

    # ------------------------------------------------------ 6. scoring
    print("[rehearsal] scoring with eval/ap.py...", flush=True)
    ap_json = os.path.join(wd, "ap.json")
    run_cli(["tools/evaluate_pred.py", "--config", args.config,
             "--pred", pred, "--iou", "0.5", "--out", ap_json],
            os.path.join(wd, "eval.log"), env)
    with open(ap_json) as f:
        ap = json.load(f)

    summary = {
        "rehearsal": "ok",
        "frames_train": args.frames_train,
        "frames_val": args.frames_val,
        "epochs": args.epochs,
        "bin_bytes": os.path.getsize(bin_path),
        "objects": n_objects,
        "ap": ap,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
