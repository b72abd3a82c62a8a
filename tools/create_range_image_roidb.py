#!/usr/bin/env python
"""Offline Waymo dataset builder CLI.

Waymo tfrecord segments -> per-frame npz (range_image, pc_vehicle_frame,
inclination, azimuth) + per-segment roidb pickles — the on-disk schema
``tools/train.py --data-root`` consumes. Mirrors the reference's entry point
datasets/create_range_image_roidb.py (:223-256 threaded main, :141-219 per
segment); the conversion body is rangedet_tpu/data/waymo_builder.py
(dependency-free and unit-tested on synthesized Frame fixtures; the
tfrecord/proto IO itself needs tensorflow + waymo_open_dataset, which this
image does not bake in — run this step in a Waymo-tooling environment).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--tfrecord-dir", required=True,
                   help="dir of segment-*.tfrecord files")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--lidar-name", type=int, default=1,
                   help="laser to rasterize (1 = TOP, dataset_pb2.LaserName)")
    args = p.parse_args(argv)

    from rangedet_tpu.data.waymo_builder import build_dataset

    build_dataset(
        args.tfrecord_dir, args.out_dir, args.split,
        num_workers=args.workers, lidar_name=args.lidar_name,
    )
    print(f"built {args.split} under {args.out_dir}")


if __name__ == "__main__":
    main()
