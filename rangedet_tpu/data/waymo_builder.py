"""Offline Waymo Open Dataset builder: *.tfrecord -> per-frame .npz range
images + per-segment .roidb pickles — the dataset format the training/eval
pipelines consume.

Re-designs datasets/create_range_image_roidb.py:48-219. TensorFlow and
waymo_open_dataset are not baked into this image, so the entry point is
import-gated; the pure-numpy pieces (spherical projection math, roidb
assembly) are importable and unit-tested regardless.
"""
from __future__ import annotations

import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np


def azimuth_table(width: int, extrinsic_yaw_correction: float = 0.0) -> np.ndarray:
    """Per-column azimuth angles, pi..-pi left-to-right (columns scan
    clockwise), optionally corrected by the lidar extrinsic yaw
    (create_range_image_roidb.py:41-45,113)."""
    step = 2 * np.pi / width
    az = np.pi - step * (np.arange(width) + 0.5)
    return (az + extrinsic_yaw_correction + np.pi) % (2 * np.pi) - np.pi


def spherical_to_cartesian(
    rng: np.ndarray, inclination: np.ndarray, azimuth: np.ndarray
) -> np.ndarray:
    """(H, W) range + (H,) inclination + (W,) azimuth -> (H, W, 3) xyz."""
    incl = inclination[:, None]
    az = azimuth[None, :]
    x = rng * np.cos(incl) * np.cos(az)
    y = rng * np.cos(incl) * np.sin(az)
    z = rng * np.sin(incl)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def corners_from_csa(csa: np.ndarray) -> np.ndarray:
    """(M, 7) csa -> (M, 8, 3) corners, bottom 4 then top 4 (numpy twin of
    ops/boxes.csa_to_corners3d, used offline without jax)."""
    csa = np.asarray(csa, np.float32).reshape(-1, 7)
    signs = np.array([[0.5, -0.5], [-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]], np.float32)
    lx = signs[None, :, 0] * csa[:, None, 3]
    wy = signs[None, :, 1] * csa[:, None, 4]
    c, s = np.cos(csa[:, 6])[:, None], np.sin(csa[:, 6])[:, None]
    x = lx * c - wy * s + csa[:, None, 0]
    y = lx * s + wy * c + csa[:, None, 1]
    bev = np.stack([x, y], axis=-1)
    z0 = (csa[:, 2] - csa[:, 5] / 2)[:, None, None] * np.ones((1, 4, 1), np.float32)
    z1 = (csa[:, 2] + csa[:, 5] / 2)[:, None, None] * np.ones((1, 4, 1), np.float32)
    return np.concatenate(
        [np.concatenate([bev, z0], -1), np.concatenate([bev, z1], -1)], axis=1
    )


def build_frame_record(
    frame_id: str,
    npz_path: str,
    gt_csa: np.ndarray,
    gt_class: np.ndarray,
    points_in_box: Optional[np.ndarray] = None,
    meta: Optional[dict] = None,
    motion: Optional[np.ndarray] = None,
) -> dict:
    """Assemble one roidb entry in the on-disk schema LoadRecord/LoadGTInfo
    expect (rangedet/core/input.py:24-59).

    ``meta_data`` keeps the reference's semantics: per-label motion metadata
    (M, 4) [speed_x, speed_y, accel_x, accel_y]
    (create_range_image_roidb.py:180-186,213); the frame-level name/timestamp
    live in ``meta_info``.
    """
    gt_csa = np.asarray(gt_csa, np.float32).reshape(-1, 7)
    return {
        "rec_id": frame_id,
        "pc_url": npz_path,
        "gt_class": np.asarray(gt_class, np.float32).reshape(-1),
        "gt_bbox_csa": gt_csa,
        "gt_bbox_imu": corners_from_csa(gt_csa),
        "gt_bbox_yaw": gt_csa[:, 6].copy(),
        "points_in_box": (
            np.asarray(points_in_box, np.float32).reshape(-1)
            if points_in_box is not None
            else np.zeros((len(gt_csa),), np.float32)
        ),
        "meta_data": (
            np.asarray(motion, np.float32).reshape(-1, 4)
            if motion is not None
            else np.zeros((len(gt_csa), 4), np.float32)
        ),
        "meta_info": meta or {},
    }


def build_segment_from_frames(
    frames, parse_range_images, out_dir: str, split: str, seg_name: str,
    lidar_name: int = 1,
) -> List[dict]:
    """The builder body, decoupled from TensorFlow IO: ``frames`` yields
    Frame protos (or any object with the same attribute surface) and
    ``parse_range_images(frame)`` returns {lidar_name: [range_image, ...]}
    where a range_image has ``.data`` (flat floats) and ``.shape.dims``.

    Mirrors get_data_from_seg (create_range_image_roidb.py:141-219),
    including the per-label motion metadata [speed_x, speed_y, accel_x,
    accel_y] (lines 180-186).
    """
    npz_dir = os.path.join(out_dir, split, "npz")
    os.makedirs(npz_dir, exist_ok=True)
    roidb = []

    for i, frame in enumerate(frames):
        range_images = parse_range_images(frame)
        ri = range_images[lidar_name][0]
        ri_np = np.array(ri.data, np.float32).reshape(ri.shape.dims)
        H, W = ri_np.shape[:2]

        calib = [c for c in frame.context.laser_calibrations if c.name == lidar_name][0]
        if len(calib.beam_inclinations) > 0:
            inclination = np.array(calib.beam_inclinations, np.float32)[::-1]
        else:
            inclination = np.linspace(
                calib.beam_inclination_min, calib.beam_inclination_max, H
            ).astype(np.float32)[::-1]
        extrinsic = np.array(calib.extrinsic.transform, np.float32).reshape(4, 4)
        az_correction = float(np.arctan2(extrinsic[1, 0], extrinsic[0, 0]))
        azimuth = azimuth_table(W, az_correction)

        rng_ch = ri_np[..., 0]
        pc = spherical_to_cartesian(np.maximum(rng_ch, 0), inclination, azimuth)
        # rotate+translate into the vehicle frame via the lidar extrinsic
        pc = pc @ extrinsic[:3, :3].T + extrinsic[:3, 3]
        pc[rng_ch <= 0] = 0

        gt_csa, gt_cls, pts_in_box, motion = [], [], [], []
        for label in frame.laser_labels:
            b = label.box
            gt_csa.append(
                [b.center_x, b.center_y, b.center_z, b.length, b.width, b.height,
                 b.heading]
            )
            gt_cls.append(label.type)
            pts_in_box.append(getattr(label, "num_lidar_points_in_box", -1))
            m = label.metadata
            motion.append([m.speed_x, m.speed_y, m.accel_x, m.accel_y])

        frame_id = f"{seg_name}_{i}"
        npz_path = os.path.join(npz_dir, f"{frame_id}.npz")
        np.savez_compressed(
            npz_path,
            range_image=ri_np[..., :4],
            pc_vehicle_frame=pc.astype(np.float32),
            inclination=inclination,
            azimuth=azimuth.astype(np.float32),
        )
        roidb.append(
            build_frame_record(
                frame_id, npz_path,
                np.array(gt_csa, np.float32).reshape(-1, 7),
                np.array(gt_cls, np.float32),
                np.array(pts_in_box, np.float32),
                meta={
                    "name": frame.context.name,
                    "timestamp_micros": frame.timestamp_micros,
                },
                motion=np.array(motion, np.float32).reshape(-1, 4),
            )
        )

    with open(os.path.join(out_dir, split, f"{seg_name}.roidb"), "wb") as f:
        pickle.dump(roidb, f)
    return roidb


def build_segment(
    tfrecord_path: str, out_dir: str, split: str, lidar_name: int = 1
) -> List[dict]:
    """One Waymo segment -> npz files + roidb list. Requires tensorflow +
    waymo_open_dataset for the tfrecord/proto IO; the body
    (build_segment_from_frames) is dependency-free and unit-tested against
    synthesized Frame fixtures."""
    try:
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "tensorflow + waymo_open_dataset are required for the offline "
            "tfrecord builder; this image does not bake them in. Run this "
            "step in a Waymo-tooling environment, or convert with your own "
            "extractor into the npz/roidb schema (see module docstring)."
        ) from e

    seg_name = os.path.basename(tfrecord_path).replace(".tfrecord", "")

    def frames():
        ds = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
        for data in ds:
            frame = dataset_pb2.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            yield frame

    def parse(frame):
        (range_images, _, _, _) = (
            frame_utils.parse_range_image_and_camera_projection(frame)
        )
        return range_images

    return build_segment_from_frames(
        frames(), parse, out_dir, split, seg_name, lidar_name
    )


def build_dataset(
    tfrecord_dir: str, out_dir: str, split: str, num_workers: int = 8,
    lidar_name: int = 1,
):
    """Threaded over segments (create_range_image_roidb.py:223-256)."""
    import glob

    segs = sorted(glob.glob(os.path.join(tfrecord_dir, "*.tfrecord")))
    if not segs:
        raise FileNotFoundError(f"no *.tfrecord under {tfrecord_dir}")
    with ThreadPoolExecutor(num_workers) as ex:
        list(ex.map(lambda s: build_segment(s, out_dir, split, lidar_name), segs))
