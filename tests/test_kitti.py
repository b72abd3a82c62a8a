"""KITTI range-image builder vs a direct transcription oracle of the
reference algorithm (create_range_image_in_kitti.py:107-137)."""
import numpy as np

from rangedet_tpu.data import kitti
from tiny import tiny_config


def _oracle_range_image(pc, incl, height, width=2048):
    xy_norm = np.linalg.norm(pc[:, :2], ord=2, axis=1)
    errs = []
    for i in range(len(incl)):
        errs.append(np.abs(incl[i] - np.arctan2(height[i] - pc[:, 2], xy_norm)))
    row_inds = np.argmin(np.stack(errs, -1), axis=-1)
    azi = np.arctan2(pc[:, 1], pc[:, 0])
    col_inds = width - 1.0 + 0.5 - (azi + np.pi) / (2.0 * np.pi) * width
    col_inds = np.round(col_inds).astype(np.int32)
    col_inds[col_inds == width] = width - 1
    col_inds[col_inds < 0] = 0
    img = np.full((64, width, 5), -1, np.float32)
    rng = np.linalg.norm(pc[:, :3], axis=1, ord=2)
    order = np.argsort(-rng)
    img[row_inds[order], col_inds[order], :] = np.concatenate(
        [rng[order][:, None], pc[order]], axis=1
    )
    return img


def _fake_scan(rng, n=5000):
    azi = rng.uniform(-np.pi, np.pi, n)
    incl = rng.choice(kitti.KITTI_INCLINATION, n) + rng.normal(0, 0.001, n)
    r = rng.uniform(3, 70, n)
    x = r * np.cos(incl) * np.cos(azi)
    y = r * np.cos(incl) * np.sin(azi)
    z = r * np.sin(incl) + 0.16
    i = rng.uniform(0, 1, n)
    return np.stack([x, y, z, i], 1).astype(np.float32)


def test_range_image_matches_oracle(rng):
    pc = _fake_scan(rng)
    got = kitti.build_range_image(pc)
    want = _oracle_range_image(pc, kitti.KITTI_INCLINATION, kitti.KITTI_LASER_HEIGHT)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got[..., 0] > -1).sum() > 2000  # most points land (minus collisions)


def test_near_point_wins(rng):
    # two points projecting to the same pixel: near one must win
    base = _fake_scan(rng, 1)
    far = base.copy()
    far[:, :3] *= 3.0
    img = kitti.build_range_image(np.concatenate([far, base]))
    filled = img[..., 0][img[..., 0] > -1]
    want_r = np.linalg.norm(base[0, :3])
    assert np.isclose(filled.min(), want_r, atol=1e-4)


def test_camera_to_lidar_box(tmp_path, rng):
    calib_txt = tmp_path / "000000.txt"
    # identity-ish calib: R0 = I, Tr_velo_to_cam = lidar->cam axis remap
    # cam: x right, y down, z forward; lidar: x fwd, y left, z up
    tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
    calib_txt.write_text(
        "P2: " + " ".join(["7.2e2", "0", "6e2", "0", "0", "7.2e2", "1.8e2", "0", "0", "0", "1", "0"]) + "\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: " + " ".join(str(v) for v in tr.reshape(-1)) + "\n"
    )
    calib = kitti.Calibration(str(calib_txt))
    # a box 10m forward (cam z=10), bottom at cam y=1.0 (i.e. lidar z=-1)
    cam_box = np.array([[0.0, 1.0, 10.0, 4.0, 1.5, 1.8, 0.0]])
    csa = kitti.boxes_camera_to_lidar_csa(cam_box, calib)
    np.testing.assert_allclose(csa[0, :3], [10.0, 0.0, -1.0 + 0.75], atol=1e-5)
    np.testing.assert_allclose(csa[0, 3:6], [4.0, 1.8, 1.5], atol=1e-6)
    # lidar<->rect roundtrip
    pts = rng.uniform(-10, 10, (20, 3)).astype(np.float32)
    back = calib.rect_to_lidar(calib.lidar_to_rect(pts))
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_builder_cli_end_to_end(tmp_path, rng):
    """tools/create_range_image_in_kitti.py on a synthesized KITTI root ->
    Waymo-schema npz/roidb -> loadable padded batch entry (the full
    'switch a KITTI user over' path)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import create_range_image_in_kitti as cli

    from rangedet_tpu.data.waymo import load_roidbs, record_to_inputs

    root = tmp_path / "kitti"
    for d in ("velodyne", "calib", "label_2"):
        (root / d).mkdir(parents=True)

    # scan = background + ~60 points inside the GT box at lidar (10, 0, 0)
    pc = _fake_scan(rng, 6000)
    nin = 60
    inbox = np.stack(
        [
            rng.uniform(8.5, 11.5, nin),
            rng.uniform(-0.8, 0.8, nin),
            rng.uniform(-0.7, 0.7, nin),
            rng.uniform(0, 1, nin),
        ],
        1,
    ).astype(np.float32)
    np.concatenate([pc, inbox]).tofile(root / "velodyne" / "000000.bin")

    tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
    (root / "calib" / "000000.txt").write_text(
        "P2: 7.2e2 0 6e2 0 0 7.2e2 1.8e2 0 0 0 1 0\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: " + " ".join(str(v) for v in tr.reshape(-1)) + "\n"
    )
    # lidar csa [10, 0, 0, l=4, w=1.8, h=1.5, yaw=0]: with this calib the
    # camera-frame row is loc (0, 0.75, 10) dims h/w/l (1.5, 1.8, 4), and
    # yaw = -(ry + pi/2) => ry = -pi/2. One DontCare row must be skipped.
    (root / "label_2" / "000000.txt").write_text(
        "Car 0 0 0 0 0 50 50 1.5 1.8 4.0 0.0 0.75 10.0 "
        f"{-np.pi / 2}\n"
        "DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10\n"
    )

    out = tmp_path / "built"
    cli.main([
        "--kitti-root", str(root), "--out-dir", str(out),
        "--split", "train", "--width", "512",
    ])

    roidb = load_roidbs(str(out), ("train",))
    assert len(roidb) == 1
    rec = roidb[0]
    np.testing.assert_allclose(
        rec["gt_bbox_csa"][0], [10, 0, 0, 4, 1.8, 1.5, 0], atol=1e-5
    )
    assert rec["gt_class"][0] == 1.0
    assert rec["points_in_box"][0] >= nin  # every synthetic in-box point

    entry = record_to_inputs(rec, (64, 512), 8)
    assert entry["input_data"].shape == (64, 512, 8)
    assert np.isfinite(entry["input_data"]).all()
    assert entry["gt_valid"].sum() == 1
    assert entry["mask"].sum() > 1000
    # NLZ channel: -1 everywhere (KITTI has no no-label-zones)
    assert (entry["is_in_nlz"] <= 0).all()


def test_kitti_inputs_feed_model(rng):
    pc = _fake_scan(rng, 8000)
    cfg = tiny_config(pad_field=(64, 512), feat_size=(64, 512))
    entry = kitti.kitti_frame_to_inputs(
        pc, cfg.pad_field, cfg.max_gt_boxes,
        gt_csa=np.array([[10, 0, 0, 4, 2, 1.6, 0.3]], np.float32),
        gt_class=np.array([1.0], np.float32),
        width=512,
    )
    assert entry["input_data"].shape == (64, 512, 8)
    assert np.isfinite(entry["input_data"]).all()
    assert entry["gt_valid"].sum() == 1
