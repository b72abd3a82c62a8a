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
