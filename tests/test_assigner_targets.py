"""Assigner + target generation vs numpy oracles."""
import numpy as np
import jax.numpy as jnp

from rangedet_tpu.ops import assigner, boxes, targets
from conftest import random_csa
import oracles


def _scene(rng, n_pts=2000, n_box=12):
    csa = random_csa(rng, n_box, center_scale=15.0)
    corners8 = np.asarray(boxes.csa_to_corners3d(jnp.asarray(csa)))
    # half the points sampled inside random boxes, half uniform
    pts = rng.uniform(-25, 25, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1, 3, n_pts)
    pick = rng.randint(0, n_box, n_pts // 2)
    frac = rng.uniform(-0.45, 0.45, (n_pts // 2, 3))
    inside = csa[pick, :3] + frac * csa[pick, 3:6]
    # rotate offsets into box frame
    yaw = csa[pick, 6]
    dx = frac[:, 0] * csa[pick, 3]
    dy = frac[:, 1] * csa[pick, 4]
    inside[:, 0] = csa[pick, 0] + dx * np.cos(yaw) - dy * np.sin(yaw)
    inside[:, 1] = csa[pick, 1] + dx * np.sin(yaw) + dy * np.cos(yaw)
    pts[: n_pts // 2] = inside
    mask = (rng.uniform(0, 1, n_pts) > 0.1).astype(np.float32)
    return pts.astype(np.float32), csa, corners8, mask


def test_assigner_matches_oracle(rng):
    pts, csa, corners8, mask = _scene(rng)
    want = oracles.assign_oracle(pts, corners8, mask)
    got = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(pts), jnp.asarray(corners8), jnp.asarray(mask)
        )
    )
    assert (want >= 0).sum() > 100, "scene should have assigned points"
    np.testing.assert_array_equal(got, want)


def test_assigner_box_valid_mask(rng):
    pts, csa, corners8, mask = _scene(rng)
    box_valid = np.ones(corners8.shape[0], bool)
    box_valid[::2] = False
    got = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(pts),
            jnp.asarray(corners8),
            jnp.asarray(mask),
            box_valid=jnp.asarray(box_valid),
        )
    )
    # no point may be assigned to an invalid box
    assert not np.isin(got[got >= 0], np.where(~box_valid)[0]).any()


def test_normalization_weight(rng):
    idx = np.array([0, 0, 0, 1, -1, 2, 2], np.int32)
    w = np.asarray(assigner.normalization_weight(jnp.asarray(idx), 4))
    np.testing.assert_allclose(
        w, [1 / 3, 1 / 3, 1 / 3, 1.0, 0.0, 0.5, 0.5], rtol=1e-6
    )


def test_reg_targets_zero_for_background(rng):
    csa = random_csa(rng, 4)
    pts = rng.uniform(-10, 10, (8, 3)).astype(np.float32)
    idx = np.array([0, 1, -1, 2, -1, 3, 0, -1], np.int32)
    tgt = np.asarray(targets.reg_targets(jnp.asarray(pts), jnp.asarray(csa), jnp.asarray(idx)))
    assert (tgt[idx < 0] == 0).all()
    assert (np.abs(tgt[idx >= 0]).sum(axis=1) > 0).all()


def test_cls_targets_label_mapping():
    gt_class = jnp.asarray([1.0, 4.0, 2.0])  # veh, cyc, ped enums
    idx = jnp.asarray([0, 1, 2, -1], jnp.int32)
    out = np.asarray(targets.cls_targets(gt_class, idx, label_set=[1, 2, 4]))
    # label_set order: veh->0, ped->1, cyc->2; bg -> 3
    np.testing.assert_array_equal(out, [0, 2, 1, 3])


def test_class_aware_expand_matches_numpy(rng):
    n, c, k = 50, 8, 3
    data = rng.randn(n, c).astype(np.float32)
    cls_t = rng.randint(0, k + 1, n).astype(np.int32)  # k == background
    got = np.asarray(
        targets.class_aware_expand(jnp.asarray(data), jnp.asarray(cls_t), k)
    )
    want = np.zeros((n, k + 1, c), np.float32)
    for i in range(n):
        want[i, cls_t[i]] = data[i]
    want = want[:, :-1].reshape(n, k * c)
    np.testing.assert_allclose(got, want)


def test_interval_masks_and_stride_slice():
    rng_img = np.zeros((4, 16, 1), np.float32)
    rng_img[:, :4] = 5.0  # stride 4 interval [0, 15)
    rng_img[:, 4:8] = 20.0  # stride 2 interval [15, 30)
    rng_img[:, 8:] = 50.0  # stride 1 interval [30, 100)
    intervals = {1: (30, 100), 2: (15, 30), 4: (0, 15)}
    masks = targets.interval_masks(jnp.asarray(rng_img), intervals, (1, 2, 4))
    assert np.asarray(masks[4])[:, :4].all() and not np.asarray(masks[4])[:, 4:].any()
    assert np.asarray(masks[2])[:, 4:8].all()
    assert np.asarray(masks[1])[:, 8:].all()

    data = np.arange(16, dtype=np.float32)[None, :, None].repeat(4, 0)
    s2 = np.asarray(targets.stride_slice(jnp.asarray(data), 2))
    np.testing.assert_array_equal(s2[0, :, 0], np.arange(1, 16, 2))
    s4 = np.asarray(targets.stride_slice(jnp.asarray(data), 4))
    np.testing.assert_array_equal(s4[0, :, 0], np.arange(2, 16, 4))


def test_generate_dense_targets_shapes(rng):
    H, W, M = 8, 32, 6
    csa = random_csa(rng, M, center_scale=10.0)
    corners8 = np.asarray(boxes.csa_to_corners3d(jnp.asarray(csa)))
    pts = rng.uniform(-15, 15, (H, W, 3)).astype(np.float32)
    mask = np.ones((H * W,), np.float32)
    idx = assigner.assign_points_to_boxes(
        jnp.asarray(pts.reshape(-1, 3)), jnp.asarray(corners8), jnp.asarray(mask)
    )
    out = targets.generate_dense_targets(
        jnp.asarray(pts),
        jnp.asarray(csa),
        jnp.asarray(np.ones(M, np.float32)),
        idx,
        label_set=[1],
        reg_dim_weights=[3, 1, 1, 1, 1, 1, 1, 1],
    )
    assert out["rpn_reg_target"].shape == (H, W, 8)
    assert out["rpn_reg_weight"].shape == (H, W, 8)
    assert out["reg_normalize_weight"].shape == (H, W, 8)
    assert out["rpn_cls_target"].shape == (H, W, 1)
    # weights nonzero exactly where assigned
    assigned = np.asarray(idx).reshape(H, W) >= 0
    got_w = np.asarray(out["rpn_reg_weight"])[..., 0] > 0
    np.testing.assert_array_equal(got_w, assigned)


def test_assigner_nlz_excludes_points(rng):
    """NLZ-flagged points must never be assigned (assigner.h:29-44 via
    core/input.py:276-320: is_in_nlz > 0 is skipped before box tests)."""
    pts, csa, corners8, mask = _scene(rng)
    base = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(pts), jnp.asarray(corners8), jnp.asarray(mask)
        )
    )
    nlz = np.full(len(pts), -1.0, np.float32)
    assigned = np.where(base >= 0)[0]
    assert len(assigned) > 50
    flagged = assigned[::2]
    nlz[flagged] = 1.0
    got = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(pts), jnp.asarray(corners8), jnp.asarray(mask),
            is_in_nlz=jnp.asarray(nlz),
        )
    )
    assert (got[flagged] == -1).all()
    keep = nlz <= 0
    np.testing.assert_array_equal(got[keep], base[keep])


def test_build_train_targets_consumes_nlz():
    """End-to-end: an is_in_nlz plane in the batch zeroes the dense targets
    of the flagged pixels (wiring of models/detector.py:build_train_targets)."""
    import jax
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models.detector import build_train_targets
    from tiny import tiny_config

    cfg = tiny_config()
    batch = make_batch(cfg, 1, seed=3, num_boxes=6)
    t_clean = jax.jit(lambda b: build_train_targets(b, cfg))(
        {k: jnp.asarray(v) for k, v in batch.items()}
    )
    w_clean = np.asarray(t_clean["reg_weight_s1"])
    assert (w_clean > 0).sum() > 0, "need foreground pixels in the scene"

    batch_nlz = dict(batch)
    batch_nlz["is_in_nlz"] = np.ones_like(batch["is_in_nlz"])  # all NLZ
    t_nlz = jax.jit(lambda b: build_train_targets(b, cfg))(
        {k: jnp.asarray(v) for k, v in batch_nlz.items()}
    )
    assert (np.asarray(t_nlz["reg_weight_s1"]) == 0).all()
