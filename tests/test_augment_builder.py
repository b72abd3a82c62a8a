"""Augmentations keep geometry consistent; offline-builder numpy pieces."""
import numpy as np

from rangedet_tpu.data.augment import world_flip, world_rotation
from rangedet_tpu.data.synthetic import make_frame
from rangedet_tpu.data.waymo_builder import (
    azimuth_table,
    build_frame_record,
    corners_from_csa,
    spherical_to_cartesian,
)


def _consistency(frame):
    """Points' azimuth must match their column's expected ordering and GT
    boxes must still contain roughly as many points as before."""
    import jax.numpy as jnp
    from rangedet_tpu.ops import assigner, boxes

    corners8 = np.asarray(boxes.csa_to_corners3d(jnp.asarray(frame["gt_csa"])))
    idx = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(frame["pc"].reshape(-1, 3)),
            jnp.asarray(corners8),
            jnp.asarray(frame["mask"].reshape(-1)),
        )
    )
    return (idx >= 0).sum()


def test_world_flip_preserves_containment(rng):
    frame = make_frame(rng, H=32, W=256, num_boxes=5)
    n0 = _consistency(frame)
    flipped = world_flip(frame, rng, prob=1.0)
    n1 = _consistency(flipped)
    assert n1 >= 0.9 * n0, (n0, n1)
    # y really flipped
    assert np.allclose(flipped["pc"][..., 1], -frame["pc"][:, ::-1, 1])


def test_world_rotation_preserves_containment(rng):
    frame = make_frame(rng, H=32, W=256, num_boxes=5)
    n0 = _consistency(frame)
    rot = world_rotation(frame, rng)
    n1 = _consistency(rot)
    assert n1 >= 0.9 * n0, (n0, n1)
    # range invariant under rotation
    r0 = np.linalg.norm(frame["pc"], axis=-1)
    r1 = np.linalg.norm(rot["pc"], axis=-1)
    assert np.allclose(np.sort(r0.ravel()), np.sort(r1.ravel()), atol=1e-4)


def test_spherical_roundtrip():
    H, W = 4, 16
    incl = np.linspace(0.1, -0.3, H).astype(np.float32)
    az = azimuth_table(W)
    rng_img = np.full((H, W), 10.0, np.float32)
    pc = spherical_to_cartesian(rng_img, incl, az)
    np.testing.assert_allclose(np.linalg.norm(pc, axis=-1), 10.0, rtol=1e-5)
    got_az = np.arctan2(pc[..., 1], pc[..., 0])
    np.testing.assert_allclose(got_az, np.broadcast_to(az, (H, W)), atol=1e-5)


def test_corners_from_csa_matches_jax(rng):
    from conftest import random_csa
    import jax.numpy as jnp
    from rangedet_tpu.ops import boxes

    csa = random_csa(rng, 8)
    np_c = corners_from_csa(csa)
    jx_c = np.asarray(boxes.csa_to_corners3d(jnp.asarray(csa)))
    np.testing.assert_allclose(np_c, jx_c, atol=1e-4)


def test_build_frame_record_schema(rng):
    from conftest import random_csa

    csa = random_csa(rng, 3)
    rec = build_frame_record("f0", "/tmp/f0.npz", csa, np.array([1, 1, 2]))
    assert rec["gt_bbox_imu"].shape == (3, 8, 3)
    assert rec["gt_bbox_csa"].shape == (3, 7)
    assert rec["gt_class"].shape == (3,)
    assert rec["pc_url"] == "/tmp/f0.npz"
