"""Native host library (C++/ctypes) vs the device ops and the numpy oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from rangedet_tpu import native
from rangedet_tpu.ops import assigner, boxes, nms, rotated_iou
from conftest import random_csa
import oracles

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib failed to build"
)


def test_native_assigner_matches_device(rng):
    from test_assigner_targets import _scene

    pts, csa, corners8, mask = _scene(rng)
    want = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(pts), jnp.asarray(corners8), jnp.asarray(mask)
        )
    )
    got = native.assign_points(pts, corners8, mask)
    np.testing.assert_array_equal(got, want)


def test_native_points_per_box():
    idx = np.array([0, 0, 2, -1, 2, 2], np.int32)
    got = native.points_per_box(idx, 4)
    np.testing.assert_allclose(got, [2, 0, 3, 0])


def test_native_iou_matrix_matches_device(rng):
    csa_a = random_csa(rng, 20, center_scale=5.0)
    csa_b = random_csa(rng, 15, center_scale=5.0)
    ca = np.asarray(boxes.csa_to_corners_bev(jnp.asarray(csa_a)))
    cb = np.asarray(boxes.csa_to_corners_bev(jnp.asarray(csa_b)))
    want = np.asarray(rotated_iou.iou_bev_matrix(jnp.asarray(ca), jnp.asarray(cb)))
    got = native.iou_bev_matrix(ca.reshape(-1, 8), cb.reshape(-1, 8))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_native_wnms_matches_device(rng):
    from test_nms import _make_dets

    n = 40
    dets = _make_dets(rng, n, scale=6.0)
    for k in range(0, 12, 4):
        dets[k + 1 : k + 3] = dets[k]
        dets[k + 1 : k + 3, :8] += rng.uniform(-0.1, 0.1, (2, 8))
        dets[k + 1 : k + 3, 11] = rng.uniform(0.05, 1.0, 2)

    out_native, _ = native.weighted_nms(dets, 0.1, 0.5)
    out_dev, valid = nms.weighted_nms(
        jnp.asarray(dets[:, :11]), jnp.asarray(dets[:, 11]),
        jnp.ones(n, bool), 0.1, 0.5, max_keep=n,
    )
    out_dev = np.asarray(out_dev)[np.asarray(valid)]
    assert out_native.shape == out_dev.shape
    np.testing.assert_allclose(out_native, out_dev, rtol=2e-3, atol=2e-3)
