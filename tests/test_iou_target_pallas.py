"""Fused IoU-target Pallas kernel vs the XLA oracle path.

The fused kernel (ops/iou_target_pallas.py) re-implements
RangeRpnHead.get_iou_target (reference rangedet/symbol/head/builder.py:156-196):
decode per-pixel boxes, max rotated-BEV IoU vs the frame's GT quads. The
oracle is the XLA chunked path (decode_boxes -> box10_to_corners_bev ->
rotated_iou.max_iou_vs_gt dense) that is itself oracle-tested against numpy
transcriptions in tests/test_geometry.py.

With M <= topk_gt the block-candidate selection is complete, so fused and
dense-oracle outputs must agree to float tolerance — including after the
far-block candidate skip (skipped (block, gt) pairs are provably IoU 0 by
the circumcircle clearance bound).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rangedet_tpu.ops import boxes as ops_boxes
from rangedet_tpu.ops import decode as ops_decode
from rangedet_tpu.ops import rotated_iou as ops_iou
from rangedet_tpu.ops.iou_target_pallas import iou_target_fused

INTERP = jax.default_backend() != "tpu"


def _scene(B, H, W, M, seed=0):
    """Plausible range-image scene: pc on an azimuth grid, mild deltas,
    GT boxes scattered in reach of some pixels."""
    rng = np.random.RandomState(seed)
    az = np.linspace(-np.pi, np.pi, W, endpoint=False)
    r = rng.uniform(3.0, 60.0, size=(B, H, W))
    pc = np.stack(
        [r * np.cos(az)[None, None], r * np.sin(az)[None, None],
         rng.uniform(-1, 1, size=(B, H, W))], axis=-1
    ).astype(np.float32)
    deltas = (rng.randn(B, H, W, 8) * 0.3).astype(np.float32)
    # GT: centers near a subset of points, sizes ~vehicle
    idx = rng.randint(0, H * W, size=(B, M))
    ctr = pc.reshape(B, -1, 3)[np.arange(B)[:, None], idx][..., :2]
    lw = rng.uniform(1.5, 5.0, size=(B, M, 2))
    yaw = rng.uniform(-np.pi, np.pi, size=(B, M))
    c, s = np.cos(yaw), np.sin(yaw)
    hl, hw = lw[..., 0] / 2, lw[..., 1] / 2
    lx = np.stack([hl, -hl, -hl, hl], -1)
    wy = np.stack([hw, hw, -hw, -hw], -1)
    corners = np.stack(
        [ctr[..., :1] + lx * c[..., None] - wy * s[..., None],
         ctr[..., 1:2] + lx * s[..., None] + wy * c[..., None]], axis=-1
    ).astype(np.float32)  # (B, M, 4, 2)
    return jnp.asarray(deltas), jnp.asarray(pc), jnp.asarray(corners)


def _oracle(deltas, pc, gt_corners):
    B = deltas.shape[0]
    dec = ops_decode.decode_boxes(deltas.reshape(B, -1, 8), pc.reshape(B, -1, 3))
    corners = ops_boxes.box10_to_corners_bev(dec)
    return jax.vmap(
        lambda p, g: ops_iou.max_iou_vs_gt(p, g, topk_gt=0, chunk=4096)
    )(corners, gt_corners)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_dense_oracle(seed):
    B, H, W, M = 1, 8, 256, 10
    deltas, pc, gt = _scene(B, H, W, M, seed=seed)
    fused = iou_target_fused(deltas, pc, gt, 32, INTERP).reshape(B, -1)
    dense = _oracle(deltas, pc, gt)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(dense), atol=2e-4, rtol=1e-3
    )
    assert float(jnp.max(fused)) > 0.05  # the scene actually overlaps


def test_degenerate_and_padded_gt_rows_are_iou0():
    B, H, W, M = 1, 8, 256, 6
    deltas, pc, gt = _scene(B, H, W, M, seed=2)
    gt = gt.at[:, 3:].set(0.0)  # padded rows: zero-size quads
    fused = iou_target_fused(deltas, pc, gt, 32, INTERP).reshape(B, -1)
    only3 = iou_target_fused(deltas, pc, gt[:, :3], 32, INTERP).reshape(B, -1)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(only3), atol=1e-6
    )


@pytest.mark.parametrize("mode", ["dyn", "gate", "gate8"])
def test_far_block_skip_is_exact(mode):
    """Every skip strategy must be bit-identical to running every candidate,
    including with M > topk_gt (selection is clearance-ordered in both) and
    with a non-8-multiple G (gate8 pads the candidate table)."""
    B, H, W, M = 1, 8, 512, 24
    deltas, pc, gt = _scene(B, H, W, M, seed=5)
    for G in (8, 12):
        a = iou_target_fused(deltas, pc, gt, G, INTERP, mode)
        b = iou_target_fused(deltas, pc, gt, G, INTERP, False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crowded_block_cap_is_one_sided_and_exact_when_covered():
    """ADVICE r4: with MORE than G GTs overlapping one block, the clearance-
    ordered candidate truncation is an accepted approximation — pin its
    contract vs the dense oracle: (a) capped output is a one-sided LOWER
    bound of the dense max-IoU, (b) a G that covers the crowd is exact,
    (c) the cap actually binds in this scene (the test is not vacuous)."""
    B, H, W = 1, 8, 256
    rng = np.random.RandomState(7)
    az = np.linspace(-np.pi, np.pi, W, endpoint=False)
    r = rng.uniform(3.0, 60.0, size=(B, H, W))
    pc = np.stack(
        [r * np.cos(az)[None, None], r * np.sin(az)[None, None],
         rng.uniform(-1, 1, size=(B, H, W))], axis=-1
    ).astype(np.float32)
    deltas = (rng.randn(B, H, W, 8) * 0.3).astype(np.float32)
    # a CROWD: 40 GT boxes all clustered around one pixel's neighborhood so
    # a single column-major block sees far more than G=8 live candidates
    M = 40
    anchor = pc[0, 4, 37, :2]
    ctr = anchor[None, None] + rng.uniform(-2.0, 2.0, size=(B, M, 2))
    lw = rng.uniform(2.5, 6.0, size=(B, M, 2))
    yaw = rng.uniform(-np.pi, np.pi, size=(B, M))
    c, s = np.cos(yaw), np.sin(yaw)
    hl, hw = lw[..., 0] / 2, lw[..., 1] / 2
    lx = np.stack([hl, -hl, -hl, hl], -1)
    wy = np.stack([hw, hw, -hw, -hw], -1)
    gt = np.stack(
        [ctr[..., :1] + lx * c[..., None] - wy * s[..., None],
         ctr[..., 1:2] + lx * s[..., None] + wy * c[..., None]], axis=-1
    ).astype(np.float32)
    deltas, pc, gt = jnp.asarray(deltas), jnp.asarray(pc), jnp.asarray(gt)

    dense = np.asarray(_oracle(deltas, pc, gt)).reshape(-1)
    capped = np.asarray(
        iou_target_fused(deltas, pc, gt, 8, INTERP)
    ).reshape(-1)
    covered = np.asarray(
        iou_target_fused(deltas, pc, gt, M, INTERP)
    ).reshape(-1)
    # (a) one-sided: truncation can only LOWER the max-IoU
    assert (capped <= dense + 2e-4).all()
    # (b) exact when G covers every candidate
    np.testing.assert_allclose(covered, dense, atol=2e-4, rtol=1e-3)
    # (c) the cap binds somewhere in this crowd (non-vacuous)
    assert (capped < dense - 1e-3).any()


def test_zero_gt_gives_zero_target():
    B, H, W, M = 1, 8, 128, 4
    deltas, pc, gt = _scene(B, H, W, M, seed=3)
    fused = iou_target_fused(deltas, pc, jnp.zeros_like(gt), 32, INTERP)
    assert float(jnp.max(jnp.abs(fused))) == 0.0


def test_gradients_are_zero():
    B, H, W, M = 1, 8, 128, 4
    deltas, pc, gt = _scene(B, H, W, M, seed=4)
    g = jax.grad(lambda d: iou_target_fused(d, pc, gt, 32, INTERP).sum())(deltas)
    assert float(jnp.max(jnp.abs(g))) == 0.0
