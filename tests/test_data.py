"""Host data pipeline: hole filling, normalization, loader, synthetic scenes."""
import numpy as np
import pytest

from rangedet_tpu.data.loader import BatchLoader
from rangedet_tpu.data.normalization import CHANNELS, clip_and_norm
from rangedet_tpu.data.synthetic import make_batch, make_frame
from rangedet_tpu.data.waymo import fill_missing
from tiny import tiny_config


def test_fill_missing_single_hole():
    H, W = 8, 16
    ri = np.full((H, W, 4), 5.0, np.float32)
    pc = np.ones((H, W, 3), np.float32)
    ri[3, 4] = [-1, 0, 0, -1]  # isolated hole; right neighbor valid
    out_ri, out_pc, mask = fill_missing(ri.copy(), pc.copy())
    # filled from the pixel one to the right (input.py:100-103 shift)
    assert out_ri[3, 4, 0] == 5.0
    assert mask[3, 4] == 1.0


def test_fill_missing_background_and_car_window():
    H, W = 8, 16
    ri = np.full((H, W, 4), -1.0, np.float32)
    ri[..., 1:3] = 0
    pc = np.zeros((H, W, 3), np.float32)
    # one valid return at (4, 8): holes within 2 px become "car window"
    ri[4, 8] = [10, 0.5, 0.1, 0]
    out_ri, out_pc, mask = fill_missing(ri.copy(), pc.copy())
    # far corner: genuine background -> range 80
    assert out_ri[0, 0, 0] == 80.0
    # neighbor 2 px away in the same row: car window -> zeroed
    assert out_ri[4, 6, 0] == 0.0
    # the valid pixel keeps its value... (4,7) was filled by shift from (4,8)
    assert out_ri[4, 8, 0] == 10.0


def test_clip_and_norm_matches_reference_constants():
    v = np.array([100.0, -5.0, 50.0], np.float32)
    out = clip_and_norm("range_value", v)
    want = (np.clip(v, 0, 80) - 20.0) / np.sqrt(1500.0)
    np.testing.assert_allclose(out, want, rtol=1e-6)
    assert len(CHANNELS) == 8


def test_synthetic_points_inside_boxes(rng):
    frame = make_frame(rng, H=32, W=256, num_boxes=5)
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
    # each synthetic box should own a healthy number of points
    counts = np.bincount(idx[idx >= 0], minlength=5)
    assert (counts > 5).sum() >= 3, counts


def test_synthetic_vehicles_raytrace_consistency(rng):
    """Raytraced vehicle frames: every painted object pixel's 3D point lies
    strictly inside its GT cuboid (per the reference-strict assigner), and
    gt_num_points matches the assigner's census exactly."""
    from rangedet_tpu.data.synthetic import make_frame_vehicles

    import jax.numpy as jnp
    from rangedet_tpu.ops import assigner, boxes

    frame = make_frame_vehicles(rng, H=64, W=512, num_boxes=6)
    corners8 = np.asarray(boxes.csa_to_corners3d(jnp.asarray(frame["gt_csa"])))
    idx = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(frame["pc"].reshape(-1, 3)),
            jnp.asarray(corners8),
            jnp.asarray(frame["mask"].reshape(-1)),
        )
    )
    counts = np.bincount(idx[idx >= 0], minlength=6).astype(np.float32)
    np.testing.assert_array_equal(counts, frame["gt_num_points"])
    assert counts.sum() > 0
    # vehicle boxes are oriented (l != w): yaw is identifiable
    assert (frame["gt_csa"][:, 3] > frame["gt_csa"][:, 4]).all()


def test_make_batch_shapes():
    cfg = tiny_config()
    b = make_batch(cfg, batch_size=3, seed=1, num_boxes=4)
    H, W = cfg.pad_field
    assert b["input_data"].shape == (3, H, W, 8)
    assert b["coord"].shape == (3, H, W, 3)
    assert b["gt_csa"].shape == (3, cfg.max_gt_boxes, 7)
    assert b["gt_valid"].sum() == 3 * 4
    assert np.isfinite(b["input_data"]).all()


def test_batch_loader_prefetch_and_shard():
    records = list(range(20))
    map_fn = lambda r: {"x": np.full((2, 2), float(r), np.float32)}
    loader = BatchLoader(records, map_fn, batch_size=4, shuffle=True, num_workers=3)
    batches = list(loader.epoch())
    assert len(batches) == 5
    seen = sorted(int(v) for b in batches for v in b["x"][:, 0, 0])
    assert seen == records

    # host sharding: 2 hosts × 10 records
    l0 = BatchLoader(records, map_fn, 5, shuffle=False, host_id=0, num_hosts=2)
    l1 = BatchLoader(records, map_fn, 5, shuffle=False, host_id=1, num_hosts=2)
    v0 = {int(v) for b in l0.epoch() for v in b["x"][:, 0, 0]}
    v1 = {int(v) for b in l1.epoch() for v in b["x"][:, 0, 0]}
    assert v0 == set(range(10)) and v1 == set(range(10, 20))


def test_batch_loader_propagates_errors():
    def bad_map(r):
        if r == 3:
            raise ValueError("boom")
        return {"x": np.zeros(1, np.float32)}

    loader = BatchLoader(list(range(5)), bad_map, 5, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader.epoch())


def test_prefetch_pipeline():
    from rangedet_tpu.data.prefetch import device_prefetch, threaded_prefetch

    items = list(range(10))
    out = list(threaded_prefetch(iter(items), depth=3))
    assert out == items

    calls = []
    out2 = list(device_prefetch(iter(items), put=lambda x: calls.append(x) or x * 2, depth=2))
    assert out2 == [x * 2 for x in items]
    assert calls == items

    def boom():
        yield 1
        raise ValueError("boom")

    import pytest

    with pytest.raises(ValueError, match="boom"):
        list(threaded_prefetch(boom(), depth=2))


def test_synthetic_device_raytrace_consistency():
    """On-device generator (data/synthetic_device.py): same invariants as
    the numpy raytracer — every painted pixel's point strictly inside its GT
    cuboid, census equality, oriented boxes, finite normalized inputs."""
    import jax
    import jax.numpy as jnp
    from rangedet_tpu.data.synthetic_device import make_batch_device
    from rangedet_tpu.ops import assigner, boxes

    b = make_batch_device(
        jax.random.PRNGKey(3), B=2, H=32, W=256, pad_w=256, max_gt=16,
        num_boxes=5,
    )
    assert np.isfinite(np.asarray(b["input_data"])).all()
    for f in range(2):
        corners8 = boxes.csa_to_corners3d(b["gt_csa"][f])
        idx = np.asarray(
            assigner.assign_points_to_boxes(
                jnp.asarray(b["pc"][f].reshape(-1, 3)), corners8,
                jnp.asarray(b["mask"][f].reshape(-1)),
                box_valid=b["gt_valid"][f],
            )
        )
        counts = np.bincount(idx[idx >= 0], minlength=16).astype(np.float32)
        np.testing.assert_array_equal(counts, np.asarray(b["gt_num_points"][f]))
        gt = np.asarray(b["gt_csa"][f][:5])
        assert (gt[:, 3] > gt[:, 4]).all()  # l > w: yaw identifiable
        assert counts[:5].sum() > 0


def test_synthetic_device_ped_family():
    """PED_DIMS scene family: walking-adult-scale cuboids with the same
    raytrace invariants (containment census, identifiable yaw, gt_class=2 —
    the Waymo TYPE_PEDESTRIAN enum the ped recipes filter on)."""
    import jax
    import jax.numpy as jnp
    from rangedet_tpu.data.synthetic_device import PED_DIMS, make_batch_device
    from rangedet_tpu.ops import assigner, boxes

    b = make_batch_device(
        jax.random.PRNGKey(7), B=2, H=32, W=512, pad_w=512, max_gt=16,
        num_boxes=5, dims=PED_DIMS, r_range=(5.0, 25.0), class_value=2.0,
    )
    assert np.isfinite(np.asarray(b["input_data"])).all()
    for f in range(2):
        corners8 = boxes.csa_to_corners3d(b["gt_csa"][f])
        idx = np.asarray(
            assigner.assign_points_to_boxes(
                jnp.asarray(b["pc"][f].reshape(-1, 3)), corners8,
                jnp.asarray(b["mask"][f].reshape(-1)),
                box_valid=b["gt_valid"][f],
            )
        )
        counts = np.bincount(idx[idx >= 0], minlength=16).astype(np.float32)
        np.testing.assert_array_equal(counts, np.asarray(b["gt_num_points"][f]))
        gt = np.asarray(b["gt_csa"][f][:5])
        assert (gt[:, 3] > gt[:, 4]).all()  # PED_DIMS keeps l > w
        assert (gt[:, 3] < 1.3).all() and (gt[:, 5] >= 1.6).all()
        assert (np.asarray(b["gt_class"][f][:5]) == 2.0).all()
        assert counts[:5].sum() > 0


def test_synthetic_device_mixed_families():
    """families=: each box draws (dims, r_range, class) independently — the
    multiclass recipes' scene generator. Class enums land in gt_class and
    every family is represented across a few frames."""
    import jax
    from rangedet_tpu.data.synthetic_device import (
        CYC_DIMS, PED_DIMS, VEHICLE_DIMS, make_batch_device,
    )

    fams = (
        (VEHICLE_DIMS, (8.0, 40.0), 1.0),
        (PED_DIMS, (5.0, 25.0), 2.0),
        (CYC_DIMS, (5.0, 30.0), 4.0),
    )
    b = make_batch_device(
        jax.random.PRNGKey(11), B=4, H=32, W=512, pad_w=512, max_gt=16,
        num_boxes=8, families=fams,
    )
    cls = np.asarray(b["gt_class"])[np.asarray(b["gt_valid"]) > 0]
    assert set(np.unique(cls)) <= {1.0, 2.0, 4.0}
    assert len(np.unique(cls)) == 3  # all families drawn across 32 boxes
    csa = np.asarray(b["gt_csa"]).reshape(-1, 7)[
        np.asarray(b["gt_valid"]).reshape(-1) > 0
    ]
    # vehicle-sized lengths only for class-1 boxes
    assert (csa[cls == 1.0][:, 3] >= 3.6).all()
    assert (csa[cls == 2.0][:, 3] <= 1.2).all()


def test_synthetic_device_clutter_and_far():
    """Clutter + far-range scene knobs (VERDICT r4 weak #2): unlabeled
    poles/walls are rendered (occluding geometry) but never enter GT;
    far-family boxes reach past 50 m and still paint enough pixels for the
    census invariant to hold."""
    import jax
    import jax.numpy as jnp
    from rangedet_tpu.data.synthetic_device import (
        VEHICLE_DIMS,
        make_batch_device,
    )
    from rangedet_tpu.ops import assigner, boxes

    b = make_batch_device(
        jax.random.PRNGKey(11), B=2, H=32, W=1024, pad_w=1024, max_gt=16,
        num_boxes=5, dims=VEHICLE_DIMS, r_range=(8.0, 68.0),
        num_clutter=6,
    )
    base = make_batch_device(
        jax.random.PRNGKey(11), B=2, H=32, W=1024, pad_w=1024, max_gt=16,
        num_boxes=5, dims=VEHICLE_DIMS, r_range=(8.0, 68.0),
    )
    assert np.isfinite(np.asarray(b["input_data"])).all()
    # clutter never enters GT: identical boxes with and without it
    np.testing.assert_array_equal(
        np.asarray(b["gt_csa"]), np.asarray(base["gt_csa"]))
    np.testing.assert_array_equal(
        np.asarray(b["gt_valid"]), np.asarray(base["gt_valid"]))
    # clutter paints real extra geometry somewhere in the batch
    assert float(jnp.abs(b["unnorm_range"] - base["unnorm_range"]).max()) > 1.0
    painted_r = []
    for f in range(2):
        corners8 = boxes.csa_to_corners3d(b["gt_csa"][f])
        idx = np.asarray(
            assigner.assign_points_to_boxes(
                jnp.asarray(b["pc"][f].reshape(-1, 3)), corners8,
                jnp.asarray(b["mask"][f].reshape(-1)),
                box_valid=b["gt_valid"][f],
            )
        )
        counts = np.bincount(idx[idx >= 0], minlength=16).astype(np.float32)
        np.testing.assert_array_equal(
            counts, np.asarray(b["gt_num_points"][f]))
        gt = np.asarray(b["gt_csa"][f][:5])
        painted_r.append(np.linalg.norm(gt[:, :2], axis=1))
    # the far family actually reaches past 50 m in this fixed-seed batch
    assert np.concatenate(painted_r).max() > 50.0


def test_synthetic_host_clutter_matches_invariants():
    """Host twin of the clutter knob (data/synthetic.py): same exclusion
    from GT + census invariant."""
    import jax.numpy as jnp
    from rangedet_tpu.data.synthetic import make_frame_vehicles
    from rangedet_tpu.ops import assigner, boxes

    rng = np.random.RandomState(5)
    frame = make_frame_vehicles(
        rng, H=32, W=1024, num_boxes=5, r_range=(8.0, 68.0), num_clutter=6)
    assert frame["gt_csa"].shape == (5, 7)
    corners8 = np.asarray(
        boxes.csa_to_corners3d(jnp.asarray(frame["gt_csa"])))
    idx = np.asarray(
        assigner.assign_points_to_boxes(
            jnp.asarray(frame["pc"].reshape(-1, 3)),
            jnp.asarray(corners8),
            jnp.asarray(frame["mask"].reshape(-1)),
        )
    )
    counts = np.bincount(idx[idx >= 0], minlength=5).astype(np.float32)
    np.testing.assert_array_equal(counts, frame["gt_num_points"])
    assert counts.sum() > 0
