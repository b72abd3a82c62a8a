"""Round-trip contract of the compact device ingest codec
(data/device_cache.py): expand(pack(record_to_inputs(rec))) must reproduce
the full training-batch dict within the documented quantization budget, and
the HBM-cache gather must be an exact frame selection.
"""
import numpy as np
import pytest

from rangedet_tpu.data.device_cache import (
    expand_inputs,
    gather_packed,
    pack_inputs,
    stack_packed,
)
from rangedet_tpu.data.synthetic import make_frame_vehicles
from rangedet_tpu.data.waymo import record_to_inputs

H, W, PAD_W = 16, 256, 384


def _records(n, seed0=0, nlz=False):
    recs = []
    for i in range(n):
        f = make_frame_vehicles(
            np.random.RandomState(seed0 + i), H=H, W=W, num_boxes=4
        )
        nlz_ch = -np.ones((H, W), np.float32)
        if nlz:
            nlz_ch[2:4, 10:40] = 1.0
        ri = np.stack(
            [np.where(f["mask"] > 0, f["range_value"], -1.0),
             f["intensity"], f["elongation"], nlz_ch], -1
        ).astype(np.float32)
        path = f"/tmp/devcache_{seed0 + i}.npz"
        np.savez(path, pc_vehicle_frame=f["pc"].astype(np.float32),
                 range_image=ri,
                 inclination=np.linspace(0.03, -0.3, H, dtype=np.float32),
                 azimuth=np.zeros(W, np.float32))
        recs.append(dict(pc_url=path, gt_class=f["gt_class"],
                         gt_bbox_csa=f["gt_csa"]))
    return recs


@pytest.mark.parametrize("nlz", [False, True])
def test_pack_expand_round_trip(nlz):
    recs = _records(2, seed0=10, nlz=nlz)
    fulls = [record_to_inputs(r, (H, PAD_W), 20) for r in recs]
    packed = stack_packed([pack_inputs(f) for f in fulls])
    out = {k: np.asarray(v) for k, v in expand_inputs(
        {k: np.asarray(v) for k, v in packed.items()}, W).items()}

    ref = {k: np.stack([f[k] for f in fulls]) for k in fulls[0]}
    # exact fields
    for k in ("mask", "is_in_nlz", "gt_csa", "gt_class", "gt_valid"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    # quantized fields, documented budgets
    np.testing.assert_allclose(out["pc"], ref["pc"], atol=2.5e-3)
    np.testing.assert_allclose(
        out["unnorm_range"], ref["unnorm_range"], atol=2e-3)
    # normalized channels: per-channel tolerance = quantization step / sigma
    sig = {
        0: 2e-3 / np.sqrt(1500.0) + 1e-6,   # range u16
        1: (1 / 255.0) / np.sqrt(0.01) / 2 + 1e-6,
        2: (1 / 255.0) / np.sqrt(0.0267) / 2 + 1e-6,
        3: 2.5e-3 / np.sqrt(307.4),
        4: 2.5e-3 / np.sqrt(219.1),
        5: 2.5e-3 / np.sqrt(1.0),
        6: 1e-5,                             # inclination table, f32
        7: 3e-3 / np.sqrt(2.55),             # azimuth from quantized pc
    }
    for c, tol in sig.items():
        err = np.abs(out["input_data"][..., c] - ref["input_data"][..., c])
        if c == 7:
            # the ±pi branch cut: a pixel at azimuth exactly pi can wrap to
            # -pi under pc quantization — same angle; compare mod 2pi
            err = np.minimum(err, np.abs(err - 2 * np.pi / np.sqrt(2.55)))
        assert err.max() <= tol * 1.05, (c, err.max(), tol)
    # z is whitened with var 1.0, so the 2.4 mm pc step passes through
    np.testing.assert_allclose(out["coord"], ref["coord"], atol=2.6e-3)


def test_padding_zeros_are_exact():
    recs = _records(1, seed0=30)
    full = record_to_inputs(recs[0], (H, PAD_W), 20)
    packed = stack_packed([pack_inputs(full)])
    out = expand_inputs({k: np.asarray(v) for k, v in packed.items()}, W)
    for k in ("input_data", "coord", "pc", "mask", "unnorm_range",
              "is_in_nlz"):
        assert float(np.abs(np.asarray(out[k])[:, :, W:]).max()) == 0.0, k


def test_gather_selects_frames():
    recs = _records(3, seed0=40)
    fulls = [record_to_inputs(r, (H, PAD_W), 20) for r in recs]
    cache = stack_packed([pack_inputs(f) for f in fulls])
    import jax.numpy as jnp

    cache_j = {k: jnp.asarray(v) for k, v in cache.items()}
    sub = gather_packed(cache_j, jnp.asarray([2, 0]))
    out = expand_inputs(sub, W)
    ref = expand_inputs(
        {k: np.asarray(v)[np.array([2, 0])] for k, v in cache.items()}, W)
    for k in out:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


def test_device_augment_matches_host_augment():
    """augment_raw (device twin) == data/augment.py host path through the
    full pipeline: record_to_inputs(augment=...) with a known RandomState vs
    pack -> unpack_raw -> augment_raw(explicit matched draws) -> finalize,
    within the codec's quantization budget."""
    import jax.numpy as jnp

    from rangedet_tpu.data.device_cache import (
        augment_raw,
        finalize_inputs,
        unpack_raw,
    )
    from rangedet_tpu.data.waymo import record_to_inputs as r2i

    recs = _records(2, seed0=60)
    seed = 123
    # replicate the host draw sequence (world_flip: one uniform; rotation:
    # one uniform theta -> column-quantized shift)
    flips, shifts = [], []
    for i in range(2):
        r = np.random.RandomState(seed + i)
        flips.append(bool(r.uniform() < 0.5))
        theta = float(r.uniform(-np.pi / 4, np.pi / 4))
        shifts.append(int(round(theta / (2 * np.pi) * W)))

    host = [
        r2i(recs[i], (H, PAD_W), 20, augment=("flip", "rotation"),
            aug_rng=np.random.RandomState(seed + i))
        for i in range(2)
    ]
    ref = {k: np.stack([h[k] for h in host]) for k in host[0]}

    packed = stack_packed(
        [pack_inputs(r2i(r, (H, PAD_W), 20)) for r in recs])
    raw = unpack_raw({k: jnp.asarray(v) for k, v in packed.items()}, W)
    raw = augment_raw(raw, W, do_flip=jnp.asarray(flips),
                      shift=jnp.asarray(shifts, jnp.int32))
    out = {k: np.asarray(v) for k, v in finalize_inputs(raw).items()}

    assert any(flips) or any(s != 0 for s in shifts)  # non-trivial case
    for k in ("mask", "is_in_nlz", "gt_class", "gt_valid"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    np.testing.assert_allclose(out["gt_csa"], ref["gt_csa"], atol=1e-5)
    np.testing.assert_allclose(out["pc"], ref["pc"], atol=4e-3)
    np.testing.assert_allclose(out["unnorm_range"], ref["unnorm_range"],
                               atol=2e-3)
    err = np.abs(out["input_data"] - ref["input_data"])
    # azimuth channel: tolerate the +-pi branch cut under quantization
    err[..., 7] = np.minimum(
        err[..., 7], np.abs(err[..., 7] - 2 * np.pi / np.sqrt(2.55)))
    # bound = the largest per-channel quantization budget (intensity u8:
    # half-step / sigma = (1/255)/2/0.1 = 0.0196)
    assert err.max() < 2.1e-2, err.max()


def test_device_augment_random_draws_shapes():
    """Key-driven draws: flip is Bernoulli, shift stays within the +-W/8
    column lattice of the host op's (-pi/4, pi/4) interval."""
    import jax
    import jax.numpy as jnp

    from rangedet_tpu.data.device_cache import augment_raw, unpack_raw

    recs = _records(2, seed0=70)
    from rangedet_tpu.data.waymo import record_to_inputs as r2i

    packed = stack_packed(
        [pack_inputs(r2i(r, (H, PAD_W), 20)) for r in recs])
    raw = unpack_raw({k: jnp.asarray(v) for k, v in packed.items()}, W)
    out = augment_raw(raw, W, key=jax.random.PRNGKey(0))
    assert out["pc"].shape == raw["pc"].shape
    assert np.isfinite(np.asarray(out["pc"])).all()
    # yaw moved on at least one frame (rotation applied)
    assert (np.asarray(out["gt_csa"]) != np.asarray(raw["gt_csa"])).any()
