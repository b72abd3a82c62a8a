"""Training infrastructure: LR schedules, optimizer, checkpoint round-trip,
running metrics, width validation."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from rangedet_tpu.configs import load_config
from rangedet_tpu.train.schedule import build_optimizer, build_schedule
from rangedet_tpu.utils.metrics import (
    AccWithIgnore,
    CompositeMetric,
    L1Metric,
    ScalarLoss,
)
from tiny import tiny_config


def test_every_shipped_recipe_loads():
    """Every configs/*.py recipe builds in both modes with consistent
    per-class dicts (the reference CLI contract: --config <name>)."""
    import glob
    import os

    import rangedet_tpu.configs as cfgs

    names = sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(os.path.dirname(cfgs.__file__), "*.py"))
        if os.path.basename(p) not in ("__init__.py", "base.py")
    )
    assert len(names) >= 7  # 4 parity + multiclass + cyc + tpuopt
    for name in names:
        for is_train in (True, False):
            c = load_config(name, is_train)
            assert c.name == name and c.is_train == is_train
            for cls in c.class_names:
                for d in (c.eval_iou_thresh, c.post_nms_top_n, c.min_score,
                          c.pre_nms_top_n, c.device_topk):
                    assert cls in d, (name, cls)


def test_cosine_warmup_schedule():
    cfg = load_config("rangedet_veh_wo_aug_4_18e", True)
    sched = build_schedule(cfg, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(cfg.warmup_lr)
    # peak at end of the 2-epoch warmup
    assert float(sched(200)) == pytest.approx(cfg.base_lr, rel=1e-3)
    # decays toward 0 at the end of 18 epochs
    assert float(sched(1800)) < 0.01 * cfg.base_lr
    # monotone decay after warmup
    assert float(sched(500)) > float(sched(1200))


def test_step_and_onecycle_modes():
    cfg = load_config("rangedet_veh_wo_aug_4_18e", True)
    step = build_schedule(cfg.replace(lr_mode="step", warmup_epochs=0), 100)
    assert float(step(1100)) == pytest.approx(cfg.base_lr)
    assert float(step(1300)) == pytest.approx(cfg.base_lr * 0.1, rel=1e-4)
    assert float(step(1600)) == pytest.approx(cfg.base_lr * 0.01, rel=1e-4)

    oc = build_schedule(cfg.replace(lr_mode="onecycle"), 100)
    peak = max(float(oc(s)) for s in range(0, 1800, 50))
    assert peak == pytest.approx(cfg.base_lr, rel=0.05)


def _ref_annealing_cos(start, end, pct):
    """numpy transcription of OneCycleScheduler.annealing_cos
    (reference utils/train_utils.py:46-52)."""
    import math

    return end + (start - end) / 2 * (math.cos(math.pi * pct) + 1)


def test_onecycle_lr_matches_reference_formula():
    """onecycle LR curve == the reference OneCycleScheduler phases
    (utils/train_utils.py:28-62): cosine low->peak over pct_start, then
    cosine peak->low/1e4; low = peak / div_factor."""
    cfg = load_config("rangedet_veh_wo_aug_4_18e", True).replace(
        lr_mode="onecycle", warmup_epochs=0)
    total, peak = 1800, cfg.base_lr
    warm = int(total * cfg.onecycle_pct_start)
    low = peak / cfg.onecycle_div_factor
    sched = build_schedule(cfg, steps_per_epoch=100)
    for s in (0, warm // 2, warm, warm + 1, total // 2, total):
        if s <= warm:
            want = _ref_annealing_cos(low, peak, s / warm)
        else:
            want = _ref_annealing_cos(peak, low / 1e4,
                                      (s - warm) / (total - warm))
        assert float(sched(s)) == pytest.approx(want, rel=1e-5), s


def test_onecycle_momentum_matches_reference_formula():
    """OneCycleMomentumScheduler (utils/train_utils.py:65-93): momentum
    anneals moms[0]->moms[1] during the LR ramp, back to moms[0] after."""
    from rangedet_tpu.train.schedule import onecycle_momentum_schedule

    total, moms, pct = 1000, (0.95, 0.85), 0.4
    warm = int(total * pct)
    sched = onecycle_momentum_schedule(total, moms, pct)
    for s in (0, warm // 2, warm, warm + 1, 700, total):
        if s <= warm:
            want = _ref_annealing_cos(moms[0], moms[1], s / warm)
        else:
            want = _ref_annealing_cos(moms[1], moms[0],
                                      (s - warm) / (total - warm))
        assert float(sched(s)) == pytest.approx(want, rel=1e-5), s
    # counter-phase to the LR: lowest momentum at the LR peak
    assert float(sched(warm)) == pytest.approx(moms[1])
    assert float(sched(0)) == pytest.approx(moms[0])


def test_onecycle_sgd_momentum_is_injected():
    """With lr_mode=onecycle, the SGD momentum hyperparameter cycles: two
    one-step updates at different counts must use different momenta."""
    cfg = tiny_config().replace(
        lr_mode="onecycle", optimizer="sgd", base_lr=1.0, weight_decay=0.0,
        clip_gradient=100.0, begin_epoch=0, end_epoch=10,
    )
    tx, _ = build_optimizer(cfg, steps_per_epoch=100)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    g = {"w": jnp.asarray([1.0, 1.0])}
    # step 1 builds the trace; step 2's update reveals the applied momentum:
    # u2 = -lr2 * (g + m2 * trace1) with trace1 = g
    _, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    from rangedet_tpu.train.schedule import (
        onecycle_momentum_schedule,
        onecycle_schedule,
    )

    lr2 = float(onecycle_schedule(1000, 1.0)(1))
    m2 = float(onecycle_momentum_schedule(1000)(1))
    np.testing.assert_allclose(
        np.asarray(u2["w"]), -lr2 * (1.0 + m2 * 1.0) * np.ones(2), rtol=1e-5)


def test_adamws_standardizes_conv_kernels():
    """AdamWS (utils/train_utils.py:240-302): after each update, every 4-D
    kernel has per-output-filter mean 0 / std 1; non-4D params are left to
    plain AdamW."""
    cfg = tiny_config().replace(
        optimizer="adamws", lr_mode="constant", base_lr=1e-3,
        weight_decay=0.0, clip_gradient=100.0,
    )
    tx, _ = build_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(0)
    params = {
        "conv": jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32),
        "bias": jnp.asarray(rng.randn(8), jnp.float32),
    }
    state = tx.init(params)
    g = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
    upd, state = tx.update(g, state, params)
    new = optax.apply_updates(params, upd)
    w = np.asarray(new["conv"])
    np.testing.assert_allclose(w.mean(axis=(0, 1, 2)), 0.0, atol=1e-6)
    centered_sq = (w - w.mean(axis=(0, 1, 2), keepdims=True)) ** 2
    np.testing.assert_allclose(
        np.sqrt(centered_sq.mean(axis=(0, 1, 2))), 1.0, rtol=1e-4)
    # bias changed but was not standardized
    assert not np.allclose(np.asarray(new["bias"]), np.asarray(params["bias"]))


def test_elementwise_grad_clip():
    """MXNet-style clip_gradient clamps each element, not the global norm."""
    cfg = tiny_config().replace(
        clip_gradient=1.0, base_lr=1.0, momentum=0.0, weight_decay=0.0,
        warmup_epochs=0, lr_mode="constant",
    )
    tx, _ = build_optimizer(cfg, 10)
    params = {"w": jnp.zeros((3,))}
    grads = {"w": jnp.asarray([0.5, 100.0, -7.0])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.5, -1.0, 1.0])


def test_checkpoint_roundtrip(tmp_path):
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.train.checkpoint import (
        latest_epoch,
        restore_checkpoint,
        save_checkpoint,
    )
    from rangedet_tpu.train.state import create_train_state

    cfg = tiny_config().replace(experiment_dir=str(tmp_path))
    batch = {
        k: jnp.asarray(v) for k, v in make_batch(cfg, 1, seed=0, num_boxes=2).items()
    }
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)

    save_checkpoint(state, cfg, epoch=3)
    save_checkpoint(state, cfg, epoch=7)
    assert latest_epoch(cfg) == 7

    restored, ep = restore_checkpoint(state, cfg)
    assert ep == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_running_metrics():
    comp = CompositeMetric([
        ScalarLoss("cls", "cls_loss"),
        AccWithIgnore("acc", "score", "target", "mask"),
        L1Metric("l1", "pred", "target_reg", "weight"),
    ])
    comp.update(
        cls_loss=2.0,
        score=np.array([0.9, 0.1, 0.8, 0.3]),
        target=np.array([1.0, 0.0, 0.0, 1.0]),
        mask=np.array([1, 1, 1, 0]),
        pred=np.array([1.0, 2.0]),
        target_reg=np.array([1.5, 2.0]),
        weight=np.array([1.0, 0.0]),
    )
    comp.update(cls_loss=4.0, score=np.zeros(1), target=np.zeros(1),
                mask=np.ones(1), pred=np.zeros(1), target_reg=np.zeros(1),
                weight=np.zeros(1))
    got = comp.get()
    assert got["cls"] == pytest.approx(3.0)
    # first update: of 3 valid px, preds [T,F,T] vs pos [T,F,F] -> 2 correct
    # second: 1 valid, pred F vs pos F -> correct => 3/4
    assert got["acc"] == pytest.approx(3 / 4)
    assert got["l1"] == pytest.approx(0.5)
    assert "cls=" in comp.format()


def test_ce_with_ignore_metric():
    """CeWithIgnore matches the hand-computed masked BCE
    (reference detection_metric.py:115-158)."""
    from rangedet_tpu.utils.metrics import CeWithIgnore

    m = CeWithIgnore("ce", "score", "target", "mask")
    s = np.array([0.9, 0.1, 0.5, 0.7])
    t = np.array([1.0, 0.0, 1.0, 0.0])
    msk = np.array([1, 1, 1, 0])  # last pixel ignored
    m.update(score=s, target=t, mask=msk)
    want = -(np.log(0.9) + np.log(0.9) + np.log(0.5)) / 3
    assert m.get()[1] == pytest.approx(want)
    m.reset()
    assert m.get()[1] == 0.0


def test_width_divisibility_error():
    from rangedet_tpu.models import RangeDet

    cfg = tiny_config(pad_field=(16, 126), feat_size=(16, 126))
    model = RangeDet(**cfg.model_kwargs())
    x = jnp.zeros((1, 16, 126, 8))
    c = jnp.zeros((1, 16, 126, 3))
    with pytest.raises(AssertionError, match="divisible"):
        model.init(jax.random.PRNGKey(0), x, c, True)


def test_gradients_reach_all_params():
    """Every parameter must receive a nonzero gradient somewhere in a train
    step (catches dead branches / silently unwired modules)."""
    import jax
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.models.detector import build_train_targets, compute_losses
    from rangedet_tpu.train.state import create_train_state

    cfg = tiny_config()
    batch = {
        k: jnp.asarray(v) for k, v in make_batch(cfg, 2, seed=1, num_boxes=4).items()
    }
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)

    def loss_fn(params):
        targets = build_train_targets(batch, cfg)
        (cl, rd), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["input_data"], batch["coord"], True, mutable=["batch_stats"],
        )
        total, _ = compute_losses(cl, rd, targets, cfg)
        return total

    grads = jax.jit(jax.grad(loss_fn))(state.params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [
        jax.tree_util.keystr(path)
        for path, g in flat
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    assert not dead, f"parameters with zero gradient: {dead}"


def test_loader_deterministic_given_seed():
    from rangedet_tpu.data.loader import BatchLoader

    records = list(range(16))
    map_fn = lambda r: {"x": np.full((1,), float(r), np.float32)}

    def epoch_order(seed):
        loader = BatchLoader(records, map_fn, 4, shuffle=True, seed=seed,
                             num_workers=1)
        return [sorted(b["x"].ravel().tolist()) for b in loader.epoch()]

    assert epoch_order(7) == epoch_order(7)
    assert epoch_order(7) != epoch_order(8)


@pytest.mark.heavy
def test_run_validation_synthetic_branch():
    """tools/train.py:run_validation synthetic path: raytraced scenes,
    per-class GT split, WOD per-class operating point — returns a finite
    metric dict for every recipe class (the in-training validation signal)."""
    import argparse
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from train import build_validation

    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.train.state import create_train_state

    cfg = tiny_config()
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(cfg, batch_size=1, seed=0, num_boxes=4).items()
    }
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    args = argparse.Namespace(synthetic=True, device_cache=False)
    metrics = build_validation(model, cfg, args, n_frames=2)(state)
    assert set(metrics) == set(cfg.class_names)
    for name, m in metrics.items():
        assert np.isfinite(m["ap"]), (name, m)


def test_detail_speedometer_logs_timing_split(caplog):
    """VERDICT r4 #7: DetailSpeedometer reports data-wait vs step-time means
    (reference utils/callback.py:52-99 semantics)."""
    import logging

    from rangedet_tpu.utils.logger import DetailSpeedometer

    logger = logging.getLogger("rangedet_tpu_test_sm")
    logger.setLevel(logging.INFO)
    sm = DetailSpeedometer(batch_size=2, frequency=4, logger=logger)
    with caplog.at_level(logging.INFO, logger="rangedet_tpu_test_sm"):
        for i in range(4):
            sm.tick(data_s=0.010, step_s=0.030)
            sm(0, i, {"total_loss": 1.0}, lr=0.01)
    assert len(caplog.records) == 1
    line = caplog.records[0].getMessage()
    assert "data_ms=10.0" in line and "step_ms=30.0" in line
    assert "total_loss=1.00000" in line and "lr=0.010000" in line


def test_scalar_writer_emits_tb_events(tmp_path):
    """VERDICT r4 #7: the optional TensorBoard recorder writes readable event
    files (reference utils/callback.py:20,40-46)."""
    from rangedet_tpu.utils.logger import DetailSpeedometer, ScalarWriter

    tb = ScalarWriter(str(tmp_path / "tb"))
    sm = DetailSpeedometer(batch_size=2, frequency=2, tb=tb)
    for i in range(4):
        sm.tick(0.001, 0.002)
        sm(0, i, {"total_loss": float(i)}, lr=0.1, global_step=i)
    tb.scalars({"val/veh_ap": 0.5}, 4)
    tb.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files, "no event file written"

    # decode the TFRecord-of-Event stream and check our tags landed
    import struct

    from tensorboard.compat.proto.event_pb2 import Event

    tags, values = [], {}
    raw = files[0].read_bytes()
    off = 0
    while off < len(raw):
        (length,) = struct.unpack_from("<Q", raw, off)
        off += 12  # length + masked crc of length
        ev = Event.FromString(raw[off:off + length])
        off += length + 4  # payload + crc
        for v in ev.summary.value:
            tags.append(v.tag)
            values[v.tag] = v.simple_value
    assert "train/total_loss" in tags
    assert "train/lr" in tags
    assert "train/frames_per_sec" in tags
    assert "time/data_ms" in tags and "time/step_ms" in tags
    assert "val/veh_ap" in tags
    assert abs(values["val/veh_ap"] - 0.5) < 1e-6
