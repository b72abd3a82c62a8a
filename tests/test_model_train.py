"""Model forward shapes, jitted train-step loss decrease, and the fused eval
path on synthetic scenes — the single-device end-to-end slice."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rangedet_tpu.models.detector import RangeDet
from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.train.schedule import build_optimizer
from rangedet_tpu.train.state import create_train_state, param_count
from rangedet_tpu.train.train_step import (
    build_eval_inputs,
    make_eval_step,
    make_train_step,
)
from tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch_np = make_batch(cfg, batch_size=2, seed=0, num_boxes=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), steps_per_epoch=100)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    return cfg, model, state, batch


def test_forward_shapes(setup):
    cfg, model, state, batch = setup
    cls_logits, reg_deltas = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["input_data"], batch["coord"], False,
    )
    H, W = cfg.pad_field
    for logit, delta, s in zip(cls_logits, reg_deltas, cfg.fpn_strides):
        assert logit.shape == (2, H, W // s, 1)
        assert delta.shape == (2, H, W // s, 8)
        assert logit.dtype == jnp.float32
    assert param_count(state) > 1e4


@pytest.mark.heavy
def test_train_step_loss_decreases(setup):
    cfg, model, state, batch = setup
    step = jax.jit(make_train_step(model, cfg))
    state1, m0 = step(state, batch)
    first = float(m0["total_loss"])
    losses = [first]
    for _ in range(12):
        state1, m = step(state1, batch)
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], f"loss did not decrease: {losses}"


def test_train_step_deterministic(setup):
    cfg, model, state, batch = setup
    step = jax.jit(make_train_step(model, cfg))
    _, m1 = step(state, batch)
    _, m2 = step(state, batch)
    assert float(m1["total_loss"]) == float(m2["total_loss"])


@pytest.mark.heavy
def test_batch_stats_update(setup):
    cfg, model, state, batch = setup
    step = jax.jit(make_train_step(model, cfg))
    new_state, _ = step(state, batch)
    before = jax.tree.leaves(state.batch_stats)
    after = jax.tree.leaves(new_state.batch_stats)
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed, "BN running stats must update during training"


def test_eval_step_runs(setup):
    cfg, model, state, batch = setup
    eval_batch = build_eval_inputs(batch, cfg)
    eval_step = jax.jit(make_eval_step(model, cfg))
    out = eval_step(state, eval_batch)
    assert set(out.keys()) == set(cfg.class_names)
    boxes = np.asarray(out["veh"]["boxes"])
    valid = np.asarray(out["veh"]["valid"])
    assert boxes.shape == (2, cfg.post_nms_top_n["veh"], 8)
    assert valid.shape == (2, cfg.post_nms_top_n["veh"])
    # finite outputs on valid rows
    assert np.isfinite(boxes[valid]).all()


def test_planar_conv_matches_xla_conv(rng):
    """conv3x3_planar (shifted channel-matmuls) == nn.Conv SAME, strides 1&2."""
    import jax.numpy as jnp
    from rangedet_tpu.models.layers import conv3x3_planar

    x = jnp.asarray(rng.randn(2, 8, 20, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    for sw in (1, 2):
        want = jax.lax.conv_general_dilated(
            x, k, (1, sw), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = conv3x3_planar(x, k, sw)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_planar_deconv_matches_conv_transpose(rng):
    """deconv_planar (phase-decomposed matmuls) == nn.ConvTranspose SAME for
    the backbone's (3,8)/s4 and (3,4)/s2 aggregation deconvs."""
    import flax.linen as nn
    import jax.numpy as jnp
    from rangedet_tpu.models.layers import deconv_planar

    for kh, kw, s in [(3, 8, 4), (3, 4, 2)]:
        x = jnp.asarray(rng.randn(2, 6, 10, 3).astype(np.float32))
        dec = nn.ConvTranspose(4, (kh, kw), strides=(1, s), padding="SAME",
                               use_bias=False)
        v = dec.init(jax.random.PRNGKey(0), x)
        want = dec.apply(v, x)
        got = deconv_planar(
            jnp.transpose(x, (0, 3, 1, 2)), v["params"]["kernel"], s
        )
        got = jnp.transpose(got, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
