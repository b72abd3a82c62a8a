"""End-to-end quality: overfit the tiny model on fixed synthetic scenes and
verify detections emerge where the objects are (AP ~0 -> high), then assert
the cross-layout checkpoint conversion (models/convert.py) is AP-neutral.

The CI-sized variant runs ungated (~4 min on CPU: adamw overfit of 3-box
scenes); RANGEDET_RUN_SLOW=1 adds a longer 5-box variant.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.eval.ap import average_precision
from rangedet_tpu.models import RangeDet
from rangedet_tpu.models.detector import run_inference
from rangedet_tpu.train.schedule import build_optimizer
from rangedet_tpu.train.state import create_train_state
from rangedet_tpu.train.train_step import build_eval_inputs, make_train_step
from tiny import tiny_config


def _overfit_and_eval(num_boxes, steps, seed=7):
    """Train the tiny model to overfit 2 synthetic frames; return everything
    needed for AP evaluation in any layout."""
    cfg = tiny_config(feat_size=(32, 256), pad_field=(32, 256))
    # lower the score gate: the tiny net never gets that confident
    cfg = cfg.replace(min_score={"veh": 0.25})
    batch_np = make_batch(cfg, batch_size=2, seed=seed, num_boxes=num_boxes)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = RangeDet(**cfg.model_kwargs())
    # adamw converges the overfit ~3x faster than the recipe SGD here
    tx, _ = build_optimizer(
        cfg.replace(optimizer="adamw", base_lr=3e-3, warmup_epochs=0,
                    lr_mode="constant"), 100
    )
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg))
    for _ in range(steps):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    return cfg, state, batch, batch_np


def _ap(cfg, params, batch_stats, batch, batch_np, layout=None):
    c = cfg.replace(layout=layout) if layout else cfg
    model = RangeDet(**c.model_kwargs())
    eval_batch = build_eval_inputs(batch, c)
    cls_logits, reg_deltas = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["input_data"], batch["coord"], False,
    )
    out = run_inference(cls_logits, reg_deltas, eval_batch, c)
    frames = []
    for b in range(2):
        boxes = np.asarray(out["veh"]["boxes"][b])
        valid = np.asarray(out["veh"]["valid"][b])
        kept = boxes[valid]
        gt = batch_np["gt_csa"][b][batch_np["gt_valid"][b] > 0]
        frames.append(
            dict(det_csa=kept[:, :7], det_scores=kept[:, 7], gt_csa=gt)
        )
    return average_precision(frames, iou_thresh=0.3, mode="bev")


@pytest.mark.heavy
def test_overfit_ap_and_layout_conversion():
    """CI-sized: detections emerge (AP > 0.5 from ~0) and converting the
    trained checkpoint to another layout leaves AP intact."""
    from rangedet_tpu.models.convert import convert_params

    cfg, state, batch, batch_np = _overfit_and_eval(num_boxes=3, steps=250)
    res = _ap(cfg, state.params, state.batch_stats, batch, batch_np)
    assert res["ap"] > 0.5 and res["recall"] > 0.8, res

    # exact cross-layout conversion: nhwc -> bhcw (same tree as planar)
    p_bhcw = convert_params(state.params, "bhcw")
    res_b = _ap(cfg, p_bhcw, state.batch_stats, batch, batch_np,
                layout="bhcw")
    # conversion is exact; only bf16 op-order differences remain
    assert abs(res_b["ap"] - res["ap"]) < 0.05, (res, res_b)
    assert res_b["recall"] > 0.8


@pytest.mark.skipif(
    "RANGEDET_RUN_SLOW" not in os.environ,
    reason="longer overfit; set RANGEDET_RUN_SLOW=1",
)
@pytest.mark.heavy
def test_overfit_synthetic_ap_dense():
    cfg, state, batch, batch_np = _overfit_and_eval(num_boxes=5, steps=600)
    res = _ap(cfg, state.params, state.batch_stats, batch, batch_np)
    assert res["ap"] > 0.5 and res["recall"] > 0.6, res
