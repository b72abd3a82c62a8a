"""End-to-end quality: overfit the tiny model on a couple of fixed synthetic
scenes and verify detections emerge where the objects are (AP improves from
~0 to useful). This is the single-device train→infer→evaluate slice; slow, so
gated behind RANGEDET_RUN_SLOW=1 (CI runs the fast loss-decrease test in
test_model_train.py instead).
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

pytestmark = pytest.mark.skipif(
    "RANGEDET_RUN_SLOW" not in os.environ,
    reason="overfit test is slow on CPU; set RANGEDET_RUN_SLOW=1",
)


def test_overfit_synthetic_ap():
    cfg = tiny_config(feat_size=(32, 256), pad_field=(32, 256))
    # lower the score gate: the tiny net never gets that confident
    cfg = cfg.replace(min_score={"veh": 0.25})
    batch_np = make_batch(cfg, batch_size=2, seed=7, num_boxes=5)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(
        cfg.replace(base_lr=0.02, warmup_epochs=0, lr_mode="constant"), 100
    )
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg))

    def evaluate(state):
        eval_batch = build_eval_inputs(batch, cfg)
        cls_logits, reg_deltas = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input_data"], batch["coord"], False,
        )
        out = run_inference(cls_logits, reg_deltas, eval_batch, cfg)
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

    before = evaluate(state)
    losses = []
    for i in range(300):
        state, metrics = step(state, batch)
        if i % 50 == 0:
            losses.append(float(metrics["total_loss"]))
    after = evaluate(state)
    print("losses:", losses, "before:", before, "after:", after, flush=True)

    assert np.isfinite(metrics["total_loss"])
    assert after["ap"] > max(0.25, before["ap"] + 0.2), (before, after)
