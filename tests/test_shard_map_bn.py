"""Local-BN shard_map step runs, and its loss matches the GSPMD step at step 0
(identical params ⇒ only BN statistics scope differs)."""
import numpy as np
import jax
import jax.numpy as jnp

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.models import RangeDet
from rangedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from rangedet_tpu.parallel.shard_map_step import make_local_bn_train_step
from rangedet_tpu.train.schedule import build_optimizer
from rangedet_tpu.train.state import create_train_state
from rangedet_tpu.train.train_step import make_train_step
from tiny import tiny_config


def test_local_bn_step_runs_and_differs_from_sync():
    cfg = tiny_config()
    batch_np = make_batch(cfg, batch_size=4, seed=3, num_boxes=4)
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), 100)
    state = create_train_state(
        model, cfg, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch_np.items()},
    )

    mesh = make_mesh({"data": 4})
    state_r = replicate_state(state, mesh)
    batch = shard_batch(batch_np, mesh)

    local_step = jax.jit(make_local_bn_train_step(model, cfg, mesh))
    s1, m_local = local_step(state_r, batch)
    assert np.isfinite(float(m_local["total_loss"]))

    sync_step = jax.jit(make_train_step(model, cfg))
    _, m_sync = sync_step(state_r, batch)

    # local-BN normalizes losses per shard (mean-of-ratios) and BN stats per
    # replica — the values legitimately differ from the global GSPMD step
    # (that IS the reference's per-GPU semantics); both must be finite and in
    # the same ballpark
    a, b = float(m_local["total_loss"]), float(m_sync["total_loss"])
    assert np.isfinite(a) and np.isfinite(b)
    assert 0.1 < a / b < 10.0, (a, b)

    # a second local step must keep making progress
    s2, m2 = local_step(s1, batch)
    assert float(m2["total_loss"]) < a
