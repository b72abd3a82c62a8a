"""Local-BN shard_map step runs, and its loss matches the GSPMD step at step 0
(identical params ⇒ only BN statistics scope differs)."""
import pytest
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


@pytest.mark.heavy
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


@pytest.mark.heavy
def test_shard_map_sync_bn_matches_gspmd():
    # With bn_sync_axis="data" the shard_map step's in-model psum'd BN
    # statistics are GLOBAL — it must match the GSPMD sync-BN step on the
    # same params/batch (this is the multi-chip path the Pallas kernels
    # require; parallel/shard_map_step.py module docstring). f32 so the
    # comparison is exact (bf16 reassociation noise reaches percent level).
    cfg = tiny_config(dtype=jnp.float32)
    batch_np = make_batch(cfg, batch_size=4, seed=5, num_boxes=4)
    model_sync = RangeDet(**cfg.replace(bn_sync_axis="data").model_kwargs())
    model_gspmd = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), 100)
    state = create_train_state(
        model_gspmd, cfg, tx, jax.random.PRNGKey(1),
        {k: jnp.asarray(v) for k, v in batch_np.items()},
    )

    mesh = make_mesh({"data": 4})
    state_r = replicate_state(state, mesh)
    batch = shard_batch(batch_np, mesh)

    from rangedet_tpu.parallel.shard_map_step import make_shard_map_train_step

    sm_step = jax.jit(make_shard_map_train_step(model_sync, cfg, mesh))
    s1, m_sm = sm_step(state_r, batch)

    gspmd_step = jax.jit(make_train_step(model_gspmd, cfg))
    s2, m_gs = gspmd_step(state_r, batch)

    a, b = float(m_sm["total_loss"]), float(m_gs["total_loss"])
    np.testing.assert_allclose(a, b, rtol=1e-5)
    # updated params must also agree (same grads up to psum reassociation)
    la = jax.tree_util.tree_leaves(s1.params)
    lb = jax.tree_util.tree_leaves(s2.params)
    worst = max(
        float(jnp.max(jnp.abs(x - y))) / (float(jnp.max(jnp.abs(y))) + 1e-9)
        for x, y in zip(la, lb)
    )
    assert worst < 1e-3, worst
