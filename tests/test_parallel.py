"""Multi-device (virtual 8-CPU) data/width-sharded training — validates the
GSPMD path the driver dry-runs, plus DP-consistency vs single device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.models import RangeDet
from rangedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from rangedet_tpu.train.schedule import build_optimizer
from rangedet_tpu.train.state import create_train_state
from rangedet_tpu.train.train_step import make_train_step
from tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    cfg = tiny_config()
    batch_np = make_batch(cfg, batch_size=4, seed=0, num_boxes=4)
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), 100)
    state = create_train_state(
        model, cfg, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch_np.items()},
    )
    return cfg, model, state, batch_np


def _run_steps(cfg, model, state, batch_np, mesh, n=2):
    state = replicate_state(state, mesh)
    batch = shard_batch(batch_np, mesh)
    step = jax.jit(make_train_step(model, cfg))
    metrics = None
    for _ in range(n):
        state, metrics = step(state, batch)
    return state, {k: float(v) for k, v in metrics.items()}


def test_data_parallel_4x(setup):
    cfg, model, state, batch_np = setup
    mesh = make_mesh({"data": 4})
    _, m = _run_steps(cfg, model, state, batch_np, mesh)
    assert np.isfinite(m["total_loss"])


@pytest.mark.heavy
def test_data_model_mesh_4x2(setup):
    """dp=4 × width-sharding=2 — the full tp/sp-analog mesh."""
    cfg, model, state, batch_np = setup
    mesh = make_mesh({"data": 4, "model": 2})
    _, m = _run_steps(cfg, model, state, batch_np, mesh)
    assert np.isfinite(m["total_loss"])


@pytest.mark.heavy
def test_sharded_matches_single_device(setup):
    """GSPMD-sharded loss must equal the single-device loss bit-for-bit-ish."""
    cfg, model, state, batch_np = setup
    mesh1 = make_mesh({"data": 1})
    _, m1 = _run_steps(cfg, model, state, batch_np, mesh1, n=1)
    mesh4 = make_mesh({"data": 4})
    _, m4 = _run_steps(cfg, model, state, batch_np, mesh4, n=1)
    assert abs(m1["total_loss"] - m4["total_loss"]) < 1e-3 * max(
        1.0, abs(m1["total_loss"])
    ), (m1, m4)


@pytest.mark.heavy
def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(
    "RANGEDET_RUN_SLOW" not in __import__("os").environ,
    reason="full-size flagship compile on CPU is slow; set RANGEDET_RUN_SLOW=1",
)
def test_graft_entry_fn_jits():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
