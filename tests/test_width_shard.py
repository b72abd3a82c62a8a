"""Width ("model"-axis) sharding with explicit halo exchange — the shard_map
path that keeps the Pallas kernels running on width-sharded meshes (VERDICT
round-2 #4). Exactness is proven two ways:

* op level: halo-exchange + the REAL Pallas conv kernel (interpret mode on
  CPU) inside shard_map equals the unsharded conv bit-for-bit;
* step level: the full width-sharded train step ({data:2, model:2}) matches
  the GSPMD sync-BN step on the same params/batch in f32.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.models import RangeDet
from rangedet_tpu.models.layers import (
    conv3x3_bhcw_xla,
    width_halo_exchange,
)
from rangedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from rangedet_tpu.train.schedule import build_optimizer
from rangedet_tpu.train.state import create_train_state
from rangedet_tpu.train.train_step import build_train_step_fn, make_train_step
from tiny import tiny_config


def test_halo_exchange_pallas_conv_matches_unsharded(rng):
    """width_halo_exchange + unmodified Pallas conv (interpret) + interior
    slice == the full-width conv, bit-for-bit, over a 2-shard width mesh."""
    from rangedet_tpu.ops.conv_pallas import conv3x3_bhcw

    B, H, C, W = 1, 16, 8, 64
    x = jnp.asarray(rng.standard_normal((B, H, C, W)), jnp.float32)
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, C, C)), jnp.float32)

    want = conv3x3_bhcw(x, k, None, True)  # interpret=True (CPU)

    mesh = make_mesh({"model": 2})

    def per_shard(xs):
        xe = width_halo_exchange(xs, "model")
        y = conv3x3_bhcw(xe, k, None, True)
        return y[..., 1:-1]

    got = shard_map(
        per_shard, mesh=mesh,
        in_specs=P(None, None, None, "model"),
        out_specs=P(None, None, None, "model"),
        check_rep=False,
    )(x)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    # and the XLA einsum formulation agrees through the same halo machinery
    def per_shard_xla(xs):
        xe = width_halo_exchange(xs, "model")
        return conv3x3_bhcw_xla(xe, k)[..., 1:-1]

    got2 = shard_map(
        per_shard_xla, mesh=mesh,
        in_specs=P(None, None, None, "model"),
        out_specs=P(None, None, None, "model"),
        check_rep=False,
    )(x)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got2), rtol=1e-5, atol=1e-5
    )


@pytest.mark.heavy
def test_width_sharded_step_matches_gspmd():
    """Full train step on a {data:2, model:2} mesh via the shard_map
    halo-exchange path == the GSPMD sync-BN step (f32; same params/batch).
    This is the dryrun mesh of MULTICHIP with the Pallas-compatible path."""
    cfg = tiny_config(dtype=jnp.float32, layout="bhcw", use_pallas_conv=True)
    batch_np = make_batch(cfg, batch_size=2, seed=9, num_boxes=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), 100)
    model_ref = RangeDet(**cfg.model_kwargs())
    state = create_train_state(
        model_ref, cfg, tx, jax.random.PRNGKey(2), batch
    )

    mesh = make_mesh({"data": 2, "model": 2})

    # GSPMD reference: sync-BN semantics, XLA handles the width halos
    state_r = replicate_state(state, mesh)
    sharded = shard_batch(batch_np, mesh)
    gspmd_step = jax.jit(make_train_step(model_ref, cfg))
    _, m_ref = gspmd_step(state_r, sharded)

    # width shard_map path: same params, explicit halo exchange
    cfg_w = cfg.replace(
        width_axis="model", bn_sync_axis=tuple(mesh.axis_names)
    )
    model_w = RangeDet(**cfg_w.model_kwargs())
    step_w = build_train_step_fn(model_w, cfg_w, mesh)
    assert step_w.bn_semantics == "sync"
    s2, m_w = jax.jit(step_w)(state_r, sharded)

    a, b = float(m_ref["total_loss"]), float(m_w["total_loss"])
    assert np.isfinite(a) and np.isfinite(b)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    for k in m_ref:
        np.testing.assert_allclose(
            float(m_ref[k]), float(m_w[k]), rtol=5e-5, atol=5e-5
        ), k

    # a second step keeps training (optimizer + BN stats flowed through)
    _, m2 = jax.jit(step_w)(s2, sharded)
    assert np.isfinite(float(m2["total_loss"]))
