"""Two-process ``jax.distributed`` smoke (VERDICT round-2 #6): spawn a real
2-process CPU cluster (1 device each), run the shard_map DP train step over
the cross-process {"data": 2} mesh, and assert the losses equal a
single-process 2-virtual-device run of the same step on the same batch.

This exercises the actual multi-host machinery tools/train.py --multihost
relies on (cluster bootstrap, cross-process collectives inside the in-model
sync-BN psums and the gradient psum) — the reference's equivalent launch
path is mpirun + Horovod (scripts/horovodrun.sh:7-17).
"""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.models import RangeDet
from rangedet_tpu.parallel import make_mesh, replicate_state, shard_batch
from rangedet_tpu.train.schedule import build_optimizer
from rangedet_tpu.train.state import create_train_state
from rangedet_tpu.train.train_step import build_train_step_fn
from tiny import tiny_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _single_process_reference():
    cfg = tiny_config(sync_bn=True, bn_sync_axis="data")
    batch_np = make_batch(cfg, batch_size=2, seed=11, num_boxes=4)
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), 100)
    state = create_train_state(
        model, cfg, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch_np.items()},
    )
    mesh = make_mesh({"data": 2})
    state = replicate_state(state, mesh)
    batch = shard_batch(batch_np, mesh)
    step = jax.jit(build_train_step_fn(model, cfg, mesh))
    losses = []
    for _ in range(2):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    return losses


@pytest.mark.heavy
def test_two_process_distributed_matches_single_process():
    port = "29781"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    worker_losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSSES ")]
        assert lines, out[-3000:]
        worker_losses.append(json.loads(lines[-1][len("LOSSES "):]))
    # both processes see the identical (psum-reduced, replicated) loss
    np.testing.assert_allclose(worker_losses[0], worker_losses[1], rtol=1e-6)

    ref = _single_process_reference()
    # cross-process Gloo collectives vs in-process: same math, same data
    np.testing.assert_allclose(worker_losses[0], ref, rtol=1e-4, atol=1e-5)
