"""Worker process for tests/test_multihost.py: joins a 2-process
``jax.distributed`` CPU cluster (1 device per process) and runs the real
shard_map data-parallel train step over the global {"data": 2} mesh — the
same code path tools/train.py --multihost uses (reference launch story:
scripts/horovodrun.sh). Prints the per-step losses for the parent to compare
against a single-process run.
"""
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path[:0] = [repo, os.path.join(repo, "tests")]
    import jax.numpy as jnp
    from tiny import tiny_config
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state
    from rangedet_tpu.train.train_step import build_train_step_fn

    assert jax.process_count() == nproc
    assert jax.device_count() == nproc  # 1 local device per process

    cfg = tiny_config(sync_bn=True, bn_sync_axis="data")
    # every process generates the same GLOBAL batch; device_put slices out
    # the local shard (the loader's per-host partition covers real datasets)
    batch_np = make_batch(cfg, batch_size=2, seed=11, num_boxes=4)
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg.replace(base_lr=0.01, warmup_epochs=0), 100)
    state = create_train_state(
        model, cfg, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch_np.items()},
    )
    mesh = make_mesh({"data": jax.device_count()})
    state = replicate_state(state, mesh)
    batch = shard_batch(batch_np, mesh)
    step = jax.jit(build_train_step_fn(model, cfg, mesh))
    losses = []
    for _ in range(2):
        state, m = step(state, batch)
        losses.append(float(m["total_loss"]))
    print("LOSSES " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
