#!/usr/bin/env python
"""Component-level timing of the train step on real hardware (BENCH.md
profile tables). Chains iterations through a data dependency and syncs once
(block_until_ready is unreliable on the tunneled backend), reporting
steady-state ms per call; the null-jit dispatch floor is measured first so
every number can be read net of tunnel overhead.

Usage: python -u tools/profile_parts.py [--iters 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rangedet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from rangedet_tpu.configs import load_config
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.models.detector import (
        build_train_targets,
        compute_losses,
        iou_targets_per_level,
    )
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state
    from rangedet_tpu.train.train_step import make_train_step

    cfg = load_config(args.config, True)
    batch_np = make_batch(cfg, cfg.batch_image, seed=0, num_boxes=20)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, 1000)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)

    N = args.iters

    def timeit(name, fn, *fargs, chain=None):
        """fn(*fargs) -> out; chain(out, i) -> new fargs[0] makes a data
        dependency so the device runs iterations back-to-back."""
        out = fn(*fargs)
        out = fn(*fargs)  # warm twice (cache + donation states)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        t0 = time.perf_counter()
        a0 = fargs[0]
        for i in range(N):
            out = fn(a0, *fargs[1:])
            if chain is not None:
                a0 = chain(out, a0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        dt = (time.perf_counter() - t0) / N * 1000
        print(json.dumps({"part": name, "ms": round(dt, 2)}), flush=True)
        return dt

    # 0. dispatch floor
    null = jax.jit(lambda x: x + 1.0)
    timeit("null_dispatch", null, jnp.zeros(()), chain=lambda o, a: o)

    # 1. target generation only
    tg = jax.jit(lambda eps, b: jax.tree_util.tree_map(
        lambda x: x + eps * 0, build_train_targets(b, cfg)))
    timeit("targets_only", tg, jnp.zeros(()), batch,
           chain=lambda o, a: jax.tree_util.tree_leaves(o)[0].ravel()[0] * 0)

    # 2. forward only (train mode)
    def fwd(params, b):
        (cl, rd), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["input_data"], b["coord"], True, mutable=["batch_stats"])
        return cl[0].sum() + sum(r.sum() for r in rd)

    fwd_j = jax.jit(lambda s, b: fwd(s, b))
    timeit("forward_only", fwd_j, state.params, batch)

    # 3. forward+loss (incl. IoU target) no backward
    def fwd_loss(params, b):
        targets = build_train_targets(b, cfg)
        (cl, rd), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["input_data"], b["coord"], True, mutable=["batch_stats"])
        total, _ = compute_losses(cl, rd, targets, cfg)
        return total

    timeit("forward_loss", jax.jit(fwd_loss), state.params, batch)

    # 4. forward+loss+backward (grad, no optimizer)
    timeit("fwd_bwd", jax.jit(lambda p, b: jax.grad(fwd_loss)(p, b)),
           state.params, batch)

    # 5. full train step (steady state, donated)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    s = state
    s, m = step(s, batch)
    s, m = step(s, batch)
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(N):
        s, m = step(s, batch)
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / N * 1000
    print(json.dumps({"part": "train_step_steady", "ms": round(dt, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
