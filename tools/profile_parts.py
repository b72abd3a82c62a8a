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


def _load(args, is_train):
    if args.tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from tiny import tiny_config

        return tiny_config(args.config, is_train)
    from rangedet_tpu.configs import load_config

    return load_config(args.config, is_train)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--eval-batch", type=int, default=4,
                   help="batch for the eval-path parts (bench.py uses 4)")
    p.add_argument("--skip-train", action="store_true",
                   help="profile only the eval-path parts")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-config smoke (tests/tiny.py overrides) — for "
                        "validating the profiling code paths, not timings")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rangedet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

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

    cfg = _load(args, True)
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

    if args.skip_train:
        profile_eval(args, jax, jnp, np, timeit, state)
        return

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

    # 5. full train step (steady state, donated) — donate a COPY so the
    # eval-path section below can still read state.params/batch_stats
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    s = jax.tree_util.tree_map(jnp.copy, state)
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

    profile_eval(args, jax, jnp, np, timeit, state)


def profile_eval(args, jax, jnp, np, timeit, state):
    """Eval-path breakdown at --eval-batch: eval-mode forward alone, the full
    fused eval step (forward + topk/decode/WNMS, what bench.py times), the
    post-forward stage alone, and the weighted-NMS isolated on the real
    decoded candidate set (mirrors the reference's host wnms_4c cost,
    tools/test.py:211-217)."""
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.models.detector import run_inference
    from rangedet_tpu.ops import boxes as ops_boxes
    from rangedet_tpu.ops import decode as ops_decode
    from rangedet_tpu.ops import nms as ops_nms
    from rangedet_tpu.train.train_step import build_eval_inputs

    cfg_t = _load(args, False)
    eb_np = make_batch(cfg_t, args.eval_batch, seed=1, num_boxes=20)
    ebatch = build_eval_inputs(
        {k: jnp.asarray(v) for k, v in eb_np.items()}, cfg_t
    )
    model = RangeDet(**cfg_t.model_kwargs())

    def eval_fwd(params, b):
        cl, rd = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["input_data"], b["coord"], False)
        return cl, rd

    fwd_sum = jax.jit(
        lambda p, b: sum(x.sum() for x in eval_fwd(p, b)[0]))
    timeit(f"eval_forward_only_b{args.eval_batch}", fwd_sum,
           state.params, ebatch)

    def eval_full(params, b):
        cl, rd = eval_fwd(params, b)
        out = run_inference(cl, rd, b, cfg_t)
        name = cfg_t.class_names[0]
        return out[name]["boxes"].sum() + out[name]["valid"].sum()

    timeit(f"eval_full_b{args.eval_batch}", jax.jit(eval_full),
           state.params, ebatch)

    # post-forward stage alone: logits precomputed once on device
    cl, rd = jax.jit(eval_fwd)(state.params, ebatch)
    jax.block_until_ready((cl, rd))

    def post(cl0, rest, b):
        out = run_inference([cl0] + list(rest[0]), list(rest[1]), b, cfg_t)
        name = cfg_t.class_names[0]
        return out[name]["boxes"].sum() + out[name]["valid"].sum()

    timeit(f"infer_post_b{args.eval_batch}", jax.jit(post),
           cl[0], (cl[1:], rd), ebatch)

    # WNMS alone, on the real decoded top-k candidate set of frame 0
    name = cfg_t.class_names[0]
    topk = min(cfg_t.device_topk.get(name, 4096),
               cfg_t.pre_nms_top_n.get(name, 50000))

    def prep(cl_all, rd_all, b):
        B = cl_all[0].shape[0]
        scores = jnp.concatenate(
            [jax.nn.sigmoid(c).reshape(B, -1, cfg_t.num_classes)
             for c in cl_all], axis=1)[..., 0]
        deltas = jnp.concatenate(
            [r.reshape(B, -1, cfg_t.num_classes, 8) for r in rd_all],
            axis=1)[:, :, 0]
        pc = jnp.concatenate(
            [b[f"pc_s{s}"].reshape(B, -1, 3) for s in cfg_t.fpn_strides],
            axis=1)
        mask = jnp.concatenate(
            [b[f"mask_s{s}"].reshape(B, -1) for s in cfg_t.fpn_strides],
            axis=1)

        def pf(sc, dl, pcb, mb):
            masked = jnp.where(mb > 0, sc, 0.0)
            idx = jnp.argsort(-masked)[:topk]
            box10 = ops_decode.decode_boxes(dl[idx], pcb[idx])
            return (ops_boxes.box10_to_box11(box10), masked[idx],
                    masked[idx] > cfg_t.min_score[name])

        return jax.vmap(pf)(scores, deltas, pc, mask)

    box11, sc, valid = jax.jit(prep)(cl, rd, ebatch)
    jax.block_until_ready(box11)

    def wnms_only(b11, s, v):
        out12, ov = jax.vmap(lambda bb, ss, vv: ops_nms.weighted_nms(
            bb, ss, vv, thresh=cfg_t.wnms_thr_lo,
            thresh_vote=cfg_t.wnms_thr_hi,
            max_keep=cfg_t.post_nms_top_n[name],
            iou_3d=cfg_t.wnms_is_3d,
            prefilter_topm=cfg_t.wnms_prefilter_topm,
        ))(b11, s, v)
        return out12.sum() + ov.sum()

    timeit(f"wnms_only_b{args.eval_batch}", jax.jit(wnms_only),
           box11, sc, valid)

    # blocked greedy sweep A/B (ops/nms.py weighted_nms block=...): exact,
    # batches the per-round selection + IoU row machinery B rounds at a time
    for blk in (4, 8, 16, 32):
        def wnms_blk(b11, s, v, blk=blk):
            out12, ov = jax.vmap(lambda bb, ss, vv: ops_nms.weighted_nms(
                bb, ss, vv, thresh=cfg_t.wnms_thr_lo,
                thresh_vote=cfg_t.wnms_thr_hi,
                max_keep=cfg_t.post_nms_top_n[name],
                iou_3d=cfg_t.wnms_is_3d,
                block=blk,
            ))(b11, s, v)
            return out12.sum() + ov.sum()

        timeit(f"wnms_block{blk}_b{args.eval_batch}", jax.jit(wnms_blk),
               box11, sc, valid)

    # full eval step with the blocked sweep wired through the config
    for blk in (8, 16):
        cfg_b = cfg_t.replace(wnms_block=blk)

        def eval_full_blk(params, b, cfg_b=cfg_b):
            cl, rd = eval_fwd(params, b)
            out = run_inference(cl, rd, b, cfg_b)
            nm = cfg_b.class_names[0]
            return out[nm]["boxes"].sum() + out[nm]["valid"].sum()

        timeit(f"eval_full_block{blk}_b{args.eval_batch}",
               jax.jit(eval_full_blk), state.params, ebatch)


if __name__ == "__main__":
    main()
