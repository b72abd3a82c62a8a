#!/usr/bin/env python
"""Attribute the fused IoU-target cost: XLA-side prep (layout repack +
candidate table) vs the Pallas kernel proper, at the real per-level shapes.

The r4 knockout profile (tools/profile_tail.py) puts the whole IoU target at
~6.5 ms of the B=2 train step; this script splits that between
  prep   — everything iou_target_fused does before pallas_call (column-major
           transpose, planar packing, CCW canonicalization, candidate rows)
  kernel — the pallas_call itself
by timing (a) the full op, (b) a variant whose kernel is replaced with a
copy of one input plane (prep retained, clip knocked out).

Usage: python -u tools/profile_iou_target.py [--iters 20] [--boxes 20]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--boxes", type=int, default=20)
    p.add_argument("--batch", type=int, default=2)
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
    from rangedet_tpu.models.detector import build_train_targets
    from rangedet_tpu.ops import iou_target_pallas as itp

    cfg = load_config("rangedet_veh_wo_aug_4_18e", True)
    batch_np = make_batch(cfg, args.batch, seed=0, num_boxes=args.boxes)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    targets = jax.jit(lambda b: build_train_targets(b, cfg))(batch)
    targets = jax.tree_util.tree_map(jnp.asarray, targets)

    rng = np.random.RandomState(0)
    interp = jax.default_backend() != "tpu"

    N = args.iters

    def timeit(name, fn, *fargs):
        eps = jnp.zeros(())
        out = fn(*fargs, eps)
        out = fn(*fargs, eps)
        jax.block_until_ready(out)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(N):
            out = fn(*fargs, eps)
            eps = out.ravel()[0] * 0
        float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / N * 1000
        print(json.dumps({"part": name, "ms": round(dt, 2)}), flush=True)
        return dt

    # the three per-level calls exactly as the train graph makes them
    def deltas_for(s):
        pc = targets[f"pc_s{s}"]
        B, H, Ws, _ = pc.shape
        return jnp.asarray(rng.randn(B, H, Ws, 8).astype(np.float32) * 0.1)

    # arrays ride as jit ARGUMENTS (closure constants measured 94 ms/call on
    # the tunneled backend where the same graph knocks out at 6.5 ms inside
    # the train step — constants are re-staged per dispatch there)
    levels = [
        (s, deltas_for(s), targets[f"pc_s{s}"], targets["gt_corners_cls0"])
        for s in cfg.fpn_strides
    ]
    dlist = [d for _, d, _, _ in levels]
    plist = [pc for _, _, pc, _ in levels]
    gc0 = targets["gt_corners_cls0"]

    null = jax.jit(lambda x, eps: x + 1.0 + eps)
    timeit("null_dispatch", lambda eps, x=jnp.zeros(()): null(x, eps))

    def make_full_all(mode):
        def full_all(eps, ds, ps, gc):
            tot = 0.0
            for d, pc in zip(ds, ps):
                tot = tot + itp.iou_target_fused(
                    d + eps, pc, gc, max(cfg.iou_topk_gt, 32), interp, mode
                ).sum()
            return jnp.asarray(tot)[None]

        return jax.jit(full_all)

    # interleaved multi-round medians: the tunneled chip's contention drifts
    # on the ~minute scale, so A-then-B timing lies; round-robin the modes
    modes = ["none", "dyn", "gate", "gate8"]
    fns = {m: make_full_all(m) for m in modes}
    rounds = {m: [] for m in modes}
    for m in modes:  # compile + warm
        jax.block_until_ready(fns[m](jnp.zeros(()), dlist, plist, gc0))
    for _ in range(5):
        for m in modes:
            eps = jnp.zeros(())
            out = fns[m](eps, dlist, plist, gc0)
            float(np.asarray(out).ravel()[0])
            t0 = time.perf_counter()
            for _ in range(N):
                out = fns[m](eps, dlist, plist, gc0)
                eps = out.ravel()[0] * 0
            float(np.asarray(out).ravel()[0])
            rounds[m].append((time.perf_counter() - t0) / N * 1000)
    for m in modes:
        r = sorted(rounds[m])
        print(json.dumps({"part": f"iou_all_levels_{m}",
                          "ms_median": round(r[len(r) // 2], 2),
                          "ms_rounds": [round(x, 2) for x in r]}), flush=True)

    full_all = make_full_all("gate8")
    fa = full_all

    # prep-only: monkeypatch the kernel body to a copy (same BlockSpecs, same
    # prep graph; the clip loop knocked out)
    def _copy_kernel(cand_ref, nv_ref, delta_ref, pc_ref, out_ref, *, G, mode):
        out_ref[0] = delta_ref[0, 0] + pc_ref[0, 0] + cand_ref[0, 0] \
            + nv_ref[0].astype(jnp.float32)

    orig = itp._kernel
    itp._kernel = _copy_kernel
    try:
        fp = jax.jit(full_all)
        timeit("prep_only", lambda eps: fp(eps, dlist, plist, gc0))
    finally:
        itp._kernel = orig

    # single-level (s=1) kernel-only scaling point
    def one_level(eps, d, pc, gc):
        return itp.iou_target_fused(
            d + eps, pc, gc, max(cfg.iou_topk_gt, 32), interp
        ).sum()[None]

    ol = jax.jit(one_level)
    timeit("iou_s1_only", lambda eps: ol(eps, dlist[0], plist[0], gc0))

    # XLA chunked oracle path for scale
    from rangedet_tpu.ops import boxes as ops_boxes
    from rangedet_tpu.ops import decode as ops_decode
    from rangedet_tpu.ops import rotated_iou as ops_iou

    def xla_all(eps, ds, ps, gc):
        tot = 0.0
        for d, pc in zip(ds, ps):
            B = pc.shape[0]
            dec = ops_decode.decode_boxes((d + eps).reshape(B, -1, 8),
                                          pc.reshape(B, -1, 3))
            corners = ops_boxes.box10_to_corners_bev(dec)
            iou = jax.vmap(
                lambda p, g: ops_iou.max_iou_vs_gt(
                    p, g, topk_gt=cfg.iou_topk_gt, chunk=cfg.iou_chunk
                )
            )(corners, gc)
            tot = tot + iou.sum()
        return jnp.asarray(tot)[None]

    xa = jax.jit(xla_all)
    timeit("xla_chunked_all_levels", lambda eps: xa(eps, dlist, plist, gc0))


if __name__ == "__main__":
    main()
