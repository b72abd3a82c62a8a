#!/usr/bin/env python
"""Capture a jax.profiler device trace of the donated train step and print
the top XLA ops by self time — direct attribution for the backward-pass
work (VERDICT r4 #3) that step-level knockouts can only bracket.

The xplane is parsed with tensorboard_plugin_profile's converter
(framework_op_stats), so this works headless: no TensorBoard UI needed.

Usage: python -u tools/profile_trace.py [--steps 3] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="rangedet_veh_wo_aug_4_18e")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="/tmp/rangedet_trace")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--csv", default=None,
                   help="also dump the full op table CSV here")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rangedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    if args.tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from tiny import tiny_config

        cfg = tiny_config(args.config, True)
    else:
        from rangedet_tpu.configs import load_config

        cfg = load_config(args.config, True)

    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state
    from rangedet_tpu.train.train_step import make_train_step

    batch = jax.device_put(
        make_batch(cfg, cfg.batch_image, seed=0, num_boxes=20)
    )
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(model, cfg, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)

    # warmup / compile
    state, m = step(state, batch)
    print("warmup loss:", float(m["total_loss"]), flush=True)
    state, m = step(state, batch)
    float(m["total_loss"])

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, batch)
        float(m["total_loss"])

    planes = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    if not planes:
        print("NO xplane captured — device tracing unsupported on this "
              "backend", flush=True)
        return 1
    xplane = planes[-1]
    print("xplane:", xplane, flush=True)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # plugin's bundled protos reject new protobuf
        print(f"profile plugin unavailable ({e}); falling back to "
              f"tools/parse_xplane.py aggregation", flush=True)
        import subprocess

        return subprocess.call([
            sys.executable, os.path.join(os.path.dirname(__file__),
                                         "parse_xplane.py"),
            xplane, "--top", str(args.top), "--steps", str(args.steps),
        ])

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", {}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write(data)
        print("csv:", args.csv, flush=True)
    # the tool emits CSV (exclude the host columns); print top rows by
    # self time
    lines = data.splitlines()
    if not lines:
        print("empty op stats", flush=True)
        return 1
    import csv as _csv

    rows = list(_csv.reader(lines))
    hdr = rows[0]
    print(json.dumps(hdr), flush=True)

    def col(name):
        for i, h in enumerate(hdr):
            if name.lower() in h.lower():
                return i
        return None

    c_self = col("total_self_time")
    c_self = c_self if c_self is not None else col("self_time")
    c_name = col("operation") if col("operation") is not None else col("op_name")
    c_type = col("type")
    body = [r for r in rows[1:] if len(r) == len(hdr)]
    try:
        body.sort(key=lambda r: -float(r[c_self]))
    except (TypeError, ValueError):
        pass
    for r in body[: args.top]:
        print(json.dumps({
            "op": r[c_name][:110] if c_name is not None else r[:2],
            "type": r[c_type] if c_type is not None else "",
            "self": r[c_self] if c_self is not None else "",
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
