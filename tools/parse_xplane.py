#!/usr/bin/env python
"""Parse a jax.profiler .xplane.pb (XSpace proto) WITHOUT the tensorboard
profile plugin (its bundled _pb2 files predate the installed protobuf and
refuse to import): aggregate device-plane XEvent durations by op name and
print the top self-time entries. Run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the default C++ descriptor
pool rejects TF's generated protos.

Usage: python tools/parse_xplane.py <xplane.pb> [--top 50] [--per-step N]
"""
import argparse
import collections
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("xplane")
    p.add_argument("--top", type=int, default=50)
    p.add_argument("--steps", type=int, default=1,
                   help="divide totals by this many profiled steps")
    args = p.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(args.xplane, "rb") as f:
        xs.ParseFromString(f.read())

    print(json.dumps({"planes": [pl.name for pl in xs.planes]}))
    for pl in xs.planes:
        if "TPU" not in pl.name and "device" not in pl.name.lower():
            continue
        emeta = {m.id: m.name for m in pl.event_metadata.values()}
        by_line = {}
        for line in pl.lines:
            agg = collections.defaultdict(float)
            total = 0.0
            for ev in line.events:
                ns = ev.duration_ps / 1e9  # ps -> ms... (1e9 ps = 1 ms)
                agg[emeta.get(ev.metadata_id, "?")] += ns
                total += ns
            by_line[line.name or str(line.id)] = (agg, total)
        print(json.dumps({"plane": pl.name,
                          "lines": {k: round(v[1] / args.steps, 3)
                                    for k, v in by_line.items()}}))
        # the XLA op line carries the flat op-level events
        for lname, (agg, total) in by_line.items():
            if not agg:
                continue
            top = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
            print(f"--- line '{lname}' total {total / args.steps:.3f} "
                  f"ms/step ---")
            for name, ms in top:
                print(json.dumps({
                    "op": name[:120], "ms": round(ms / args.steps, 4)
                }))


if __name__ == "__main__":
    sys.exit(main())
