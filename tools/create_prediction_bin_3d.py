#!/usr/bin/env python
"""Prediction pickle → Waymo metrics .bin (or JSON fallback) — CLI wrapper
around rangedet_tpu.eval.waymo_bin, preserving the reference's export step
(tools/create_prediction_bin_3d.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rangedet_tpu.eval.waymo_bin import export_bin, export_json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="prediction pickle from tools/test.py")
    p.add_argument("--out", required=True, help="output .bin (or .json) path")
    args = p.parse_args(argv)
    if args.out.endswith(".json"):
        n = export_json(args.pred, args.out)
    else:
        n = export_bin(args.pred, args.out)
    print(f"wrote {n} objects to {args.out}")


if __name__ == "__main__":
    main()
