#!/usr/bin/env python
"""Analytic FLOP count of the parity model (rangedet_veh_wo_aug_4_18e
shapes) for honest MFU accounting in BENCH.md.

Counts the MXU work (convs / matmuls, 2*MACs) layer by layer from the
architecture that models/dla_backbone.py + models/head.py build — the
reference's stage/agg wiring (reference dla_backbone.py:129-161, head
towers builder.py:198-266). Elementwise work (BN, relu, losses, targets)
is bandwidth- not FLOP-bound and is excluded, so the MFU this implies is
an UNDERestimate.

XLA's cost_analysis cannot be used here: the hot convs are Pallas custom
calls, invisible to it.

Usage: python tools/flops.py
"""
import json

H = 64


def conv3(w_out, ci, co, taps=9):
    return 2 * H * w_out * ci * co * taps


def deconv(w_in, ci, co, kw):
    # transposed conv k=(3,kw): every input pixel contributes 3*kw taps
    return 2 * H * w_in * ci * co * 3 * kw


def block(w, ci, co, proj):
    f = conv3(w, ci, co) + conv3(w, co, co)
    if proj:
        f += 2 * H * w * ci * co  # 1x1 shortcut
    return f


def stage(w, ci, co, nb):
    f = block(w, ci, co, True)
    for _ in range(nb - 1):
        f += block(w, co, co, False)
    return f


def meta_block(w, c, mid):
    mlp = 2 * 9 * H * w * (3 * mid + mid * c)  # shared MLP over 9 taps
    agg = 2 * H * w * (9 * c) * c  # 1x1 aggregation of the 9C tensor
    return mlp + agg


def main():
    parts = {}
    # --- backbone (widths: stride-2 in W at res2a/res2/res3a/res3) ---
    parts["res1"] = (
        block(2656, 8, 64, True)
        # unit2 = meta block (replaces conv1) + conv2
        + meta_block(2656, 64, 32) + conv3(2656, 64, 64)
    )
    parts["res2a"] = stage(1328, 64, 64, 3)
    parts["res2"] = stage(664, 64, 128, 3)
    parts["res3a"] = stage(332, 128, 128, 5)
    parts["res3"] = stage(166, 128, 128, 5)
    parts["agg2"] = deconv(166, 128, 128, 8) + stage(664, 128, 128, 2)
    parts["agg1"] = deconv(664, 128, 64, 8) + stage(2656, 64, 64, 2)
    parts["agg2a"] = deconv(664, 128, 64, 4) + stage(1328, 64, 64, 1)
    parts["agg3"] = deconv(1328, 64, 64, 4) + stage(2656, 64, 64, 2)

    # --- head: per-level cls+reg towers (4 x 3x3 @128) + 1x1 projections ---
    head = 0
    for w, ci in ((2656, 72), (1328, 64), (664, 128)):
        for _ in range(2):  # cls and reg towers
            head += conv3(w, ci, 128) + 3 * conv3(w, 128, 128)
        head += 2 * H * w * 128 * (1 + 8)  # logit + delta 1x1
    parts["head"] = head

    total_fwd = sum(parts.values())
    for k, v in parts.items():
        print(f"{k:8s} {v / 1e9:8.2f} GFLOP/frame")
    out = {
        "fwd_gflop_per_frame": round(total_fwd / 1e9, 1),
        # dgrad + wgrad each cost one forward; elementwise excluded
        "fwd_bwd_gflop_per_frame": round(3 * total_fwd / 1e9, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
