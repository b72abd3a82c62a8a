"""One-command real-schema pipeline rehearsal, as a CI gate.

Runs scripts/rehearse_real_pipeline.py — the full reference workflow
(reference scripts/train_rangedet.sh + datasets/create_range_image_roidb.py):
synthesized real-schema .tfrecord segments -> offline roidb builder CLI ->
tools/train.py (checkpoint + mid-run resume across an epoch boundary, on the
roidb loader path) -> tools/test.py -> tools/create_prediction_bin_3d.py
(metrics_pb2 bytes) -> tools/evaluate_pred.py (eval/ap.py scoring) — and
asserts every artifact. The only reference line NOT executed anywhere in the
repo remains the literal `waymo_open_dataset` wheel import (absent from the
image); its two contributions are mirrored (tests/fake_waymo_protos.py) or
shimmed (the zlib range-image decompressor).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.heavy
def test_rehearse_real_pipeline(tmp_path):
    # child process: the rehearsal drives the CLIs itself (each with --cpu);
    # keep it out of this process so its fake-proto install and TF imports
    # cannot leak into other tests
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "scripts", "rehearse_real_pipeline.py"),
         "--workdir", str(tmp_path), "--epochs", "8"],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rehearsal"] == "ok"
    # the gate is the CHAIN: a tiny 8-epoch model may emit zero detections
    # above min_score, which serializes to a zero-byte Objects — legitimate;
    # a non-empty prediction set must serialize non-empty
    assert summary["objects"] >= 0
    if summary["objects"] > 0:
        assert summary["bin_bytes"] > 0
    # stage artifacts on disk
    assert os.path.getsize(tmp_path / "predictions.pkl") > 0
    assert os.path.getsize(tmp_path / "submission.bin") == summary["bin_bytes"]
    with open(tmp_path / "ap.json") as f:
        ap = json.load(f)
    assert ap and ap[0]["class"] == "veh" and ap[0]["frames"] == 8
    # resume actually restored a checkpoint mid-run
    with open(tmp_path / "train_stage2.log") as f:
        assert "resumed from epoch" in f.read()
    # Tiny geometry is a smoke run: the gate is the CHAIN, not the AP value
    # (held-out AP at 16x128 stays 0.0 even at 80 epochs; the full-size
    # loader-path proof lives in QUALITY.md's loader table)
