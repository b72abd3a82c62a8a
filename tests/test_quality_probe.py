"""Regression gates for tools/quality_probe.py segment semantics.

The probe is the vehicle for every full-size held-out quality number in
QUALITY.md, run as chains of short bounded segments
(tools/run_probe_segments.sh). Two behaviors bit real runs and are pinned
here:

* a segment's FINAL step must log + eval even when --log-every does not
  divide the segment length (the ped 3500->6000 segment, length 2500 with
  log-every 200, silently dropped its step-6000 terminal eval);
* --stop-after 0 with --resume is an eval-only rescore of a saved
  checkpoint (used by tools/run_postqueue.sh to score finished chains).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(tmp_path, *extra):
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools", "quality_probe.py"),
         "--tiny", "--steps", "3", "--log-every", "2", "--eval-every", "100",
         *extra],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    return [json.loads(l) for l in out.stdout.strip().splitlines()
            if l.startswith("{")]


@pytest.mark.heavy
def test_segment_final_step_always_evals_and_eval_only_rescores(tmp_path):
    save = str(tmp_path / "probe.npz")
    # segment of length 2 inside a 3-step horizon: step 2 is both a
    # log-every multiple and the segment end; with --stop-after 2 the last
    # record must carry eval keys even though eval-every (100) never fires
    recs = _run(tmp_path, "--stop-after", "2", "--save", save)
    steps = [r for r in recs if "step" in r]
    assert steps and steps[-1]["step"] == 2
    assert any(k.startswith("l1_ap") for k in steps[-1]), steps[-1]
    # terminal segment 2->3: length 1, NOT a multiple of log-every 2 — the
    # round-4 bug dropped this record entirely; it must log + eval, and at
    # the horizon (step 3 == --steps) it must include the RANGE buckets
    recs = _run(tmp_path, "--stop-after", "1", "--step0", "2",
                "--resume", save, "--save", save)
    steps = [r for r in recs if "step" in r]
    assert steps and steps[-1]["step"] == 3
    assert any(k.startswith("l1_ap") for k in steps[-1]), steps[-1]
    assert any("_r[" in k for k in steps[-1]), steps[-1]  # RANGE buckets
    # eval-only rescore of the saved checkpoint (no train steps)
    recs = _run(tmp_path, "--stop-after", "0", "--step0", "3",
                "--resume", save)
    steps = [r for r in recs if "step" in r]
    assert len(steps) == 1 and steps[0]["step"] == 3
    assert any(k.startswith("l1_ap") for k in steps[0]), steps[0]
