"""bench.py bounded-retry supervisor (round-3 lesson: a transient TPU
FAILED_PRECONDITION on the first warmup step cost the round its official
bench record — BENCH_r03.json rc=1 while the chip measured 2.87x).

These tests exercise the harness mechanics only (subprocess orchestration,
retry/backoff, diagnostic JSON) with a stubbed child — no device needed.
"""
import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)  # no real backoff
    return mod


def _completed(rc, stdout, stderr=""):
    return subprocess.CompletedProcess(
        args=["python", "bench.py"], returncode=rc, stdout=stdout, stderr=stderr
    )


GOOD = json.dumps({
    "metric": "range-image frames/sec/chip (train+infer)",
    "value": 16.4, "unit": "frames/s/chip", "vs_baseline": 2.87,
})


def test_first_attempt_success_passthrough(bench, monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(kw["env"].get("RANGEDET_BENCH_CHILD"))
        return _completed(0, "some warmup noise\n" + GOOD + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.supervise() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # exactly ONE json line
    rec = json.loads(out[0])
    assert rec["vs_baseline"] == 2.87
    assert "bench_attempt" not in rec  # clean first attempt: no retry marker
    assert calls == ["1"]  # child env flag set


def test_transient_failure_then_success(bench, monkeypatch, capsys):
    """The exact round-3 scenario: FAILED_PRECONDITION kills attempt 1,
    a fresh process succeeds on attempt 2."""
    attempts = iter([
        _completed(1, "", "jaxlib...: FAILED_PRECONDITION: lease lost"),
        _completed(0, GOOD + "\n"),
    ])
    monkeypatch.setattr(
        bench.subprocess, "run", lambda *a, **kw: next(attempts)
    )
    assert bench.supervise() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["vs_baseline"] == 2.87
    assert rec["bench_attempt"] == 2


def test_all_attempts_fail_emits_diagnostic_json(bench, monkeypatch, capsys):
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **kw: _completed(1, "", "FAILED_PRECONDITION: boom"),
    )
    assert bench.supervise() == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    # driver-required keys present even on failure; the sentinel is null
    # (ADVICE r4: a 0.0 could be recorded as a measured result by a driver
    # keying off the last stdout JSON line) plus an explicit error key
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec.get("error")
    assert len(rec["attempts"]) == bench.N_ATTEMPTS
    assert "FAILED_PRECONDITION" in rec["attempts"][0]["tail"]


def test_timeout_is_survived(bench, monkeypatch, capsys):
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, kw["timeout"], output=b"")
        return _completed(0, GOOD + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.supervise() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["bench_attempt"] == 2


def test_pause_flag_set_during_run_and_cleaned_up(
    bench, monkeypatch, capsys, tmp_path
):
    """bench must ask a running probe queue to idle between segments
    (touch PAUSE_FLAG) for the duration of the measurement, and remove
    only a flag it created itself."""
    flag = str(tmp_path / "pause_queue")
    monkeypatch.setattr(bench, "PAUSE_FLAG", flag)
    seen = {}

    def fake_run(cmd, **kw):
        seen["flag_during"] = os.path.exists(flag)
        return _completed(0, GOOD + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.supervise() == 0
    assert seen["flag_during"] is True
    assert not os.path.exists(flag)  # removed after

    # pre-existing flag (user-set) must survive bench
    with open(flag, "w") as f:
        f.write("manual\n")
    assert bench.supervise() == 0
    assert os.path.exists(flag)
    os.remove(flag)


def test_garbage_stdout_with_rc0_is_a_failure(bench, monkeypatch, capsys):
    """rc=0 but no parseable result line (e.g. a hook printed last) must
    not be reported as success."""
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **kw: _completed(0, "not json at all\n"),
    )
    assert bench.supervise() == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] is None
    assert rec.get("error")
