"""Experiment logging + training Speedometer.

Replaces utils/logger.py (file+console root logger) and utils/callback.py's
Speedometer (samples/sec + per-loss metric lines every log_frequency batches).
Adds optional jax.profiler trace capture, which the reference lacked entirely
(SURVEY.md §5 tracing row).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional


def config_logger(experiment_dir: str, name: str) -> logging.Logger:
    log_dir = os.path.join(experiment_dir, name)
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger("rangedet_tpu")
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class Speedometer:
    """Logs frames/sec and running-mean metrics every ``frequency`` steps."""

    def __init__(self, batch_size: int, frequency: int = 100, logger=None):
        self.batch_size = batch_size
        self.frequency = frequency
        self.logger = logger or logging.getLogger("rangedet_tpu")
        self._tic = time.time()
        self._count = 0
        self._sums: Dict[str, float] = {}

    def __call__(self, epoch: int, step: int, metrics: Dict[str, float],
                 lr: Optional[float] = None):
        self._count += 1
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
        if self._count % self.frequency == 0:
            dt = time.time() - self._tic
            speed = self.frequency * self.batch_size / max(dt, 1e-9)
            means = ", ".join(
                f"{k}={v / self.frequency:.5f}" for k, v in sorted(self._sums.items())
            )
            lr_str = f" lr={lr:.6f}" if lr is not None else ""
            self.logger.info(
                f"Epoch[{epoch}] Batch[{step}] speed {speed:.2f} frames/s{lr_str} {means}"
            )
            self._sums.clear()
            self._tic = time.time()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, log_dir: str, start_step: int = 0, num_steps: int = 0):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def __call__(self, step: int):
        import jax

        if self.stop <= self.start:
            return
        if step == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
