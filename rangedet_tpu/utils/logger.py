"""Experiment logging + training Speedometer.

Replaces utils/logger.py (file+console root logger) and utils/callback.py's
Speedometer (samples/sec + per-loss metric lines every log_frequency batches),
DetailSpeedometer (data-wait vs step-time breakdown, callback.py:52-99), and
the optional TensorBoard scalar recorder the reference threads through fit
(callback.py:20,40-46 / detection_module.py:992). Adds optional jax.profiler
trace capture, which the reference lacked entirely (SURVEY.md §5 tracing row).
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


class ScalarWriter:
    """Optional TensorBoard scalar recorder (reference utils/callback.py:20,40-46).

    Wraps torch's SummaryWriter lazily; degrades to a no-op (with one warning)
    when tensorboard isn't importable so training never depends on it.
    """

    def __init__(self, log_dir: str, logger=None):
        self.log_dir = log_dir
        self._writer = None
        self._dead = False
        self._logger = logger or logging.getLogger("rangedet_tpu")

    def _get(self):
        if self._writer is None and not self._dead:
            try:
                from torch.utils.tensorboard import SummaryWriter

                os.makedirs(self.log_dir, exist_ok=True)
                self._writer = SummaryWriter(self.log_dir)
            except Exception as e:  # pragma: no cover - env without tensorboard
                self._dead = True
                self._logger.warning(f"tensorboard writer unavailable: {e}")
        return self._writer

    def scalars(self, tag_values: Dict[str, float], step: int):
        w = self._get()
        if w is not None:
            for tag, v in tag_values.items():
                w.add_scalar(tag, float(v), step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None


class Speedometer:
    """Logs frames/sec and running-mean metrics every ``frequency`` steps."""

    def __init__(self, batch_size: int, frequency: int = 100, logger=None,
                 tb: Optional[ScalarWriter] = None):
        self.batch_size = batch_size
        self.frequency = frequency
        self.logger = logger or logging.getLogger("rangedet_tpu")
        self.tb = tb
        self._tic = time.time()
        self._count = 0
        self._sums: Dict[str, float] = {}

    def _extra(self) -> str:
        return ""

    @property
    def due_next(self) -> bool:
        """True when the NEXT __call__ will emit a log line — lets callers
        compute call-time-only extras (e.g. the lr, a device fetch on the
        tunneled backend) lazily for just that call."""
        return (self._count + 1) % self.frequency == 0

    def __call__(self, epoch: int, step: int, metrics: Dict[str, float],
                 lr: Optional[float] = None, global_step: Optional[int] = None):
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
                f"Epoch[{epoch}] Batch[{step}] speed {speed:.2f} frames/s"
                f"{lr_str}{self._extra()} {means}"
            )
            if self.tb is not None:
                gs = global_step if global_step is not None else step
                scalars = {
                    (k if "/" in k else f"train/{k}"): v / self.frequency
                    for k, v in self._sums.items()
                }
                scalars["train/frames_per_sec"] = speed
                if lr is not None:
                    scalars["train/lr"] = lr
                self.tb.scalars(scalars, gs)
            self._sums.clear()
            self._tic = time.time()


class DetailSpeedometer(Speedometer):
    """Speedometer that additionally reports the data-wait vs step-time split
    (reference utils/callback.py:52-99 DetailSpeedometer).

    The train loop feeds per-step host timings via :meth:`tick`; each log line
    then carries mean ``data_ms`` (time blocked on the input iterator) and
    ``step_ms`` (dispatch + device sync for the jitted step).
    """

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._data_s = 0.0
        self._step_s = 0.0

    def tick(self, data_s: float, step_s: float):
        self._data_s += data_s
        self._step_s += step_s

    def _extra(self) -> str:
        n = max(self.frequency, 1)
        s = f" data_ms={1e3 * self._data_s / n:.1f} step_ms={1e3 * self._step_s / n:.1f}"
        if self.tb is not None:
            self._sums.setdefault("time/data_ms", 0.0)
            self._sums["time/data_ms"] += 1e3 * self._data_s  # summed; /freq in tb
            self._sums.setdefault("time/step_ms", 0.0)
            self._sums["time/step_ms"] += 1e3 * self._step_s
        self._data_s = 0.0
        self._step_s = 0.0
        return s


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
