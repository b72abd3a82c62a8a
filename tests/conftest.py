"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-device (pjit / shard_map) logic is testable without a TPU pod.

Note: the environment's sitecustomize force-registers a remote-tunneled TPU
backend and overwrites JAX_PLATFORMS, so an env-var override is not enough —
we must update jax.config after import (backends initialize lazily).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: compile-heavy test (several minutes on the virtual-CPU "
        "platform); the fast inner-loop tier is `pytest -m 'not heavy'` "
        "(~10 min) — the default full run remains the pre-commit/CI gate",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_csa(rng, n, center_scale=20.0):
    """Random plausible csa7 boxes."""
    cx = rng.uniform(-center_scale, center_scale, n)
    cy = rng.uniform(-center_scale, center_scale, n)
    cz = rng.uniform(-1.0, 2.0, n)
    length = rng.uniform(1.0, 10.0, n)
    width = rng.uniform(0.5, 4.0, n)
    height = rng.uniform(0.5, 3.0, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx, cy, cz, length, width, height, yaw], axis=1).astype(
        np.float32
    )
