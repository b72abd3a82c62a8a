"""Device mesh + sharding — the TPU-native replacement of the reference's
Horovod data parallelism (tools/train.py:67-79,219-229,364-368 and
scripts/horovodrun.sh).

Design (GSPMD): one jitted train step; batch arrays sharded over the mesh
"data" axis and (optionally) the range-image *width* over a "model" axis —
the range image is 64×2656, so W is the only spatially shardable dim, and XLA
inserts the conv halo exchanges automatically. Parameters are replicated; the
gradient all-reduce over ICI is inserted by XLA from the shardings (no
explicit collectives, no launcher — ``jax.distributed.initialize`` covers
multi-host).

BatchNorm note: under GSPMD the BN statistics reductions become *global*
(sync-BN semantics) — statistically stronger than the reference's per-GPU
"localbn" + epoch-end aux allreduce (mxnext/complicate.py:55-66,
utils/detection_module.py:1164-1170).
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Dict[str, int]] = None, devices=None
) -> Mesh:
    """mesh_shape e.g. {"data": 4, "model": 2}; default: all devices on "data"."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    names = tuple(mesh_shape.keys())
    dims = tuple(int(v) for v in mesh_shape.values())
    n = math.prod(dims)
    assert n <= len(devices), f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
    dev_array = mesh_utils.create_device_mesh(dims, devices[:n])
    return Mesh(dev_array, names)


def batch_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec for a batch array: batch dim over "data"; for 4D NHWC
    range-image tensors, width additionally over "model" when present."""
    model = "model" if "model" in mesh.axis_names else None
    if ndim == 4:
        return P("data", None, model, None)
    return P(*(("data",) + (None,) * (ndim - 1)))


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch onto the mesh with data(/width)-sharded layouts."""
    out = {}
    for k, v in batch.items():
        spec = batch_spec(mesh, np.ndim(v))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate the TrainState (params/opt/batch_stats) across the mesh."""
    return jax.device_put(state, NamedSharding(mesh, P()))
