"""Device mesh + sharding — the TPU-native replacement of the reference's
Horovod data parallelism (tools/train.py:67-79,219-229,364-368 and
scripts/horovodrun.sh).

Two multi-chip regimes (train_step.py:build_train_step_fn picks one):

* **data-only meshes — shard_map (manual sharding).** The Pallas kernels
  require it (pallas_call cannot ride GSPMD's auto partitioner); each shard
  runs the kernels on its local batch, gradients psum over ICI exactly like
  Horovod's allreduce. BN statistics per cfg.sync_bn: in-model psum of the
  per-shard (sum, sum-sq, count) — exact global sync-BN, proven equal to
  the GSPMD step (tests/test_shard_map_bn.py) — or the reference's
  per-replica localbn.
* **width-sharded meshes (a "model" axis) — GSPMD.** The range image is
  64×2656, so W is the only spatially shardable dim; XLA inserts the conv
  halo exchanges automatically (Pallas kernels are switched off for this
  shape — the XLA conv formulations partition fine).

Parameters are replicated either way; ``jax.distributed.initialize`` covers
multi-host.
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
