"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.11); scaling here is new
TPU-native surface: pure data parallelism over ICI via jit + NamedSharding.
Parameters are replicated; every per-step tensor has a leading batch axis
and shards over the 'data' mesh axis. XLA inserts the gradient all-reduce
automatically from sharding propagation (grads of replicated params w.r.t.
a sharded batch), riding ICI -- no hand-written collectives needed at this
model scale.

The mesh helpers also reserve a 'model' axis name so tensor-sharded
variants can be layered in without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data_parallel: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices fully data-
    parallel."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    want = data_parallel * model_parallel
    if want > n:
        raise ValueError(
            f"{data_parallel} x {model_parallel} > {n} devices")
    devices = list(devices)[:want]
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, keys=("noisy", "clean")):
    """device_put the array values of a batch dict with the batch axis
    sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = dict(batch)
    for k in keys:
        if k in out:
            out[k] = jax.device_put(out[k], sh)
    return out
