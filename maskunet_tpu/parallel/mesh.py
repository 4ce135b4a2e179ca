"""Device mesh construction and sharding rules.

The framework's parallelism layer (SURVEY.md §2.5): the reference's only
strategy is single-process DataParallel (scatter batch / replicate module /
gather outputs, ade_semantic.py:373). The TPU-native equivalent is jit over
a `jax.sharding.Mesh` with the batch sharded on the `data` axis and params
replicated — XLA inserts the psum/all-gather collectives over ICI. A second
`model` axis is provisioned for channel-sharding the 512-wide bottleneck
(tensor parallelism) — not required for parity but a real seam.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
same code spans slices (DCN x ICI) — nothing else changes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with batch sharded over `data`."""
    return jax.device_put(tree, batch_sharding(mesh))


def put_replicated(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def channels_tp_spec() -> P:
    """NHWC activation spec sharding channels over the model axis (the
    tensor-parallel seam for the 512-channel bottleneck)."""
    return P(DATA_AXIS, None, None, MODEL_AXIS)
