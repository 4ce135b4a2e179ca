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
    sh = replicated(mesh)
    if not sh.is_fully_addressable:
        # Multi-process mesh: device_put onto a sharding spanning other
        # processes only accepts host values, and runs a per-leaf
        # cross-process equality collective that is prohibitively slow
        # for a full train state. Every process holds the identical
        # state (same seed, same init), so build the global arrays
        # directly from local host buffers. Typed PRNG keys go through
        # key_data bits and are re-wrapped on the global mesh.
        def put(leaf):
            if isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
                    leaf.dtype, jax.dtypes.prng_key):
                impl = jax.random.key_impl(leaf)
                bits = put(jax.random.key_data(leaf))
                return jax.random.wrap_key_data(bits, impl=impl)
            host = np.asarray(jax.device_get(leaf))
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx, a=host: a[idx])
        return jax.tree_util.tree_map(put, tree)
    return jax.device_put(tree, sh)


def channels_tp_spec() -> P:
    """NHWC activation spec sharding channels over the model axis (the
    tensor-parallel seam for the 512-channel bottleneck)."""
    return P(DATA_AXIS, None, None, MODEL_AXIS)
