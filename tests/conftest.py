"""Test harness config: force an 8-device virtual CPU mesh.

Must run before jax initializes a backend — this is the framework's analog of
a fake distributed backend (SURVEY.md §4): sharding/pjit tests assert
multi-device semantics without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough when a TPU PJRT plugin (axon) is already
# registered; the config update forces the CPU backend regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
