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

from maskunet_tpu.utils.compile_cache import (  # noqa: E402
    raise_cpu_collective_watchdog)

# virtual "devices" are threads sharing this host's core(s); a slow tick
# must not trip XLA:CPU's 40 s collective-rendezvous abort
raise_cpu_collective_watchdog()

import jax  # noqa: E402

# The env var alone is not enough when a TPU PJRT plugin (axon) is already
# registered; the config update forces the CPU backend regardless.
jax.config.update("jax_platforms", "cpu")

from maskunet_tpu.utils import compile_cache  # noqa: E402

# Persistent XLA compile cache: the suite is dominated by CPU compiles of
# the full model (~20-40 s each); a warm cache cuts default wall time from
# ~15 min to ~2-3 min.
compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Inner-loop smoke tier (~70 s warm on a 1-core box): modules with no
# full-model compile in them. `pytest --smoke` runs only these; the
# default run is unchanged. Keep a module out of this list the moment it
# gains a whole-UNet jit.
SMOKE_MODULES = frozenset({
    "test_rle", "test_metrics", "test_losses", "test_evaluation",
    "test_data", "test_utils", "test_native", "test_layers",
    "test_download", "test_task_evaluators", "test_coco_instance_eval",
    "test_e2e_artifacts",
})


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked @pytest.mark.slow")
    parser.addoption("--smoke", action="store_true", default=False,
                     help="run only the fast smoke tier (<2 min; "
                          "no full-model compiles)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long integration test, deselected by default "
        "(run with --runslow or -m slow)")
    config.addinivalue_line(
        "markers", "smoke: fast inner-loop tier (select with --smoke)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
    if config.getoption("--smoke"):
        # the tier promises "<2 min, no full-model compiles": slow-marked
        # tests stay out even when their module is in SMOKE_MODULES
        # (test_task_evaluators' module fixture trains a UNet)
        keep = [i for i in items if "smoke" in i.keywords
                and ("slow" not in i.keywords
                     or config.getoption("--runslow"))]
        deselect = [i for i in items if i not in set(keep)]
        config.hook.pytest_deselected(items=deselect)
        items[:] = keep
        return
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow (use --runslow or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
