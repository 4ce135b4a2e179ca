"""Profiling and debugging hooks (the tracing layer the reference lacks,
SURVEY.md §5: its only knob is cudnn.benchmark).

- `trace(logdir)`: context manager around jax.profiler for TensorBoard-
  viewable device traces.
- `nan_guard(tree, where)`: host-side finite check on a metrics pytree —
  the jit-purity-friendly analog of torch's anomaly detection; raised
  errors name the offending metric.
- `step_timer()`: wall-clock step timing with compile-step exclusion is in
  core/metrics_log.Throughput.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class NonFiniteError(RuntimeError):
    pass


def nan_guard(tree, where: str = "") -> None:
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf, dtype=np.float32)
        if not np.all(np.isfinite(arr)):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            raise NonFiniteError(
                f"non-finite value in {name} at {where or 'step'}")
