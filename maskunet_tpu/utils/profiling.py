"""Profiling and debugging hooks (the tracing layer the reference lacks,
SURVEY.md §5: its only knob is cudnn.benchmark).

- `trace(logdir)`: context manager around jax.profiler for TensorBoard-
  viewable device traces.
- `nan_guard(tree, where)`: host-side finite check on a metrics pytree —
  the jit-purity-friendly analog of torch's anomaly detection; raised
  errors name the offending metric.
- `StallWatchdog`: detects a hung device step — a remote-device tunnel
  that stops answering, a deadlocked collective — and surfaces it
  instead of letting the training process block forever inside a
  device sync that Python cannot interrupt.
- `step_timer()`: wall-clock step timing with compile-step exclusion is in
  core/metrics_log.Throughput.
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading
import time
from typing import Callable, Iterator

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


class StallWatchdog:
    """Fail-fast detection for a hung device step (SURVEY.md §5 failure
    detection — the reference has none, and neither jit dispatch nor a
    blocked `float(metrics)` sync is interruptible from Python once the
    device stops answering).

    A daemon thread watches the gap since the last `beat()`. When it
    exceeds `timeout_s` it prints a loud stderr diagnostic (elapsed,
    last context string) and either keeps warning every `timeout_s`
    (`abort=False`, the default: long XLA compiles and 256px steps are
    legitimately slow, so killing is opt-in) or hard-exits the process
    with status 42 (`abort=True`) so a pod supervisor can restart the
    run with `--resume` — the idiomatic recovery for a wedged remote
    device, since the blocked sync itself can never raise.

    Zero overhead on the step path: `beat()` is one monotonic read and
    one attribute store, no locks.
    """

    EXIT_CODE = 42

    def __init__(self, timeout_s: float, *, abort: bool = False,
                 on_stall: Callable[[float, str], None] | None = None,
                 poll_s: float | None = None):
        self.timeout_s = float(timeout_s)
        self.abort = abort
        self.on_stall = on_stall
        self._poll_s = poll_s if poll_s is not None else min(
            self.timeout_s / 4.0, 10.0)
        self._last = time.monotonic()
        self._context = "startup"
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._paused = False
        self.stalls = 0

    def beat(self, context: str = "") -> None:
        self._last = time.monotonic()
        if context:
            self._context = context

    def pause(self, context: str = "") -> None:
        """Suspend stall detection (epoch-end validation / checkpoint
        windows: first-time eval compiles and full-state D2H saves are
        legitimately longer than a step timeout sized for the step loop).
        `resume()` re-arms with a fresh clock."""
        self._paused = True
        if context:
            self._context = context

    def resume(self) -> None:
        self._last = time.monotonic()
        self._paused = False

    def _run(self) -> None:
        while not self._stop.wait(self._poll_s):
            if self._paused:
                continue
            elapsed = time.monotonic() - self._last
            if elapsed < self.timeout_s:
                continue
            self.stalls += 1
            msg = (f"[watchdog] no step progress for {elapsed:.0f}s "
                   f"(timeout {self.timeout_s:.0f}s) — last progress: "
                   f"{self._context}. The device (or its tunnel) may be "
                   f"hung; a blocked device sync cannot be interrupted "
                   f"from Python.")
            print(msg, file=sys.stderr, flush=True)
            if self.on_stall is not None:
                self.on_stall(elapsed, self._context)
            if self.abort:
                print(f"[watchdog] aborting with exit code "
                      f"{self.EXIT_CODE} — restart with --resume to "
                      f"recover from the last checkpoint",
                      file=sys.stderr, flush=True)
                sys.stderr.flush()
                os._exit(self.EXIT_CODE)
            # warn-only: reset the clock so the warning repeats once per
            # timeout window instead of once per poll tick
            self._last = time.monotonic()

    def __enter__(self) -> "StallWatchdog":
        self._last = time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stall-watchdog")
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self._poll_s + 1.0)
