"""Persistent XLA compilation cache (the analog of cudnn.benchmark +
torch kernel caches the reference relies on, ade_semantic.py:372 — but
surviving process restarts).

First compiles of the full model through the TPU tunnel cost minutes;
enabling the on-disk cache makes every subsequent process start hit warm
compiles. Called by the CLI, bench.py, and tools/.
"""

from __future__ import annotations

import os


def enable(path: str = "~/.cache/maskunet_tpu/xla") -> None:
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # explicit env override wins (hermetic tests, multi-tenant hosts
        # where ~/.cache may hold entries from a different machine —
        # XLA:CPU AOT results are ISA-specific and a foreign entry can
        # poison multi-process collective setup)
        return
    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (AttributeError, ValueError):
        pass  # older jax: silently skip


def raise_cpu_collective_watchdog(seconds: int = 600) -> None:
    """Lift XLA:CPU's 40 s collective-rendezvous termination watchdog.

    XLA:CPU aborts the process (`rendezvous.cc Termination timeout`) when
    a collective's participants don't all arrive within 40 s. On a
    virtual multi-device CPU mesh the "devices" are threads sharing the
    host's cores, so one slow stage (e.g. the pipeline-parallel encoder
    tick at real image sizes on a 1-core box) trips the watchdog even
    though the program is merely slow. Must run BEFORE jax initializes
    the CPU backend (env-var parse time); no-op if the flag is already
    set. Irrelevant for real TPU meshes (different runtime)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_collective_call_terminate_timeout_seconds"
            f"={seconds}").strip()
