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
