"""On-chip A/B: `remat_attention` cost + the HBM headroom it buys.

Two questions, same methodology as tools/plan_ab.py (same-process,
interleaved, scalar-fenced timing — the axon tunnel's run-to-run noise
is ±10%, so never compare across processes):

1. What does rematerializing the six attention blocks cost on the
   training step at the production config (128px, batch 8)?
2. What peak-HBM headroom does it buy — i.e. the largest training batch
   (or resolution) that fits with remat but OOMs without?

Usage: python tools/remat_ab.py [batch] [steps] [img]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _mk(cfg, batch, seed=0):
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.train import step as step_lib

    params, mstate = mu.init(jax.random.key(seed), cfg)
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    masks = mu.make_attention_masks(jax.random.key(seed + 1), batch,
                                    cfg.img_size)
    ts = state_lib.create(jax.random.key(seed + 2), params, mstate, tx,
                          masks=masks)
    plans = mu.precompute_mask_plans(ts.masks)
    step = jax.jit(step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx, mask_plans=plans))
    x = jax.random.uniform(jax.random.key(3),
                           (batch, cfg.img_size, cfg.img_size, 3))
    y = jnp.zeros((batch, cfg.img_size, cfg.img_size), jnp.int32)
    return ts, step, {"image": x, "label": y}


def _time(ts, step, batch, steps):
    # scalar host fetch as the fence: block_until_ready returns early
    # during degraded tunnel phases (PERF.md "Caveat")
    ts, m = step(ts, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _i in range(steps):
        ts, m = step(ts, batch)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / steps


def _live_hbm_mb():
    # bytes_in_use (live after the step), NOT peak_bytes_in_use: the peak
    # counter is process-lifetime and never resets between modes/trials, so
    # it would report the max over all earlier trials, not this one's.
    stats = jax.devices()[0].memory_stats() or {}
    pk = stats.get("bytes_in_use")
    return pk / 1e6 if pk else None


def main() -> None:
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.utils import compile_cache

    compile_cache.enable()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    print(f"backend={jax.default_backend()} batch={batch} img={img} "
          f"steps={steps} dtype={dtype}")

    # 1. cost A/B at the requested config, interleaved
    res = {}
    for name, remat in [("plain", False), ("remat", True)]:
        cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=img,
                                    compute_dtype=dtype,
                                    remat_attention=remat)
        res[name] = _mk(cfg, batch)
    for _round in range(2):                      # interleave: warm both,
        for name in ("plain", "remat"):          # then measure both
            ts, step, b = res[name]
            dt = _time(ts, step, b, steps)
            print(f"  {name:5s}: {dt * 1e3:7.2f} ms/step "
                  f"({batch / dt:6.1f} img/s)")
    del res

    # 2. headroom: walk batch up, report largest fitting batch per mode
    print("max-fitting training batch (fresh state per trial):")
    for name, remat in [("plain", False), ("remat", True)]:
        cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=img,
                                    compute_dtype=dtype,
                                    remat_attention=remat)
        fit = None
        for b_try in [8, 16, 32, 64, 96, 128, 192, 256]:
            try:
                ts, step, b = _mk(cfg, b_try, seed=7)
                ts, m = step(ts, b)
                _ = float(m["loss"])
                pk = _live_hbm_mb()
                fit = (b_try, pk)
                del ts, step, b, m
            except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED
                if "RESOURCE_EXHAUSTED" not in str(e) and \
                        "Out of memory" not in str(e):
                    raise
                print(f"  {name:5s}: batch {b_try} OOM")
                break
        if fit:
            b_ok, pk = fit
            pk_s = f", live {pk:.0f} MB after step" if pk else ""
            print(f"  {name:5s}: largest tried-and-fit batch {b_ok}{pk_s}")


if __name__ == "__main__":
    main()
