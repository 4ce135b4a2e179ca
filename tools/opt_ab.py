"""A/B the optimizer-update segment of the train step (VERDICT r3 #3).

Same-process interleaved timing of the full train step under:
  adamw      — baseline optax.adamw (f32 moments)
  adamw_bf16 — mu_dtype=bfloat16 (halves first-moment HBM traffic;
               optax casts in update, numerics change is the bf16
               rounding of m only)
  sgd        — cost floor for the update segment
  bwd_bf16   — adamw + MASKUNET_BWD_PARTIALS_BF16=1 (bf16 dQ partial
               blocks: halves the attn6 partial stream traffic)

    python tools/opt_ab.py [batch] [steps-per-trial]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.ops import flash_attention as fa
    from maskunet_tpu.train import step as step_lib

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.standard_normal(
            (batch, 128, 128, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 150, (batch, 128, 128))),
    }

    txs = {
        "adamw": optax.adamw(5e-5, weight_decay=1e-1),
        "adamw_bf16": optax.adamw(5e-5, weight_decay=1e-1,
                                  mu_dtype=jnp.bfloat16),
        "sgd": optax.sgd(5e-5),
    }

    def build(name, tx, bwd_bf16=False):
        # the partials knob is read at trace time
        fa._BWD_PARTIALS_BF16 = bwd_bf16
        params, mstate = mu.init(jax.random.key(0), cfg)
        masks = mu.make_attention_masks(jax.random.key(1), batch, 128)
        plans = mu.precompute_mask_plans(masks)
        ts = state_lib.create(jax.random.key(2), params, mstate, tx,
                              masks=masks)
        step = jax.jit(step_lib.make_train_step(
            cfg, step_lib.TaskConfig(), tx, mask_plans=plans),
            donate_argnums=(0,))
        ts, m = step(ts, batch_data)
        float(m["loss"])
        fa._BWD_PARTIALS_BF16 = (
            os.environ.get("MASKUNET_BWD_PARTIALS_BF16", "0") == "1")
        return ts, step

    res = {}
    for name, tx in txs.items():
        res[name] = build(name, tx)
    res["bwd_bf16"] = build("bwd_bf16", txs["adamw"], bwd_bf16=True)

    best = {k: float("inf") for k in res}
    for _round in range(3):
        for name, (ts, step) in res.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                ts, m = step(ts, batch_data)
            float(m["loss"])
            dt = (time.perf_counter() - t0) / steps
            best[name] = min(best[name], dt)
            res[name] = (ts, step)

    base = best["adamw"]
    print(f"batch {batch}, best of 3 x {steps} steps:")
    for name, dt in best.items():
        print(f"  {name:10s}: {dt * 1e3:7.2f} ms/step "
              f"({batch / dt:6.1f} img/s)  {base / dt:5.3f}x vs adamw")
    print(f"\n  AdamW update segment (adamw - sgd): "
          f"{(best['adamw'] - best['sgd']) * 1e3:5.2f} ms")


if __name__ == "__main__":
    main()
