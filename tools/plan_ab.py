"""Same-process A/B: precomputed compaction plans vs in-graph slot assignment.

VERDICT r2 experiment (b): the attention key masks are generated once and
cached for the whole run (reference semantics, ade_semantic.py:177-181),
but as traced jit arguments they re-run `plan_compaction`'s cumsum+scatter
every step. This measures the win from hoisting that out of the step graph
(`precompute_mask_plans`), for the serving-style inference forward and the
full train step, interleaved A/B in one process (tunnel noise is ±10%
across runs but ~1% within a process — PERF.md methodology).

Usage: python tools/plan_ab.py [batch] [steps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maskunet_tpu.utils import compile_cache

compile_cache.enable()

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402
import optax                                                  # noqa: E402

from maskunet_tpu.core import state as state_lib              # noqa: E402
from maskunet_tpu.models import maskattn_unet as mu           # noqa: E402
from maskunet_tpu.train import step as step_lib               # noqa: E402


def _time(fn, fence, steps):
    fence(fn())                       # warm
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn()
    fence(r)
    return (time.perf_counter() - t0) / steps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    params, mstate = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 128, 128, 3), ).astype("f4"))
    labels = jnp.asarray(rng.integers(0, 150, (batch, 128, 128)))
    masks = mu.make_attention_masks(jax.random.key(1), batch, 128)
    plans = mu.precompute_mask_plans(masks)

    infer = mu.fold_bn_for_inference(params, mstate, cfg)
    infer = mu.cast_params_for_inference(infer)

    @jax.jit
    def fwd_inline(p, x):
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks, train=False,
                          folded=True)
        return out.semantic

    @jax.jit
    def fwd_plan(p, x):
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks, train=False,
                          folded=True, mask_plans=plans)
        return out.semantic

    fence = lambda r: float(r[0, 0, 0, 0])  # noqa: E731 (scalar host fetch)
    # interleave A/B twice to cancel drift
    ti1 = _time(lambda: fwd_inline(infer, x), fence, steps)
    tp1 = _time(lambda: fwd_plan(infer, x), fence, steps)
    ti2 = _time(lambda: fwd_inline(infer, x), fence, steps)
    tp2 = _time(lambda: fwd_plan(infer, x), fence, steps)
    ti, tp = (ti1 + ti2) / 2, (tp1 + tp2) / 2
    print(f"forward  inline {ti * 1e3:7.3f} ms   plan {tp * 1e3:7.3f} ms   "
          f"{ti / tp:5.3f}x   ({batch / tp:.1f} img/s planned)")

    tx = optax.adamw(5e-5, weight_decay=1e-1)
    batch_data = {"image": x, "label": labels}

    def make(plans_):
        ts = state_lib.create(jax.random.key(2), params, mstate, tx,
                              masks=masks)
        step = jax.jit(step_lib.make_train_step(
            cfg, step_lib.TaskConfig(), tx, mask_plans=plans_))
        box = {"ts": ts}

        def run():
            box["ts"], m = step(box["ts"], batch_data)
            return m
        return run

    fence_m = lambda m: float(m["loss"])  # noqa: E731
    run_inline, run_plan = make(None), make(plans)
    si1 = _time(run_inline, fence_m, steps)
    sp1 = _time(run_plan, fence_m, steps)
    si2 = _time(run_inline, fence_m, steps)
    sp2 = _time(run_plan, fence_m, steps)
    si, sp = (si1 + si2) / 2, (sp1 + sp2) / 2
    print(f"train    inline {si * 1e3:7.3f} ms   plan {sp * 1e3:7.3f} ms   "
          f"{si / sp:5.3f}x   ({batch / sp:.1f} img/s planned)")


if __name__ == "__main__":
    main()
