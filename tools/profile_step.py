"""Capture a TPU xplane trace of the inference forward and the train step,
then print per-op device timings via tools/parse_xplane.py.

    python tools/profile_step.py [batch] [out_dir]
"""

from __future__ import annotations

import os
import sys

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
    from maskunet_tpu.train import step as step_lib

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"
    # >~10 traced steps of the full model overflows the axon tunnel's
    # profiler (TPU backend InvalidArgument mid-trace, observed r3);
    # 3 steps is enough for steady-state per-op times
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    params, mstate = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 150, (batch, 128, 128)))
    masks = mu.make_attention_masks(jax.random.key(1), batch, 128)

    p_fold = mu.cast_params_for_inference(
        mu.fold_bn_for_inference(params, mstate, cfg))

    mask_plans = mu.precompute_mask_plans(masks)

    @jax.jit
    def fwd(p, x):
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks, train=False,
                          folded=True, mask_plans=mask_plans)
        return out.semantic

    tx = optax.adamw(5e-5, weight_decay=1e-1)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    train_step = jax.jit(
        step_lib.make_train_step(cfg, step_lib.TaskConfig(), tx,
                                 mask_plans=mask_plans),
        donate_argnums=(0,))
    batch_data = {"image": x, "label": labels}

    # warm-then-trace strictly per phase: warming the donated-buffer
    # train step before the forward trace wedges the tunnel profiler
    # (TPU backend InvalidArgument mid-trace, observed r3)
    fwd_dir = os.path.join(out_dir, "fwd")
    train_dir = os.path.join(out_dir, "train")
    os.makedirs(fwd_dir, exist_ok=True)
    os.makedirs(train_dir, exist_ok=True)
    fwd(p_fold, x).block_until_ready()
    with jax.profiler.trace(fwd_dir):
        for _ in range(steps):
            out = fwd(p_fold, x)
        out.block_until_ready()
    ts, m = train_step(ts, batch_data)
    jax.block_until_ready(m["loss"])
    with jax.profiler.trace(train_dir):
        for _ in range(steps):
            ts, m = train_step(ts, batch_data)
        jax.block_until_ready(m["loss"])
    print(f"traces written to {out_dir}; parsing...")

    import subprocess
    for d in (fwd_dir, train_dir):
        print(f"-- {os.path.basename(d)} --")
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "parse_xplane.py"),
                        d, str(steps)], check=False)


if __name__ == "__main__":
    main()
