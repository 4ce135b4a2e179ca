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
    steps = 10

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

    @jax.jit
    def fwd(p, x):
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks, train=False,
                          folded=True)
        return out.semantic

    tx = optax.adamw(5e-5, weight_decay=1e-1)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    train_step = jax.jit(
        step_lib.make_train_step(cfg, step_lib.TaskConfig(), tx),
        donate_argnums=(0,))
    batch_data = {"image": x, "label": labels}

    fwd(p_fold, x).block_until_ready()
    ts, m = train_step(ts, batch_data)
    jax.block_until_ready(m["loss"])

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            out = fwd(p_fold, x)
        out.block_until_ready()
        for _ in range(steps):
            ts, m = train_step(ts, batch_data)
        jax.block_until_ready(m["loss"])
    print(f"trace written to {out_dir}; parsing...")

    import subprocess
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "parse_xplane.py"),
                    out_dir, str(steps)], check=False)


if __name__ == "__main__":
    main()
