"""Ablation breakdown of the training step (fwd+bwd+AdamW) on the chip.

Same-process A/B with attention layers selectively removed, plus a
no-metrics and no-dropout variant, to locate the backward-pass time.

    python tools/train_breakdown.py [batch]
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

    from maskunet_tpu.core import layers, state as state_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.ops import attention, metrics_ops
    from maskunet_tpu.train import step as step_lib

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 150, (batch, 128, 128)))
    batch_data = {"image": x, "label": labels}
    tx = optax.adamw(5e-5, weight_decay=1e-1)

    orig = attention.spatial_attention
    orig_miou = metrics_ops.mean_iou
    orig_ce = step_lib.cross_entropy
    orig_bn = layers.batchnorm
    orig_gelu = layers.gelu

    def timed_step(mode):
        def patched(p, xx, km, **kw):
            l = xx.shape[1] * xx.shape[2]
            if mode == "noattn":
                return xx
            if mode == "no16k" and l == 16384:
                return xx
            if mode == "no4k" and l == 4096:
                return xx
            return orig(p, xx, km, **kw)

        attention.spatial_attention = patched
        # numerics-changing ablations: cost probes only, never defaults
        if mode == "nomiou":
            metrics_ops.mean_iou = lambda lg, lb, c, **kw: jnp.float32(0)
        if mode == "noce":    # trivial loss head; bwd still spans the model
            step_lib.cross_entropy = lambda lg, lb, ig=None: jnp.mean(lg)
        if mode == "nobnstat":   # running-stats BN: batch-stat cost probe
            layers.batchnorm = lambda p, s, x, *, train, **kw: orig_bn(
                p, s, x, train=False, **kw)
        if mode == "nogelu":
            layers.gelu = lambda x: x
        tx_local = optax.sgd(5e-5) if mode == "sgd" else tx
        try:
            params, mstate = mu.init(jax.random.key(0), cfg)
            masks = mu.make_attention_masks(jax.random.key(1), batch, 128)
            ts = state_lib.create(jax.random.key(2), params, mstate,
                                  tx_local, masks=masks)
            dropout_rate = 0.0 if mode == "nodrop" else cfg.dropout_rate
            import dataclasses
            cfg2 = dataclasses.replace(cfg, dropout_rate=dropout_rate)
            train_step = jax.jit(
                step_lib.make_train_step(cfg2, step_lib.TaskConfig(),
                                         tx_local),
                donate_argnums=(0,))
            ts, m = train_step(ts, batch_data)
            float(m["loss"])   # scalar host fetch: the reliable fence
            # (block_until_ready can return early through the tunnel and
            # produce physically impossible timings — PERF.md)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(15):
                    ts, m = train_step(ts, batch_data)
                float(m["loss"])
                best = min(best, (time.perf_counter() - t0) / 15)
            return best, float(m["loss"])
        finally:
            attention.spatial_attention = orig
            metrics_ops.mean_iou = orig_miou
            step_lib.cross_entropy = orig_ce
            layers.batchnorm = orig_bn
            layers.gelu = orig_gelu

    modes = ["full", "noattn", "no16k", "no4k", "nodrop",
             "nomiou", "noce", "nobnstat", "nogelu", "sgd"]
    if len(sys.argv) > 2:
        modes = ["full"] + sys.argv[2].split(",")
    results = {}
    for mode in modes:
        ms, loss = timed_step(mode)
        results[mode] = ms
        print(f"{mode:8s} {ms * 1e3:7.2f} ms/step  "
              f"({batch / ms:6.1f} img/s)  loss={loss:.4f}", flush=True)

    full = results["full"]

    def delta(name, label):
        if name in results:
            print(f"{label:19s}: {(full - results[name]) * 1e3:6.2f} ms")

    delta("noattn", "attn total fwd+bwd")
    delta("no16k", "attn6 fwd+bwd")
    delta("no4k", "attn1/5 fwd+bwd")
    if "noattn" in results:
        print(f"conv+opt (noattn)  : {results['noattn'] * 1e3:6.2f} ms")
    delta("nodrop", "dropout cost")
    delta("nomiou", "train-miou cost")
    delta("noce", "CE loss cost")
    delta("nobnstat", "BN batch-stat cost")
    delta("nogelu", "GELU cost")
    delta("sgd", "AdamW-over-SGD cost")


if __name__ == "__main__":
    main()
