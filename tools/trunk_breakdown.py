"""Conv-trunk ablation: what the 6+ ms non-attention forward is made of.

Monkeypatches individual layer ops to identity / cheaper variants and
times the attention-free forward (same-process A/B).

    python tools/trunk_breakdown.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=30, repeats=3) -> float:
    fn(*args).block_until_ready()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskunet_tpu.core import layers
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.ops import attention

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    params, mstate = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 3)).astype(np.float32))
    masks = mu.make_attention_masks(jax.random.key(1), batch, 128)
    p_fold = mu.cast_params_for_inference(
        mu.fold_bn_for_inference(params, mstate, cfg))

    orig_attn = attention.spatial_attention
    orig_gelu = layers.gelu
    orig_ln = layers.layernorm
    orig_up = layers.upsample_2x_bilinear

    def make_fwd(patches: dict):
        attention.spatial_attention = lambda p, xx, km, **kw: xx
        for name, fn in patches.items():
            setattr(layers, name, fn)
        try:
            @jax.jit
            def fwd(p, x):
                out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks,
                                  train=False, folded=True)
                return out.semantic
            fwd(p_fold, x).block_until_ready()
        finally:
            attention.spatial_attention = orig_attn
            layers.gelu = orig_gelu
            layers.layernorm = orig_ln
            layers.upsample_2x_bilinear = orig_up
        return fwd

    variants = {
        "trunk": {},
        "no_gelu": {"gelu": lambda x: x},
        "tanh_gelu": {"gelu": lambda x: jax.nn.gelu(x, approximate=True)},
        "no_layernorm": {"layernorm": lambda p, x, **kw: x},
        "nearest_up": {"upsample_2x_bilinear":
                       lambda x: jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)},
    }
    results = {}
    for name, patches in variants.items():
        fwd = make_fwd(patches)
        mean = float(fwd(p_fold, x).astype(jnp.float32).mean())
        results[name] = timeit(fwd, p_fold, x)
        print(f"{name:14s} {results[name] * 1e3:7.2f} ms  "
              f"(out mean {mean:.4f})", flush=True)

    base = results["trunk"]
    for name in list(results)[1:]:
        print(f"{name:14s} delta {(base - results[name]) * 1e3:+6.2f} ms")


if __name__ == "__main__":
    main()
