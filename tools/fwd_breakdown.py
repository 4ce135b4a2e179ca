"""Ablation breakdown of the inference forward on the real chip.

Monkeypatches the attention dispatch to skip or re-route individual
layers, timing each variant in one process (same-process A/B — separate
runs differ by more than the effects under test on the shared chip).

    python tools/fwd_breakdown.py [batch]
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

    orig = attention.spatial_attention

    def make_fwd(mode):
        """mode: 'full' | 'noattn' | 'no16k' | 'no4k' | 'nosmall' |
        'dense_small' (dense for L<4096, flash above)."""
        def patched(p, xx, km, **kw):
            l = xx.shape[1] * xx.shape[2]
            if mode == "noattn":
                return xx
            if mode == "no16k" and l == 16384:
                return xx
            if mode == "no4k" and l == 4096:
                return xx
            if mode == "nosmall" and l < 4096:
                return xx
            if mode == "dense_small" and l < 4096:
                # dense path takes no flash-only plan
                return orig(p, xx, km, **{**kw, "impl": "dense",
                                          "plan": None})
            return orig(p, xx, km, **kw)

        attention.spatial_attention = patched
        try:
            @jax.jit
            def fwd(p, x):
                out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks,
                                  train=False, folded=True)
                return out.semantic
            fwd(p_fold, x).block_until_ready()   # compile under the patch
        finally:
            attention.spatial_attention = orig
        return fwd

    results = {}
    for mode in ["full", "noattn", "no16k", "no4k", "nosmall",
                 "dense_small"]:
        attention.spatial_attention = orig
        fwd = make_fwd(mode)
        results[mode] = timeit(fwd, p_fold, x)
        print(f"{mode:12s} {results[mode] * 1e3:7.2f} ms  "
              f"({batch / results[mode]:7.1f} img/s)", flush=True)

    full = results["full"]
    print(f"\nattn total  : {(full - results['noattn']) * 1e3:6.2f} ms")
    print(f"attn6 (16k) : {(full - results['no16k']) * 1e3:6.2f} ms")
    print(f"attn1/5 (4k): {(full - results['no4k']) * 1e3:6.2f} ms")
    print(f"attn2/3/4   : {(full - results['nosmall']) * 1e3:6.2f} ms")
    print(f"conv trunk  : {results['noattn'] * 1e3:6.2f} ms")
    print(f"dense_small delta: {(full - results['dense_small']) * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
