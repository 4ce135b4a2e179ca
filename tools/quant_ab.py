"""Same-process A/B: bf16 folded inference vs int8-quantized convs.

Measures whether int8x int8->int32 convs (double MXU rate on v5e) beat
bf16 end to end once the dynamic activation-quant reduce + dequant are
paid, and reports the class-map agreement between the two paths. Run on
the real chip (chip noise between separate runs swamps single-digit-%
effects; one process, one warmup regime).

    python tools/quant_ab.py [batch]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    params, mstate = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 3)).astype(np.float32))
    masks = mu.make_attention_masks(jax.random.key(1), batch, 128)

    folded = mu.fold_bn_for_inference(params, mstate, cfg)
    p_bf16 = mu.cast_params_for_inference(folded)
    p_int8 = mu.cast_params_for_inference(
        mu.quantize_params_for_inference(folded))

    def fwd_eager(p, t):
        out, _ = mu.apply(p, None, t, cfg=cfg, masks=masks, train=False,
                          folded=True)
        return out.semantic

    # static arm: calibrate on the bench input itself (eager pass)
    scales = mu.calibrate_activation_scales(folded, fwd_eager, [x])
    p_stat = mu.cast_params_for_inference(
        mu.quantize_params_for_inference(folded, act_scales=scales))

    @jax.jit
    def fwd(p, x):
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks, train=False,
                          folded=True)
        return out.semantic

    t_bf16 = timeit(fwd, p_bf16, x)
    t_int8 = timeit(fwd, p_int8, x)
    t_stat = timeit(fwd, p_stat, x)
    a = jnp.argmax(fwd(p_bf16, x), axis=-1)
    b = jnp.argmax(fwd(p_int8, x), axis=-1)
    c = jnp.argmax(fwd(p_stat, x), axis=-1)
    agree = float(jnp.mean((a == b).astype(jnp.float32)))
    agree_s = float(jnp.mean((a == c).astype(jnp.float32)))
    print(f"batch={batch} bf16={t_bf16 * 1e3:.2f} ms "
          f"({batch / t_bf16:.1f} img/s)  "
          f"int8-dyn={t_int8 * 1e3:.2f} ms ({batch / t_int8:.1f} img/s, "
          f"{t_bf16 / t_int8:.3f}x, agree={agree:.4f})  "
          f"int8-static={t_stat * 1e3:.2f} ms ({batch / t_stat:.1f} img/s, "
          f"{t_bf16 / t_stat:.3f}x, agree={agree_s:.4f})")


if __name__ == "__main__":
    main()
