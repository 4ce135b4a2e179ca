"""Same-process A/B timing of inference variants (chip noise between
separate runs swamps single-digit-% effects; comparing in one process
under one warmup regime isolates the change under test).

    python tools/infer_ab.py [batch]
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

    cast = mu.cast_params_for_inference
    p_plain = cast(params)
    p_fold = cast(mu.fold_bn_for_inference(params, mstate, cfg))

    @jax.jit
    def fwd_plain(p, s, x):
        out, _ = mu.apply(p, s, x, cfg=cfg, masks=masks, train=False)
        return out.semantic

    @jax.jit
    def fwd_fold(p, x):
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks, train=False,
                          folded=True)
        return out.semantic

    t_plain = timeit(fwd_plain, p_plain, mstate, x)
    t_fold = timeit(fwd_fold, p_fold, x)
    print(f"batch={batch} plain={t_plain * 1e3:.2f} ms "
          f"({batch / t_plain:.1f} img/s)  "
          f"folded={t_fold * 1e3:.2f} ms ({batch / t_fold:.1f} img/s)  "
          f"speedup={t_plain / t_fold:.3f}x")


if __name__ == "__main__":
    main()
