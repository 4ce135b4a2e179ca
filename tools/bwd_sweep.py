"""Same-process sweep of merged-backward block sizes + partials dtype.

Times jax.grad of the full masked_attention_flash layer (projections +
kernel + epilogue) at the attn6 and attn1/5 shapes for each
(BQ_BWD, BK_BWD, partials-dtype) config by monkeypatching the module
knobs and re-jitting. Scalar host fetch as the timing fence.

    python tools/bwd_sweep.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    from maskunet_tpu.ops import attention, flash_attention as fa

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16
    shapes = [(16384, 64), (4096, 64)]
    data = {}
    for l, c in shapes:
        params = attention.attention_init(jax.random.key(0), c)
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        tokens = jax.random.normal(jax.random.key(1), (batch, l, c), dtype)
        mask = attention.random_key_mask(jax.random.key(2), batch, l)
        data[(l, c)] = (params, tokens, mask)
    print(f"backend={jax.default_backend()} batch={batch} bf16")

    def timed_grad(l, c):
        params, tokens, mask = data[(l, c)]
        g = jax.jit(jax.grad(lambda t: jnp.sum(jnp.square(
            fa.masked_attention_flash(params, t, mask)
            .astype(jnp.float32)))))
        out = g(tokens)
        float(jnp.sum(out[0, :2, :2]))          # fence
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = g(tokens)
            float(jnp.sum(out[0, :2, :2]))
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    configs = [
        (1024, 1024, False),     # r2 optimum for the split kernels
        (2048, 1024, False),
        (512, 1024, False),
        (1024, 512, False),
        (2048, 512, False),
        (1024, 1024, True),      # bf16 dq partials
    ]
    for bq, bk, pbf16 in configs:
        fa._BQ_BWD, fa._BK_BWD = bq, bk
        fa._BWD_PARTIALS_BF16 = pbf16
        # label the blocks _block_sizes actually resolves: the compacted
        # key lengths (9216/2304) are not divisible by 2048, so a
        # requested BK=2048 would silently clamp — keep labels honest
        e16 = fa._block_sizes(16384, fa._key_capacity(16384),
                              jnp.bfloat16, bwd=True)
        try:
            t16 = timed_grad(16384, 64)
            t4 = timed_grad(4096, 64)
            print(f"BQ={bq:5d} BK={bk:5d} pbf16={int(pbf16)} "
                  f"(attn6 effective {e16[0]}/{e16[1]}): "
                  f"attn6 {t16 * 1e3:7.3f} ms  attn1/5 {t4 * 1e3:6.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"BQ={bq:5d} BK={bk:5d} pbf16={int(pbf16)}: "
                  f"FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
