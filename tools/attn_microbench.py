"""Micro-benchmark for the Pallas masked attention kernel.

Times the three hot attention shapes of MaskAttn-UNet (attn6: 16384x64,
attn1/5: 4096x(128|64)) in isolation so kernel/block-size tuning iterates
in seconds instead of full-model compile minutes.

    MASKUNET_FLASH_BQ=1024 MASKUNET_FLASH_BK=1024 python tools/attn_microbench.py
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
    from maskunet_tpu.ops import attention, flash_attention

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={batch} "
          f"BQ={os.environ.get('MASKUNET_FLASH_BQ', '512')} "
          f"BK={os.environ.get('MASKUNET_FLASH_BK', '512')}")
    for l, c in [(16384, 64), (4096, 64), (4096, 128), (1024, 256)]:
        params = attention.attention_init(jax.random.key(0), c)
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        tokens = jax.random.normal(jax.random.key(1), (batch, l, c), dtype)
        mask = attention.random_key_mask(jax.random.key(2), batch, l)

        fwd = jax.jit(lambda p, t: flash_attention.masked_attention_flash(
            p, t, mask))
        grad = jax.jit(jax.grad(lambda t: jnp.sum(jnp.square(
            flash_attention.masked_attention_flash(params, t, mask)
            .astype(jnp.float32)))))

        fwd(params, tokens).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            out = fwd(params, tokens)
        out.block_until_ready()
        fwd_ms = (time.perf_counter() - t0) / 20 * 1e3

        grad(tokens).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            g = grad(tokens)
        g.block_until_ready()
        bwd_ms = (time.perf_counter() - t0) / 10 * 1e3

        lk = flash_attention._key_capacity(l) if l >= \
            flash_attention.COMPACT_MIN_TOKENS else l
        flops = 2 * 2 * batch * l * lk * c
        print(f"L={l:6d} C={c:4d}: fwd {fwd_ms:7.2f} ms "
              f"({flops / fwd_ms / 1e9:6.1f} TF/s)  fwd+bwd {bwd_ms:7.2f} ms")


if __name__ == "__main__":
    main()
