"""Forward-block re-sweep for the no-max kernel + compaction cost probe.

The r2 forward block optimum (BQ=4096/BK=1024) was swept for the
online-max kernel; the no-max kernel has a different VPU/MXU balance.
Also times the per-step cost of `compact_keys` (cumsum+scatter plan +
K/V gathers) vs gathers from a precomputed plan, to size the win of
plan precomputation (VERDICT r2 next-#1b).

    python tools/fwd_sweep.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def fence(out):
    return float(jnp.sum(jax.tree.leaves(out)[0][(0,) * 2]))


def timeit(fn, *args, steps=30):
    fence(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    from maskunet_tpu.ops import attention, flash_attention as fa

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} batch={batch} bf16")

    # ---- forward block sweep (full layer: proj + kernel + epilogue)
    l, c = 16384, 64
    params = attention.attention_init(jax.random.key(0), c)
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    tokens = jax.random.normal(jax.random.key(1), (batch, l, c), dtype)
    mask = attention.random_key_mask(jax.random.key(2), batch, l)
    seen = set()
    for bq, bk in [(4096, 1024), (2048, 1024), (8192, 1024),
                   (4096, 2048), (2048, 2048), (4096, 512)]:
        fa._BQ_DEFAULT, fa._BK_DEFAULT = bq, bk
        # report the blocks _block_sizes actually resolves (the compacted
        # key length lk=9216 is not divisible by 2048, so a requested
        # BK=2048 silently falls back to 1024 — label the real config,
        # and skip configs that duplicate one already timed)
        ebq, ebk = fa._block_sizes(l, fa._key_capacity(l), dtype)
        label = (f"fwd BQ={bq:5d} BK={bk:5d} "
                 f"(effective {ebq}/{ebk})")
        if (ebq, ebk) in seen:
            print(f"{label}: skipped (duplicate of an effective config)",
                  flush=True)
            continue
        seen.add((ebq, ebk))
        try:
            f = jax.jit(lambda t: fa.masked_attention_flash(
                params, t, mask))
            t_ms = timeit(f, tokens) * 1e3
            print(f"{label}: {t_ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}", flush=True)
    fa._BQ_DEFAULT, fa._BK_DEFAULT = 4096, 1024

    # ---- compaction cost: full compact_keys vs gather-from-plan
    ks = jax.random.normal(jax.random.key(3), (batch, l, c), dtype)
    vs = jax.random.normal(jax.random.key(4), (batch, l, c), dtype)

    full = jax.jit(lambda k, v, m: fa.compact_keys(k, v, m))
    t_full = timeit(full, ks, vs, mask) * 1e3

    # precomputed plan: indices fixed, only the value gathers per step
    _, _, valid = jax.jit(fa.compact_keys)(ks, vs, mask)
    cap = valid.shape[1]
    ones = mask.astype(jnp.int32)
    pos = jnp.cumsum(ones, axis=1) - 1
    slot = jnp.where(mask, jnp.minimum(pos, cap), cap)
    src = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None],
                           (batch, l))
    idx = jnp.zeros((batch, cap + 1), jnp.int32)
    idx = idx.at[jnp.arange(batch)[:, None], slot].set(src)[:, :cap]

    gather_only = jax.jit(lambda k, v, i: (
        jnp.take_along_axis(k, i[..., None], axis=1),
        jnp.take_along_axis(v, i[..., None], axis=1)))
    t_gather = timeit(gather_only, ks, vs, idx) * 1e3
    print(f"compact_keys full: {t_full:7.3f} ms   "
          f"gather-from-plan: {t_gather:7.3f} ms   "
          f"plan overhead: {t_full - t_gather:7.3f} ms (x3 layers/step)")


if __name__ == "__main__":
    main()
