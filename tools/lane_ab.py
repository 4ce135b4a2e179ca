"""Close the C=64 MXU lane-underfill question (VERDICT r3 #4).

Two parts:

1. **The arithmetic that bounds batch-row packing at zero gain.** The
   only way to pack two independent batch rows into one contraction is
   block-diagonal zero padding: for QK^T, q' = [q_b0 | q_b1] ([BQ, 128])
   against K' = [[k_b0, 0], [0, k_b1]] ([2BK, 128]). That matmul does
   BQ x 2BK x 128 MACs where the two separate C=64 matmuls do
   2 x BQ x BK x 64 — exactly 2x the nominal work at exactly 2x the lane
   utilization: identical MXU time, plus the pack/unpack traffic. For PV
   (output-lane underfill) the same construction is 4x nominal MACs at
   2x utilization — a 2x LOSS. Packing cannot win; the padding always
   inflates MACs by the inverse of the utilization it recovers.

2. **Measure the underfill directly**: time [L,64]@[64,L] vs
   [L,128]@[128,L] (QK^T shape) and [L,L]@[L,64] vs [L,L]@[L,128]
   (PV shape). If the 64-variant costs ~the same wall time as the
   128-variant (not half), the MXU is half-utilized at C=64 — the
   'architectural' claim in PERF.md — and per part 1 no packing scheme
   recovers it.

    python tools/lane_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=30):
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp

    l = 8192
    b = 8
    key = jax.random.key(0)

    print(f"batched matmul timings, B={b}, L={l}, bf16 "
          f"(3 trials x 30 iters, best):")
    for label, m, k, n in (("QK^T  C=64 ", l, 64, l),
                           ("QK^T  C=128", l, 128, l),
                           ("PV    C=64 ", l, l, 64),
                           ("PV    C=128", l, l, 128)):
        a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
        bb = jax.random.normal(key, (b, k, n), jnp.bfloat16)
        f = jax.jit(lambda x, y: jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dt = _time(f, a, bb)
        tf = 2 * b * m * k * n / dt / 1e12
        print(f"  {label}: {dt * 1e3:7.3f} ms  {tf:6.1f} TF/s")

    print("\nInterpretation: if the C=64 rows run at ~half the C=128"
          " TF/s in the same wall time, the MXU is half-utilized at"
          " C=64 and (per the packing arithmetic in the docstring) no"
          " batch-row packing can recover it — the underfill is"
          " architectural at this model's widths.")


if __name__ == "__main__":
    main()
