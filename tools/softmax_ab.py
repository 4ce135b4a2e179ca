"""Same-process A/B of forward-kernel softmax variants at the attn6 shape
(L=16384 queries x 9216 compacted keys, C=64, bf16, batch 8):

  A: r2 kernel — natural exp, online max (reconstructed inline)
  B: exp2, online max (the new training fwd kernel)
  C: exp2, no online max + static clamp (the new inference kernel)

Interleaved timing with min-of-repeats; scalar host fetch as the fence
(block_until_ready can return early through the tunnel — see PERF.md).

    python tools/softmax_ab.py [batch]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _old_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                    acc_sc, m_sc, l_sc, *, nk: int):
    """The r2 forward kernel verbatim (natural exp, use_valid=False)."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    bias = bias_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias
    m_prev = m_sc[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_sc[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_sc[:] = acc_sc[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
    l_sc[:] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(ik == nk - 1)
    def _():
        l_fin = l_sc[:, :1]
        o_ref[0] = (acc_sc[:] / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)
        lse_ref[0] = (m_sc[:, :1] + jnp.log(jnp.maximum(l_fin, 1e-30))).T


def old_flash_fwd(q, k, v, bias):
    from maskunet_tpu.ops.flash_attention import (_VMEM_LIMIT, _block_sizes)
    b, lq, c = q.shape
    lk = k.shape[1]
    bq, bk = _block_sizes(lq, lk, q.dtype)
    nq, nk = lq // bq, lk // bk
    out, _ = pl.pallas_call(
        functools.partial(_old_fwd_kernel, nk=nk),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda ib, iq, ik: (ib, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, 1, bq), lambda ib, iq, ik: (ib, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, c), q.dtype),
            jax.ShapeDtypeStruct((b, 1, lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(q, k, v, bias)
    return out


def fence(out):
    return float(jnp.sum(out[0, :2, :2]))   # scalar host fetch


def timeit(fn, *args, steps=30):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    from maskunet_tpu.ops import flash_attention as fa

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    lq, c = 16384, 64
    cap = fa._key_capacity(lq)
    rng = jax.random.key(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (batch, lq, c), jnp.bfloat16) * 0.35
    k = jax.random.normal(kk, (batch, cap, c), jnp.bfloat16)
    v = jax.random.normal(kv, (batch, cap, c), jnp.bfloat16)
    bias = jnp.zeros((batch, 1, cap), jnp.float32)
    print(f"backend={jax.default_backend()} batch={batch} "
          f"Lq={lq} cap={cap} C={c} bf16")

    f_old = jax.jit(old_flash_fwd)
    f_exp2 = jax.jit(lambda q, k, v, b: fa._flash_fwd(
        q, k, v, b, 1.0, False, need_lse=True)[0])
    f_nomax = jax.jit(lambda q, k, v, b: fa._flash_fwd(
        q, k, v, b, 1.0, False, need_lse=False)[0])

    # numerics cross-check first
    o_old = f_old(q, k, v, bias)
    o_exp2 = f_exp2(q, k, v, bias)
    o_nomax = f_nomax(q, k, v, bias)
    import numpy as np
    d1 = float(jnp.max(jnp.abs(o_old.astype(jnp.float32)
                               - o_exp2.astype(jnp.float32))))
    d2 = float(jnp.max(jnp.abs(o_old.astype(jnp.float32)
                               - o_nomax.astype(jnp.float32))))
    print(f"max|old-exp2|={d1:.2e}  max|old-nomax|={d2:.2e}")
    assert np.isfinite(d1) and np.isfinite(d2)

    best = {"old": 1e9, "exp2": 1e9, "nomax": 1e9}
    for rep in range(3):
        best["old"] = min(best["old"], timeit(f_old, q, k, v, bias))
        best["exp2"] = min(best["exp2"], timeit(f_exp2, q, k, v, bias))
        best["nomax"] = min(best["nomax"], timeit(f_nomax, q, k, v, bias))
    for name, t in best.items():
        flops = 2 * 2 * batch * lq * cap * c
        print(f"{name:6s} {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s "
              f" ({best['old'] / t:.3f}x vs old)")


def _nomax65_kernel(q_ref, k_ref, v_ref, o_ref, acc_sc, l_sc, *, nk: int,
                    clamp: bool = True):
    """Variant D: bias rides the matmul as channel 65 (q's 65th channel
    is 1, k's 65th is the additive bias) — no separate [BQ,BK] bias add."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        l_sc[:] = jnp.zeros_like(l_sc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s, 60.0)) if clamp else jnp.exp2(s)
    l_sc[:] += jnp.broadcast_to(jnp.sum(p, axis=-1, keepdims=True),
                                l_sc.shape)
    acc_sc[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = (acc_sc[:] /
                    jnp.maximum(l_sc[:, :1], 1e-30)).astype(o_ref.dtype)


def nomax65_fwd(q65, k65, v, clamp=True):
    from maskunet_tpu.ops.flash_attention import (_VMEM_LIMIT, _block_sizes)
    b, lq, c65 = q65.shape
    lk = k65.shape[1]
    c = v.shape[-1]
    bq, bk = _block_sizes(lq, lk, q65.dtype)
    nq, nk = lq // bq, lk // bk
    return pl.pallas_call(
        functools.partial(_nomax65_kernel, nk=nk, clamp=clamp),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, c65), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c65), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, c), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(q65, k65, v)


def main2() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    from maskunet_tpu.ops import flash_attention as fa

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lq, c = 16384, 64
    cap = fa._key_capacity(lq)
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (batch, lq, c), jnp.bfloat16) * 0.35
    k = jax.random.normal(kk, (batch, cap, c), jnp.bfloat16)
    v = jax.random.normal(kv, (batch, cap, c), jnp.bfloat16)
    bias = jnp.zeros((batch, 1, cap), jnp.float32)
    L2E = 1.4426950408889634
    q65 = jnp.concatenate(
        [q * L2E, jnp.ones((batch, lq, 1), jnp.bfloat16)], axis=-1)
    k65 = jnp.concatenate([k, bias.transpose(0, 2, 1).astype(jnp.bfloat16)],
                          axis=-1)
    print(f"backend={jax.default_backend()} D/E variants batch={batch}")

    f_nomax = jax.jit(lambda q, k, v, b: fa._flash_fwd(
        q, k, v, b, 1.0, False, need_lse=False)[0])
    f_d = jax.jit(lambda q65, k65, v: nomax65_fwd(q65, k65, v, clamp=True))
    f_e = jax.jit(lambda q65, k65, v: nomax65_fwd(q65, k65, v, clamp=False))

    o_c = f_nomax(q, k, v, bias)
    o_d = f_d(q65, k65, v)
    d = float(jnp.max(jnp.abs(o_c.astype(jnp.float32)
                              - o_d.astype(jnp.float32))))
    print(f"max|C-D|={d:.2e}")

    best = {"nomaxC": 1e9, "bias65D": 1e9, "noclampE": 1e9}
    for rep in range(3):
        best["nomaxC"] = min(best["nomaxC"], timeit(f_nomax, q, k, v, bias))
        best["bias65D"] = min(best["bias65D"], timeit(f_d, q65, k65, v))
        best["noclampE"] = min(best["noclampE"], timeit(f_e, q65, k65, v))
    for name, t in best.items():
        print(f"{name:9s} {t * 1e3:7.3f} ms ({best['nomaxC'] / t:.3f}x vs C)")


if __name__ == "__main__":
    # `python tools/softmax_ab.py`   -> A/B/C (old vs exp2 vs no-max)
    # `python tools/softmax_ab.py 2` -> D/E (bias-as-65th-channel, no-clamp)
    #   — the variants behind PERF.md's 0.998x/0.997x dead-end entries
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "2":
        main2()
    else:
        main()
