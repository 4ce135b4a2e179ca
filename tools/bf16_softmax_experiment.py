"""Experiment: bf16 score/prob matrices inside the flash forward kernel.

The [BQ, BK] s/p tensors dominate the kernel's VPU work (max, exp, sum,
mul); bf16 elementwise ops run up to 2x on the VPU and halve the VMEM
footprint. bf16's exponent range still represents the -1e30 mask bias, so
masked keys underflow to exact zero as in the f32 kernel. Accuracy cost:
attention weights quantized to ~0.4% — below the bf16 rounding already on
V. This script times the variant against the production kernel and
reports the output deviation vs the f32 dense reference.

    python tools/bf16_softmax_experiment.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskunet_tpu.ops import attention, flash_attention as fa


def _fwd_kernel_bf16(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                     acc_sc, m_sc, l_sc, *, nk: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, jnp.bfloat16(-1e30))
        l_sc[:] = jnp.zeros_like(l_sc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0].astype(jnp.bfloat16)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)                              # [BQ, BK] -> bf16
    s = s + bias

    m_prev = m_sc[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                              # bf16 exp
    alpha = jnp.exp((m_prev - m_new).astype(jnp.float32))
    l_new = alpha * l_sc[:, :1] + jnp.sum(
        p, axis=-1, keepdims=True, dtype=jnp.float32)
    acc_sc[:] = acc_sc[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
    l_sc[:] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(ik == nk - 1)
    def _():
        l_fin = l_sc[:, :1]
        o_ref[0] = (acc_sc[:] / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)
        lse_ref[0] = (m_sc[:, :1].astype(jnp.float32)
                      + jnp.log(jnp.maximum(l_fin, 1e-30))).T


def flash_fwd_bf16(q, k, v, bias):
    b, lq, c = q.shape
    lk = k.shape[1]
    bq, bk = fa._block_sizes(lq, lk, q.dtype)
    nq, nk = lq // bq, lk // bk
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bf16, nk=nk),
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
            pltpu.VMEM((bq, 128), jnp.bfloat16),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=fa._VMEM_LIMIT),
        interpret=fa._interpret_mode(),
    )(q, k, v, bias)
    return out, lse


def timeit(fn, *args, steps=30, repeats=3):
    """block_until_ready through the axon tunnel intermittently returns
    early (see memory: tpu-tunnel-benchmarking); a scalar host fetch is
    the reliable fence."""
    float(fn(*args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3


def main():
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()

    batch, l, c = 8, 16384, 64
    key = jax.random.key(0)
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, l, c), jnp.bfloat16) * 0.125
    mask = attention.random_key_mask(km, batch, l)
    k_, v_, mask_c = fa.compact_keys(
        jax.random.normal(kk, (batch, l, c), jnp.bfloat16),
        jax.random.normal(kv, (batch, l, c), jnp.bfloat16), mask)
    bias = fa.mask_to_bias(mask_c, batch, k_.shape[1])

    cur = jax.jit(lambda q, k, v, b: fa.flash_mha(q, k, v, b, 1.0, False))
    new = jax.jit(lambda q, k, v, b: flash_fwd_bf16(q, k, v, b)[0])
    cur_sum = jax.jit(lambda q, k, v, b: jnp.sum(
        fa.flash_mha(q, k, v, b, 1.0, False).astype(jnp.float32)))
    new_sum = jax.jit(lambda q, k, v, b: jnp.sum(
        flash_fwd_bf16(q, k, v, b)[0].astype(jnp.float32)))

    t_cur = timeit(cur_sum, q, k_, v_, bias)
    t_new = timeit(new_sum, q, k_, v_, bias)

    o_cur = np.asarray(cur(q, k_, v_, bias), np.float32)
    o_new = np.asarray(new(q, k_, v_, bias), np.float32)
    scale = np.abs(o_cur).max()
    dev = np.abs(o_new - o_cur).max()
    print(f"f32-softmax kernel: {t_cur:.3f} ms")
    print(f"bf16-softmax kernel: {t_new:.3f} ms "
          f"(speedup {t_cur / t_new:.3f}x)")
    print(f"max |delta| {dev:.2e} (output scale {scale:.2e}, "
          f"rel {dev / scale:.2e})")


if __name__ == "__main__":
    main()
