"""Pallas blockwise masked attention (flash-style) for TPU.

TPU-native replacement for the reference's dense masked attention
(ade_semantic.py:174-186): instead of materializing the [L, L] score matrix
(1 GiB fp32 per sample at L=16384 — the reference's single biggest
memory/compute consumer, SURVEY.md §2.1), this kernel streams key/value
blocks through VMEM with an online (streaming) softmax, so HBM traffic is
O(L*C) and the MXU sees large [BQ, C] x [C, BK] tiles.

Semantics match `ops.attention.masked_attention_dense` exactly (same safe
masked softmax: fully-masked query rows produce zeros, not NaN). The binary
key mask enters as an additive f32 bias in {0, -1e30} per (batch, key).

Forward + backward are both Pallas kernels (flash-attention-2 style
recomputation), wired up with jax.custom_vjp so the 16k-token layer is
trainable within v5e HBM at useful batch sizes.

All kernels work in base-2 score space (pow2 is the TPU's native
transcendental; log2e folds into the q block, and the chain-rule factors
cancel in the backward). The default forward skips the online max
entirely — a static clamp at 2^60 makes f32 overflow impossible — which
removed ~1/5 of the 16k-token kernel's time (PERF.md r3);
MASKUNET_SAFE_SOFTMAX=1 restores the online-max kernel.

Grid layouts: forward (B, nQ, nK) with the K dimension sequential
("arbitrary") carrying accumulator state in VMEM scratch; backward is ONE
merged kernel over (B, nK, nQ) that computes the score/softmax blocks
once — dK/dV accumulate in scratch, dQ partial blocks stream out and one
XLA sum reduces them over nK.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskunet_tpu.core import layers

NEG_INF = -1e30
_LOG2E = 1.4426950408889634          # 1/ln(2): natural-base -> base-2 scores
# No-online-max forward (inference): clamp base-2 scores so exp2 cannot
# overflow f32 even summed over 16k keys (2^60 * 16384 = 2^74 << 2^128).
# Engages only beyond natural score ~41.6 — unreachable for LayerNormed
# activations (trained nets observe |s| < ~30); see test_flash_nomax_*.
_NOMAX_CLAMP = 60.0
_INTERPRET = None  # resolved lazily: interpret mode off-TPU (CPU tests)


def _interpret_mode() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


# Tuned on TPU v5e (tools/attn_microbench.py sweeps, r1+r2): forward
# BQ=4096/BK=1024 runs the 16,384-token layer at ~44 TF/s — r2 re-sweep
# under the 64 MB VMEM budget: 4096/1024 6.94 ms vs 2048/1024 7.04,
# 8192/1024 7.32, 4096/512 9.5, 16384/512 11.0 (BK below 1024 starves
# the MXU; giant BQ hurts pipelining). The backward kernels hold more
# [BQ, BK] temporaries (s, p, dp, ds); 1024/1024 measured best there
# (2048/1024 equal, 2048/512 worse, BK=2048 fails). Env knobs override.
_BQ_DEFAULT = int(os.environ.get("MASKUNET_FLASH_BQ", "4096"))
_BK_DEFAULT = int(os.environ.get("MASKUNET_FLASH_BK", "1024"))
_BQ_BWD = int(os.environ.get("MASKUNET_FLASH_BQ_BWD", "1024"))
_BK_BWD = int(os.environ.get("MASKUNET_FLASH_BK_BWD", "1024"))
# Scoped-VMEM budget for the kernels: the default 16 MB limit is exceeded
# by ~120 KB at BQ=2048/BK=1024 with some layouts; v5e has 128 MB of
# VMEM, so grant 64 MB headroom (still leaves half for the pipeline).
_VMEM_LIMIT = int(os.environ.get("MASKUNET_FLASH_VMEM", str(64 * 2**20)))
# dQ partial-block dtype for the merged backward (0 = f32, 1 = input
# dtype): measured equal on the train bench (the partial traffic is not
# the bottleneck), so the extra-precision f32 default stands.
_BWD_PARTIALS_BF16 = os.environ.get("MASKUNET_BWD_PARTIALS_BF16", "0") == "1"


def _pick_block(l: int, preferred: int) -> int:
    for b in (preferred, 2048, 1024, 512, 256, 128):
        if b <= l and l % b == 0:
            return b
    return l


def _block_sizes(lq: int, lk: int, dtype, *,
                 bwd: bool = False) -> tuple[int, int]:
    if bwd:
        return _pick_block(lq, _BQ_BWD), _pick_block(lk, _BK_BWD)
    bq = _BQ_DEFAULT
    if lq < 8192:
        # BQ=4096 wins on the 16k layer but regresses the 4k layers
        # (nq=1 leaves no q-block pipeline: 1.81 vs 1.72 ms measured)
        bq = min(bq, 2048)
    if dtype == jnp.float32 and bq > 1024:
        # f32 q/k/v/o blocks + the f32 [BQ, BK] score/prob temporaries
        # exceed the 16 MB scoped-VMEM budget at BQ=2048 (measured
        # 21.7 MB); bf16 inputs fit.
        bq = 1024
    return _pick_block(lq, bq), _pick_block(lk, _BK_DEFAULT)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                acc_sc, m_sc, l_sc, *, scale: float, nk: int,
                use_valid: bool = True):
    """Online-softmax forward in base-2: pow2 is the native TPU
    transcendental, so exp(x) = exp2(x*log2e) with log2e folded into the
    [BQ, C] q block (64/1024 the cost of folding it into the [BQ, BK]
    scores). The additive {0, -1e30} bias needs no rescaling: -1e30
    underflows exp2 to exact zero just like exp."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)

    q = q_ref[0] * (scale * _LOG2E)    # [BQ, C]; base-2 score scaling
    k = k_ref[0]                       # [BK, C]
    v = v_ref[0]                       # [BK, C]
    bias = bias_ref[0]                 # [1, BK] in {0, NEG_INF}

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [BQ, BK] base-2
    s = s + bias                                        # broadcast over rows

    m_prev = m_sc[:, :1]                                # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    if use_valid:
        # exact zeros for masked keys even in all-masked rows; when every
        # row is guaranteed >=1 visible key (compacted path), exp2
        # underflow of s-1e30-m already yields exact zeros and this
        # [BQ, BK] multiply is skipped
        p = p * (bias > NEG_INF * 0.5)
    alpha = jnp.exp2(m_prev - m_new)
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
        # base-2 lse for backward; NEG_INF rows (all keys masked) stay
        # harmless.
        lse_ref[0] = (m_sc[:, :1] + jnp.log2(jnp.maximum(l_fin, 1e-30))).T


def _fwd_kernel_nomax(q_ref, k_ref, v_ref, bias_ref, o_ref, *rest,
                      scale: float, nk: int, use_valid: bool = True,
                      with_lse: bool = False):
    """Inference-only forward without the online-max bookkeeping.

    The running max exists to keep exp in f32 range; in base-2 a static
    clamp at 2^60 guarantees that outright (sum over 16k keys stays
    < 2^74, acc products < 2^90 — far inside f32's 2^128). Mathematically
    out = acc/l is invariant to the missing max shift, so results match
    the safe kernel except when a base-2 score exceeds 60 (natural ~41.6
    — see _NOMAX_CLAMP). Drops per k-block: the [BQ, BK] max-reduce, the
    [BQ, BK] subtract, the alpha rescale chain, and the m scratch —
    roughly 2 of the ~6 VPU passes over the score block, on the layer
    where PERF.md attributes ~half of kernel time to VPU softmax work.

    `with_lse=True` additionally emits base-2 lse = log2(l) for the
    backward — mathematically the same quantity the online-max kernel
    produces (m + log2(l_shifted)), valid whenever the clamp did not
    engage; this makes the fast kernel usable as the TRAINING forward
    (MASKUNET_SAFE_SOFTMAX=1 restores the online-max kernel)."""
    if with_lse:
        lse_ref, acc_sc, l_sc = rest
    else:
        acc_sc, l_sc = rest
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        l_sc[:] = jnp.zeros_like(l_sc)

    q = q_ref[0] * (scale * _LOG2E)
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [BQ, BK] base-2
    p = jnp.exp2(jnp.minimum(s + bias, _NOMAX_CLAMP))
    if use_valid:
        p = p * (bias > NEG_INF * 0.5)
    l_sc[:] += jnp.broadcast_to(jnp.sum(p, axis=-1, keepdims=True),
                                l_sc.shape)
    acc_sc[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        l_fin = l_sc[:, :1]
        o_ref[0] = (acc_sc[:] /
                    jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = jnp.log2(jnp.maximum(l_fin, 1e-30)).T


# MASKUNET_SAFE_SOFTMAX=1: training forward uses the online-max kernel
# instead of the clamped no-max kernel (debug/fallback; semantics differ
# only when a base-2 score exceeds _NOMAX_CLAMP).
_SAFE_SOFTMAX = os.environ.get("MASKUNET_SAFE_SOFTMAX", "0") == "1"


def _flash_fwd(q, k, v, bias, scale, use_valid=True, *,
               need_lse: bool = True):
    """`need_lse=False` is the primal/inference path (no lse output).
    With `need_lse=True` (the custom-vjp fwd rule) the default is still
    the fast no-max kernel, now emitting lse = log2(l).
    MASKUNET_SAFE_SOFTMAX=1 switches BOTH paths (inference included) to
    the online-max kernel."""
    b, lq, c = q.shape
    lk = k.shape[1]
    bq, bk = _block_sizes(lq, lk, q.dtype)
    nq, nk = lq // bq, lk // bk
    grid = (b, nq, nk)
    qspec = pl.BlockSpec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0))
    kspec = pl.BlockSpec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0))
    bspec = pl.BlockSpec((1, 1, bk), lambda ib, iq, ik: (ib, 0, ik))
    lspec = pl.BlockSpec((1, 1, bq), lambda ib, iq, ik: (ib, 0, iq))
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT)
    if not need_lse and not _SAFE_SOFTMAX:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_nomax, scale=scale, nk=nk,
                              use_valid=use_valid),
            grid=grid,
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((b, lq, c), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, c), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
            compiler_params=params,
            interpret=_interpret_mode(),
        )(q, k, v, bias)
        return out, None
    # MASKUNET_SAFE_SOFTMAX=1 swaps the PRIMAL/inference kernel too (not
    # just the vjp fwd rule) — otherwise the knob could not A/B suspected
    # clamp saturation in eval/serving outputs; the online-max kernel
    # below runs and its lse is simply unused when need_lse=False.
    if not _SAFE_SOFTMAX:
        out, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_nomax, scale=scale, nk=nk,
                              use_valid=use_valid, with_lse=True),
            grid=grid,
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=[qspec, lspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, lq, c), q.dtype),
                jax.ShapeDtypeStruct((b, 1, lq), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, c), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
            compiler_params=params,
            interpret=_interpret_mode(),
        )(q, k, v, bias)
        return out, lse
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk,
                          use_valid=use_valid),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=[qspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, c), q.dtype),
            jax.ShapeDtypeStruct((b, 1, lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=params,
        interpret=_interpret_mode(),
    )(q, k, v, bias)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _scores_base2(q, k, bias, scale):
    """Base-2 scores: log2e folds into the [BQ, C] q block (cheap), the
    {0, -1e30} bias needs no rescaling (underflows exp2 to zero either
    way). p = exp2(s2 - lse2) equals the natural-base softmax weights,
    and the ln2/log2e chain-rule factors cancel exactly in ds@k / ds.T@q
    when ds is computed WITHOUT the ln2 factor and the dk matmul uses the
    RAW q — see the derivation in _dkv_kernel."""
    s = jax.lax.dot_general(q * (scale * _LOG2E), k,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s + bias


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dqp_ref, dk_ref, dv_ref, dk_sc, dv_sc, *, scale: float,
                nq: int, use_valid: bool = True, clamp: bool = True):
    """Merged backward: ONE pass over the [Lq, Lk] score space.

    The r2 backward ran two kernels (dq over (B,nQ,nK), dk/dv over
    (B,nK,nQ)) that EACH recomputed s = QK^T and p = exp2(s - lse) — the
    score matmul and the exp were done twice on top of the forward
    (VERDICT r2 weak #2). Here grid (B, nK, nQ) computes s/p/dp once:
    dK/dV accumulate in VMEM scratch over the sequential nQ sweep
    (written at iq == nq-1), while per-(ik, iq) dQ partial blocks stream
    to a [B, nK, Lq, C] output that one XLA sum reduces over nK —
    5 [BQ,BK]-shaped matmuls + 1 exp pass instead of 7 + 2.
    """
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]                      # [BQ, C]
    lse = lse_ref[0].T                  # [BQ, 1] base-2
    delta = delta_ref[0].T              # [BQ, 1]
    bias = bias_ref[0]

    # Chain rule in base-2: s2 = (q*scale*log2e)@k.T + bias, and
    # dL/ds2 = ln2 * p * (dp - delta). Then
    #   dq = dL/ds2 @ (k*scale*log2e) = scale * (p*(dp-delta)) @ k
    #   dk = (dL/ds2).T @ (q*scale*log2e) = scale * (p*(dp-delta)).T @ q
    # -- the ln2*log2e products cancel, so computing ds WITHOUT ln2 and
    # contracting against the RAW q/k reproduces the natural-base
    # gradients exactly (no extra [BQ, BK] multiply).
    s = _scores_base2(q, k, bias, scale)
    if clamp:
        # mirror the no-max forward's overflow clamp: without it, a
        # score past _NOMAX_CLAMP (possible transiently at high lr)
        # makes exp2(s - lse) overflow HERE even though the forward
        # stayed finite — observed as train-loss NaN. Clamped entries
        # reproduce the forward's saturated p exactly. (The online-max
        # forward needs NO clamp — its lse contains the true max — and
        # must not get one: lse can legitimately exceed the clamp.)
        s = jnp.minimum(s, _NOMAX_CLAMP)
    p = jnp.exp2(s - lse)                                          # [BQ, BK]
    if use_valid:
        p = p * (bias > NEG_INF * 0.5)
    dv_sc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                        # [BK, C]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [BQ, BK]
    ds = p * (dp - delta)                                          # [BQ, BK]
    dsc = ds.astype(q.dtype)
    dk = jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_sc[:] += dk * scale if scale != 1.0 else dk
    dq = jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                        # [BQ, C]
    dqp_ref[0, 0] = (dq * scale if scale != 1.0 else dq).astype(dqp_ref.dtype)

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_sc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, bias, o, lse, do, scale, use_valid=True):
    b, lq, c = q.shape
    lk = k.shape[1]
    bq, bk = _block_sizes(lq, lk, q.dtype, bwd=True)
    nq, nk = lq // bq, lk // bk
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=False)[:, None, :]      # [B, 1, L]

    dqp, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, nq=nq,
                          use_valid=use_valid, clamp=not _SAFE_SOFTMAX),
        grid=(b, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, 1, bk), lambda ib, ik, iq: (ib, 0, ik)),
            pl.BlockSpec((1, bq, c), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, 1, bq), lambda ib, ik, iq: (ib, 0, iq)),
            pl.BlockSpec((1, 1, bq), lambda ib, ik, iq: (ib, 0, iq)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, c), lambda ib, ik, iq: (ib, ik, iq, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
        ],
        out_shape=[
            # f32 partials: the ~300 MB round-trip at attn6 scale costs
            # well under 1 ms of HBM time vs the ~2 matmul + 1 exp passes
            # the merge saves; bf16 partials would halve that traffic at
            # an extra rounding step (env knob below for A/B)
            jax.ShapeDtypeStruct(
                (b, nk, lq, c),
                q.dtype if _BWD_PARTIALS_BF16 else jnp.float32),
            jax.ShapeDtypeStruct((b, lk, c), k.dtype),
            jax.ShapeDtypeStruct((b, lk, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, c), jnp.float32),
            pltpu.VMEM((bk, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret_mode(),
    )(q, k, v, bias, do, lse, delta)
    dq = jnp.sum(dqp, axis=1).astype(q.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_mha(q, k, v, bias, scale, use_valid=True):
    """use_valid=False skips the explicit masked-key zeroing (exp2
    underflow of the -1e30 bias already yields exact zeros) — only legal
    when every batch row has >=1 visible key (the compacted path
    guarantees it; compact_keys NaN-poisons empty masks).

    The primal (inference / no-grad eval) runs the no-online-max kernel
    (`_fwd_kernel_nomax`): fewer VPU passes, no lse output. Under
    differentiation the fwd rule runs the same kernel with the base-2
    lse = log2(l) emitted for the backward (MASKUNET_SAFE_SOFTMAX=1
    swaps in the online-max kernel)."""
    out, _ = _flash_fwd(q, k, v, bias, scale, use_valid, need_lse=False)
    return out


def _fwd_rule(q, k, v, bias, scale, use_valid):
    out, lse = _flash_fwd(q, k, v, bias, scale, use_valid)
    return out, (q, k, v, bias, out, lse)


def _bwd_rule(scale, use_valid, res, do):
    q, k, v, bias, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, bias, out, lse, do, scale,
                            use_valid)
    return dq, dk, dv, None


flash_mha.defvjp(_fwd_rule, _bwd_rule)


def mask_to_bias(key_mask: jax.Array | None, batch: int,
                 l: int) -> jax.Array:
    """Boolean keep-mask [B, L] -> additive f32 bias [B, 1, L] in
    {0, NEG_INF} (3D so the block minor-most dims tile legally)."""
    if key_mask is None:
        return jnp.zeros((batch, 1, l), jnp.float32)
    return jnp.where(key_mask[:, None, :], 0.0, NEG_INF).astype(jnp.float32)


def _key_capacity(l: int, density: float = 0.5) -> int:
    """Compacted key count for a Bernoulli(density) mask over l keys:
    the mean kept count plus an 8-sigma safety margin, rounded up to the
    512 kernel block."""
    import math

    margin = 8 * int(math.sqrt(l * density * (1.0 - density))) + 1
    cap = int(math.ceil(l * density)) + margin
    return min(l, -(-cap // 512) * 512)


COMPACT_MIN_TOKENS = 4096


class CompactPlan(NamedTuple):
    """Mask-derived compaction indices, computable once per cached mask.

    The model's key masks are generated ONCE and reused for the whole run
    (the reference caches its random mask the same way,
    ade_semantic.py:177-181), but a mask passed as a traced jit argument
    re-runs the cumsum+scatter slot assignment every step. A CompactPlan
    is that slot assignment precomputed outside the step graph — the
    per-step work drops to the two K/V gathers. Derived data: always
    recompute from the masks actually in use (never checkpointed)."""
    idx: jax.Array    # [B, cap] int32: source position of each slot
    valid: jax.Array  # [B, cap] bool: slot < kept-count
    bad: jax.Array    # [B, 1] bool: overflow/empty rows (NaN-poisoned)


def plan_compaction(key_mask: jax.Array, *,
                    density: float = 0.5) -> CompactPlan:
    """Slot assignment for `compact_keys`: which source key feeds each
    compacted slot, which slots are valid, which rows are poisoned.

    Pure function of the mask — jittable (the in-graph fallback for the
    'fresh' mask policy) and precomputable (the 'cached' policy)."""
    b, l = key_mask.shape
    cap = _key_capacity(l, density)
    # stable partition via cumsum + scatter (argsort is a multi-pass
    # bitonic network on TPU — this is one cumsum and one scatter)
    ones = key_mask.astype(jnp.int32)
    pos = jnp.cumsum(ones, axis=1) - 1            # target slot if kept
    slot = jnp.where(key_mask, jnp.minimum(pos, cap), cap)  # drop -> bucket
    src = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None], (b, l))
    idx = jnp.zeros((b, cap + 1), jnp.int32)
    idx = idx.at[jnp.arange(b)[:, None], slot].set(src)[:, :cap]
    total = jnp.sum(ones, axis=1, keepdims=True)
    # poison overflow (denser mask than declared) AND empty masks (the
    # compacted kernel path skips explicit masked-key zeroing, which is
    # only exact when >=1 key is visible) — wrong output must be loud
    bad = (total > cap) | (total == 0)             # [B, 1]
    count = jnp.minimum(total, cap)
    valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < count
    return CompactPlan(idx=idx, valid=valid, bad=bad)


def compact_keys(k: jax.Array, v: jax.Array, key_mask: jax.Array, *,
                 density: float = 0.5, plan: CompactPlan | None = None
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gather only the visible keys (the ~50% a Bernoulli(0.5) mask keeps)
    into a fixed-capacity buffer. Masked keys receive exactly zero
    attention weight, so dropping them is a pure FLOP/bandwidth saving —
    it halves the dominant QK^T/PV matmuls and the softmax work of the
    16k-token layers.

    `density` declares the caller's expected keep fraction; capacity is
    mean + 8 sigma for that density (overflow probability < 1e-15 for a
    true Bernoulli mask). If the actual mask keeps MORE keys than the
    capacity (a denser mask than declared), the overflowing rows are
    NaN-poisoned rather than silently truncated — wrong attention output
    must be loud.

    `plan`: precomputed `plan_compaction(key_mask)` for run-cached masks
    (MUST be derived from this same `key_mask`); None recomputes it
    in-graph, paying the cumsum+scatter every step.
    """
    if plan is None:
        plan = plan_compaction(key_mask, density=density)
    k_c = jnp.take_along_axis(k, plan.idx[..., None], axis=1)
    v_c = jnp.take_along_axis(v, plan.idx[..., None], axis=1)
    k_c = jnp.where(plan.bad[..., None], jnp.nan, k_c)
    return k_c, v_c, plan.valid


def _flash_mha_sharded(q, k, v, bias, scale, mesh, data_axis="data",
                       use_valid=True):
    """Run the Pallas kernel under an explicit batch-sharded shard_map.

    GSPMD cannot partition a pallas_call on its own — under a jit'd mesh
    it would replicate the kernel (or fail to partition), silently
    wasting every chip but one. shard_map splits the batch over the
    `data` axis so each device runs the kernel on its local shard; axes
    not named (e.g. a 'model' TP axis) see replicated execution.
    """
    from jax.sharding import PartitionSpec as P

    spec = P(data_axis, None, None)
    # positional closure: custom_vjp functions reject keyword args
    fn = lambda q_, k_, v_, b_: flash_mha(  # noqa: E731
        q_, k_, v_, b_, scale, use_valid)
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v, bias)


def masked_attention_flash(params: dict, tokens: jax.Array,
                           key_mask: jax.Array | None, *,
                           mask_density: float | None = 0.5,
                           mesh=None, data_axis: str = "data",
                           plan: CompactPlan | None = None) -> jax.Array:
    """Drop-in replacement for `masked_attention_dense` using the Pallas
    kernel: projections and the residual+LayerNorm epilogue stay in XLA
    (fused into neighbors); only the O(L^2) core runs in Pallas. Large
    masked layers additionally compact K/V to the visible keys first.

    `mask_density` is the expected keep fraction of `key_mask` (the
    model's masks are Bernoulli(0.5)); pass None to disable compaction
    for masks with no density guarantee. A mask denser than declared
    NaN-poisons the affected rows instead of silently dropping keys.

    `mesh`: a jax.sharding.Mesh with a `data_axis` axis — the Pallas
    core then runs under shard_map with the batch partitioned over that
    axis (required for multi-chip DP: GSPMD won't partition pallas_call
    by itself). Projections/epilogue stay plain XLA (GSPMD handles
    them).

    `plan`: precomputed `plan_compaction(key_mask)` when the mask is
    cached for the run — skips the per-step cumsum+scatter. Must be
    derived from this exact `key_mask`."""
    b, l, c = tokens.shape
    # One fused [C, 3C] projection instead of three [C, C] matmuls: at
    # C=64 the separate projections use half the MXU's output lanes;
    # fused they fill 192. The 1/sqrt(C) score scale is folded into the
    # Q slice: one fewer [BQ, BK] VPU multiply per block in the forward
    # and both backward kernels (autodiff routes it into dQ here).
    wqkv = jnp.concatenate([params["query"]["kernel"],
                            params["key"]["kernel"],
                            params["value"]["kernel"]],
                           axis=1).astype(tokens.dtype)
    bqkv = jnp.concatenate([params["query"]["bias"],
                            params["key"]["bias"],
                            params["value"]["bias"]]).astype(tokens.dtype)
    qkv = jnp.dot(tokens, wqkv) + bqkv
    q = qkv[..., :c] * (1.0 / (c ** 0.5))
    k = qkv[..., c:2 * c]
    v = qkv[..., 2 * c:]
    use_valid = True
    if (key_mask is not None and mask_density is not None
            and l >= COMPACT_MIN_TOKENS):
        k, v, key_mask = compact_keys(k, v, key_mask,
                                      density=mask_density, plan=plan)
        # compaction guarantees >=1 visible key per row (empty masks are
        # NaN-poisoned), so exp underflow of the -1e30 bias zeroes masked
        # keys exactly and the explicit valid multiply can be skipped
        use_valid = False
    bias = mask_to_bias(key_mask, b, k.shape[1])
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        out = _flash_mha_sharded(q, k, v, bias, 1.0, mesh, data_axis,
                                 use_valid)
    else:
        out = flash_mha(q, k, v, bias, 1.0, use_valid)
    out = out + tokens
    return layers.layernorm(params["norm"], out)
