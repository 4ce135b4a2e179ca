"""Masked single-head self-attention over flattened spatial tokens.

Re-implements the behavior of the reference's `Mask2FormerAttention`
(ade_semantic.py:152-190): x:[B,C,H,W] -> tokens [B,HW,C]; Q,K,V = three
Linear(C,C); scores = QK^T/sqrt(C); an additive *key* mask (0 where a key
position is kept, -inf where dropped) broadcast over queries; softmax; @V;
residual add; LayerNorm over C.

Differences from the reference, by design (documented policy decisions):
- The binary key mask is an explicit input (generated from a threaded PRNG
  key, see `random_key_mask`) instead of `torch.randint` captured and cached
  on the module (ade_semantic.py:177-181). This keeps the op jit-pure and
  fixes the reference's frozen-batch-dim caching bug (a smaller final batch
  breaks the cached mask). The reference's run-long mask caching is
  reproduced at the training-loop level by reusing one mask pytree.
- Softmax is the safe masked form: a fully-masked row yields zeros rather
  than NaN (cannot occur with Bernoulli(0.5) masks over >=256 keys, but the
  kernel must not be able to poison training).

Two implementations with identical semantics:
- `masked_attention_dense` (here): XLA-fused dense scores — fine up to ~4k
  tokens, used for CPU tests and as the numerics oracle.
- `masked_flash_attention` (ops/flash_attention.py): Pallas blockwise
  streaming-softmax kernel — never materializes the L x L score matrix
  (attn6 is 16,384 tokens: dense scores would be 1 GiB/sample,
  ade_semantic.py:309-310).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maskunet_tpu.core import layers

NEG_INF = -1e30


def attention_init(key: jax.Array, channels: int) -> dict:
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "query": layers.linear_init(kq, channels, channels),
        "key": layers.linear_init(kk, channels, channels),
        "value": layers.linear_init(kv, channels, channels),
        "norm": layers.layernorm_init((channels,)),
    }


def random_key_mask(rng: jax.Array, batch: int, num_tokens: int) -> jax.Array:
    """Bernoulli(0.5) keep-mask per (batch, key position) — the explicit,
    RNG-keyed equivalent of the reference's `torch.randint(0, 2, ...)`
    (ade_semantic.py:178). True = key visible, False = masked out."""
    return jax.random.bernoulli(rng, 0.5, (batch, num_tokens))


def masked_softmax(scores: jax.Array, key_mask: jax.Array | None) -> jax.Array:
    """Numerically safe softmax over the last axis with a boolean key mask.

    Equivalent to adding -inf at masked keys pre-softmax, except a
    fully-masked row produces zeros instead of NaN.
    """
    if key_mask is not None:
        mask = key_mask[:, None, :]  # [B, 1, Lk] broadcast over queries
        scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m))
    if key_mask is not None:
        e = jnp.where(key_mask[:, None, :], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def masked_attention_dense(params: dict, tokens: jax.Array,
                           key_mask: jax.Array | None) -> jax.Array:
    """tokens: [B, L, C]; key_mask: [B, L] bool or None. Returns [B, L, C]."""
    c = tokens.shape[-1]
    q = layers.linear(params["query"], tokens)
    k = layers.linear(params["key"], tokens)
    v = layers.linear(params["value"], tokens)
    scores = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) / (c ** 0.5)
    weights = masked_softmax(scores, key_mask).astype(tokens.dtype)
    out = jnp.einsum("bqk,bkc->bqc", weights, v,
                     preferred_element_type=jnp.float32).astype(tokens.dtype)
    out = out + tokens
    return layers.layernorm(params["norm"], out)


def spatial_attention(params: dict, x: jax.Array,
                      key_mask: jax.Array | None, *,
                      impl: str = "dense", mesh=None,
                      plan=None,
                      output_layout: str = "transpose") -> jax.Array:
    """Apply masked attention to an NHWC feature map (flatten -> attend ->
    unflatten), dispatching to the dense or Pallas implementation.
    `mesh` (flash only): batch-shard the Pallas kernel over the mesh's
    'data' axis via shard_map. `plan` (flash only): precomputed
    `flash_attention.plan_compaction(key_mask)` for run-cached masks.

    `output_layout`: how the [B, L, C] attention output maps back to a
    feature map. 'transpose' is the intended inverse of the flatten;
    'literal_view' reproduces the reference's raw NCHW `.view(B, C, H, W)`
    memory reinterpret (ade_semantic.py:190) that scrambles channels
    across space — see MaskAttnUNetConfig.attn_output_layout."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    if impl == "flash":
        from maskunet_tpu.ops import flash_attention
        out = flash_attention.masked_attention_flash(params, tokens,
                                                     key_mask, mesh=mesh,
                                                     plan=plan)
    else:
        out = masked_attention_dense(params, tokens, key_mask)
    if output_layout == "literal_view":
        # row-major [B, L, C] buffer relabeled [B, C, H, W], then back to
        # our NHWC convention — bit-identical to the reference's .view()
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    if output_layout != "transpose":
        raise ValueError(f"unknown output_layout: {output_layout!r}")
    return out.reshape(b, h, w, c)
