"""Ring attention: sequence-parallel masked attention over a mesh axis.

The sequence-scaling seam beyond the single-chip blockwise kernel
(SURVEY.md §2.5: not required for parity at 16 k tokens, but the natural
next step): tokens are sharded over a `seq` mesh axis; each device holds
its query shard and streams every key/value shard through an online
(streaming) softmax while the K/V shards rotate around the ring with
`jax.lax.ppermute` (one ICI hop per step, compute overlaps communication
under XLA's scheduler).

Numerics are identical to `ops.attention.masked_attention_dense`
(same safe masked softmax) and the whole thing is plain differentiable
JAX — `jax.grad` through `shard_map` + `ppermute` yields the exact
sequence-parallel backward. Per-device memory is O(Lq_local · Lk_local)
for the running score block, never the full L × L.

Use via `ring_spatial_attention(params, tokens, key_mask, mesh=...,
axis="seq")` which shard_maps the projections + ring core; weights are
replicated, tokens enter sharded on the token axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskunet_tpu.core import layers

NEG_INF = -1e30


def _ring_core(q, k, v, bias, *, scale: float, axis_name: str):
    """Inside shard_map. q: [B, Lq_loc, C]; k/v: [B, Lk_loc, C];
    bias: [B, Lk_loc] additive {0, NEG_INF}. Returns [B, Lq_loc, C]."""
    n = jax.lax.psum(1, axis_name)
    b, lq, c = q.shape
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, _):
        k_c, v_c, bias_c, acc, m, l = carry
        s = jnp.einsum("bqc,bkc->bqk", q, k_c,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias_c[:, None, :]
        valid = bias_c[:, None, :] > NEG_INF * 0.5
        m_i = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_i)
        p = jnp.exp(s - m_new[..., None]) * valid
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = (acc * alpha[..., None] +
                   jnp.einsum("bqk,bkc->bqc", p, v_c.astype(jnp.float32),
                              preferred_element_type=jnp.float32))
        k_n = jax.lax.ppermute(k_c, axis_name, perm)
        v_n = jax.lax.ppermute(v_c, axis_name, perm)
        bias_n = jax.lax.ppermute(bias_c, axis_name, perm)
        return (k_n, v_n, bias_n, acc_new, m_new, l_new), None

    def _vary(x):
        # the non-experimental shard_map tracks varying-axis types: scan
        # carries must match the ppermute outputs' vma set
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, (axis_name,), to="varying")
        if hasattr(jax.lax, "pvary"):   # pragma: no cover - jax < 0.7
            return jax.lax.pvary(x, axis_name)
        return x

    init = (k, v, bias,
            _vary(jnp.zeros((b, lq, c), jnp.float32)),
            _vary(jnp.full((b, lq), NEG_INF, jnp.float32)),
            _vary(jnp.zeros((b, lq), jnp.float32)))
    (_, _, _, acc, m, l), _ = jax.lax.scan(body, init, None, length=n)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          key_mask: jax.Array | None, *, mesh: Mesh,
                          axis: str = "seq",
                          scale: float | None = None) -> jax.Array:
    """q/k/v: [B, L, C] (token axis sharded over `axis` or shardable);
    key_mask: [B, L] bool or None. Returns [B, L, C] sharded likewise."""
    b, l, c = q.shape
    scale = scale if scale is not None else 1.0 / (c ** 0.5)
    if key_mask is None:
        bias = jnp.zeros((b, l), jnp.float32)
    else:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)

    seq_spec = P(None, axis, None)
    shard_core = functools.partial(_ring_core, scale=scale,
                                   axis_name=axis)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        lambda q_, k_, v_, b_: shard_core(q_, k_, v_, b_),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(None, axis)),
        out_specs=seq_spec,
    )
    return fn(q, k, v, bias)


def ring_spatial_attention(params: dict, tokens: jax.Array,
                           key_mask: jax.Array | None, *, mesh: Mesh,
                           axis: str = "seq") -> jax.Array:
    """Full attention block (projections + ring core + residual +
    LayerNorm), sequence-parallel over `axis`. Projections/LayerNorm are
    elementwise over tokens so they stay in sharded form; weights are
    replicated by GSPMD."""
    c = tokens.shape[-1]
    q = layers.linear(params["query"], tokens)
    k = layers.linear(params["key"], tokens)
    v = layers.linear(params["value"], tokens)
    out = ring_masked_attention(q, k, v, key_mask, mesh=mesh, axis=axis,
                                scale=1.0 / (c ** 0.5))
    out = out + tokens
    return layers.layernorm(params["norm"], out)
