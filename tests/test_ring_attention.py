"""Ring (sequence-parallel) attention vs dense on the virtual 8-way mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maskunet_tpu.ops import attention
from maskunet_tpu.parallel import ring_attention


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8,), ("seq",))


def _setup(b=2, l=256, c=32, seed=0):
    kp, kx, km = jax.random.split(jax.random.key(seed), 3)
    params = attention.attention_init(kp, c)
    tokens = jax.random.normal(kx, (b, l, c), jnp.float32)
    mask = attention.random_key_mask(km, b, l)
    return params, tokens, mask


def test_ring_matches_dense_forward():
    mesh = _mesh()
    params, tokens, mask = _setup()
    dense = attention.masked_attention_dense(params, tokens, mask)

    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P(None, "seq")))
    ring = jax.jit(lambda p, t: ring_attention.ring_spatial_attention(
        p, t, mask, mesh=mesh))(params, tokens_s)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_ring_no_mask():
    mesh = _mesh()
    params, tokens, _ = _setup(l=128)
    dense = attention.masked_attention_dense(params, tokens, None)
    ring = ring_attention.ring_spatial_attention(params, tokens, None,
                                                 mesh=mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients_match_dense():
    """The sequence-parallel backward (autodiff through ppermute) equals
    the dense gradient."""
    mesh = _mesh()
    params, tokens, mask = _setup(b=1, l=128, c=16)

    def loss_dense(p, t):
        return jnp.sum(jnp.square(
            attention.masked_attention_dense(p, t, mask)))

    def loss_ring(p, t):
        return jnp.sum(jnp.square(
            ring_attention.ring_spatial_attention(p, t, mask, mesh=mesh)))

    gd_p, gd_t = jax.grad(loss_dense, argnums=(0, 1))(params, tokens)
    gr_p, gr_t = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(params, tokens)
    np.testing.assert_allclose(np.asarray(gr_t), np.asarray(gd_t),
                               atol=5e-4, rtol=5e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4),
        gd_p, gr_p)


def test_ring_safe_fully_masked():
    mesh = _mesh()
    params, tokens, _ = _setup(b=2, l=128)
    mask = jnp.zeros((2, 128), bool).at[1].set(True)
    out = ring_attention.ring_spatial_attention(params, tokens, mask,
                                                mesh=mesh)
    assert not np.any(np.isnan(np.asarray(out)))
