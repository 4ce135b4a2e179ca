"""Layer-level numerics vs torch oracles (SURVEY.md §4 unit-parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from maskunet_tpu.core import layers


def _nhwc(t):  # torch NCHW tensor -> numpy NHWC
    return t.detach().permute(0, 2, 3, 1).numpy()


def _randn(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_conv2d_matches_torch(rng):
    x = _randn(rng, 2, 8, 8, 3)
    params = layers.conv2d_init(jax.random.key(0), 3, 16, 3)
    ref = nn.Conv2d(3, 16, 3, padding=1)
    ref.weight.data = torch.from_numpy(
        np.asarray(params["kernel"])).permute(3, 2, 0, 1)
    ref.bias.data = torch.from_numpy(np.asarray(params["bias"]))
    with torch.no_grad():
        expect = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = layers.conv2d(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(expect), atol=1e-5)


def test_batchnorm_matches_torch_train_and_eval(rng):
    x = _randn(rng, 4, 6, 6, 5)
    params, state = layers.batchnorm_init(5)
    ref = nn.BatchNorm2d(5)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref.train()
    with torch.no_grad():
        expect_train = ref(xt)
    got_train, new_state = layers.batchnorm(
        params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got_train), _nhwc(expect_train),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               ref.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               ref.running_var.numpy(), atol=1e-4)

    ref.eval()
    with torch.no_grad():
        expect_eval = ref(xt)
    got_eval, _ = layers.batchnorm(params, new_state, jnp.asarray(x),
                                   train=False)
    np.testing.assert_allclose(np.asarray(got_eval), _nhwc(expect_eval),
                               atol=1e-5)


def test_layernorm_channels(rng):
    x = _randn(rng, 2, 10, 7)
    params = layers.layernorm_init((7,))
    ref = nn.LayerNorm([7])
    with torch.no_grad():
        expect = ref(torch.from_numpy(x))
    got = layers.layernorm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=1e-5)


def test_layernorm_chw_joint(rng):
    """The UNet's LayerNorm([C,H,W]) normalizes space+channels jointly
    (ade_semantic.py:281); NHWC equivalent uses a (H,W,C) affine."""
    x = _randn(rng, 2, 4, 4, 3)
    params = layers.layernorm_init((4, 4, 3))
    params = dict(params)
    params["scale"] = jnp.asarray(_randn(rng, 4, 4, 3))
    params["offset"] = jnp.asarray(_randn(rng, 4, 4, 3))
    ref = nn.LayerNorm([3, 4, 4])
    ref.weight.data = torch.from_numpy(
        np.asarray(params["scale"])).permute(2, 0, 1)
    ref.bias.data = torch.from_numpy(
        np.asarray(params["offset"])).permute(2, 0, 1)
    with torch.no_grad():
        expect = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = layers.layernorm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(expect), atol=1e-5)


def test_maxpool(rng):
    x = _randn(rng, 2, 8, 8, 4)
    with torch.no_grad():
        expect = nn.MaxPool2d(2)(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = layers.max_pool_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(expect), atol=1e-6)


def test_upsample_bilinear_align_corners(rng):
    x = _randn(rng, 2, 5, 7, 3)
    ref = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
    with torch.no_grad():
        expect = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = layers.upsample_2x_bilinear(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _nhwc(expect), atol=1e-5)


def test_gelu_exact(rng):
    x = _randn(rng, 100)
    with torch.no_grad():
        expect = nn.GELU()(torch.from_numpy(x))
    got = layers.gelu(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=1e-6)


def test_linear_matches_torch(rng):
    x = _randn(rng, 3, 11)
    params = layers.linear_init(jax.random.key(1), 11, 7)
    ref = nn.Linear(11, 7)
    ref.weight.data = torch.from_numpy(np.asarray(params["kernel"])).T
    ref.bias.data = torch.from_numpy(np.asarray(params["bias"]))
    with torch.no_grad():
        expect = ref(torch.from_numpy(x))
    got = layers.linear(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=1e-5)


def test_dropout_scaling():
    x = jnp.ones((1000,))
    out = layers.dropout(x, rate=0.3, rng=jax.random.key(0), train=True)
    kept = np.asarray(out) > 0
    assert 0.6 < kept.mean() < 0.8
    np.testing.assert_allclose(np.asarray(out)[kept], 1.0 / 0.7, atol=1e-6)
    out_eval = layers.dropout(x, rate=0.3, rng=None, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))


def test_init_matches_torch_distribution():
    """Conv/linear inits follow torch's U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    p = layers.conv2d_init(jax.random.key(0), 64, 64, 3)
    bound = 1.0 / (64 * 9) ** 0.5
    k = np.asarray(p["kernel"])
    assert k.min() >= -bound and k.max() <= bound
    assert abs(k.std() - bound / 3 ** 0.5) < 0.05 * bound


def test_bf16_gelu_within_bf16_precision():
    """The bf16 tanh-GELU fast path deviates from exact erf-GELU by less
    than bf16's own rounding error."""
    import jax.numpy as jnp

    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    exact = layers.gelu(x)                                   # f32 -> erf
    fast = layers.gelu(x.astype(jnp.bfloat16)).astype(jnp.float32)
    # bf16 eps at |x|<=6 is ~0.008*|x|; allow abs 0.05 to cover rounding
    assert float(jnp.max(jnp.abs(fast - exact))) < 0.05
    # and the tanh approximation itself (f32) is within 4e-3 of erf
    approx = jax.nn.gelu(x, approximate=True)
    assert float(jnp.max(jnp.abs(approx - exact))) < 4e-3
