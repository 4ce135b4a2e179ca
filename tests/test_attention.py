"""Masked attention: dense-vs-flash parity, gradients, and torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskunet_tpu.core import layers
from maskunet_tpu.ops import attention, flash_attention


def _setup(b=2, l=256, c=64, seed=0):
    key = jax.random.key(seed)
    kp, kx, km = jax.random.split(key, 3)
    params = attention.attention_init(kp, c)
    tokens = jax.random.normal(kx, (b, l, c), jnp.float32)
    mask = attention.random_key_mask(km, b, l)
    return params, tokens, mask


@pytest.mark.parametrize("l,c", [(256, 64), (512, 128), (1024, 64)])
def test_flash_matches_dense(l, c):
    params, tokens, mask = _setup(l=l, c=c)
    dense = attention.masked_attention_dense(params, tokens, mask)
    flash = flash_attention.masked_attention_flash(params, tokens, mask)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_flash_no_mask():
    params, tokens, _ = _setup()
    dense = attention.masked_attention_dense(params, tokens, None)
    flash = flash_attention.masked_attention_flash(params, tokens, None)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_fully_masked_row_is_safe():
    """A fully-masked batch element must produce zeros (pre-residual), not
    NaN — divergence from the reference (which would NaN) by design."""
    params, tokens, _ = _setup(b=2, l=256, c=64)
    mask = jnp.zeros((2, 256), bool).at[1].set(True)
    for fn in (attention.masked_attention_dense,
               flash_attention.masked_attention_flash):
        out = fn(params, tokens, mask)
        assert not np.any(np.isnan(np.asarray(out)))


def test_flash_grads_match_dense():
    params, tokens, mask = _setup(b=2, l=512, c=64)

    def loss(fn, p, t):
        return jnp.sum(jnp.square(fn(p, t, mask)))

    gd_p, gd_t = jax.grad(lambda p, t: loss(
        attention.masked_attention_dense, p, t), argnums=(0, 1))(params, tokens)
    gf_p, gf_t = jax.grad(lambda p, t: loss(
        flash_attention.masked_attention_flash, p, t), argnums=(0, 1))(params, tokens)

    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gd_t),
                               atol=5e-4, rtol=5e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4),
        gd_p, gf_p)


def test_dense_matches_torch():
    import torch
    from torch_oracle import OracleAttention, load_attn

    b, c, h, w = 2, 64, 16, 16
    params, tokens, mask = _setup(b=b, l=h * w, c=c)
    x = tokens.reshape(b, h, w, c)

    oracle = OracleAttention(c)
    load_attn(oracle, jax.tree.map(np.asarray, params))
    with torch.no_grad():
        t_in = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        t_out = oracle(t_in, torch.from_numpy(np.asarray(mask)))
    ours = attention.spatial_attention(params, x, mask, impl="dense")
    np.testing.assert_allclose(
        np.asarray(ours), t_out.permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-4)


def test_literal_view_output_layout():
    """output_layout='literal_view' reproduces the reference's raw
    .view(B, C, H, W) reinterpret of the [B, HW, C] attention output
    (ade_semantic.py:190): the NHWC result, sent back to NCHW, must be
    byte-identical to reshaping the token output's buffer directly."""
    b, c, h, w = 2, 8, 4, 4
    params, tokens, mask = _setup(b=b, l=h * w, c=c)
    x = tokens.reshape(b, h, w, c)
    tok_out = np.asarray(
        attention.masked_attention_dense(params, tokens, mask))
    lit = attention.spatial_attention(params, x, mask, impl="dense",
                                      output_layout="literal_view")
    np.testing.assert_array_equal(
        np.asarray(lit).transpose(0, 3, 1, 2),       # NHWC -> NCHW
        tok_out.reshape(b, c, h, w))                 # raw reinterpret
    sane = attention.spatial_attention(params, x, mask, impl="dense")
    assert np.abs(np.asarray(sane) - np.asarray(lit)).max() > 1e-3, \
        "quirk must actually scramble (else the test proves nothing)"
    with pytest.raises(ValueError):
        attention.spatial_attention(params, x, mask, impl="dense",
                                    output_layout="bogus")


def test_mask_generation_stats():
    mask = attention.random_key_mask(jax.random.key(0), 4, 4096)
    frac = float(jnp.mean(mask))
    assert 0.45 < frac < 0.55


def test_flash_compaction_matches_dense(monkeypatch):
    """K/V compaction (visible keys only) is numerically exact vs dense."""
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    params, tokens, mask = _setup(b=2, l=512, c=64)
    dense = attention.masked_attention_dense(params, tokens, mask)
    flash = fa.masked_attention_flash(params, tokens, mask)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_flash_compaction_grads(monkeypatch):
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    params, tokens, mask = _setup(b=1, l=512, c=64)

    gd = jax.grad(lambda t: jnp.sum(jnp.square(
        attention.masked_attention_dense(params, t, mask))))(tokens)
    gf = jax.grad(lambda t: jnp.sum(jnp.square(
        fa.masked_attention_flash(params, t, mask))))(tokens)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               atol=5e-4, rtol=5e-4)


def test_key_capacity():
    from maskunet_tpu.ops.flash_attention import _key_capacity
    assert _key_capacity(16384) % 512 == 0
    assert 16384 // 2 < _key_capacity(16384) <= 16384 // 2 + 1536
    assert _key_capacity(4096) <= 4096


def test_compaction_dense_mask_declared_density(monkeypatch):
    """A denser-than-Bernoulli(0.5) mask with the matching declared
    density is still exact (capacity saturates at l -> no compaction
    benefit, but no dropped keys either)."""
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    params, tokens, _ = _setup(b=2, l=512, c=64)
    mask = jax.random.bernoulli(jax.random.key(9), 0.9, (2, 512))
    dense = attention.masked_attention_dense(params, tokens, mask)
    flash = fa.masked_attention_flash(params, tokens, mask,
                                      mask_density=0.9)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_compaction_overflow_is_loud(monkeypatch):
    """A mask denser than the declared density must NaN-poison the
    affected rows, never silently drop keys (ADVICE r1)."""
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    params, tokens, _ = _setup(b=2, l=2048, c=64)
    mask = jnp.ones((2, 2048), bool)          # 100% kept, declared 0.5
    out = fa.masked_attention_flash(params, tokens, mask,
                                    mask_density=0.5)
    assert np.isnan(np.asarray(out)).any()
    # and disabling compaction (density=None) handles it exactly
    dense = attention.masked_attention_dense(params, tokens, mask)
    safe = fa.masked_attention_flash(params, tokens, mask,
                                     mask_density=None)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)


def test_flash_nomax_primal_matches_fwd_rule():
    """The inference (primal) kernel skips the online max; for realistic
    score magnitudes it must match the armored fwd-rule kernel."""
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 256, 64)).astype("f4"))
               for _ in range(3))
    mask = jnp.asarray(rng.integers(0, 2, (2, 256)).astype(bool))
    bias = flash_attention.mask_to_bias(mask, 2, 256)
    scale = 1.0 / 8.0
    primal = flash_attention.flash_mha(q, k, v, bias, scale)
    safe, _ = flash_attention._flash_fwd(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(primal), np.asarray(safe),
                               atol=2e-5)


def test_flash_nomax_clamp_stays_finite():
    """Scores beyond the no-max clamp saturate instead of overflowing:
    output stays finite and is still a convex combination of V rows."""
    rng = np.random.default_rng(4)
    q = jnp.full((1, 128, 64), 40.0, jnp.float32)   # s2 ~ 64*1600*log2e
    k = jnp.full((1, 128, 64), 40.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 128, 64)).astype("f4"))
    bias = jnp.zeros((1, 1, 128), jnp.float32)
    out = flash_attention.flash_mha(q, k, v, bias, 1.0)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= float(jnp.abs(v).max()) + 1e-4


def test_safe_softmax_fallback_matches_dense(monkeypatch):
    """MASKUNET_SAFE_SOFTMAX=1 swaps the online-max kernel back in for
    the training forward; it must stay grad-exact vs dense (keeps the
    fallback kernel covered now that the default path is no-max)."""
    monkeypatch.setattr(flash_attention, "_SAFE_SOFTMAX", True)
    rng = np.random.default_rng(5)
    params = attention.attention_init(jax.random.key(0), 64)
    tokens = jnp.asarray(rng.standard_normal((2, 512, 64)).astype("f4"))
    mask = jnp.asarray(rng.integers(0, 2, (2, 512)).astype(bool))
    w = jnp.asarray(rng.standard_normal(64).astype("f4"))

    def loss(fn):
        return lambda t: jnp.sum(fn(params, t, mask) * w)

    gd = jax.grad(loss(attention.masked_attention_dense))(tokens)
    gf = jax.grad(loss(flash_attention.masked_attention_flash))(tokens)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               atol=2e-4)
    # the knob must swap the PRIMAL/inference kernel too (need_lse=False
    # otherwise never reaches the online-max path): forward-only output
    # still matches dense under the safe kernel
    of = flash_attention.masked_attention_flash(params, tokens, mask)
    od = attention.masked_attention_dense(params, tokens, mask)
    np.testing.assert_allclose(np.asarray(of), np.asarray(od), atol=2e-4)


def test_precomputed_plan_matches_inline(monkeypatch):
    """plan_compaction precomputed outside the graph must give bitwise
    the same forward and grads as the in-graph slot assignment (it IS
    the same computation, hoisted out of the per-step graph)."""
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    params, tokens, mask = _setup(b=2, l=512, c=64)
    plan = fa.plan_compaction(mask)

    inline = fa.masked_attention_flash(params, tokens, mask)
    planned = fa.masked_attention_flash(params, tokens, mask, plan=plan)
    np.testing.assert_array_equal(np.asarray(planned), np.asarray(inline))

    g_inline = jax.grad(lambda t: jnp.sum(jnp.square(
        fa.masked_attention_flash(params, t, mask))))(tokens)
    g_planned = jax.grad(lambda t: jnp.sum(jnp.square(
        fa.masked_attention_flash(params, t, mask, plan=plan))))(tokens)
    np.testing.assert_array_equal(np.asarray(g_planned),
                                  np.asarray(g_inline))


def test_plan_poisoning_preserved(monkeypatch):
    """Overflow/empty-mask NaN-poisoning survives the precomputed-plan
    path (the plan carries the `bad` rows)."""
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    params, tokens, _ = _setup(b=2, l=2048, c=64)
    mask = jnp.ones((2, 2048), bool)          # denser than declared 0.5
    plan = fa.plan_compaction(mask, density=0.5)
    out = fa.masked_attention_flash(params, tokens, mask, plan=plan)
    assert np.isnan(np.asarray(out)).any()


def test_precompute_mask_plans_layers():
    """Model-level plan pytree: plans only for compacted (>=4096-token)
    layers, None elsewhere; layout parallels the masks tuple."""
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.ops import flash_attention as fa
    masks = mu.make_attention_masks(jax.random.key(0), 2, 128)
    plans = mu.precompute_mask_plans(masks)
    assert len(plans) == len(masks)
    for m, p in zip(masks, plans):
        if m.shape[-1] >= fa.COMPACT_MIN_TOKENS:
            assert isinstance(p, fa.CompactPlan)
            assert p.idx.shape[0] == m.shape[0]
        else:
            assert p is None
    assert mu.precompute_mask_plans(None) is None


def test_model_forward_with_plans_matches():
    """Full model forward with mask_plans == forward without (bitwise)."""
    from maskunet_tpu.models import maskattn_unet as mu
    cfg = mu.MaskAttnUNetConfig(c_out=8, img_size=64, attn_impl="flash")
    params, state = mu.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    masks = mu.make_attention_masks(jax.random.key(2), 2, 64)
    plans = mu.precompute_mask_plans(masks)
    out_a, _ = mu.apply(params, state, x, cfg=cfg, masks=masks, train=False)
    out_b, _ = mu.apply(params, state, x, cfg=cfg, masks=masks, train=False,
                        mask_plans=plans)
    np.testing.assert_array_equal(np.asarray(out_b.semantic),
                                  np.asarray(out_a.semantic))
