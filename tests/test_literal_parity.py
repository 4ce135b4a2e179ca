"""Lockstep parity against the reference's LITERAL classes.

These tests exec the reference's actual model code (via
tests/literal_reference.py) and compare it to the JAX implementation —
forward, backward (through AdamW updates), and the 3-head variant. They
are the epistemic backstop for every oracle-based parity test: if the
transcribed oracle (tests/torch_oracle.py) had mis-read the reference,
these would diverge.

Skipped when the read-only reference checkout is absent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import literal_reference as lit
from maskunet_tpu.models import maskattn_unet as mu

pytestmark = pytest.mark.skipif(
    not lit.available(), reason="reference checkout not present")


def _masks(batch, img, seed):
    masks = mu.make_attention_masks(jax.random.key(seed), batch, img)
    # tiny attention maps can have fully-masked rows -> torch softmax NaN
    # (the reference's own failure mode); keep one key visible
    return tuple(m.at[..., 0].set(True) for m in masks)


def _forward_literal(model, x_nhwc, masks):
    with lit.inject_masks(masks), torch.no_grad():
        return model(torch.from_numpy(x_nhwc).permute(0, 3, 1, 2))


def test_literal_forward_semantic():
    """ade_semantic.py:152-314 UNet forward vs mu.apply, identical weights
    and injected masks, train-mode BN (batch stats), dropout off.
    attn_output_layout='literal_view' reproduces the reference's raw
    .view(B,C,H,W) reinterpret of the [B,HW,C] attention output
    (ade_semantic.py:190) — the quirk this test suite discovered; see
    PARITY.md 'vs literal reference code'."""
    cfg = mu.MaskAttnUNetConfig(c_out=7, img_size=32, dropout_rate=0.0,
                                attn_impl="dense",
                                attn_output_layout="literal_view")
    params, state = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    masks = _masks(2, 32, seed=1)

    model = lit.make_literal_unet("ade", 7, 32,
                                  jax.tree.map(np.asarray, params))
    model.train(True)
    t_out = _forward_literal(model, x, masks)

    out, _ = mu.apply(params, state, jnp.asarray(x), cfg=cfg, masks=masks,
                      train=True, dropout_rng=jax.random.key(2))
    np.testing.assert_allclose(
        np.asarray(out.semantic), t_out.permute(0, 2, 3, 1).numpy(),
        atol=2e-3, rtol=1e-3)


def test_literal_forward_city_3head():
    """city_instance.py:216-276 3-head UNet: semantic, boundary map, and
    16-d embeddings all match."""
    cfg = mu.MaskAttnUNetConfig(c_out=19, img_size=16, dropout_rate=0.0,
                                embed_dim=16, with_boundary_head=True,
                                attn_impl="dense",
                                attn_output_layout="literal_view")
    params, state = mu.init(jax.random.key(3), cfg)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    masks = _masks(2, 16, seed=4)

    model = lit.make_literal_unet("city", 19, 16,
                                  jax.tree.map(np.asarray, params))
    model.train(True)
    sem, bnd, emb = _forward_literal(model, x, masks)

    out, _ = mu.apply(params, state, jnp.asarray(x), cfg=cfg, masks=masks,
                      train=True, dropout_rng=jax.random.key(5))
    np.testing.assert_allclose(np.asarray(out.semantic),
                               sem.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.boundary),
                               bnd.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.embeddings),
                               emb.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-3)


def test_literal_mask_caching_semantics():
    """The literal code caches the mask on the module keyed on token count
    (ade_semantic.py:177-181): a second forward must NOT consume another
    randint draw. Locks our 'cached' mask policy to the real behavior."""
    model = lit.make_literal_unet("ade", 4, 16)
    model.train(True)
    x = torch.randn(2, 3, 16, 16)
    masks = [np.asarray(m) for m in _masks(2, 16, seed=7)]
    with lit.inject_masks(masks) as queue:
        with torch.no_grad():
            model(x)
        assert not queue, "first forward should consume all six masks"
        with torch.no_grad():
            model(x)  # would IndexError/fall through if it re-drew
    # cached processed mask has the additive 0/-inf form, [B, L, L]
    m = model.self_attention1.mask
    assert m.shape == (2, 64, 64)
    assert set(torch.unique(m).tolist()) <= {0.0, float("-inf")}


def test_literal_trainstep_lockstep():
    """Five AdamW steps, identical weights/batches: per-step CE losses of
    the JAX train step and the literal reference model agree. This pushes
    gradients through every literal layer (backward parity)."""
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.train import step as step_lib

    c_out, img, batch, lr, wd = 5, 16, 2, 1e-3, 1e-2
    cfg = mu.MaskAttnUNetConfig(c_out=c_out, img_size=img, dropout_rate=0.0,
                                attn_impl="dense",
                                attn_output_layout="literal_view")
    params, mstate = mu.init(jax.random.key(0), cfg)
    masks = _masks(batch, img, seed=1)

    model = lit.make_literal_unet("ade", c_out, img,
                                  jax.tree.map(np.asarray, params))
    model.train(True)
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=wd)
    # dead emb_layers exist only on the torch side; freeze them so AdamW's
    # weight decay doesn't touch params that have no JAX counterpart
    for name, p in model.named_parameters():
        if "emb_layer" in name:
            p.requires_grad_(False)
    criterion = torch.nn.CrossEntropyLoss()

    tx = optax.adamw(lr, weight_decay=wd)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    train_step = jax.jit(step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx))

    rng = np.random.default_rng(0)
    with lit.inject_masks(masks):
        for i in range(5):
            x = rng.standard_normal((batch, img, img, 3)).astype(np.float32)
            y = rng.integers(0, c_out, (batch, img, img))

            ts, metrics = train_step(
                ts, {"image": jnp.asarray(x), "label": jnp.asarray(y)})
            jax_loss = float(metrics["loss"])

            opt.zero_grad()
            out = model(torch.from_numpy(x).permute(0, 3, 1, 2))
            loss = criterion(out, torch.from_numpy(y).long())
            loss.backward()
            opt.step()

            rel = abs(jax_loss - float(loss)) / max(abs(float(loss)), 1e-8)
            assert rel < 5e-3, (i, jax_loss, float(loss))
