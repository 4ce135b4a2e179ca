"""256x256 (65k-token) capability checks (VERDICT r4 #7).

The measured on-chip numbers live in PERF.md (tools/res256_bench.py —
the suite's CPU backend cannot execute a 65k-token flash attention in
interpret mode in reasonable time). What the suite CAN lock is the whole
shape/plumbing path at that resolution: init, attention mask sizing, K/V
compaction plans, and the full forward/train-step trace through the flash
kernel's block math — eval_shape runs abstract values through every real
shape computation (grid sizing, padding, bilinear upsample dims) without
executing the kernels.
"""

import jax
import jax.numpy as jnp
import pytest

from maskunet_tpu.models import maskattn_unet as mu

IMG, BATCH, C_OUT = 256, 2, 150


@pytest.mark.slow
def test_256px_model_traces_end_to_end():
    cfg = mu.MaskAttnUNetConfig(c_out=C_OUT, img_size=IMG,
                                compute_dtype="bfloat16", attn_impl="flash")
    params, state = mu.init(jax.random.key(0), cfg)

    # real mask + compaction-plan construction at 65k tokens
    masks = mu.make_attention_masks(jax.random.key(1), BATCH, IMG)
    sizes = sorted({m.shape[-1] for m in masks})
    assert max(sizes) == 65536, sizes     # the 65k-token layer exists
    plans = mu.precompute_mask_plans(masks)
    assert plans is not None

    x = jax.ShapeDtypeStruct((BATCH, IMG, IMG, 3), jnp.float32)
    out, new_state = jax.eval_shape(
        lambda p, s, xx: mu.apply(p, s, xx, cfg=cfg, masks=masks,
                                  train=False, mask_plans=plans),
        params, state, x)
    assert out.semantic.shape == (BATCH, IMG, IMG, C_OUT)
    assert out.semantic.dtype == jnp.bfloat16


@pytest.mark.slow
def test_256px_train_step_traces():
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.train import step as step_lib

    cfg = mu.MaskAttnUNetConfig(c_out=C_OUT, img_size=IMG,
                                compute_dtype="bfloat16", attn_impl="flash")
    params, mstate = mu.init(jax.random.key(0), cfg)
    masks = mu.make_attention_masks(jax.random.key(1), BATCH, IMG)
    tx = optax.adamw(5e-5, weight_decay=1e-1)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    step = step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx,
        mask_plans=mu.precompute_mask_plans(masks))
    batch = {
        "image": jax.ShapeDtypeStruct((BATCH, IMG, IMG, 3), jnp.float32),
        "label": jax.ShapeDtypeStruct((BATCH, IMG, IMG), jnp.int32),
    }
    new_ts, metrics = jax.eval_shape(step, ts, batch)
    assert metrics["loss"].shape == ()
    # gradients flowed to every param leaf (same tree, same shapes)
    assert jax.tree.structure(new_ts.params) == jax.tree.structure(ts.params)
