"""Golden-activation regression: the forward must not drift across rounds.

A fixed-seed forward (params, input, masks all from fixed keys) is
compared against a committed golden output. Any future change to layer
numerics, initialization, or attention semantics that moves outputs more
than f32 noise will fail here — catching silent behavior drift between
build rounds. Regenerate deliberately with:

    REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from maskunet_tpu.models import maskattn_unet as mu

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_forward.npz")


def _forward():
    cfg = mu.MaskAttnUNetConfig(c_out=11, img_size=32, embed_dim=8,
                                with_boundary_head=True, attn_impl="dense")
    params, state = mu.init(jax.random.key(1234), cfg)
    x = jax.random.normal(jax.random.key(5678), (2, 32, 32, 3))
    masks = mu.make_attention_masks(jax.random.key(91011), 2, 32)
    out, _ = mu.apply(params, state, x, cfg=cfg, masks=masks, train=False)
    return {
        "semantic": np.asarray(out.semantic),
        "boundary": np.asarray(out.boundary),
        "embeddings": np.asarray(out.embeddings),
    }


def test_forward_matches_golden():
    got = _forward()
    if os.environ.get("REGEN_GOLDEN"):
        np.savez_compressed(GOLDEN, **got)
    elif not os.path.exists(GOLDEN):
        # A missing golden must be a hard failure, not a silent re-baseline:
        # a clean checkout / .gitignore accident would otherwise mask drift.
        raise AssertionError(
            f"golden file {GOLDEN} is missing — it is committed to the repo; "
            f"restore it from git, or regenerate DELIBERATELY with "
            f"REGEN_GOLDEN=1 after verifying the forward is correct")
    golden = np.load(GOLDEN)
    for key in ("semantic", "boundary", "embeddings"):
        np.testing.assert_allclose(
            got[key], golden[key], atol=1e-4, rtol=1e-4,
            err_msg=f"{key} drifted from golden — if intentional, "
                    f"regenerate with REGEN_GOLDEN=1")
