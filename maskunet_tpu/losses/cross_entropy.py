"""Cross-entropy loss with torch semantics (mean over non-ignored pixels).

Matches `nn.CrossEntropyLoss` / `nn.CrossEntropyLoss(ignore_index=255)` as
used by every reference training loop (ade_semantic.py:377,399;
city_semantic.py:339; city_instance.py:352). Logits are NHWC here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  ignore_index: int | None = None) -> jax.Array:
    """logits: [..., C] float; labels: [...] int. Mean NLL over pixels whose
    label != ignore_index (torch 'mean' reduction semantics). Negative
    labels are always ignored (used to mask padded eval rows)."""
    logits = logits.astype(jnp.float32)
    keep = labels >= 0
    if ignore_index is not None:
        keep &= labels != ignore_index
    safe_labels = jnp.where(keep, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    # one-hot contraction instead of take_along_axis: the gather's
    # backward is a per-pixel scatter-add, which serializes on the TPU
    # VPU; the one-hot compare fuses into the reduce in both directions
    picked = jnp.sum(
        logits * jax.nn.one_hot(safe_labels, logits.shape[-1],
                                dtype=logits.dtype), axis=-1)
    nll = logz - picked
    mask = keep.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
