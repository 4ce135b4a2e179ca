"""Jittable segmentation metrics (device-side, no host syncs).

`mean_iou` matches the reference metric exactly (ade_semantic.py:128-146):
temperature-0.5 softmax -> argmax (argmax is temperature-invariant; kept for
the faithful probability path used elsewhere), per-class intersection/union
over the *whole batch*, classes with union 0 skipped, smoothing 1e-6.

Unlike the reference's per-class python loop (a host-synced GPU loop,
SURVEY.md §3.1 hot spot 2), the counts come from scatter-free one-hot
contractions — fully on-device, fused by XLA into streamed
compare-multiply-reduces (TPU scatter-adds, which `bincount` lowers to,
serialize on the VPU and cost ~3 ms/step at batch 8 — measured with
`tools/train_breakdown.py` nomiou), and correct under pjit (the sums
reduce over the sharded batch axis with XLA collectives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predictions(logits: jax.Array, temperature: float = 0.5) -> jax.Array:
    """argmax class map from NHWC logits (reference eval path applies
    softmax(logits/0.5) first — ade_semantic.py:130; argmax-equivalent)."""
    del temperature
    return jnp.argmax(logits, axis=-1)


def probabilities(logits: jax.Array, temperature: float = 0.5) -> jax.Array:
    """softmax(logits / T) — the probability maps used for instance scoring
    (ade_instance.py:407-409)."""
    return jax.nn.softmax(logits.astype(jnp.float32) / temperature, axis=-1)


def iou_counts(pred: jax.Array, labels: jax.Array, num_classes: int,
               ignore_index: int | None = None
               ) -> tuple[jax.Array, jax.Array]:
    """Per-class (intersection, union) counts over all given pixels."""
    pred = pred.reshape(-1)
    labels = labels.reshape(-1)
    eq = pred == labels
    keep = labels >= 0   # negative labels = padded eval rows, always out
    if ignore_index is not None:
        keep &= labels != ignore_index
    # Scatter-free histograms: one_hot(v)[n, c] compares fuse into the
    # per-class reduction (out-of-range values — e.g. raw 255 ignore
    # labels — one_hot to all-zero rows, matching bincount's drop
    # semantics). f32 accumulation of 0/1 weights is exact below 2^24
    # pixels per call (a 128x128 batch of 1024 images).
    oh_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    oh_true = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    w_keep = keep.astype(jnp.float32)
    w_eq = (eq & keep).astype(jnp.float32)
    inter = jnp.einsum("n,nc->c", w_eq, oh_pred).astype(jnp.int32)
    pred_count = jnp.einsum("n,nc->c", w_keep, oh_pred).astype(jnp.int32)
    true_count = jnp.einsum("n,nc->c", w_keep, oh_true).astype(jnp.int32)
    union = pred_count + true_count - inter
    return inter, union


def mean_iou(logits: jax.Array, labels: jax.Array, num_classes: int,
             smooth: float = 1e-6,
             ignore_index: int | None = None) -> jax.Array:
    """Batch mIoU, reference semantics. Note the reference does NOT exclude
    ignore pixels from the union (pred==c | true==255 counts toward c's
    union); pass ignore_index=None to reproduce that exactly, or an index to
    get the cleaner metric."""
    pred = predictions(logits)
    inter, union = iou_counts(pred, labels, num_classes, ignore_index)
    present = union > 0
    iou = (inter.astype(jnp.float32) + smooth) / (
        union.astype(jnp.float32) + smooth)
    return jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(
        jnp.sum(present.astype(jnp.float32)), 1.0)


def confusion_matrix(pred: jax.Array, labels: jax.Array, num_classes: int,
                     ignore_index: int | None = None) -> jax.Array:
    """[C, C] confusion counts (rows = true, cols = pred)."""
    pred = pred.reshape(-1)
    labels = labels.reshape(-1)
    if ignore_index is not None:
        keep = labels != ignore_index
        pred = jnp.where(keep, pred, 0)
        labels = jnp.where(keep, labels, 0)
        w = keep.astype(jnp.int32)
    else:
        w = jnp.ones_like(pred, dtype=jnp.int32)
    idx = labels * num_classes + pred
    return jnp.bincount(idx, weights=w,
                        length=num_classes * num_classes).reshape(
        num_classes, num_classes)
