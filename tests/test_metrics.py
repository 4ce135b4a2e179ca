"""mIoU / confusion-matrix parity with the reference formula."""

import jax.numpy as jnp
import numpy as np

from maskunet_tpu.ops import metrics_ops


def _reference_mean_iou(pred, true, num_classes, smooth=1e-6):
    """Direct numpy transcription of the reference formula
    (ade_semantic.py:128-146)."""
    ious = []
    for c in range(num_classes):
        inter = np.sum((pred == c) & (true == c))
        union = np.sum((pred == c) | (true == c))
        if union == 0:
            continue
        ious.append((inter + smooth) / (union + smooth))
    return float(np.mean(ious))


def test_mean_iou_matches_reference_formula(rng):
    c = 7
    logits = rng.standard_normal((2, 16, 16, c)).astype(np.float32)
    labels = rng.integers(0, c, (2, 16, 16))
    pred = np.argmax(logits, axis=-1)
    expect = _reference_mean_iou(pred, labels, c)
    got = metrics_ops.mean_iou(jnp.asarray(logits), jnp.asarray(labels), c)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_mean_iou_absent_classes_skipped(rng):
    c = 10
    logits = rng.standard_normal((1, 8, 8, c)).astype(np.float32)
    # restrict to classes {0,1}: others absent in both pred and true
    logits[..., 2:] = -100.0
    labels = rng.integers(0, 2, (1, 8, 8))
    pred = np.argmax(logits, axis=-1)
    expect = _reference_mean_iou(pred, labels, c)
    got = metrics_ops.mean_iou(jnp.asarray(logits), jnp.asarray(labels), c)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_mean_iou_perfect_prediction():
    labels = np.arange(16).reshape(1, 4, 4) % 3
    logits = np.eye(3, dtype=np.float32)[labels] * 10
    got = metrics_ops.mean_iou(jnp.asarray(logits), jnp.asarray(labels), 3)
    assert abs(float(got) - 1.0) < 1e-5


def test_mean_iou_with_ignore_index(rng):
    c = 5
    logits = rng.standard_normal((1, 8, 8, c)).astype(np.float32)
    labels = rng.integers(0, c, (1, 8, 8))
    labels[0, 0] = 255
    got = metrics_ops.mean_iou(jnp.asarray(logits), jnp.asarray(labels), c,
                               ignore_index=255)
    pred = np.argmax(logits, -1)
    keep = labels != 255
    expect = _reference_mean_iou(pred[keep], labels[keep], c)
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_confusion_matrix(rng):
    c = 4
    pred = rng.integers(0, c, (100,))
    true = rng.integers(0, c, (100,))
    cm = np.asarray(metrics_ops.confusion_matrix(
        jnp.asarray(pred), jnp.asarray(true), c))
    for i in range(c):
        for j in range(c):
            assert cm[i, j] == np.sum((true == i) & (pred == j))


def test_probabilities_temperature():
    logits = jnp.asarray([[1.0, 2.0]])
    p = metrics_ops.probabilities(logits, temperature=0.5)
    expect = np.exp([2.0, 4.0]) / np.exp([2.0, 4.0]).sum()
    np.testing.assert_allclose(np.asarray(p)[0], expect, rtol=1e-6)
