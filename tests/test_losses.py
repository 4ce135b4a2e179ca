"""Loss numerics vs torch, and triplet-loss behavioral tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from maskunet_tpu.losses.cross_entropy import cross_entropy
from maskunet_tpu.losses.triplet import instance_triplet_loss


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8))
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long())
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_cross_entropy_ignore_index_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8))
    labels[0, :4] = 255
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                         ignore_index=255)
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(), ignore_index=255)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_cross_entropy_all_ignored_is_finite():
    logits = jnp.ones((1, 4, 4, 3))
    labels = jnp.full((1, 4, 4), 255)
    out = cross_entropy(logits, labels, ignore_index=255)
    assert np.isfinite(float(out))


def _two_instance_scene(separated: bool, rng):
    """8x8 image: instance 1 on the left half, instance 2 on the right."""
    inst = np.zeros((1, 8, 8), np.int32)
    inst[:, :, :4] = 1
    inst[:, :, 4:] = 2
    feats = np.zeros((1, 8, 8, 4), np.float32)
    if separated:
        feats[:, :, :4, 0] = 10.0
        feats[:, :, 4:, 1] = -10.0
    else:
        feats = rng.standard_normal((1, 8, 8, 4)).astype(np.float32) * 0.01
    return jnp.asarray(feats), jnp.asarray(inst)


def test_triplet_zero_for_separated_instances(rng):
    feats, inst = _two_instance_scene(True, rng)
    loss = instance_triplet_loss(feats, inst, jax.random.key(0))
    assert float(loss) == 0.0


def test_triplet_positive_for_collapsed_features(rng):
    feats, inst = _two_instance_scene(False, rng)
    loss = instance_triplet_loss(feats, inst, jax.random.key(0))
    # collapsed features: d_ap ~ d_an ~ 0 -> loss ~ margin
    assert 0.5 < float(loss) <= 1.1


def test_triplet_no_instances_is_zero(rng):
    feats = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    inst = jnp.zeros((1, 8, 8), jnp.int32)   # all background
    loss = instance_triplet_loss(feats, inst, jax.random.key(0))
    assert float(loss) == 0.0


def test_triplet_respects_ignore_label(rng):
    feats = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    inst = jnp.full((1, 8, 8), 255, jnp.int32)   # everything ignored
    loss = instance_triplet_loss(feats, inst, jax.random.key(0),
                                 ignore_label=255)
    assert float(loss) == 0.0


def test_triplet_matches_torch_triplet_margin_on_fixed_triplet():
    """Distance + hinge formula equals torch TripletMarginLoss on the same
    (a, p, n) triple."""
    a = np.array([[1.0, 2.0, 3.0]], np.float32)
    p = np.array([[1.5, 2.5, 2.0]], np.float32)
    n = np.array([[0.0, 0.5, 1.0]], np.float32)
    ref = torch.nn.TripletMarginLoss(margin=1.0)(
        torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n))

    # one-instance scene with exactly two instance pixels (anchor+positive)
    # and one distinct negative-eligible pixel arrangement is hard to force
    # through sampling; verify the formula directly instead.
    from maskunet_tpu.losses.triplet import _torch_distance
    d_ap = _torch_distance(jnp.asarray(a), jnp.asarray(p))
    d_an = _torch_distance(jnp.asarray(a), jnp.asarray(n))
    ours = jax.nn.relu(d_ap - d_an + 1.0)[0]
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_triplet_is_jittable_and_differentiable(rng):
    feats, inst = _two_instance_scene(False, rng)

    @jax.jit
    def f(x):
        return instance_triplet_loss(x, inst, jax.random.key(0))

    g = jax.grad(f)(feats)
    assert np.all(np.isfinite(np.asarray(g)))
