"""Vectorized instance-contrastive triplet loss.

Capability-parity replacement for the reference's
`InstanceContrastiveLoss` (ade_panoptic.py:390-418, coco_panoptic.py:482-521,
city_instance.py:279-307): a TripletMarginLoss(margin=1.0, p=2) over pixel
feature vectors, anchors/positives drawn from within an instance and
negatives from outside it.

The reference implementation is a host-driven python loop over
`torch.unique(instance_mask)` with per-instance `.nonzero()` — unjittable and
the worst serialization point in the reference (SURVEY.md §3.2). It also
carries an outright indexing bug: with instance_mask [B,H,W], `nonzero`
yields (batch, y, x) triples but the code indexes `features[:, :, b, y]` —
i.e. the *batch coordinate* is used as a spatial H index
(ade_panoptic.py:404-412). We implement the documented *intent* instead:

- sample `num_samples` anchor pixels per image among pixels whose instance
  id is not background (0) and not ignore (255 where applicable);
- positive: a random *different* pixel of the same instance in the same
  image;
- negative: a random pixel of a different instance (background allowed,
  matching the reference's `instance_mask != inst` criterion);
- per-triplet loss max(0, d(a,p) - d(a,n) + margin), with torch's
  pairwise_distance eps (d = ||a - b + 1e-6||_2), averaged over valid
  triplets.

Sampling is uniform over pixels (so large instances are sampled more often
than in the reference's one-triplet-per-instance scheme — documented
difference), fixed-shape, fully on-device, and O(K * HW) — no host syncs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 2.0  # added to uniform(0,1) scores to make eligible entries dominate


def _torch_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """torch.nn.functional.pairwise_distance semantics (eps=1e-6)."""
    return jnp.sqrt(jnp.sum(jnp.square(a - b + 1e-6), axis=-1))


def sample_triplets(rng: jax.Array, instance_mask: jax.Array, *,
                    num_samples: int = 32,
                    ignore_label: int | None = None
                    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Draw (anchor, positive, negative) pixel indices per image.

    instance_mask: [B,H,W] int. Returns (a_idx, p_idx, n_idx, weight),
    each [B, K] with flat-HW indices; weight is 1.0 where the triplet is
    usable. Split out from the loss so a lockstep parity oracle (torch)
    can compute the identical loss from the identical samples
    (tools/training_parity.py)."""
    b = instance_mask.shape[0]
    hw = instance_mask.shape[1] * instance_mask.shape[2]
    ids = instance_mask.reshape(b, hw)

    valid = ids != 0
    if ignore_label is not None:
        valid &= ids != ignore_label

    k1, k2, k3 = jax.random.split(rng, 3)

    # Anchors: num_samples random valid pixels per image (gumbel-free trick:
    # uniform scores, eligible entries boosted, top-k).
    a_scores = jax.random.uniform(k1, (b, hw)) + valid * _BIG
    _, a_idx = jax.lax.top_k(a_scores, num_samples)          # [B, K]
    a_ids = jnp.take_along_axis(ids, a_idx, axis=1)          # [B, K]
    a_valid = jnp.take_along_axis(valid, a_idx, axis=1)

    same = ids[:, None, :] == a_ids[:, :, None]              # [B, K, HW]
    is_self = (jnp.arange(hw)[None, None, :] == a_idx[:, :, None])

    pos_elig = same & ~is_self
    p_scores = jax.random.uniform(k2, (b, num_samples, hw)) + pos_elig * _BIG
    p_idx = jnp.argmax(p_scores, axis=-1)                    # [B, K]
    p_ok = jnp.take_along_axis(pos_elig, p_idx[..., None],
                               axis=-1)[..., 0]

    neg_elig = ~same                                         # ref: any pixel
    if ignore_label is not None:                             # outside instance
        neg_elig &= ids[:, None, :] != ignore_label
    n_scores = jax.random.uniform(k3, (b, num_samples, hw)) + neg_elig * _BIG
    n_idx = jnp.argmax(n_scores, axis=-1)
    n_ok = jnp.take_along_axis(neg_elig, n_idx[..., None],
                               axis=-1)[..., 0]

    weight = (a_valid & p_ok & n_ok).astype(jnp.float32)
    return a_idx, p_idx, n_idx, weight


def triplet_from_indices(features: jax.Array, a_idx: jax.Array,
                         p_idx: jax.Array, n_idx: jax.Array,
                         weight: jax.Array, *,
                         margin: float = 1.0) -> jax.Array:
    """TripletMarginLoss over pre-sampled flat pixel indices.
    features: [B,H,W,C]."""
    b, h, w, c = features.shape
    feats = features.reshape(b, h * w, c).astype(jnp.float32)

    def gather(idx):
        return jnp.take_along_axis(feats, idx[..., None], axis=1)

    a_f, p_f, n_f = gather(a_idx), gather(p_idx), gather(n_idx)
    d_ap = _torch_distance(a_f, p_f)
    d_an = _torch_distance(a_f, n_f)
    per_triplet = jax.nn.relu(d_ap - d_an + margin)          # [B, K]
    return jnp.sum(per_triplet * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def instance_triplet_loss(features: jax.Array, instance_mask: jax.Array,
                          rng: jax.Array, *, num_samples: int = 32,
                          margin: float = 1.0,
                          ignore_label: int | None = None) -> jax.Array:
    """features: [B,H,W,C]; instance_mask: [B,H,W] int. Returns scalar."""
    a_idx, p_idx, n_idx, weight = sample_triplets(
        rng, instance_mask, num_samples=num_samples,
        ignore_label=ignore_label)
    return triplet_from_indices(features, a_idx, p_idx, n_idx, weight,
                                margin=margin)
