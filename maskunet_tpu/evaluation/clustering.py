"""Embedding-space instance decoding (DBSCAN), cityscapes-instance path.

Reimplements `get_instances_from_embeddings` (city_instance.py:405-429):
for each predicted semantic class, cluster that class's pixels in the 16-d
embedding space with DBSCAN(eps=0.5, min_samples=5); each cluster becomes
an instance mask. `get_instance_annotations` (city_instance.py:431-449)
then builds COCO-style records: bbox from extent, category = median class
inside the mask, score 1.0, RLE segmentation.
"""

from __future__ import annotations

import numpy as np

from maskunet_tpu.evaluation import rle as rle_lib


def instances_from_embeddings(sem_pred: np.ndarray,
                              embeddings: np.ndarray, *,
                              eps: float = 0.5, min_samples: int = 5,
                              ignore: int = 255,
                              max_pixels_per_class: int | None = None
                              ) -> list[np.ndarray]:
    """sem_pred: [H, W] argmax classes; embeddings: [H, W, D].
    Returns a list of boolean instance masks."""
    from sklearn.cluster import DBSCAN

    h, w = sem_pred.shape
    masks: list[np.ndarray] = []
    for cls in np.unique(sem_pred):
        if cls == 0 or cls == ignore:
            continue
        ys, xs = np.nonzero(sem_pred == cls)
        if len(ys) < min_samples:
            continue
        feats = embeddings[ys, xs]
        sel = None
        if max_pixels_per_class is not None and len(ys) > max_pixels_per_class:
            sel = np.random.default_rng(0).choice(
                len(ys), max_pixels_per_class, replace=False)
            feats = feats[sel]
        labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(feats)
        idx_y = ys if sel is None else ys[sel]
        idx_x = xs if sel is None else xs[sel]
        for lab in np.unique(labels):
            if lab == -1:   # noise
                continue
            m = np.zeros((h, w), bool)
            pick = labels == lab
            m[idx_y[pick], idx_x[pick]] = True
            masks.append(m)
    return masks


def annotate_instances(masks: list[np.ndarray],
                       sem_pred: np.ndarray) -> list[dict]:
    """COCO-style records from instance masks (city_instance.py:431-449:
    category = median semantic class inside the mask, score 1.0)."""
    out = []
    for m in masks:
        if not m.any():
            continue
        ys, xs = np.nonzero(m)
        cat = int(np.median(sem_pred[m]))
        if cat == 0 or cat == 255:
            continue
        out.append({
            "category_id": cat,
            "bbox": [int(xs.min()), int(ys.min()),
                     int(xs.max() - xs.min() + 1),
                     int(ys.max() - ys.min() + 1)],
            "score": 1.0,
            "area": int(m.sum()),
            "segmentation": rle_lib.encode(m.astype(np.uint8)),
        })
    return out
