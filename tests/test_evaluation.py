"""Evaluation stack: instances, COCO-style AP, PQ, DBSCAN decoding."""

import numpy as np
import pytest

from maskunet_tpu.evaluation import (clustering, coco_eval, instances,
                                     panoptic, rle)


# ---------------------------------------------------------------------------
# instance extraction
# ---------------------------------------------------------------------------

def _scene():
    mask = np.zeros((32, 32), np.int32)
    mask[2:10, 2:10] = 1          # class 1 blob A
    mask[20:30, 20:30] = 1        # class 1 blob B (separate instance)
    mask[5:15, 20:28] = 2         # class 2 blob
    return mask


def test_instances_from_mask_gt():
    inst = instances.get_instances_from_mask(_scene())
    assert len(inst) == 3
    cats = sorted(i["category_id"] for i in inst)
    assert cats == [1, 1, 2]
    a = next(i for i in inst if i["bbox"][:2] == [2, 2])
    assert a["bbox"] == [2, 2, 8, 8]
    assert a["area"] == 64
    assert a["score"] == 1.0
    np.testing.assert_array_equal(
        rle.decode(a["segmentation"]),
        (_scene() == 1)[:, :] & (np.arange(32)[:, None] < 16))


def test_instances_scores_from_prob():
    mask = np.zeros((8, 8), np.int32)
    mask[:4, :4] = 1
    prob = np.zeros((8, 8, 3), np.float32)
    prob[..., 1] = 0.7
    inst = instances.get_instances_from_mask(mask, prob)
    assert len(inst) == 1
    assert abs(inst[0]["score"] - 0.7) < 1e-6


def test_top_k_by_score():
    items = [{"score": s} for s in [0.1, 0.9, 0.5]]
    top = instances.top_k_by_score(items, 2)
    assert [i["score"] for i in top] == [0.9, 0.5]


def test_instances_from_id_map():
    sem = np.zeros((16, 16), np.int32)
    inst_map = np.zeros((16, 16), np.int32)
    sem[2:8, 2:8] = 3
    inst_map[2:8, 2:8] = 42
    out = instances.instances_from_id_map(inst_map, sem)
    assert len(out) == 1
    assert out[0]["category_id"] == 3


# ---------------------------------------------------------------------------
# COCO-style AP
# ---------------------------------------------------------------------------

def _inst(img, cat, mask, score=None, crowd=False):
    d = {"image_id": img, "category_id": cat,
         "segmentation": rle.encode(mask.astype(np.uint8)),
         "area": int(mask.sum())}
    if score is not None:
        d["score"] = score
    if crowd:
        d["iscrowd"] = 1
    return d


def _box_mask(y0, y1, x0, x1, h=64, w=64):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def test_ap_perfect_detection():
    gt_mask = _box_mask(10, 30, 10, 30)
    gts = [_inst(1, 1, gt_mask)]
    dts = [_inst(1, 1, gt_mask, score=0.9)]
    stats = coco_eval.evaluate_ap(gts, dts)
    assert abs(stats["AP"] - 1.0) < 1e-6
    assert abs(stats["AR"] - 1.0) < 1e-6


def test_ap_miss_and_false_positive():
    gts = [_inst(1, 1, _box_mask(10, 30, 10, 30))]
    dts = [_inst(1, 1, _box_mask(40, 60, 40, 60), score=0.9)]  # no overlap
    stats = coco_eval.evaluate_ap(gts, dts)
    assert stats["AP"] == 0.0


def test_ap_half_precision():
    """Two gts, one matched det + one unmatched det at lower score:
    precision alternates -> AP50 = 0.5."""
    g1, g2 = _box_mask(0, 10, 0, 10), _box_mask(40, 50, 40, 50)
    gts = [_inst(1, 1, g1), _inst(1, 1, g2)]
    dts = [_inst(1, 1, g1, score=0.9),
           _inst(1, 1, _box_mask(20, 30, 20, 30), score=0.8)]
    stats = coco_eval.evaluate_ap(gts, dts)
    assert abs(stats["AP50"] - 0.5) < 0.02


def test_ap_iou_threshold_sensitivity():
    """Det overlaps gt with IoU ~0.58: counts at 0.5, not at 0.75."""
    gt = _box_mask(0, 20, 0, 20)
    dt = _box_mask(0, 20, 5, 25)    # IoU = 300/500 = 0.6
    gts = [_inst(1, 1, gt)]
    dts = [_inst(1, 1, dt, score=0.9)]
    stats = coco_eval.evaluate_ap(gts, dts)
    assert stats["AP50"] > 0.9
    assert stats["AP75"] == 0.0


def test_ap_crowd_not_fp():
    """A det matching only a crowd gt is ignored, not a false positive."""
    crowd = _box_mask(0, 64, 0, 64)
    real = _box_mask(0, 10, 0, 10)
    gts = [_inst(1, 1, crowd, crowd=True), _inst(1, 1, real)]
    dts = [_inst(1, 1, real, score=0.9),
           _inst(1, 1, _box_mask(30, 60, 30, 60), score=0.8)]  # in crowd
    stats = coco_eval.evaluate_ap(gts, dts)
    assert abs(stats["AP50"] - 1.0) < 1e-6


def test_ap_reference_iou_sweep():
    """The reference's panoptic AP uses iouThrs linspace(0.30, 0.95, 10)
    (coco_panoptic.py:443-453) — supported via params."""
    gt = _box_mask(0, 20, 0, 20)
    dt = _box_mask(0, 20, 8, 28)    # IoU = 240/560 ~ 0.43
    stats = coco_eval.evaluate_ap(
        [_inst(1, 1, gt)], [_inst(1, 1, dt, score=0.9)],
        iou_thrs=np.linspace(0.30, 0.95, 10))
    assert stats["AP"] > 0.0        # matched at the 0.30/0.37 thresholds


# ---------------------------------------------------------------------------
# PQ
# ---------------------------------------------------------------------------

def test_pq_perfect():
    gt = np.zeros((32, 32), np.int64)
    gt[4:16, 4:16] = 1
    gt[20:30, 20:30] = 2
    segs = [{"id": 1, "category_id": 5}, {"id": 2, "category_id": 7}]
    res = panoptic.pq_compute([(gt, segs, gt.copy(), list(segs))],
                              things={5})
    assert abs(res["All"]["pq"] - 1.0) < 1e-6
    assert res["Things"]["n"] == 1 and res["Stuff"]["n"] == 1


def test_pq_miss_halves():
    gt = np.zeros((32, 32), np.int64)
    gt[4:16, 4:16] = 1
    gt_segs = [{"id": 1, "category_id": 5}]
    pred = np.zeros_like(gt)
    res = panoptic.pq_compute([(gt, gt_segs, pred, [])])
    # 1 FN, 0 TP -> PQ 0
    assert res["All"]["pq"] == 0.0


def test_pq_partial_overlap():
    """gt segment rows 0..15, pred rows 4..19 on a 32-row image with void
    background: inter 12 rows; union = 16 + 16 - 12 - (4 pred rows on
    gt-void) = 16 rows (panopticapi void convention) -> IoU 0.75."""
    gt = np.zeros((32, 32), np.int64)
    gt[0:16, :] = 1
    pred = np.zeros_like(gt)
    pred[4:20, :] = 1
    segs = [{"id": 1, "category_id": 3}]
    res = panoptic.pq_compute([(gt, segs, pred, list(segs))])
    assert abs(res["All"]["pq"] - 0.75) < 1e-6
    assert abs(res["All"]["sq"] - 0.75) < 1e-6
    assert abs(res["All"]["rq"] - 1.0) < 1e-6


def test_pq_partial_overlap_fully_labeled():
    """Same geometry but the background is a labeled stuff segment, so the
    plain PQ definition applies: thing IoU = 12/20 = 0.6; background IoU =
    12/20 = 0.6; PQ = mean(0.6, 0.6) = 0.6."""
    gt = np.full((32, 32), 2, np.int64)
    gt[0:16, :] = 1
    pred = np.full_like(gt, 2)
    pred[4:20, :] = 1
    segs = [{"id": 1, "category_id": 3}, {"id": 2, "category_id": 4}]
    res = panoptic.pq_compute([(gt, segs, pred, list(segs))])
    assert abs(res["All"]["pq"] - 0.6) < 1e-6


def test_pq_category_mismatch_is_fp_fn():
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 1
    res = panoptic.pq_compute([(
        gt, [{"id": 1, "category_id": 3}],
        gt.copy(), [{"id": 1, "category_id": 4}])])
    # FN for cat 3, FP for cat 4 -> PQ 0 both
    assert res["All"]["pq"] == 0.0
    assert res["All"]["n"] == 2


def test_pq_void_excluded_from_union():
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 1
    pred = gt.copy()
    pred[8:] = 0
    # make some gt pixels void: union shrinks, still TP
    gt2 = gt.copy()
    res = panoptic.pq_compute([(
        gt2, [{"id": 1, "category_id": 3}],
        pred, [{"id": 1, "category_id": 3}])])
    assert abs(res["All"]["pq"] - 1.0) < 1e-6


def test_semantic_to_panoptic_fusion():
    sem = np.zeros((32, 32), np.int32)
    sem[2:10, 2:10] = 1     # thing, 2 components
    sem[20:30, 20:30] = 1
    sem[12:18, :] = 2       # stuff band
    pan, segs = panoptic.semantic_to_panoptic(sem, things={1})
    thing_segs = [s for s in segs if s["category_id"] == 1]
    stuff_segs = [s for s in segs if s["category_id"] == 2]
    assert len(thing_segs) == 2     # split by connected components
    assert len(stuff_segs) == 1     # merged


# ---------------------------------------------------------------------------
# DBSCAN decoding
# ---------------------------------------------------------------------------

def test_instances_from_embeddings():
    h = w = 16
    sem = np.zeros((h, w), np.int32)
    sem[:, :8] = 1
    sem[:, 8:] = 1
    emb = np.zeros((h, w, 4), np.float32)
    emb[:, :8] = [5, 0, 0, 0]     # cluster A
    emb[:, 8:] = [0, 5, 0, 0]     # cluster B
    masks = clustering.instances_from_embeddings(sem, emb)
    assert len(masks) == 2
    sizes = sorted(int(m.sum()) for m in masks)
    assert sizes == [128, 128]
    anns = clustering.annotate_instances(masks, sem)
    assert all(a["category_id"] == 1 for a in anns)


def test_save_panoptic_predictions(tmp_path):
    import json
    import os

    pan = np.zeros((16, 16), np.int64)
    pan[:8] = 7
    segs = [{"id": 7, "category_id": 3}]
    out = panoptic.save_panoptic_predictions([(5, pan, segs)], str(tmp_path))
    with open(out) as f:
        data = json.load(f)
    assert data["annotations"][0]["image_id"] == 5
    png = os.path.join(str(tmp_path), data["annotations"][0]["file_name"])
    import cv2
    from maskunet_tpu.data.coco import rgb2id
    rgb = cv2.cvtColor(cv2.imread(png), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(rgb2id(rgb), pan)


# ---------------------------------------------------------------------------
# threaded evaluation determinism
# ---------------------------------------------------------------------------

def _many_annotations(n_images=40, n_cats=6, seed=0):
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for img in range(n_images):
        for _ in range(4):
            cat = int(rng.integers(1, n_cats + 1))
            m = np.zeros((32, 32), np.uint8)
            y, x = int(rng.integers(0, 20)), int(rng.integers(0, 20))
            m[y:y + 10, x:x + 10] = 1
            gts.append({"image_id": img, "category_id": cat,
                        "segmentation": rle.encode(m), "area": 100})
            md = np.roll(m, int(rng.integers(-2, 3)), axis=0)
            dts.append({"image_id": img, "category_id": cat,
                        "segmentation": rle.encode(md), "area": 100,
                        "score": float(rng.random())})
    return gts, dts


def test_evaluate_ap_threaded_equals_serial():
    """The sparse/threaded evaluate() path is bit-identical to serial."""
    gts, dts = _many_annotations()
    serial = coco_eval.COCOEvaluator(gts, dts)
    serial.evaluate(num_threads=1)
    serial.accumulate()
    threaded = coco_eval.COCOEvaluator(gts, dts)
    threaded.evaluate(num_threads=8)
    threaded.accumulate()
    assert serial.summarize() == threaded.summarize()


def test_pq_threaded_equals_serial():
    rng = np.random.default_rng(3)
    images = []
    for _ in range(80):
        gt = rng.integers(0, 4, (24, 24)).astype(np.int64)
        pred = gt.copy()
        pred[:6] = (pred[:6] + 1) % 4
        segs_g = [{"id": i, "category_id": i} for i in range(1, 4)]
        segs_p = [{"id": i, "category_id": i} for i in range(1, 4)]
        images.append((gt, segs_g, pred, segs_p))
    serial = panoptic.pq_compute(images, num_threads=1)
    threaded = panoptic.pq_compute(images, num_threads=8)
    assert serial == threaded
