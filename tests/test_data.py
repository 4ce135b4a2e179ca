"""Data layer: synthetic dataset, batch pipeline, and the three dataset
families against miniature on-disk fixtures."""

import json
import os

import cv2
import numpy as np
import pytest

from maskunet_tpu.data import (ade20k, cityscapes, coco, pipeline,
                               synthetic)


# ---------------------------------------------------------------------------
# synthetic + pipeline
# ---------------------------------------------------------------------------

def test_synthetic_deterministic():
    ds = synthetic.SyntheticSegmentationDataset(num_examples=4, img_size=32,
                                                with_instance=True)
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["instance"], b["instance"])
    assert a["image"].dtype == np.uint8
    assert a["label"].shape == (32, 32)


def test_batch_iterator_shapes_and_droplast():
    ds = synthetic.SyntheticSegmentationDataset(num_examples=10, img_size=16)
    it = pipeline.BatchIterator(ds, 4, shuffle=True, seed=1, drop_last=True)
    batches = list(it.epoch(0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[0]["valid"].all()


def test_batch_iterator_pad_last():
    ds = synthetic.SyntheticSegmentationDataset(num_examples=10, img_size=16)
    it = pipeline.BatchIterator(ds, 4, shuffle=False, drop_last=False,
                                pad_last=True)
    batches = list(it.epoch(0))
    assert len(batches) == 3
    last = batches[-1]
    assert last["image"].shape == (4, 16, 16, 3)
    assert last["valid"].tolist() == [True, True, False, False]


def test_batch_iterator_epoch_shuffling_differs():
    ds = synthetic.SyntheticSegmentationDataset(num_examples=16, img_size=16)
    it = pipeline.BatchIterator(ds, 4, shuffle=True, seed=0)
    e0 = np.concatenate([b["label"] for b in it.epoch(0)])
    e1 = np.concatenate([b["label"] for b in it.epoch(1)])
    assert not np.array_equal(e0, e1)


def test_to_device_scales_uint8():
    batch = {"image": np.full((1, 2, 2, 3), 255, np.uint8),
             "label": np.zeros((1, 2, 2), np.int32)}
    out = pipeline.to_device(batch)
    np.testing.assert_allclose(np.asarray(out["image"]), 1.0)
    assert np.asarray(out["label"]).dtype == np.int32


def test_prefetcher_end_to_end():
    ds = synthetic.SyntheticSegmentationDataset(num_examples=8, img_size=16)
    it = pipeline.BatchIterator(ds, 4, shuffle=False)
    got = list(pipeline.Prefetcher(it.epoch(0)))
    assert len(got) == 2
    assert got[0]["image"].shape == (4, 16, 16, 3)


# ---------------------------------------------------------------------------
# ADE20K fixture
# ---------------------------------------------------------------------------

@pytest.fixture
def ade_root(tmp_path):
    root = tmp_path / "ade"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    (root / "objectInfo150.txt").write_text(
        "Idx Ratio Train Val Name\n1 0.1 1 1 wall\n2 0.2 1 1 sky\n")
    rng = np.random.default_rng(0)
    for name in ["a", "b"]:
        img = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "images" / "training" / f"{name}.jpg"), img)
        mask = np.zeros((40, 50), np.uint8)
        mask[5:20, 5:25] = 1
        mask[25:35, 30:45] = 2
        cv2.imwrite(str(root / "annotations" / "training" / f"{name}.png"),
                    mask)
    return str(root)


def test_ade20k_semantic(ade_root):
    ds = ade20k.ADE20KSemanticDataset(ade_root, "training", img_size=32)
    assert len(ds) == 2
    assert ds.num_classes == 3   # header line counted (reference quirk)
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["label"].shape == (32, 32)
    assert set(np.unique(ex["label"])) <= {0, 1, 2}


def test_ade20k_panoptic_instances(ade_root):
    ds = ade20k.ADE20KPanopticDataset(ade_root, "training", img_size=32)
    ex = ds[0]
    inst = ex["instance"]
    # two disjoint rectangles of different classes -> 2 instance ids
    ids = set(np.unique(inst)) - {0}
    assert len(ids) == 2
    # instances don't cross class boundaries
    for i in ids:
        assert len(np.unique(ex["label"][inst == i])) == 1


# ---------------------------------------------------------------------------
# COCO fixtures
# ---------------------------------------------------------------------------

@pytest.fixture
def coco_panoptic_root(tmp_path):
    root = tmp_path / "coco"
    (root / "imgs").mkdir(parents=True)
    (root / "pan").mkdir(parents=True)
    rng = np.random.default_rng(0)
    h, w = 30, 40
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    cv2.imwrite(str(root / "imgs" / "0001.jpg"), img)
    seg_id = np.zeros((h, w), np.int32)
    seg_id[2:12, 2:18] = 7
    seg_id[15:28, 20:38] = 300  # multi-byte id exercises rgb2id
    rgb = coco.id2rgb(seg_id)
    cv2.imwrite(str(root / "pan" / "0001.png"),
                cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    pan_json = {
        "images": [{"id": 1, "width": w, "height": h,
                    "file_name": "0001.jpg"}],
        "annotations": [{
            "image_id": 1, "file_name": "0001.png",
            "segments_info": [
                {"id": 7, "category_id": 20, "isthing": 1},
                {"id": 300, "category_id": 10, "isthing": 0},
            ]}],
        "categories": [
            {"id": 10, "isthing": 0, "name": "sky"},
            {"id": 20, "isthing": 1, "name": "cat"},
        ],
    }
    path = root / "panoptic.json"
    path.write_text(json.dumps(pan_json))
    return str(root), str(path)


def test_coco_panoptic(coco_panoptic_root):
    root, pan_json = coco_panoptic_root
    ds = coco.COCOPanopticDataset(pan_json, os.path.join(root, "pan"),
                                  os.path.join(root, "imgs"), img_size=32)
    assert ds.num_classes == 2
    assert ds.cat2label == {10: 0, 20: 1}   # rank of sorted ids
    ex = ds[0]
    assert set(np.unique(ex["instance"])) <= {0, 7, 300}
    # label painted with cat2label rank
    assert set(np.unique(ex["label"])) <= {0, 1}
    assert (ex["label"][ex["instance"] == 7] == 1).all()


def test_rgb2id_roundtrip():
    ids = np.array([[0, 7], [300, 70000]], np.int32)
    np.testing.assert_array_equal(coco.rgb2id(coco.id2rgb(ids)), ids)


@pytest.fixture
def coco_instance_root(tmp_path):
    root = tmp_path / "coco_inst"
    (root / "imgs").mkdir(parents=True)
    h, w = 32, 32
    cv2.imwrite(str(root / "imgs" / "i.jpg"),
                np.zeros((h, w, 3), np.uint8))
    inst_json = {
        "images": [{"id": 5, "width": w, "height": h, "file_name": "i.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 5, "category_id": 3, "iscrowd": 0,
             "segmentation": [[4, 4, 20, 4, 20, 20, 4, 20]], "area": 256,
             "bbox": [4, 4, 16, 16]},
            {"id": 2, "image_id": 5, "category_id": 1, "iscrowd": 0,
             "segmentation": [[10, 10, 28, 10, 28, 28, 10, 28]], "area": 324,
             "bbox": [10, 10, 18, 18]},
        ],
        "categories": [{"id": 1, "name": "a"}, {"id": 3, "name": "b"}],
    }
    path = root / "instances.json"
    path.write_text(json.dumps(inst_json))
    return str(root), str(path)


def test_coco_instance_summed_target(coco_instance_root):
    root, inst_json = coco_instance_root
    ds = coco.COCOInstanceDataset(inst_json, os.path.join(root, "imgs"),
                                  img_size=32)
    assert ds.num_classes == 3
    ex = ds[0]
    # overlap region sums to 2 (the reference's summed-mask quirk)
    assert ex["label"].max() == 2
    assert ex["label"][6, 6] == 1


def test_coco_instance_ragged(coco_instance_root):
    root, inst_json = coco_instance_root
    ds = coco.COCOInstanceDataset(inst_json, os.path.join(root, "imgs"),
                                  img_size=32, summed_target=False)
    ex = ds[0]
    assert ex["masks"].shape == (2, 32, 32)
    assert ex["labels"].tolist() == [3, 1]


# ---------------------------------------------------------------------------
# Cityscapes fixture
# ---------------------------------------------------------------------------

@pytest.fixture
def cityscapes_root(tmp_path):
    root = tmp_path / "cs"
    (root / "leftImg8bit" / "train" / "cityA").mkdir(parents=True)
    (root / "gtFine" / "train" / "cityA").mkdir(parents=True)
    h, w = 30, 40
    img = np.zeros((h, w, 3), np.uint8)
    cv2.imwrite(str(root / "leftImg8bit" / "train" / "cityA" /
                    "cityA_000_leftImg8bit.png"), img)
    labels = np.zeros((h, w), np.uint8)
    labels[:10] = 5
    labels[10:20] = 26   # >= 19 -> must become 255
    cv2.imwrite(str(root / "gtFine" / "train" / "cityA" /
                    "cityA_000_gtFine_labelIds.png"), labels)
    inst = np.zeros((h, w), np.uint16)
    inst[:10] = 5
    inst[10:20] = 26005   # class 26, instance 5
    cv2.imwrite(str(root / "gtFine" / "train" / "cityA" /
                    "cityA_000_gtFine_instanceIds.png"), inst)
    return str(root)


def test_cityscapes_semantic(cityscapes_root):
    ds = cityscapes.CityscapesDataset(cityscapes_root, "train", img_size=32)
    ex = ds[0]
    vals = set(np.unique(ex["label"]))
    assert 255 in vals and 5 in vals
    assert not any(19 <= v < 255 for v in vals)


def test_cityscapes_instance_fallback_and_16bit(cityscapes_root):
    ds = cityscapes.CityscapesDataset(cityscapes_root, "train", img_size=32,
                                      with_instance=True)
    ex = ds[0]
    # no labelTrainIds file -> fallback to instanceIds // 1000
    assert 26005 in np.unique(ex["instance"])   # 16-bit ids survive
    assert 255 in np.unique(ex["label"])        # 26 -> 255


def test_cityscapes_panoptic_glob(cityscapes_root):
    ds = cityscapes.CityscapesPanopticDataset(cityscapes_root, "train",
                                              img_size=32)
    ex = ds[0]
    assert "instance" in ex and "label" in ex


def test_cached_dataset():
    from maskunet_tpu.data.cache import CachedDataset

    class Counting:
        def __init__(self):
            self.calls = 0
            self.num_classes = 5
        def __len__(self):
            return 4
        def __getitem__(self, i):
            self.calls += 1
            return {"image": np.full((2, 2, 3), i, np.uint8)}

    base = Counting()
    ds = CachedDataset(base)
    a = ds[1]; b = ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert base.calls == 1          # second access served from RAM
    assert ds.num_classes == 5      # metadata delegation


def test_prefetcher_early_exit_releases_worker():
    """Breaking out of a Prefetcher (max_batches-style) must stop the
    worker thread instead of leaking it blocked on a full queue
    (ADVICE r1)."""
    ds = synthetic.SyntheticSegmentationDataset(num_examples=64, img_size=8)
    it = pipeline.BatchIterator(ds, 2, shuffle=False)
    with pipeline.Prefetcher(it.epoch(0)) as pf:
        next(pf)   # consume one of 32 batches, then exit early
        worker = pf._thread
    worker.join(timeout=10)
    assert not worker.is_alive()


def test_prefetcher_iterates_fully_after_close_support():
    ds = synthetic.SyntheticSegmentationDataset(num_examples=8, img_size=8)
    it = pipeline.BatchIterator(ds, 4, shuffle=False)
    with pipeline.Prefetcher(it.epoch(0)) as pf:
        got = list(pf)
    assert len(got) == 2


def test_coco_image_id_and_things(coco_panoptic_root):
    root, pan_json = coco_panoptic_root
    ds = coco.COCOPanopticDataset(pan_json, os.path.join(root, "pan"),
                                  os.path.join(root, "imgs"), img_size=16)
    # real json image ids, not indices
    assert ds.image_id(0) == 1
    # isthing flags -> label space: cat 20 (label 1) thing, 10 (0) stuff
    assert ds.things_labels == {1}


def test_fraction_subset_image_id_remap():
    from maskunet_tpu.data.subset import FractionSubset
    ds = synthetic.SyntheticSegmentationDataset(num_examples=16, img_size=8)
    sub = FractionSubset(ds, 0.5, seed=0)
    for i in range(len(sub)):
        assert sub.image_id(i) == int(sub.indices[i])
