"""Batch inference over an image directory, incl. instance decoding.

`cli predict --instances` must give a reference user the full inference
story: class-id masks always, plus instance-id maps decoded via DBSCAN
over the embedding head (3-head models, city_instance.py:405-429 path)
or per-class connected components (single-head models,
ade_instance.py:367-397 path).
"""

import dataclasses
import json
import os

import cv2
import numpy as np
import optax
import pytest

from maskunet_tpu.tasks import predict as predict_lib
from maskunet_tpu.tasks import recipes as recipes_lib
from maskunet_tpu.train import loop as loop_lib


def _image_dir(tmp_path, n=3):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(str(d / f"im{i}.png"),
                    rng.integers(0, 255, (40, 48, 3)).astype(np.uint8))
    return str(d)


def _fresh_state(rec, num_classes):
    cfg = loop_lib.model_config(rec, num_classes,
                                compute_dtype="float32")
    tx = optax.adamw(rec.lr, weight_decay=rec.weight_decay)
    return loop_lib.setup_state(rec, cfg, tx)


def test_predict_semantic_and_cc_instances(tmp_path):
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    ts = _fresh_state(rec, 8)
    out = str(tmp_path / "out")
    written = predict_lib.predict_directory(
        rec, ts, _image_dir(tmp_path), out, num_classes=8,
        save_instances=True)
    assert len(written) == 3
    for p in written:
        mask = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (32, 32) and mask.max() < 8
        inst = cv2.imread(p.replace("_mask", "_instances"),
                          cv2.IMREAD_UNCHANGED)
        assert inst is not None and inst.shape == (32, 32)
    manifest = json.load(open(os.path.join(out, "predictions.json")))
    assert set(manifest["instances"]) == {"im0.png", "im1.png", "im2.png"}
    for recs in manifest["instances"].values():
        for r in recs:
            assert {"category_id", "bbox", "score", "area"} <= set(r)
            assert "segmentation" not in r   # manifest stays small


def test_predict_panoptic_export(tmp_path):
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    ts = _fresh_state(rec, 8)
    out = str(tmp_path / "out")
    written = predict_lib.predict_directory(
        rec, ts, _image_dir(tmp_path), out, num_classes=8,
        save_panoptic=True)
    pan_dir = os.path.join(out, "panoptic")
    pngs = [f for f in os.listdir(pan_dir) if f.endswith(".png")]
    assert len(pngs) == len(written) == 3
    meta = json.load(open(os.path.join(pan_dir, "predictions.json")))
    anns = meta["annotations"] if isinstance(meta, dict) else meta
    assert len(anns) == 3
    for a in anns:
        assert a["segments_info"]   # real segments, not empty lists


def test_predict_embedding_instances(tmp_path):
    # 3-head model: instances come from DBSCAN over the embedding head
    rec = dataclasses.replace(recipes_lib.get("city_instance"),
                              img_size=32, batch_size=2)
    ts = _fresh_state(rec, 19)
    out = str(tmp_path / "out")
    written = predict_lib.predict_directory(
        rec, ts, _image_dir(tmp_path, n=2), out, num_classes=19,
        save_instances=True)
    assert len(written) == 2
    inst = cv2.imread(written[0].replace("_mask", "_instances"),
                      cv2.IMREAD_UNCHANGED)
    assert inst is not None and inst.shape == (32, 32)
    manifest = json.load(open(os.path.join(out, "predictions.json")))
    # id map ids are 1-based positions in the manifest records
    recs = manifest["instances"]["im0.png"]
    assert inst.max() <= len(recs)
