"""End-to-end task evaluators on the synthetic recipes (integration)."""

import dataclasses

import numpy as np
import pytest

from maskunet_tpu.tasks import evaluators, recipes as recipes_lib
from maskunet_tpu.train import loop


pytestmark = pytest.mark.slow   # module fixture trains for ~2 min


@pytest.fixture(scope="module")
def trained_panoptic():
    rec = dataclasses.replace(recipes_lib.get("synthetic_panoptic"),
                              img_size=32, lr=3e-3)
    res = loop.train(rec, None, "/tmp/test_eval_run", max_epochs=4,
                     log_every=0, verbose=False)
    return rec, res.state


def test_semantic_eval(trained_panoptic):
    rec, ts = trained_panoptic
    metrics = evaluators.evaluate_semantic(rec, None, ts, max_batches=2)
    assert metrics["miou"] > 0.3
    assert np.isfinite(metrics["loss"])


def test_instance_eval_sweep(trained_panoptic):
    rec, ts = trained_panoptic
    results = evaluators.evaluate_instances(
        rec, None, ts, max_queries=(50, 100), max_batches=1)
    assert set(results) == {50, 100}
    for stats in results.values():
        assert -1.0 <= stats["AP"] <= 1.0
    # a partly-trained model should find *some* instances
    assert results[100]["AP"] > 0.0


def test_panoptic_eval(trained_panoptic):
    rec, ts = trained_panoptic
    out = evaluators.evaluate_panoptic(rec, None, ts, max_batches=1)
    assert 0.0 <= out["pq"]["All"]["pq"] <= 1.0
    assert out["miou"] > 0.2
    assert "AP" in out["ap"]
    assert out["pq"]["All"]["n"] > 0


def test_panoptic_things_stuff_split(trained_panoptic):
    """PQ must report All/Things/Stuff like the reference prints
    (ade_panoptic.py:588-592) — the split comes from the dataset's
    things_labels (VERDICT r1 missing #3)."""
    rec, ts = trained_panoptic
    out = evaluators.evaluate_panoptic(rec, None, ts, max_batches=1)
    assert "Things" in out["pq"] and "Stuff" in out["pq"]
    # synthetic: all non-background classes are things; only class 0
    # (background, never emitted as a segment) could be stuff
    assert out["pq"]["Things"]["n"] > 0


def test_panoptic_export_uses_dataset_image_ids(trained_panoptic, tmp_path):
    """Exports are keyed by dataset image ids, not batch indices
    (VERDICT r1 missing #4)."""
    import json
    import os

    rec, ts = trained_panoptic
    out_dir = str(tmp_path / "export")
    evaluators.evaluate_panoptic(rec, None, ts, max_batches=1,
                                 export_dir=out_dir)
    with open(os.path.join(out_dir, "predictions.json")) as f:
        data = json.load(f)
    ids = [a["image_id"] for a in data["annotations"]]
    assert ids == sorted(ids)
    assert len(ids) == rec.batch_size        # one batch, all valid
    for a in data["annotations"]:
        assert os.path.exists(os.path.join(out_dir, a["file_name"]))
