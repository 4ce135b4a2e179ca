"""coco_instance evaluation uses real ragged gt masks, not summed maps."""

import dataclasses
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_coco(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fake_coco"))
    sys.path.insert(0, "tools")
    from make_fake_dataset import make_coco
    make_coco(root, n=8, size=48)
    return root


def test_ragged_gt_categories_are_real(fake_coco):
    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.tasks.evaluators import _ragged_coco_gt

    rec = dataclasses.replace(recipes_lib.get("coco_instance"), img_size=32)
    gt_for = _ragged_coco_gt(rec, fake_coco, "val")
    gts = gt_for(0)
    assert gts, "fixture image should have gt instances"
    cats = {g["category_id"] for g in gts}
    # fake categories are 10c+1 (11, 21, ...) — summed-map values would be
    # small overlap counts, real gt must carry the json category ids
    assert all(c % 10 == 1 and c > 10 for c in cats), cats
    for g in gts:
        assert g["area"] > 0
        assert g["segmentation"]["size"] == [32, 32]


def test_evaluate_instances_coco_path(fake_coco):
    import jax
    import optax

    from maskunet_tpu.tasks import evaluators, recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(recipes_lib.get("coco_instance"),
                              img_size=32, batch_size=2)
    from maskunet_tpu.tasks.datasets import make_datasets
    _, _, num_classes = make_datasets(rec, fake_coco)
    cfg = loop.model_config(rec, num_classes, attn_impl="dense")
    tx = optax.adamw(1e-4)
    ts = loop.setup_state(rec, cfg, tx)

    results = evaluators.evaluate_instances(rec, fake_coco, ts,
                                            max_queries=(50,),
                                            max_batches=1)
    stats = results[50]
    # untrained model: AP may be 0, but the evaluator must have found gts
    # (AP -1 would mean an empty evaluation)
    assert stats["AP"] >= 0.0
