"""The nine (dataset x task) training recipes.

Exact hyperparameter transcription of the reference's nine scripts
(SURVEY.md §2.6): batch size, AdamW lr/weight-decay, loss blend, class
count, checkpoint name, patience 10, nominal 1000 epochs, 128x128 images,
seed 42. A tenth `synthetic_semantic` recipe drives tests/CI without data
on disk.
"""

from __future__ import annotations

import dataclasses

from maskunet_tpu.train.step import TaskConfig


@dataclasses.dataclass(frozen=True)
class Recipe:
    name: str
    dataset: str                 # 'ade20k' | 'coco' | 'cityscapes' | 'synthetic'
    task: str                    # 'semantic' | 'instance' | 'panoptic'
    batch_size: int
    lr: float
    weight_decay: float
    task_config: TaskConfig
    # model options
    num_classes: int | None = None   # None: derived from the dataset
    embed_dim: int = 0
    with_boundary_head: bool = False
    img_size: int = 128
    # loop options (reference defaults)
    num_epochs: int = 1000
    patience: int = 10
    overfit_margin: float = 0.1
    checkpoint_name: str = "checkpoint"
    seed: int = 42
    # reference max_queries sweeps: 50/100/150/200 (ade_instance.py:451),
    # 30/50/70/100 for cityscapes (city_instance.py:510)
    eval_max_queries: tuple[int, ...] = (50, 100, 150, 200)
    # 'transpose' (this framework's intended un-flatten) or 'literal_view'
    # (the reference's raw .view(B,C,H,W) attention-output reinterpret,
    # ade_semantic.py:190) — checkpoints imported from reference .pth
    # files encode the latter; the CLI resolves this automatically from
    # the import-torch sidecar (core/checkpoint.read_import_meta)
    attn_output_layout: str = "transpose"


_R = Recipe
RECIPES: dict[str, Recipe] = {r.name: r for r in [
    # ade_semantic.py:18,379,349,344
    _R("ade_semantic", "ade20k", "semantic", 8, 5e-5, 1e-1,
       TaskConfig(), checkpoint_name="checkpoint_ade"),
    # ade_instance.py:21,315,286
    _R("ade_instance", "ade20k", "instance", 8, 1e-2, 1e-1,
       TaskConfig(), checkpoint_name="checkpoint_ade_inst"),
    # ade_panoptic.py:17,442,463,387
    _R("ade_panoptic", "ade20k", "panoptic", 8, 5e-5, 1e-3,
       TaskConfig(ce_weight=0.9, triplet_weight=0.1),
       checkpoint_name="checkpoint_ade_pan"),
    # city_semantic.py:19,341-342,314
    _R("city_semantic", "cityscapes", "semantic", 1, 1e-4, 1e-4,
       TaskConfig(ignore_index=255), num_classes=19,
       checkpoint_name="checkpoint_cityscapes"),
    # city_instance.py:22,355-356,25
    _R("city_instance", "cityscapes", "instance", 8, 1e-3, 1e-1,
       TaskConfig(ignore_index=255, triplet_weight=0.5,
                  triplet_features="embeddings", triplet_ignore_label=255),
       num_classes=19, embed_dim=16, with_boundary_head=True,
       checkpoint_name="checkpoint_cityscapes_inst",
       eval_max_queries=(30, 50, 70, 100)),
    # city_panoptic.py:17,479-480,501,511 (the reference's early-stop path
    # writes checkpoint_ade_pan.pth — a copy-paste bug we do not reproduce)
    _R("city_panoptic", "cityscapes", "panoptic", 1, 1e-2, 1e-4,
       TaskConfig(ce_weight=0.9, triplet_weight=0.1, ignore_index=255),
       num_classes=19, checkpoint_name="checkpoint_city_pan"),
    # coco_semantic.py:18,382,355
    _R("coco_semantic", "coco", "semantic", 8, 1e-5, 1e-4,
       TaskConfig(), checkpoint_name="checkpoint"),
    # coco_instance.py:28,312,293,289
    _R("coco_instance", "coco", "instance", 4, 1e-5, 1e-4,
       TaskConfig(), checkpoint_name="checkpoint_instance"),
    # coco_panoptic.py:18,528,552,365
    _R("coco_panoptic", "coco", "panoptic", 14, 1e-5, 1e-4,
       TaskConfig(ce_weight=0.9, triplet_weight=0.1),
       checkpoint_name="checkpoint_pan"),
    # CI / smoke recipe: no data on disk required
    _R("synthetic_semantic", "synthetic", "semantic", 8, 1e-3, 1e-4,
       TaskConfig(), num_classes=8, img_size=64,
       checkpoint_name="checkpoint_synth"),
    _R("synthetic_panoptic", "synthetic", "panoptic", 8, 1e-3, 1e-4,
       TaskConfig(ce_weight=0.9, triplet_weight=0.1), num_classes=8,
       img_size=64, checkpoint_name="checkpoint_synth_pan"),
]}


def get(name: str) -> Recipe:
    if name not in RECIPES:
        raise KeyError(
            f"unknown recipe {name!r}; available: {sorted(RECIPES)}")
    return RECIPES[name]
