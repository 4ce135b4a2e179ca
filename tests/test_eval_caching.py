"""In-training evaluation reuse + mesh-aware evaluators (VERDICT r2 #5/#6).

- `cached_eval_step` memoizes the jitted eval step per (cfg, task, mesh),
  so repeated evaluation never re-jits a fresh closure (which would
  retrace every call).
- `train(eval_every=...)` passes its already-built val dataset into the
  instance/panoptic evaluators — the second in-training eval does zero
  dataset construction.
- `evaluate_panoptic`/`evaluate_instances` accept a mesh and DP-shard the
  device eval; results equal single-device evaluation.
"""

import dataclasses

import numpy as np
import pytest

from maskunet_tpu.parallel import mesh as mesh_lib
from maskunet_tpu.tasks import evaluators, recipes as recipes_lib
from maskunet_tpu.train import loop, step as step_lib


def _tiny_panoptic(img_size=16):
    return dataclasses.replace(recipes_lib.get("synthetic_panoptic"),
                               img_size=img_size)


def test_cached_eval_step_identity():
    rec = _tiny_panoptic()
    cfg = loop.model_config(rec, 8, attn_impl="dense")
    a = step_lib.cached_eval_step(cfg, rec.task_config, None)
    b = step_lib.cached_eval_step(cfg, rec.task_config, None)
    assert a is b
    mesh = mesh_lib.make_mesh()
    c = step_lib.cached_eval_step(cfg, rec.task_config, mesh)
    assert c is not a
    assert step_lib.cached_eval_step(cfg, rec.task_config, mesh) is c


def test_mesh_aware_panoptic_eval_matches_single_device():
    """Instance/panoptic evaluation under 8-way DP equals single-device
    (VERDICT r2 weak #5: the evaluators previously ignored the mesh)."""
    rec = _tiny_panoptic()
    cfg = loop.model_config(rec, 8, attn_impl="dense")
    tx = loop.make_optimizer(rec)
    ts = loop.setup_state(rec, cfg, tx)

    single = evaluators.evaluate_panoptic(rec, None, ts, max_batches=2)
    mesh = mesh_lib.make_mesh()
    sharded = evaluators.evaluate_panoptic(rec, None, ts, max_batches=2,
                                           mesh=mesh)
    assert single["pq"]["All"]["n"] == sharded["pq"]["All"]["n"]
    np.testing.assert_allclose(single["miou"], sharded["miou"], atol=1e-5)
    np.testing.assert_allclose(single["pq"]["All"]["pq"],
                               sharded["pq"]["All"]["pq"], atol=1e-5)
    np.testing.assert_allclose(single["ap"]["AP"], sharded["ap"]["AP"],
                               atol=1e-5)


def test_mesh_aware_instance_eval_matches_single_device():
    rec = _tiny_panoptic()
    cfg = loop.model_config(rec, 8, attn_impl="dense")
    ts = loop.setup_state(rec, cfg, loop.make_optimizer(rec))
    single = evaluators.evaluate_instances(rec, None, ts, max_queries=(50,),
                                           max_batches=2)
    sharded = evaluators.evaluate_instances(rec, None, ts, max_queries=(50,),
                                            max_batches=2,
                                            mesh=mesh_lib.make_mesh())
    np.testing.assert_allclose(single[50]["AP"], sharded[50]["AP"],
                               atol=1e-5)


def test_in_training_eval_builds_datasets_once(monkeypatch, tmp_path):
    """With eval_every=1 over 2 epochs (a panoptic recipe, so the PQ/AP
    evaluators run too), make_datasets must be called exactly once — the
    evaluators reuse the loop's cached val set — and the eval-step cache
    must serve every eval epoch from one jitted step."""
    rec = dataclasses.replace(_tiny_panoptic(), num_epochs=2, patience=99)

    calls = {"n": 0}
    real = loop.make_datasets

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(loop, "make_datasets", counting)
    monkeypatch.setattr(evaluators, "make_datasets", counting)
    import maskunet_tpu.tasks.datasets as ds_mod
    monkeypatch.setattr(ds_mod, "make_datasets", counting)

    before = step_lib.cached_eval_step.cache_info()
    loop.train(rec, None, str(tmp_path), max_epochs=2, eval_every=1,
               eval_max_batches=1, log_every=0, verbose=False)
    after = step_lib.cached_eval_step.cache_info()

    assert calls["n"] == 1
    # >=2 eval epochs x (_evaluate_state + evaluate_panoptic) but at most
    # ONE new cache entry for this (cfg, task, mesh) combination
    assert after.misses <= before.misses + 1
    assert after.hits >= before.hits + 2
