"""Data-parallel mesh semantics on the virtual 8-device CPU mesh.

The TPU-native analog of the reference's DataParallel (SURVEY.md §2.5):
batch sharded over the `data` axis, params replicated, XLA inserting the
collectives. Asserts DP numerics equal single-device numerics — including
cross-replica BatchNorm statistics (global-batch mean/var).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from maskunet_tpu.core import state as state_lib
from maskunet_tpu.models import maskattn_unet as mu
from maskunet_tpu.parallel import mesh as mesh_lib
from maskunet_tpu.train import step as step_lib


def _setup(batch=8):
    cfg = mu.MaskAttnUNetConfig(c_out=4, img_size=16, attn_impl="dense",
                                dropout_rate=0.0)
    task = step_lib.TaskConfig()
    params, mstate = mu.init(jax.random.key(0), cfg)
    # SGD: AdamW's first-step update is ~sign(grad), which amplifies
    # f32 reduction-order noise into +/-lr flips; SGD keeps the
    # DP-vs-single comparison meaningful.
    tx = optax.sgd(1e-2)
    masks = mu.make_attention_masks(jax.random.key(1), batch, cfg.img_size)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(
            rng.standard_normal((batch, 16, 16, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 4, (batch, 16, 16))),
    }
    return cfg, task, tx, ts, batch_data


def test_mesh_construction():
    mesh = mesh_lib.make_mesh()
    assert mesh.shape[mesh_lib.DATA_AXIS] == 8
    mesh2 = mesh_lib.make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_matches_single_device():
    cfg, task, tx, ts, batch = _setup()
    step = step_lib.make_train_step(cfg, task, tx)

    # single device
    ts1, m1 = jax.jit(step)(ts, batch)

    # 8-way DP
    mesh = mesh_lib.make_mesh()
    ts_sharded = mesh_lib.put_replicated(mesh, ts)
    batch_sharded = mesh_lib.shard_batch(mesh, batch)
    ts8, m8 = jax.jit(step)(ts_sharded, batch_sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["miou"]), float(m8["miou"]),
                               rtol=1e-5)
    # params identical after one update (cross-replica BN + psum grads)
    a = jax.device_get(ts1.params["initial"]["conv1"]["kernel"])
    b = jax.device_get(ts8.params["initial"]["conv1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)
    # BN running stats identical (global-batch statistics)
    sa = jax.device_get(ts1.model_state["initial"]["bn1"]["mean"])
    sb = jax.device_get(ts8.model_state["initial"]["bn1"]["mean"])
    np.testing.assert_allclose(sa, sb, atol=1e-6)


def test_batch_sharding_layout():
    mesh = mesh_lib.make_mesh()
    x = jnp.zeros((8, 4, 4, 3))
    xs = mesh_lib.shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(1, 4, 4, 3)}


@pytest.mark.slow
def test_evaluate_with_mesh_matches_single_device():
    """Sharded evaluation (batch over `data`) equals single-device."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32)
    cfg = loop.model_config(rec, 8, attn_impl="dense")
    tx = optax.adamw(1e-3)
    ts = loop.setup_state(rec, cfg, tx)
    single = loop.evaluate(rec, None, ts, max_batches=2)

    mesh = mesh_lib.make_mesh()
    ts8 = mesh_lib.put_replicated(mesh, ts)
    sharded = loop.evaluate(rec, None, ts8, mesh=mesh, max_batches=2)
    for k in single:
        np.testing.assert_allclose(single[k], sharded[k], rtol=1e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_dp_matches_single_device_flash():
    """DP correctness with the *flash* (Pallas) attention path — the
    configuration every real multi-chip training run uses (VERDICT r1
    missing #2). The Pallas core runs under shard_map with the batch
    partitioned over 'data' (interpret mode on CPU)."""
    cfg = mu.MaskAttnUNetConfig(c_out=4, img_size=16, attn_impl="flash",
                                dropout_rate=0.0)
    task = step_lib.TaskConfig()
    params, mstate = mu.init(jax.random.key(0), cfg)
    tx = optax.sgd(1e-2)
    batch = 8
    masks = mu.make_attention_masks(jax.random.key(1), batch, cfg.img_size)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(
            rng.standard_normal((batch, 16, 16, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 4, (batch, 16, 16))),
    }

    ts1, m1 = jax.jit(step_lib.make_train_step(cfg, task, tx))(ts, batch_data)

    mesh = mesh_lib.make_mesh()
    step8 = step_lib.make_train_step(cfg, task, tx, mesh=mesh)
    ts8, m8 = jax.jit(step8)(mesh_lib.put_replicated(mesh, ts),
                             mesh_lib.shard_batch(mesh, batch_data))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    a = jax.device_get(ts1.params["attn6"]["query"]["kernel"])
    b = jax.device_get(ts8.params["attn6"]["query"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_dp_tp_mesh_matches_single_device():
    """4x2 (data x model) mesh: batch sharded over 'data' AND the 512-ch
    bottleneck sharded over 'model' equals single-device numerics."""
    cfg, task, tx, ts, batch = _setup()
    ts1, m1 = jax.jit(step_lib.make_train_step(cfg, task, tx))(ts, batch)

    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    step = step_lib.make_train_step(cfg, task, tx, mesh=mesh)
    ts8, m8 = jax.jit(step)(mesh_lib.put_replicated(mesh, ts),
                            mesh_lib.shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    a = jax.device_get(ts1.params["bottom2"]["conv1"]["kernel"])
    b = jax.device_get(ts8.params["bottom2"]["conv1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5)
    sa = jax.device_get(ts1.model_state["bottom2"]["bn1"]["mean"])
    sb = jax.device_get(ts8.model_state["bottom2"]["bn1"]["mean"])
    np.testing.assert_allclose(sa, sb, atol=1e-6)
