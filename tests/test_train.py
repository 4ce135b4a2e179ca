"""Train-step integration: loss decreases, state round-trips, transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from maskunet_tpu.core import checkpoint, state as state_lib
from maskunet_tpu.models import maskattn_unet as mu
from maskunet_tpu.train import step as step_lib


def _setup(task=None, cfg=None, seed=0, batch=4):
    cfg = cfg or mu.MaskAttnUNetConfig(c_out=4, img_size=16,
                                       attn_impl="dense")
    task = task or step_lib.TaskConfig()
    params, mstate = mu.init(jax.random.key(seed), cfg)
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    masks = mu.make_attention_masks(jax.random.key(seed + 1), batch,
                                    cfg.img_size)
    ts = state_lib.create(jax.random.key(seed + 2), params, mstate, tx,
                          masks=masks)
    return cfg, task, tx, ts


def _synthetic_batch(cfg, batch=4, seed=0, with_instance=False):
    """Learnable task: label = quadrant index of the pixel."""
    rng = np.random.default_rng(seed)
    h = cfg.img_size
    yy, xx = np.mgrid[0:h, 0:h]
    label = (yy >= h // 2) * 2 + (xx >= h // 2)
    labels = np.broadcast_to(label, (batch, h, h)).astype(np.int32)
    images = (labels[..., None] / 3.0 +
              0.05 * rng.standard_normal((batch, h, h, 3))).astype(np.float32)
    out = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    if with_instance:
        out["instance"] = jnp.asarray(labels + 1)
    return out


@pytest.mark.slow
def test_loss_decreases_semantic():
    cfg, task, tx, ts = _setup()
    train_step = jax.jit(step_lib.make_train_step(cfg, task, tx))
    batch = _synthetic_batch(cfg)
    first = None
    for i in range(30):
        ts, metrics = train_step(ts, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.8, (first, last)
    assert int(ts.step) == 30
    assert float(metrics["miou"]) > 0.2


def test_panoptic_blend_runs():
    cfg = mu.MaskAttnUNetConfig(c_out=4, img_size=16, attn_impl="dense")
    task = step_lib.TaskConfig(ce_weight=0.9, triplet_weight=0.1)
    _, _, tx, ts = _setup(task, cfg)
    train_step = jax.jit(step_lib.make_train_step(cfg, task, tx))
    batch = _synthetic_batch(cfg, with_instance=True)
    ts, metrics = train_step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "triplet_loss" in metrics


@pytest.mark.slow
def test_instance_embed_variant_runs():
    cfg = mu.MaskAttnUNetConfig(c_out=4, img_size=16, embed_dim=16,
                                with_boundary_head=True, attn_impl="dense")
    task = step_lib.TaskConfig(ce_weight=1.0, triplet_weight=0.5,
                               triplet_features="embeddings",
                               ignore_index=255, triplet_ignore_label=255)
    _, _, tx, ts = _setup(task, cfg)
    train_step = jax.jit(step_lib.make_train_step(cfg, task, tx))
    batch = _synthetic_batch(cfg, with_instance=True)
    ts, metrics = train_step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    cfg, task, tx, ts = _setup()
    train_step = jax.jit(step_lib.make_train_step(cfg, task, tx))
    batch = _synthetic_batch(cfg)
    ts, _ = train_step(ts, batch)

    path = str(tmp_path / "ckpt.msgpack")
    checkpoint.save(path, ts)
    restored = checkpoint.restore(path, ts)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(ts.params), restored.params)
    assert int(restored.step) == int(ts.step)

    # training continues identically from a restored state
    ts2, m2 = train_step(restored, batch)
    ts1, m1 = train_step(ts, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_transfer_params_head_swap():
    """Cross-task warm start drops the c_out-dependent head
    (city_semantic.py:333-338 capability)."""
    cfg_a = mu.MaskAttnUNetConfig(c_out=4, img_size=16)
    cfg_b = mu.MaskAttnUNetConfig(c_out=7, img_size=16)
    pa, _ = mu.init(jax.random.key(0), cfg_a)
    pb, _ = mu.init(jax.random.key(1), cfg_b)
    merged, skipped = checkpoint.transfer_params(pb, pa)
    # trunk transferred
    np.testing.assert_array_equal(
        np.asarray(merged["initial"]["conv1"]["kernel"]),
        np.asarray(pa["initial"]["conv1"]["kernel"]))
    # mismatched head kept from fresh init
    np.testing.assert_array_equal(
        np.asarray(merged["final_conv"]["kernel"]),
        np.asarray(pb["final_conv"]["kernel"]))
    assert any(k[0] == "final_conv" for k in skipped)


def test_eval_step_outputs():
    cfg, task, tx, ts = _setup()
    eval_step = jax.jit(step_lib.make_eval_step(cfg, task))
    batch = _synthetic_batch(cfg)
    result = eval_step(ts, batch)
    assert result["pred"].shape == (4, 16, 16)
    assert result["prob"].shape == (4, 16, 16, 4)
    np.testing.assert_allclose(
        np.asarray(result["prob"]).sum(-1), 1.0, rtol=1e-4)


def test_early_stopping_and_overfit_guard():
    from maskunet_tpu.core.loop_control import EarlyStopping, OverfitGuard
    saves = []
    es = EarlyStopping(patience=2, on_improve=lambda: saves.append(1))
    assert not es(1.0) and not es(0.9)      # improvements
    assert not es(1.1)                      # counter 1
    assert es(1.2)                          # counter 2 -> stop
    assert len(saves) == 2

    og = OverfitGuard(margin=0.1)
    assert not og(0.5)
    assert not og(0.45)
    assert og(0.35)


@pytest.mark.slow
def test_warm_start_via_loop(tmp_path):
    """Cross-task warm start: 3-head panoptic checkpoint -> semantic run
    (the city_semantic.py:333-338 capability, structure-independent)."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    donor_rec = dataclasses.replace(
        recipes_lib.get("synthetic_panoptic"), img_size=32,
        checkpoint_name="donor")
    donor = loop.train(donor_rec, None, str(tmp_path), max_epochs=1,
                       log_every=0, verbose=False)

    target_rec = dataclasses.replace(
        recipes_lib.get("synthetic_semantic"), img_size=32,
        checkpoint_name="target")
    res = loop.train(target_rec, None, str(tmp_path), max_epochs=1,
                     log_every=0, verbose=False,
                     init_from=str(tmp_path / "donor_best.msgpack"),
                     init_drop=("final_conv", "final_bn"))
    # warm-started run should beat a cold epoch-1 (which lands ~0.4)
    assert res.history[0]["miou"] > 0.4


def test_profile_dir_writes_device_trace(tmp_path):
    """--profile-dir captures an xplane trace of steady-state steps and
    stops cleanly even when the run ends inside the trace window."""
    import dataclasses
    import glob

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, checkpoint_name="prof")
    trace_dir = tmp_path / "trace"
    loop.train(rec, None, str(tmp_path), max_steps=4, log_every=0,
               verbose=False, profile_dir=str(trace_dir),
               profile_steps=100)   # window larger than the run
    files = glob.glob(str(trace_dir / "**" / "*.xplane.pb"),
                      recursive=True)
    assert files, "no xplane trace written"


@pytest.mark.slow
def test_training_dynamics_match_torch_oracle():
    """Lockstep training parity: same weights, batches, masks -> per-step
    losses match torch (AdamW + BN stats + grads through all layers)."""
    import torch
    from torch_oracle import OracleUNet, load_params

    img, c_out, batch, lr, wd = 16, 5, 4, 1e-3, 1e-2
    cfg = mu.MaskAttnUNetConfig(c_out=c_out, img_size=img,
                                dropout_rate=0.0, attn_impl="dense")
    params, mstate = mu.init(jax.random.key(0), cfg)
    masks = mu.make_attention_masks(jax.random.key(1), batch, img)
    masks = tuple(m.at[..., 0].set(True) for m in masks)

    oracle = OracleUNet(3, c_out, img)
    load_params(oracle, jax.tree.map(np.asarray, params))
    oracle.train(True)
    opt = torch.optim.AdamW(oracle.parameters(), lr=lr, weight_decay=wd)
    criterion = torch.nn.CrossEntropyLoss()
    t_masks = [torch.from_numpy(np.asarray(m)) for m in masks]

    tx = optax.adamw(lr, weight_decay=wd)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    train_step = jax.jit(step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx))

    rng = np.random.default_rng(0)
    for i in range(8):
        x = rng.standard_normal((batch, img, img, 3)).astype(np.float32)
        y = rng.integers(0, c_out, (batch, img, img))
        ts, metrics = train_step(ts, {"image": jnp.asarray(x),
                                      "label": jnp.asarray(y)})
        opt.zero_grad()
        out = oracle(torch.from_numpy(x).permute(0, 3, 1, 2), t_masks)
        loss = criterion(out, torch.from_numpy(y).long())
        loss.backward()
        opt.step()
        rel = abs(float(metrics["loss"]) - float(loss)) / float(loss)
        assert rel < 5e-3, (i, float(metrics["loss"]), float(loss))


def test_async_checkpoint_manager_roundtrip(tmp_path):
    cfg, task, tx, ts = _setup()
    manager = checkpoint.CheckpointManager(str(tmp_path), "async")
    manager.save_latest(ts)
    manager.save_best(ts)
    manager.save_latest(ts)          # second in-flight save for same tag
    assert manager.has("latest")     # waits for pending writes
    restored = manager.restore(ts, "latest")
    np.testing.assert_array_equal(
        np.asarray(restored.params["initial"]["conv1"]["kernel"]),
        np.asarray(ts.params["initial"]["conv1"]["kernel"]))


def test_async_checkpoint_save_failure_raises(tmp_path):
    """A failed async save must surface in wait()/has(), not report
    success with no durable checkpoint (ADVICE r1)."""
    import pytest

    cfg, task, tx, ts = _setup()
    manager = checkpoint.CheckpointManager(str(tmp_path), "failing")
    blocker = tmp_path / "blocker"
    blocker.write_text("not a directory")
    manager.directory = str(blocker)   # open() inside save -> ENOTDIR
    manager.save_latest(ts)
    with pytest.raises(RuntimeError, match="checkpoint save"):
        manager.wait()
    # manager is usable again after the error was surfaced
    manager.directory = str(tmp_path)
    manager.save_latest(ts)
    assert manager.has("latest")


@pytest.mark.slow
def test_ckpt_every_decoupled_from_log_every(tmp_path, monkeypatch):
    """Intra-epoch checkpoints fire on their own cadence even with
    log_every=0 (the reference nests them; decoupled here by design)."""
    from maskunet_tpu.core import checkpoint as ckpt_lib
    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop as loop_lib

    calls = []
    orig = ckpt_lib.CheckpointManager.save_latest

    def counting(self, state):
        calls.append(1)
        return orig(self, state)

    monkeypatch.setattr(ckpt_lib.CheckpointManager, "save_latest", counting)
    rec = recipes_lib.get("synthetic_semantic")
    import dataclasses
    rec = dataclasses.replace(rec, img_size=16, batch_size=2)
    loop_lib.train(rec, None, str(tmp_path), max_epochs=1, max_steps=5,
                   log_every=0, ckpt_every=2, verbose=False)
    # intra-epoch saves at i=2 and i=4 plus the epoch-end save
    assert len(calls) >= 3


def test_stop_reason_recorded(tmp_path):
    """TrainResult.stop_reason distinguishes a budget-exhausted run from
    the reference's two circuit breakers — measurement campaigns
    (plateau, fraction sweep) record it per row so a stopped-early run
    is interpretable without the verbose log."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop as loop_lib

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=2)
    res = loop_lib.train(rec, None, str(tmp_path), max_epochs=1,
                         log_every=0, verbose=False,
                         save_checkpoints=False)
    assert res.stop_reason == "completed"
    res = loop_lib.train(rec, None, str(tmp_path), max_epochs=5,
                         max_steps=3, log_every=0, verbose=False,
                         save_checkpoints=False)
    assert res.stop_reason == "max_steps"


def test_keep_best_state_snapshots_early_stop_best(tmp_path):
    """keep_best_state=True returns the state at the EarlyStopping
    best-loss epoch (the reference reloads exactly that checkpoint on
    its next script run, ade_panoptic.py:432-435) — it must survive the
    donating train step and differ from post-best final weights."""
    import dataclasses

    import jax
    import numpy as np

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop as loop_lib

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=2)
    res = loop_lib.train(rec, None, str(tmp_path), max_epochs=3,
                         log_every=0, verbose=False,
                         save_checkpoints=False, keep_best_state=True)
    assert res.best_state is not None
    # best epoch's params are usable (buffers not donated away)
    leaves = jax.tree_util.tree_leaves(
        jax.device_get(res.best_state.params))
    assert all(np.all(np.isfinite(l)) for l in leaves)
    best_losses = [h["loss"] for h in res.history]
    if best_losses.index(min(best_losses)) < len(best_losses) - 1:
        # best epoch was not the last -> snapshot must differ from final
        diff = jax.tree_util.tree_map(
            lambda a, b: float(abs(a - b).max()),
            jax.device_get(res.best_state.params),
            jax.device_get(res.state.params))
        assert max(jax.tree_util.tree_leaves(diff)) > 0.0
    # off by default: no snapshot kept
    res2 = loop_lib.train(rec, None, str(tmp_path), max_epochs=1,
                          log_every=0, verbose=False,
                          save_checkpoints=False)
    assert res2.best_state is None


def test_step_timeout_watchdog_through_loop(tmp_path):
    """--step-timeout threads a StallWatchdog around the step loop; a
    healthy run beats it every step and finishes clean (the stall path
    itself is unit-tested in test_utils)."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop as loop_lib

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=2)
    res = loop_lib.train(rec, None, str(tmp_path), max_epochs=1,
                         log_every=0, verbose=False,
                         save_checkpoints=False, step_timeout=600.0)
    assert res.stop_reason == "completed" and len(res.history) == 1


def test_save_checkpoints_off_writes_nothing(tmp_path):
    """save_checkpoints=False (measurement runs: fraction sweep, plateau
    campaign) must skip every save cadence — epoch-end latest, best-on-
    improve, and intra-epoch ckpt_every — while training normally."""
    import dataclasses
    import glob

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop as loop_lib

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=2)
    res = loop_lib.train(rec, None, str(tmp_path), max_epochs=2,
                         max_steps=6, log_every=0, ckpt_every=2,
                         verbose=False, save_checkpoints=False)
    assert len(res.history) >= 1   # it did train
    assert glob.glob(str(tmp_path / "*.msgpack")) == []


def test_async_save_safe_under_donation(tmp_path):
    """An async save must capture the state's values even though the very
    next (donating) train step invalidates the device buffers — the D2H
    copies are enqueued before the step can reuse them."""
    cfg, task, tx, ts = _setup()
    train_step = jax.jit(step_lib.make_train_step(cfg, task, tx),
                         donate_argnums=(0,))
    batch = _synthetic_batch(cfg)
    ts, _ = train_step(ts, batch)
    snapshot = jax.device_get(ts.params["initial"]["conv1"]["kernel"])

    manager = checkpoint.CheckpointManager(str(tmp_path), "donated")
    manager.save_latest(ts)              # async; do NOT wait
    ts, _ = train_step(ts, batch)        # donates the saved state's buffers
    manager.wait()
    restored = manager.restore(ts, "latest")
    np.testing.assert_array_equal(
        np.asarray(restored.params["initial"]["conv1"]["kernel"]),
        snapshot)


def test_async_save_oom_falls_back_to_host_snapshot(tmp_path, monkeypatch):
    """When the on-device snapshot cannot allocate (HBM near capacity a
    second full state copy would OOM), the async save falls back to the
    synchronous host snapshot instead of failing the save."""
    cfg, task, tx, ts = _setup()

    def exhausted(state):
        raise RuntimeError("RESOURCE_EXHAUSTED: while allocating snapshot")

    monkeypatch.setattr(checkpoint, "_device_snapshot", exhausted)
    manager = checkpoint.CheckpointManager(str(tmp_path), "oomfb")
    manager.save_latest(ts)
    manager.wait()
    restored = manager.restore(ts, "latest")
    np.testing.assert_array_equal(
        np.asarray(restored.params["initial"]["conv1"]["kernel"]),
        np.asarray(ts.params["initial"]["conv1"]["kernel"]))


@pytest.mark.slow
def test_grad_accum_matches_manual_average():
    """grad_accum=2 produces the average of the two microbatch gradients
    (one optimizer update; BN stats threaded through the scan)."""
    cfg, task, tx, ts = _setup(batch=2)   # masks sized for the microbatch
    b1 = _synthetic_batch(cfg, batch=2, seed=1)
    b2 = _synthetic_batch(cfg, batch=2, seed=2)
    big = {k: jnp.concatenate([b1[k], b2[k]]) for k in b1}

    accum_step = jax.jit(step_lib.make_train_step(cfg, task, tx,
                                                  grad_accum=2))
    ts_a, m_a = accum_step(ts, big)
    assert np.isfinite(float(m_a["loss"]))
    assert int(ts_a.step) == 1

    # manual: average the two per-microbatch grads with the same RNG
    # derivation, single tx.update
    import optax

    rng = jax.random.fold_in(ts.rng, ts.step)
    _, dropout_rng, triplet_rng = jax.random.split(rng, 3)
    from maskunet_tpu.models import maskattn_unet as model
    from maskunet_tpu.train.step import _compute_loss

    def grads_for(batch, mstate, i):
        def loss_fn(p):
            out, new_ms = model.apply(
                p, mstate, batch["image"], cfg=cfg, masks=ts.masks,
                train=True, dropout_rng=jax.random.fold_in(dropout_rng, i))
            loss, _ = _compute_loss(out, batch, task,
                                    jax.random.fold_in(triplet_rng, i))
            return loss, new_ms
        return jax.grad(loss_fn, has_aux=True)(ts.params)

    g1, ms1 = grads_for(b1, ts.model_state, 0)
    g2, _ = grads_for(b2, ms1, 1)
    gavg = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    updates, _ = tx.update(gavg, ts.opt_state, ts.params)
    manual = jax.tree.map(lambda p, u: p + u, ts.params, updates)
    np.testing.assert_allclose(
        np.asarray(ts_a.params["initial"]["conv1"]["kernel"]),
        np.asarray(manual["initial"]["conv1"]["kernel"]),
        atol=1e-6, rtol=1e-6)


def test_grad_accum_via_loop(tmp_path):
    """The loop feeds grad_accum*batch examples per step and trains."""
    import dataclasses

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=2)
    res = loop.train(rec, None, str(tmp_path), max_epochs=1, max_steps=2,
                     log_every=0, verbose=False, grad_accum=2)
    assert res.history[0]["step"] == 2
    assert np.isfinite(res.history[0]["loss"])


def test_lr_schedule_and_inference_restore(tmp_path):
    """Scheduled-optimizer training runs, and an inference consumer with
    a plain constant-lr template can restore its checkpoint (the optax
    state structures differ; restore_for_inference skips opt state)."""
    import dataclasses

    from maskunet_tpu.core import checkpoint as ckpt_lib
    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=2)
    res = loop.train(rec, None, str(tmp_path), max_epochs=1, max_steps=3,
                     log_every=0, verbose=False,
                     lr_schedule="warmup_cosine", warmup_steps=2)
    assert np.isfinite(res.history[0]["loss"])

    cfg = loop.model_config(rec, 8)
    plain_tx = optax.adamw(rec.lr)
    template = loop.setup_state(rec, cfg, plain_tx)
    manager = ckpt_lib.CheckpointManager(str(tmp_path),
                                         rec.checkpoint_name)
    restored = manager.restore_for_inference(template, "latest")
    np.testing.assert_array_equal(
        np.asarray(restored.params["initial"]["conv1"]["kernel"]),
        np.asarray(jax.device_get(res.state.params
                                  )["initial"]["conv1"]["kernel"]))
    assert int(restored.step) == 3


@pytest.mark.slow
def test_train_step_with_mask_plans_matches(monkeypatch):
    """make_train_step(mask_plans=...) is numerically identical to the
    in-graph slot assignment on the cached mask policy (flash path with
    compaction engaged). (The fast bitwise equivalents live in
    test_attention.py; this locks the train-step threading.)"""
    from maskunet_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "COMPACT_MIN_TOKENS", 256)
    cfg = mu.MaskAttnUNetConfig(c_out=4, img_size=32, attn_impl="flash")
    _, task, tx, ts = _setup(cfg=cfg, batch=2)
    batch = _synthetic_batch(cfg, batch=2)
    plans = mu.precompute_mask_plans(ts.masks)
    assert any(p is not None for p in plans)   # compaction engaged

    step_inline = jax.jit(step_lib.make_train_step(cfg, task, tx))
    step_plan = jax.jit(step_lib.make_train_step(cfg, task, tx,
                                                 mask_plans=plans))
    ts_a, m_a = step_inline(ts, batch)
    ts_b, m_b = step_plan(ts, batch)
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7),
        ts_a.params, ts_b.params)


def test_remat_attention_identical_numerics():
    """`remat_attention=True` (jax.checkpoint around the attn() wrapper in
    maskattn_unet.apply, gated by cfg.remat_attention) trades backward-pass
    HBM for recompute FLOPs —
    the loss and the updated params must be indistinguishable from the
    stored-activation path."""
    cfg_a = mu.MaskAttnUNetConfig(c_out=4, img_size=16, attn_impl="dense")
    cfg_b = mu.MaskAttnUNetConfig(c_out=4, img_size=16, attn_impl="dense",
                                  remat_attention=True)
    _, task, tx, ts = _setup(cfg=cfg_a)
    batch = _synthetic_batch(cfg_a)

    ts_a, m_a = jax.jit(step_lib.make_train_step(cfg_a, task, tx))(ts, batch)
    ts_b, m_b = jax.jit(step_lib.make_train_step(cfg_b, task, tx))(ts, batch)
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7),
        ts_a.params, ts_b.params)


def test_cli_dp_preflight_rejects_indivisible_batch(capsys):
    """--n-data must divide the recipe batch (cli.py DP preflight): the
    batch-1 recipes (city_semantic/city_panoptic, tasks/recipes.py) would
    otherwise fail deep inside device_put with a shape error."""
    from maskunet_tpu import cli
    rc = cli.main(["train", "--recipe", "city_semantic", "--n-data", "8"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "batch_size=1" in err and "--n-data=8" in err


def test_cli_rejects_abort_without_timeout(capsys):
    """--step-timeout-abort without --step-timeout arms no watchdog at
    all (loop.train gates on `if step_timeout:`) — the CLI must refuse
    rather than silently run unsupervised."""
    from maskunet_tpu import cli
    rc = cli.main(["train", "--recipe", "ade_semantic",
                   "--step-timeout-abort"])
    assert rc == 2
    assert "--step-timeout" in capsys.readouterr().err


def test_watchdog_torn_down_when_train_raises(tmp_path):
    """The armed watchdog daemon must not outlive train() on the
    exception path: a sweep driver that catches the error and keeps
    running would otherwise be killed (abort mode) or spammed (warn
    mode) by a leaked thread receiving no beats."""
    import dataclasses
    import threading

    import pytest

    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.train import loop as loop_lib

    # batch_size 128 > the 64-example synthetic train set -> drop_last
    # yields zero batches -> ValueError from inside the epoch loop
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=16, batch_size=128)
    with pytest.raises(ValueError, match="no batches"):
        loop_lib.train(rec, None, str(tmp_path), max_epochs=1,
                       log_every=0, verbose=False, save_checkpoints=False,
                       step_timeout=0.5)
    assert not any(t.name == "stall-watchdog" and t.is_alive()
                   for t in threading.enumerate())
