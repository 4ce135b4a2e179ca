"""The training loop: epochs, cadenced checkpoints, early stop, logging.

Orchestrates the reference's loop behavior (SURVEY.md §2.3) around the
jitted step: per-batch metric accumulation, intra-epoch periodic prints and
checkpoint saves (ade_semantic.py:408-412), per-epoch 'latest' checkpoint
(:426), EarlyStopping on *training* loss saving 'best' (:431), and the
overfit circuit-breaker on mIoU (:420-422). Improvements by design: full
train-state checkpoints (resume restores optimizer/step/RNG/masks),
prefetched input pipeline, jsonl metrics, images/sec meter.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from maskunet_tpu.core import checkpoint as ckpt_lib
from maskunet_tpu.core import metrics_log, state as state_lib
from maskunet_tpu.core.loop_control import EarlyStopping, OverfitGuard
from maskunet_tpu.data import pipeline
from maskunet_tpu.models import maskattn_unet as model_lib
from maskunet_tpu.parallel import mesh as mesh_lib
from maskunet_tpu.tasks.datasets import make_datasets
from maskunet_tpu.tasks.recipes import Recipe
from maskunet_tpu.train import step as step_lib


@dataclasses.dataclass
class TrainResult:
    state: state_lib.TrainState
    history: list[dict]
    best_loss: float
    best_iou: float
    images_per_sec: float
    # why the run ended: "completed" (epoch budget exhausted), "max_steps",
    # "early_stop" (patience on train loss, ade_semantic.py:317-344), or
    # "overfit_guard" (mIoU circuit breaker, ade_semantic.py:420-422) —
    # measurement campaigns record this so a stopped-early row is
    # interpretable without the verbose log
    stop_reason: str = "completed"
    # keep_best_state=True: the state at the EarlyStopping best-loss epoch
    # (the reference persists exactly this via its best checkpoint and
    # reloads it on the next script run, ade_panoptic.py:432-435) — None
    # when the option is off or no epoch ever improved
    best_state: state_lib.TrainState | None = None


def make_optimizer(recipe: Recipe, *, lr_schedule: str | None = None,
                   total_steps: int | None = None,
                   warmup_steps: int = 0):
    """AdamW with an optional learning-rate schedule.

    The reference trains at a constant lr with a commented-out scheduler
    vestige (ade_semantic.py:424); `None` is the faithful default. The
    schedules need `total_steps` (the loop computes it from the dataset
    size and epoch budget)."""
    if lr_schedule is None:
        lr = recipe.lr
    elif total_steps is None:
        raise ValueError("lr_schedule requires total_steps")
    elif lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(recipe.lr, max(total_steps, 1))
    elif lr_schedule == "warmup_cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, recipe.lr, max(warmup_steps, 1),
            max(total_steps, warmup_steps + 1))
    elif lr_schedule == "step":
        # reference-style StepLR: x0.1 every third of the run
        lr = optax.exponential_decay(recipe.lr, max(total_steps // 3, 1),
                                     0.1, staircase=True)
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}; "
                         "use cosine | warmup_cosine | step")
    return optax.adamw(lr, weight_decay=recipe.weight_decay)


def model_config(recipe: Recipe, num_classes: int, *,
                 attn_impl: str = "auto",
                 compute_dtype: str = "float32",
                 remat_attention: bool = False) -> model_lib.MaskAttnUNetConfig:
    return model_lib.MaskAttnUNetConfig(
        c_out=num_classes, img_size=recipe.img_size,
        embed_dim=recipe.embed_dim,
        with_boundary_head=recipe.with_boundary_head,
        attn_impl=attn_impl, compute_dtype=compute_dtype,
        remat_attention=remat_attention,
        attn_output_layout=recipe.attn_output_layout)


def setup_state(recipe: Recipe, cfg: model_lib.MaskAttnUNetConfig, tx,
                *, batch_size: int | None = None) -> state_lib.TrainState:
    rng = jax.random.key(recipe.seed)
    init_rng, mask_rng, state_rng = jax.random.split(rng, 3)
    params, mstate = model_lib.init(init_rng, cfg)
    masks = model_lib.make_attention_masks(
        mask_rng, batch_size or recipe.batch_size, cfg.img_size)
    return state_lib.create(state_rng, params, mstate, tx, masks=masks)


def train(recipe: Recipe, data_root: str | None, workdir: str, *,
          max_steps: int | None = None, max_epochs: int | None = None,
          mesh=None, attn_impl: str = "auto",
          compute_dtype: str = "float32", remat_attention: bool = False,
          resume: bool = False,
          grad_accum: int = 1,
          pipeline_microbatches: int = 1,
          lr_schedule: str | None = None, warmup_steps: int = 0,
          log_every: int = 500, ckpt_every: int = 2000,
          num_io_threads: int = 4, verbose: bool = True,
          data_fraction: float = 1.0,
          debug_nan: bool = False,
          eval_every: int | None = None,
          eval_max_batches: int = 8,
          init_from: str | None = None,
          init_drop: tuple[str, ...] = (),
          cache_examples: bool = True,
          save_checkpoints: bool = True,
          keep_best_state: bool = False,
          step_timeout: float | None = None,
          step_timeout_abort: bool = False,
          profile_dir: str | None = None,
          profile_steps: int = 5) -> TrainResult:
    train_ds, val_ds, num_classes = make_datasets(recipe, data_root)
    if data_fraction < 1.0:
        from maskunet_tpu.data.subset import FractionSubset
        train_ds = FractionSubset(train_ds, data_fraction,
                                  seed=recipe.seed)
    if cache_examples:
        from maskunet_tpu.data.cache import CachedDataset
        train_ds = CachedDataset(train_ds)
        val_ds = CachedDataset(val_ds)
    cfg = model_config(recipe, num_classes, attn_impl=attn_impl,
                       compute_dtype=compute_dtype,
                       remat_attention=remat_attention)
    # pipeline parallelism (2-stage GPipe, parallel/pipeline.py): like
    # grad_accum, each step consumes pipeline_microbatches microbatches of
    # recipe.batch_size — masks and eval stay sized for recipe.batch_size.
    # DP composes: a mesh carrying a 'pipe' axis (make_dp_pipe_mesh, built
    # by the CLI for --pipeline + --n-data) becomes the executor's dp x pp
    # mesh, with the batch sharded over its 'data' axis.
    # grad_accum composes as an outer loop: grad_accum GPipe flushes of
    # pipeline_microbatches microbatches each, one optimizer update.
    pipe_mesh = None
    pp_micro = max(pipeline_microbatches, 1)
    if pp_micro > 1:
        from maskunet_tpu.parallel import pipeline as pp_lib
        if mesh is None:
            pipe_mesh = pp_lib.make_pipe_mesh()
        else:
            # model.apply's in-model (TP) annotations don't run on the PP
            # path; the mesh moves whole to the executor, which is manual
            # over 'pipe' and leaves 'data' to GSPMD
            pipe_mesh = pp_lib.validate_pipe_mesh(mesh)
            mesh = None

    micro_per_step = grad_accum * pp_micro
    epochs_planned = max_epochs if max_epochs is not None else recipe.num_epochs
    steps_per_epoch = max(
        len(train_ds) // (recipe.batch_size * micro_per_step), 1)
    tx = make_optimizer(
        recipe, lr_schedule=lr_schedule, warmup_steps=warmup_steps,
        total_steps=(max_steps if max_steps is not None
                     else epochs_planned * steps_per_epoch))
    ts = setup_state(recipe, cfg, tx)

    if init_from is not None:
        # cross-task warm start (city_semantic.py:331-338 capability):
        # merge matching leaves from another run's checkpoint; `init_drop`
        # prefixes and shape mismatches keep the fresh init
        donor = ckpt_lib.restore_raw(init_from)
        merged, skipped = ckpt_lib.transfer_params(
            jax.device_get(ts.params), donor["params"],
            drop_prefixes=init_drop)
        ts = ts.replace(params=jax.device_put(merged))
        if verbose:
            print(f"warm start from {init_from}; "
                  f"{len(skipped)} leaves kept fresh")

    # Multi-process SPMD (jax.distributed.initialize'd): every process
    # computes the full replicated state, but only the lead process writes
    # checkpoints and metric logs — the others would race on the same files
    # with identical contents. Single-process runs are always the lead.
    is_lead = jax.process_index() == 0
    # save_checkpoints=False: measurement runs (fraction sweeps, plateau
    # campaigns) evaluate the returned in-memory state and never restore —
    # the per-epoch full-state save (hundreds of MB D2H through a remote-
    # device tunnel) would dominate their epoch time on small datasets
    save_lead = is_lead and save_checkpoints

    manager = ckpt_lib.CheckpointManager(workdir, recipe.checkpoint_name)
    if resume and manager.has("latest"):
        ts = manager.restore(ts, "latest")
        if verbose:
            print(f"resumed from step {int(ts.step)}")

    sharding = None
    if mesh is not None:
        ts = mesh_lib.put_replicated(mesh, ts)
        sharding = mesh_lib.batch_sharding(mesh)
    elif pipe_mesh is not None and mesh_lib.DATA_AXIS in pipe_mesh.axis_names:
        # dp x pp: state replicated over the whole mesh, input batches
        # sharded over 'data' (each pipeline microbatch spans all replicas)
        ts = mesh_lib.put_replicated(pipe_mesh, ts)
        sharding = mesh_lib.batch_sharding(pipe_mesh)

    # compaction plans are derived from the masks the state ACTUALLY
    # carries — computed here, after restore/warm-start settled ts.masks,
    # so the per-step graph skips the slot-assignment cumsum+scatter
    mask_plans = model_lib.precompute_mask_plans(ts.masks)
    train_step = jax.jit(
        step_lib.make_train_step(cfg, recipe.task_config, tx, mesh=mesh,
                                 grad_accum=grad_accum,
                                 pipe_mesh=pipe_mesh,
                                 pipe_microbatches=pp_micro,
                                 mask_plans=mask_plans),
        donate_argnums=(0,))
    logger = metrics_log.MetricsLogger(workdir, f"train_{recipe.name}")
    meter = metrics_log.Throughput()
    # `current` indirection: the callback must save the state at call time,
    # not the init-time binding.
    current: dict[str, Any] = {"ts": ts}
    # keep_best_state: device-side copy of (params, BN stats) at each
    # best-loss epoch — the in-memory analog of the reference's best
    # checkpoint for measurement runs with save_checkpoints=False. An
    # HBM-resident jnp.copy (~100 MB at 24.7 M params), not a D2H pull,
    # so long plateau campaigns don't pay a host transfer per improvement.
    best_snap: dict[str, Any] = {}

    def _on_improve() -> None:
        if save_lead:
            manager.save_best(current["ts"])
        if keep_best_state:
            best_snap["pm"] = jax.tree.map(
                jnp.copy, (current["ts"].params, current["ts"].model_state))

    early = EarlyStopping(recipe.patience, verbose=verbose,
                          on_improve=_on_improve)
    guard = OverfitGuard(recipe.overfit_margin)

    # grad_accum / pipeline_microbatches > 1: the loop feeds
    # micro_per_step * batch_size examples per step; the step splits them
    # into microbatches (masks stay sized for recipe.batch_size)
    batches = pipeline.BatchIterator(
        train_ds, recipe.batch_size * micro_per_step, shuffle=True,
        seed=recipe.seed, drop_last=True, num_threads=num_io_threads)
    history: list[dict] = []
    best_loss, best_iou = float("inf"), 0.0
    steps_done = 0
    epochs = epochs_planned   # same budget the lr schedule was built for

    # Device-trace window (the reference has no profiler at all, SURVEY.md
    # §5): skip the first 2 steps (compile + warm cache pollute the
    # trace), capture `profile_steps` steps, parse offline with
    # tools/parse_xplane.py or TensorBoard.
    profile_start = 2 if profile_dir is not None else -1
    profiling = False

    def _maybe_profile(metrics):
        nonlocal profiling
        if steps_done == profile_start:
            jax.block_until_ready(metrics)   # trace only steady-state work
            jax.profiler.start_trace(profile_dir)
            profiling = True
        elif profiling and steps_done >= profile_start + profile_steps:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            profiling = False
            if verbose:
                print(f"device trace ({profile_steps} steps) -> "
                      f"{profile_dir}")

    # Metric consumption trails dispatch by one step: float(metrics[...])
    # blocks on a device->host round trip, which serializes the step
    # pipeline (through a remote-device tunnel each sync costs the full
    # RTT — measured 3x the step time). Instead the async host copy
    # starts at dispatch and is consumed on the NEXT iteration, when the
    # transfer has already completed behind step N+1's compute. Totals
    # are exact — every step is consumed, the last by the epoch flush.
    # --debug-nan opts out (a NaN should name the step that made it).
    def _consume(m, nonlocals):
        loss = float(m["loss"])
        iou = float(m["miou"])
        nonlocals["total_loss"] += loss
        nonlocals["total_iou"] += iou
        nonlocals["count"] += 1

    # --step-timeout: fail-fast on a hung device step (a wedged remote-
    # device tunnel blocks float(metrics) forever and Python cannot
    # interrupt it; the watchdog warns — or exits 42 for a supervisor to
    # restart with --resume). Sized by the caller: must exceed the worst
    # legitimate gap on the STEP path (first-step compile, ~100s at
    # 128px); the epoch-end validation/checkpoint window is paused.
    # Entered manually; the epoch loop's finally tears it down on every
    # exit path (exceptions included — the daemon thread must not
    # outlive train()).
    watchdog = None
    beat = lambda *_: None   # noqa: E731
    if step_timeout:
        from maskunet_tpu.utils.profiling import StallWatchdog
        watchdog = StallWatchdog(step_timeout, abort=step_timeout_abort)
        watchdog.__enter__()
        beat = watchdog.beat

    stop_reason = "completed"
    try:
        for epoch in range(epochs):
            acc = {"total_loss": 0.0, "total_iou": 0.0, "count": 0}
            lagged = None   # dispatched step whose metrics are in flight
            with pipeline.Prefetcher(batches.epoch(epoch),
                                     sharding=sharding) as prefetcher:
                for i, batch in enumerate(prefetcher):
                    batch.pop("valid", None)
                    ts, metrics = train_step(ts, batch)
                    current["ts"] = ts
                    meter.step(recipe.batch_size * micro_per_step)
                    if debug_nan:
                        from maskunet_tpu.utils.profiling import nan_guard
                        nan_guard(metrics, f"step {steps_done}")
                        _consume(metrics, acc)
                    else:
                        for v in metrics.values():
                            v.copy_to_host_async()
                        if lagged is not None:
                            _consume(lagged, acc)
                        lagged = metrics
                    steps_done += 1
                    # progress = the step was dispatched AND the lagged sync
                    # above returned — exactly what a wedged device blocks
                    beat(f"epoch {epoch + 1} step {steps_done}")
                    if profile_start >= 0:
                        _maybe_profile(metrics)
                    if log_every and i % log_every == 0 and i != 0 and verbose \
                            and acc["count"]:
                        print(f"epoch {epoch + 1}: batch[{i}] "
                              f"loss {acc['total_loss'] / acc['count']:.4f} "
                              f"iou {acc['total_iou'] / acc['count']:.4f}")
                    # independent of log_every (the reference nests its save
                    # inside the print cadence, ade_semantic.py:408-412 — here
                    # that coupling silently disabled saves for log_every=0)
                    if ckpt_every and i % ckpt_every == 0 and i != 0 \
                            and save_lead:
                        manager.save_latest(ts)
                    if max_steps is not None and steps_done >= max_steps:
                        break
            if lagged is not None:
                _consume(lagged, acc)
            total_loss, total_iou = acc["total_loss"], acc["total_iou"]
            count = acc["count"]

            if count == 0:
                raise ValueError(
                    f"epoch produced no batches: train set has {len(train_ds)} "
                    f"examples < batch size {recipe.batch_size} (drop_last)")
            avg_loss = total_loss / max(count, 1)
            avg_iou = total_iou / max(count, 1)
            best_loss = min(best_loss, avg_loss)
            best_iou = max(best_iou, avg_iou)
            record = {"epoch": epoch + 1, "loss": avg_loss, "miou": avg_iou,
                      "step": steps_done,
                      "images_per_sec": round(meter.images_per_sec(), 2)}
            # the epoch-end window (in-training validation incl. its
            # first-time eval-step compile, panoptic/instance host
            # decoding, full-state checkpoint D2H) is legitimately much
            # slower than a step timeout sized for the step loop —
            # suspend stall detection rather than kill a healthy run
            if watchdog is not None:
                watchdog.pause(f"epoch {epoch + 1} end "
                               f"(validation/checkpoint window)")
            if eval_every and (epoch + 1) % eval_every == 0:
                # periodic in-training validation (the reference's
                # coco_instance in-loop eval pattern writing train_ap_results
                # .txt, coco_instance.py:345-367). val_pq/val_ap are
                # estimates over eval_max_batches * batch_size images — the
                # sample size is recorded alongside so logs are not mistaken
                # for full-split numbers.
                val = _evaluate_state(recipe, cfg, ts, val_ds,
                                      sharding=sharding, mesh=mesh,
                                      max_batches=eval_max_batches)
                record.update({f"val_{k}": v for k, v in val.items()})
                record["val_sample_images"] = min(
                    eval_max_batches * recipe.batch_size, len(val_ds))
                # the evaluators reuse the already-built (cached) val dataset
                # and the memoized jitted eval step — the second in-training
                # eval does zero dataset construction and zero retracing
                if recipe.task == "panoptic":
                    from maskunet_tpu.tasks import evaluators
                    pan = evaluators.evaluate_panoptic(
                        recipe, data_root, ts, max_batches=eval_max_batches,
                        attn_impl=attn_impl, compute_dtype=compute_dtype,
                        mesh=mesh, dataset=(val_ds, num_classes))
                    record["val_pq"] = pan["pq"]["All"]["pq"]
                    record["val_ap"] = pan["ap"]["AP"]
                elif recipe.task == "instance":
                    from maskunet_tpu.tasks import evaluators
                    q = recipe.eval_max_queries[-1]
                    inst = evaluators.evaluate_instances(
                        recipe, data_root, ts, max_queries=(q,),
                        max_batches=eval_max_batches, attn_impl=attn_impl,
                        compute_dtype=compute_dtype,
                        mesh=mesh, dataset=(val_ds, num_classes))
                    record["val_ap"] = inst[q]["AP"]
            history.append(record)
            if is_lead:
                logger.log(record)
            if verbose:
                print(f"epoch [{epoch + 1}/{epochs}] loss {avg_loss:.4f} "
                      f"iou {avg_iou:.4f} "
                      f"({record['images_per_sec']} img/s)")
            if save_lead:
                manager.save_latest(ts)

            if max_steps is not None and steps_done >= max_steps:
                stop_reason = "max_steps"
                break
            if guard(avg_iou):
                stop_reason = "overfit_guard"
                if verbose:
                    print("overfit guard triggered")
                break
            # early() can save a best checkpoint on improvement (which may
            # block on the previous in-flight async write) — it must stay
            # inside the paused epoch-end window; resume only once the
            # step loop is about to restart
            if early(avg_loss):
                stop_reason = "early_stop"
                if verbose:
                    print("early stopping triggered")
                break
            if watchdog is not None:
                watchdog.resume()

    finally:
        # the armed daemon thread must never outlive train() —
        # a sweep driver that catches this exception and keeps
        # running would be killed (abort) or spammed (warn) by a
        # leaked watchdog receiving no beats
        if watchdog is not None:
            watchdog.__exit__(None, None, None)
    if profiling:   # run ended inside the trace window (max_steps, early
        jax.profiler.stop_trace()   # stop, tiny dataset) — still flush it
    logger.close()
    manager.wait()   # all async checkpoint writes durable before return
    best_state = None
    if "pm" in best_snap:
        bp, bm = best_snap["pm"]
        best_state = ts.replace(params=bp, model_state=bm)
    return TrainResult(ts, history, best_loss, best_iou,
                       meter.images_per_sec(), stop_reason,
                       best_state=best_state)


def _evaluate_state(recipe: Recipe, cfg, ts, val_ds, *, sharding=None,
                    mesh=None, max_batches: int | None = None
                    ) -> dict[str, float]:
    eval_step = step_lib.cached_eval_step(cfg, recipe.task_config,
                                          mesh)
    mask_plans = model_lib.precompute_mask_plans(ts.masks)
    # pad_last so validation sets smaller than a batch still evaluate
    # (padded rows are metric-masked in the eval step)
    batches = pipeline.BatchIterator(
        val_ds, recipe.batch_size, shuffle=False, drop_last=False,
        pad_last=True)
    total: dict[str, float] = {}
    count = 0

    def _add(m) -> None:
        nonlocal count
        host = jax.device_get(m)   # one transfer for all metrics
        for k, v in host.items():
            total[k] = total.get(k, 0.0) + float(v)
        count += 1

    # same one-batch-lag pipeline as the train loop: the async host copy
    # of batch N's metrics completes behind batch N+1's compute
    lagged = None
    with pipeline.Prefetcher(batches.epoch(0),
                             sharding=sharding) as prefetcher:
        for i, batch in enumerate(prefetcher):
            result = eval_step(ts, batch, mask_plans)
            for v in result["metrics"].values():
                v.copy_to_host_async()
            if lagged is not None:
                _add(lagged)
            lagged = result["metrics"]
            if max_batches is not None and i + 1 >= max_batches:
                break
    if lagged is not None:
        _add(lagged)
    if count == 0:
        raise ValueError("validation produced no batches")
    return {k: v / count for k, v in total.items()}


def evaluate(recipe: Recipe, data_root: str | None, ts: state_lib.TrainState,
             *, mesh=None, attn_impl: str = "auto",
             compute_dtype: str = "float32",
             max_batches: int | None = None) -> dict[str, float]:
    """Validation pass: loss + mIoU with running BN stats
    (ade_semantic.py:439-474 — minus its epoch-loop re-running bug)."""
    _, val_ds, num_classes = make_datasets(recipe, data_root)
    cfg = model_config(recipe, num_classes, attn_impl=attn_impl,
                       compute_dtype=compute_dtype)
    sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None
    return _evaluate_state(recipe, cfg, ts, val_ds, sharding=sharding,
                           mesh=mesh, max_batches=max_batches)
