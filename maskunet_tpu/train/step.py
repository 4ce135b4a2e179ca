"""Jitted train / eval steps for all task families.

One factory covers the reference's four training-loop patterns
(SURVEY.md §2.3):

- semantic:            CE                       (ade_semantic.py:399)
- panoptic:            0.9*CE + 0.1*triplet on sem logits
                       (ade_panoptic.py:461-463, coco_panoptic.py:549-552)
- instance (embed):    CE(ignore 255) + 0.5*triplet on 16-d embeddings
                       (city_instance.py:374-376)
- instance (summed):   CE on the summed-mask integer target
                       (coco_instance.py:331-341 — dataset-side transform)

expressed as (ce_weight, triplet_weight, triplet_features, ignore_index).

The attention-mask policy mirrors the reference's run-long mask caching:
'cached' reuses the mask pytree carried in TrainState (regenerating only if
absent), 'fresh' draws new Bernoulli masks every step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from maskunet_tpu.core.state import TrainState
from maskunet_tpu.losses.cross_entropy import cross_entropy
from maskunet_tpu.losses.triplet import instance_triplet_loss
from maskunet_tpu.models import maskattn_unet as model
from maskunet_tpu.ops import metrics_ops
from maskunet_tpu.parallel import pipeline as pipeline_lib


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    ce_weight: float = 1.0
    triplet_weight: float = 0.0
    triplet_features: str = "logits"      # 'logits' | 'embeddings'
    ignore_index: int | None = None       # CE ignore (255 for cityscapes)
    triplet_ignore_label: int | None = None
    triplet_samples: int = 32
    mask_policy: str = "cached"           # 'cached' | 'fresh'


def _compute_loss(out: model.ModelOutput, batch: dict, task: TaskConfig,
                  triplet_rng: jax.Array) -> tuple[jax.Array, dict]:
    logits = out.semantic.astype(jnp.float32)
    ce = cross_entropy(logits, batch["label"], task.ignore_index)
    loss = task.ce_weight * ce
    metrics = {"ce_loss": ce}
    # triplet term requires instance labels; inference batches (predict
    # path) carry none — CE-only loss there
    if task.triplet_weight > 0.0 and "instance" in batch:
        feats = (out.embeddings if task.triplet_features == "embeddings"
                 else logits)
        tri = instance_triplet_loss(
            feats, batch["instance"], triplet_rng,
            num_samples=task.triplet_samples,
            ignore_label=task.triplet_ignore_label)
        loss = loss + task.triplet_weight * tri
        metrics["triplet_loss"] = tri
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(cfg: model.MaskAttnUNetConfig, task: TaskConfig,
                    tx, mesh=None, grad_accum: int = 1, mask_plans=None,
                    pipe_mesh=None, pipe_microbatches: int = 1
                    ) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Returns a pure step(ts, batch) -> (ts, metrics), ready for jit/pjit.
    `mesh` enables in-model sharding annotations (DP batch + bottleneck TP).

    `mask_plans`: `model.precompute_mask_plans(ts.masks)` — MUST be
    derived from the exact masks the state carries (compute it after any
    checkpoint restore). Used only on the 'cached' mask policy; the
    'fresh' policy regenerates masks per step and recomputes plans
    in-graph.

    `grad_accum > 1`: the batch's leading dim is split into that many
    microbatches processed sequentially under `lax.scan`; gradients are
    averaged into ONE optimizer update (large effective batches beyond
    per-chip memory). The cached attention masks apply per microbatch, so
    `ts.masks` must be sized for batch/(grad_accum*pipe_microbatches) —
    the model-forward microbatch, whichever knobs split it. BatchNorm batch
    statistics are per-microbatch (running stats thread through the scan)
    — the same semantics as per-replica BN, documented divergence from a
    monolithic large batch.

    `pipe_mesh` + `pipe_microbatches > 1`: the batch is split into that
    many microbatches run through the 2-stage GPipe executor
    (`parallel/pipeline.py` — encoder on stage 0, decoder on stage 1,
    skips via ppermute). One GLOBAL loss over all microbatch outputs and
    one optimizer update per step; `ts.masks` must be sized for
    batch/pipe_microbatches (same per-microbatch convention as
    grad_accum). Data parallelism composes by passing a ('data', 'pipe')
    mesh from `pipeline.make_dp_pipe_mesh` as `pipe_mesh` (the executor is
    manual over `pipe` only; batch sharded over the auto `data` axis) —
    the separate `mesh` argument is for the NON-pipelined path's in-model
    annotations and stays mutually exclusive. `grad_accum` composes as an
    OUTER loop: each of the grad_accum accumulation chunks (batch_size *
    pipe_microbatches rows) runs one full GPipe flush, and gradients are
    averaged over chunks into one optimizer update (effective batch =
    batch_size * pipe_microbatches * grad_accum). Loss-weighting nuance
    vs grad_accum: the pipelined loss is a global CE mean weighting every
    valid pixel of a flush equally, while grad_accum averages per-chunk
    means — they differ only when `ignore_index` leaves unequal valid
    counts per chunk."""
    if pipe_mesh is not None:
        pipeline_lib.validate_pipe_mesh(pipe_mesh)
        if mesh is not None:
            raise ValueError("pass DP/TP either as `mesh` (non-pipelined) "
                             "or as a ('data', 'pipe') `pipe_mesh` "
                             "(pipeline.make_dp_pipe_mesh), not both")
        if pipe_microbatches < 2:
            raise ValueError("pipe_microbatches must be >= 2 with a "
                             "pipe_mesh (1 microbatch has no overlap)")
    else:
        pipe_microbatches = 1

    def grads_and_metrics(params, mstate, batch, masks, plans, dropout_rng,
                          triplet_rng):
        def loss_fn(params):
            if pipe_mesh is not None:
                x_micro = pipeline_lib.split_microbatches(
                    batch["image"], pipe_microbatches)
                out_m, new_mstate = pipeline_lib.pipeline_apply(
                    params, mstate, x_micro, cfg=cfg, mesh=pipe_mesh,
                    masks=masks, train=True, dropout_rng=dropout_rng,
                    mask_plans=plans)
                # [M, mb, ...] -> [M*mb, ...] so the loss/metrics see the
                # full batch exactly as the non-pipelined path does
                out = jax.tree.map(
                    lambda a: a.reshape((-1,) + a.shape[2:]), out_m)
            else:
                out, new_mstate = model.apply(
                    params, mstate, batch["image"], cfg=cfg,
                    masks=masks, train=True, dropout_rng=dropout_rng,
                    mesh=mesh, mask_plans=plans)
            loss, metrics = _compute_loss(out, batch, task, triplet_rng)
            return loss, (metrics, new_mstate, out)

        grads, (metrics, new_mstate, out) = jax.grad(
            loss_fn, has_aux=True)(params)
        metrics["miou"] = metrics_ops.mean_iou(
            out.semantic, batch["label"], cfg.c_out)
        return grads, metrics, new_mstate

    def step(ts: TrainState, batch: dict):
        rng = jax.random.fold_in(ts.rng, ts.step)
        mask_rng, dropout_rng, triplet_rng = jax.random.split(rng, 3)
        micro = batch["image"].shape[0] // (grad_accum * pipe_microbatches)
        if task.mask_policy == "fresh" or ts.masks is None:
            masks = model.make_attention_masks(mask_rng, micro,
                                               cfg.img_size)
            plans = None               # per-step masks: plan in-graph
        else:
            masks = ts.masks
            plans = mask_plans

        if grad_accum == 1:
            grads, metrics, new_mstate = grads_and_metrics(
                ts.params, ts.model_state, batch, masks, plans, dropout_rng,
                triplet_rng)
        else:
            # with pipeline parallelism each accumulation chunk is itself
            # pipe_microbatches microbatches — the GPipe executor splits
            # it again inside loss_fn
            chunk = micro * pipe_microbatches
            stacked = {k: v.reshape((grad_accum, chunk) + v.shape[1:])
                       for k, v in batch.items()}

            def body(carry, mb):
                mstate, acc, i = carry
                d_rng = jax.random.fold_in(dropout_rng, i)
                t_rng = jax.random.fold_in(triplet_rng, i)
                g, m, mstate = grads_and_metrics(
                    ts.params, mstate, mb, masks, plans, d_rng, t_rng)
                acc = jax.tree.map(lambda a, b: a + b, acc, g)
                return (mstate, acc, i + 1), m

            zeros = jax.tree.map(jnp.zeros_like, ts.params)
            (new_mstate, gsum, _), ms = jax.lax.scan(
                body, (ts.model_state, zeros, 0), stacked)
            grads = jax.tree.map(lambda g: g / grad_accum, gsum)
            metrics = jax.tree.map(jnp.mean, ms)

        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = jax.tree.map(lambda p, u: p + u, ts.params, updates)
        new_ts = ts.replace(step=ts.step + 1, params=new_params,
                            model_state=new_mstate, opt_state=new_opt,
                            masks=masks)
        return new_ts, metrics

    return step


@functools.lru_cache(maxsize=16)
def cached_eval_step(cfg: model.MaskAttnUNetConfig, task: TaskConfig,
                     mesh=None) -> Callable[[TrainState, dict], dict]:
    """Memoized jitted eval step.

    Every caller that builds a fresh `jax.jit(make_eval_step(...))`
    closure defeats jit's own trace cache (a new function identity per
    call -> retrace per call, VERDICT r2 weak #4). cfg/task are frozen
    dataclasses and jax.sharding.Mesh is hashable, so one jitted step per
    (cfg, task, mesh) is shared by the training loop's in-training
    validation, `loop.evaluate`, and the instance/panoptic evaluators."""
    return jax.jit(make_eval_step(cfg, task, mesh=mesh))


def make_eval_step(cfg: model.MaskAttnUNetConfig, task: TaskConfig,
                   mesh=None) -> Callable[[TrainState, dict], dict]:
    """Eval step: running BN stats, no dropout; returns metrics + argmax
    prediction map (for host-side instance/panoptic decoding).

    `step(ts, batch, mask_plans=None)`: pass
    `model.precompute_mask_plans(ts.masks)` (computed ONCE per eval run,
    outside the per-batch loop) to skip the in-graph compaction slot
    assignment — plans are a traced argument, so the one jitted step per
    (cfg, task, mesh) stays shared across runs with different masks."""

    def step(ts: TrainState, batch: dict, mask_plans=None):
        masks = ts.masks
        if masks is None:
            masks = model.make_attention_masks(
                ts.rng, batch["image"].shape[0], cfg.img_size)
            mask_plans = None          # per-call masks: plan in-graph
        # padded eval rows (pipeline pad_last) are masked out of every
        # metric via the negative-label convention
        valid = batch.get("valid")
        if valid is not None:
            batch = dict(batch)
            batch["label"] = jnp.where(valid[:, None, None],
                                       batch["label"], -1)
            if "instance" in batch:
                batch["instance"] = jnp.where(valid[:, None, None],
                                              batch["instance"], 0)
        out, _ = model.apply(ts.params, ts.model_state, batch["image"],
                             cfg=cfg, masks=masks, train=False, mesh=mesh,
                             mask_plans=mask_plans)
        _, metrics = _compute_loss(out, batch, task,
                                   jax.random.fold_in(ts.rng, 1))
        metrics["miou"] = metrics_ops.mean_iou(
            out.semantic, batch["label"], cfg.c_out)
        result = {
            "metrics": metrics,
            "pred": metrics_ops.predictions(out.semantic),
            "prob": metrics_ops.probabilities(out.semantic),
        }
        if out.embeddings is not None:
            result["embeddings"] = out.embeddings
        return result

    return step
