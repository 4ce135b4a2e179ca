"""Command-line entry points.

The reference's "CLI" is `python <script>.py` with constants at the top of
each of nine scripts (SURVEY.md §1); here the nine recipes are named
configs:

    python -m maskunet_tpu.cli recipes
    python -m maskunet_tpu.cli train --recipe ade_semantic \
        --data-root /data/ADEK --workdir runs/ade [--max-steps N]
    python -m maskunet_tpu.cli evaluate --recipe ade_semantic \
        --data-root /data/ADEK --workdir runs/ade [--tag best]
    python -m maskunet_tpu.cli visualize --recipe ... --workdir runs/ade
    python -m maskunet_tpu.cli predict --recipe ... --images dir/ --out masks/
    python -m maskunet_tpu.cli import-torch --recipe ... \
        --torch-checkpoint checkpoint_ade.pth   # reference .pth -> ours
    python -m maskunet_tpu.serve --recipe ... --port 8799   # HTTP serving
    python bench.py [batch]                   # one-line JSON throughput
"""

from __future__ import annotations

import argparse
import json
import sys

from maskunet_tpu.utils.compile_cache import raise_cpu_collective_watchdog

# before jax backend init (see the docstring): a virtual CPU mesh
# (--platform cpu smoke runs of --pipeline/--n-data) would otherwise hit
# XLA:CPU's 40 s collective watchdog on slow hosts
raise_cpu_collective_watchdog()


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--recipe", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--workdir", default="runs")
    p.add_argument("--attn-impl", default="auto",
                   choices=["auto", "dense", "flash"])
    p.add_argument("--attn-output-layout", default="auto",
                   choices=["auto", "transpose", "literal_view"],
                   help="attention-output un-flatten semantics. auto: "
                        "'literal_view' when the workdir checkpoint was "
                        "imported from a reference .pth (those weights "
                        "encode the reference's raw .view(B,C,H,W) "
                        "scramble, ade_semantic.py:190 — recorded by "
                        "import-torch in a sidecar), else 'transpose' "
                        "(this framework's intended layout)")
    p.add_argument("--compute-dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="auto: bfloat16 on TPU (validated end-to-end, "
                        "see PARITY.md), float32 elsewhere")
    p.add_argument("--n-data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu for a smoke run)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "before device/mesh setup (TPU pod slices)")
    p.add_argument("--coordinator", default=None,
                   help="with --distributed: coordinator address "
                        "(host:port); omit to auto-detect from the "
                        "cluster environment (TPU metadata / SLURM)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="with --distributed: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="with --distributed: this process's index")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="maskunet_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("recipes", help="list available recipes")

    tp = sub.add_parser("train")
    _add_common(tp)
    tp.add_argument("--max-steps", type=int, default=None)
    tp.add_argument("--max-epochs", type=int, default=None)
    tp.add_argument("--resume", action="store_true")
    tp.add_argument("--log-every", type=int, default=500)
    tp.add_argument("--data-fraction", type=float, default=1.0,
                    help="seeded random train-set fraction (sweep support)")
    tp.add_argument("--debug-nan", action="store_true",
                    help="raise on non-finite step metrics")
    tp.add_argument("--step-timeout", type=float, default=None,
                    metavar="SEC",
                    help="warn if no training step completes for SEC "
                         "seconds (hung device / dead tunnel detection; "
                         "size it above the first-step compile, ~100s)")
    tp.add_argument("--step-timeout-abort", action="store_true",
                    help="with --step-timeout: exit 42 on a stall "
                         "instead of warning, so a supervisor can "
                         "restart the run with --resume")
    tp.add_argument("--no-cache", action="store_true",
                    help="disable the in-RAM decoded-example cache")
    tp.add_argument("--remat-attention", action="store_true",
                    help="jax.checkpoint the attention blocks: recompute "
                         "them in the backward instead of storing "
                         "activations (HBM headroom for larger batches / "
                         "resolutions; numerics are unchanged)")
    tp.add_argument("--grad-accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step "
                         "(effective batch = batch_size * grad_accum, "
                         "times M when composed with --pipeline M)")
    tp.add_argument("--img-size", type=int, default=None,
                    help="override the recipe's training resolution "
                         "(e.g. 16/32 for CPU smoke runs; checkpoints "
                         "record the size they were trained at)")
    tp.add_argument("--pipeline", type=int, default=1, metavar="M",
                    help="pipeline parallelism: run M >= 2 microbatches of "
                         "batch_size per step through the 2-stage GPipe "
                         "(encoder | decoder over the first two devices); "
                         "one global loss and optimizer update per step. "
                         "Composes with --n-data N (a data x pipe mesh "
                         "over N*2 devices) and with --grad-accum K "
                         "(K accumulated flushes per optimizer update)")
    tp.add_argument("--lr-schedule", default=None,
                    choices=["cosine", "warmup_cosine", "step"],
                    help="optional lr schedule (default: the reference's "
                         "constant lr)")
    tp.add_argument("--warmup-steps", type=int, default=0)
    tp.add_argument("--eval-every", type=int, default=None,
                    help="run validation every N epochs (logged as val_*)")
    tp.add_argument("--eval-max-batches", type=int, default=8,
                    help="batches per in-training validation pass "
                         "(val_* metrics are estimates over this sample; "
                         "val_sample_images is logged alongside)")
    tp.add_argument("--init-from", default=None,
                    help="warm-start params from another run's checkpoint")
    tp.add_argument("--init-drop", nargs="*", default=[],
                    help="param path prefixes to keep fresh (e.g. "
                         "final_conv final_bn for a head swap)")
    tp.add_argument("--profile-dir", default=None,
                    help="capture a device trace of a few steady-state "
                         "steps to this directory (view in TensorBoard "
                         "or tools/parse_xplane.py)")
    tp.add_argument("--profile-steps", type=int, default=5,
                    help="steps in the trace window (default 5)")

    ep = sub.add_parser("evaluate")
    _add_common(ep)
    ep.add_argument("--tag", default="best", choices=["best", "latest"])
    ep.add_argument("--max-batches", type=int, default=None)
    ep.add_argument("--mode", default="semantic",
                    choices=["semantic", "instances", "panoptic"],
                    help="semantic: loss+mIoU; instances: AP with "
                         "max_queries sweep; panoptic: AP+PQ+mIoU")
    ep.add_argument("--max-queries", type=int, nargs="+", default=None,
                    help="default: the recipe's reference sweep")
    ep.add_argument("--split", default="val", choices=["val", "train"],
                    help="instances mode: evaluate on the train split "
                         "(the reference's city_instance quirk)")
    ep.add_argument("--export-dir", default=None,
                    help="panoptic mode: write id2rgb prediction PNGs + "
                         "predictions.json here")

    vp = sub.add_parser("visualize", help="save sample + prediction panels")
    _add_common(vp)
    vp.add_argument("--tag", default="best", choices=["best", "latest"])
    vp.add_argument("--index", type=int, default=0)
    vp.add_argument("--out", default="viz")

    pp = sub.add_parser("predict",
                        help="batch inference over a directory of images")
    _add_common(pp)
    pp.add_argument("--tag", default="best", choices=["best", "latest"])
    pp.add_argument("--images", required=True)
    pp.add_argument("--out", default="predictions")
    pp.add_argument("--num-classes", type=int, default=None,
                    help="override when no dataset root is given")
    pp.add_argument("--panels", action="store_true")
    pp.add_argument("--instances", action="store_true",
                    help="also decode and write instance-id maps "
                         "(DBSCAN over embeddings for 3-head models, "
                         "per-class connected components otherwise)")
    pp.add_argument("--panoptic", action="store_true",
                    help="also write panopticapi-layout panoptic "
                         "predictions (id2rgb PNGs + segments json)")

    ip = sub.add_parser(
        "import-torch",
        help="convert a reference PyTorch .pth state_dict into a "
             "checkpoint this package's evaluate/predict/serve/train "
             "--init-from can load")
    _add_common(ip)
    ip.add_argument("--torch-checkpoint", required=True,
                    help="reference checkpoint (e.g. checkpoint_ade.pth)")
    ip.add_argument("--num-classes", type=int, default=None,
                    help="override when no dataset root is given")

    xp = sub.add_parser(
        "export",
        help="freeze a checkpoint into a self-contained StableHLO "
             "serving artifact (see maskunet_tpu.export)")
    _add_common(xp)
    xp.add_argument("--tag", default="best", choices=["best", "latest"])
    xp.add_argument("--out", required=True, help="artifact directory")
    xp.add_argument("--num-classes", type=int, default=None,
                    help="override when no dataset root is given")
    xp.add_argument("--batch-size", type=int, default=None)
    xp.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu")
    xp.add_argument("--quantize", default=None, choices=["int8"],
                    help="bake int8 conv weights (4x smaller artifact, "
                         "double MXU rate; not bit-parity with bf16)")
    xp.add_argument("--calibrate-images", default=None,
                    help="with --quantize int8: sample-image dir for "
                         "static PTQ activation scales")

    args = parser.parse_args(argv)

    if args.cmd == "recipes":
        from maskunet_tpu.tasks.recipes import RECIPES
        for name, r in sorted(RECIPES.items()):
            print(f"{name:22s} {r.dataset:10s} {r.task:9s} "
                  f"batch={r.batch_size:<3d} lr={r.lr:g} wd={r.weight_decay:g}")
        return 0

    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "distributed", False):
        import jax
        # explicit coordinator/process args for SPMD launchers without
        # cluster auto-detection (and for the 1-process smoke test);
        # bare initialize() auto-detects on TPU pods / SLURM
        jax.distributed.initialize(
            coordinator_address=getattr(args, "coordinator", None),
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None))

    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()

    from maskunet_tpu.tasks import recipes as recipes_lib
    try:
        recipe = recipes_lib.get(args.recipe)
    except KeyError as e:
        print(f"error: {e.args[0]}", file=sys.stderr)
        return 2

    if getattr(args, "img_size", None):
        import dataclasses
        recipe = dataclasses.replace(recipe, img_size=args.img_size)

    # attention-output layout: explicit flag wins; 'auto' resolves from
    # the import-torch sidecar so reference-trained checkpoints evaluate/
    # serve with the layout their weights were trained under
    layout = getattr(args, "attn_output_layout", "auto")
    if layout == "auto":
        if args.cmd == "import-torch":
            layout = "literal_view"   # provenance: a reference .pth
        else:
            from maskunet_tpu.core import checkpoint as _ckpt_meta
            meta = _ckpt_meta.read_import_meta(
                getattr(args, "workdir", "runs"), recipe.checkpoint_name)
            layout = (meta or {}).get("attn_output_layout", "transpose")
    if layout != recipe.attn_output_layout:
        import dataclasses
        recipe = dataclasses.replace(recipe, attn_output_layout=layout)
        if layout == "literal_view":
            print(f"attention-output layout: literal_view "
                  f"(reference-checkpoint semantics)", file=sys.stderr)

    if getattr(args, "compute_dtype", None) == "auto":
        # bf16 is the validated TPU default (same accuracy as f32 on the
        # end-to-end synthetic convergence run, see PARITY.md) and ~2x
        # the MXU throughput; f32 elsewhere (CPU matmuls gain nothing)
        import jax
        args.compute_dtype = ("bfloat16"
                              if jax.default_backend() == "tpu"
                              else "float32")

    mesh = None
    if args.n_data is not None:
        # DP preflight: the global batch is sharded over the data axis, so it
        # must divide evenly — fail here with a one-line message instead of
        # deep inside device_put (city_semantic/city_panoptic have batch 1).
        if recipe.batch_size % args.n_data != 0:
            print(f"error: recipe '{recipe.name}' batch_size="
                  f"{recipe.batch_size} is not divisible by --n-data="
                  f"{args.n_data}; pick --n-data that divides the batch "
                  f"(or a recipe with a larger batch)", file=sys.stderr)
            return 2
        if getattr(args, "pipeline", 1) > 1:
            # dp x pp: the pipeline executor wants the 'pipe' axis ON the
            # mesh (manual over pipe, GSPMD-auto over data)
            from maskunet_tpu.parallel import pipeline as pp_lib
            mesh = pp_lib.make_dp_pipe_mesh(n_data=args.n_data)
        else:
            from maskunet_tpu.parallel import mesh as mesh_lib
            mesh = mesh_lib.make_mesh(n_data=args.n_data)

    if args.cmd == "train":
        if (getattr(args, "step_timeout_abort", False)
                and not getattr(args, "step_timeout", None)):
            # without a timeout no watchdog is armed — refuse rather than
            # silently run unsupervised when the operator asked for abort
            print("error: --step-timeout-abort requires --step-timeout "
                  "(no watchdog is armed without a timeout)",
                  file=sys.stderr)
            return 2
        from maskunet_tpu.train import loop
        result = loop.train(
            recipe, args.data_root, args.workdir,
            max_steps=args.max_steps, max_epochs=args.max_epochs,
            mesh=mesh, attn_impl=args.attn_impl,
            compute_dtype=args.compute_dtype,
            remat_attention=args.remat_attention, resume=args.resume,
            grad_accum=args.grad_accum,
            pipeline_microbatches=args.pipeline,
            lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
            log_every=args.log_every, data_fraction=args.data_fraction,
            debug_nan=args.debug_nan, eval_every=args.eval_every,
            eval_max_batches=args.eval_max_batches,
            init_from=args.init_from, init_drop=tuple(args.init_drop),
            cache_examples=not args.no_cache,
            step_timeout=args.step_timeout,
            step_timeout_abort=args.step_timeout_abort,
            profile_dir=args.profile_dir,
            profile_steps=args.profile_steps)
        print(json.dumps({
            "recipe": recipe.name,
            "best_loss": result.best_loss,
            "best_iou": result.best_iou,
            "images_per_sec": result.images_per_sec,
        }))
        return 0

    if args.cmd == "evaluate":
        import optax

        from maskunet_tpu.core import checkpoint as ckpt_lib
        from maskunet_tpu.tasks.datasets import make_datasets
        from maskunet_tpu.train import loop

        _, _, num_classes = make_datasets(recipe, args.data_root)
        cfg = loop.model_config(recipe, num_classes,
                                attn_impl=args.attn_impl,
                                compute_dtype=args.compute_dtype)
        tx = optax.adamw(recipe.lr, weight_decay=recipe.weight_decay)
        ts = loop.setup_state(recipe, cfg, tx)
        manager = ckpt_lib.CheckpointManager(args.workdir,
                                             recipe.checkpoint_name)
        ts = manager.restore_for_inference(ts, args.tag)
        if args.mode == "semantic":
            metrics = loop.evaluate(recipe, args.data_root, ts, mesh=mesh,
                                    attn_impl=args.attn_impl,
                                    compute_dtype=args.compute_dtype,
                                    max_batches=args.max_batches)
            print(json.dumps({"recipe": recipe.name, **metrics}))
        elif args.mode == "instances":
            from maskunet_tpu.tasks import evaluators
            results = evaluators.evaluate_instances(
                recipe, args.data_root, ts,
                max_queries=(tuple(args.max_queries)
                             if args.max_queries else None),
                max_batches=args.max_batches, attn_impl=args.attn_impl,
                compute_dtype=args.compute_dtype, split=args.split)
            print(json.dumps({"recipe": recipe.name,
                              "instances": {str(k): v for k, v in
                                            results.items()}}))
        else:
            from maskunet_tpu.tasks import evaluators
            out = evaluators.evaluate_panoptic(
                recipe, args.data_root, ts,
                max_batches=args.max_batches, attn_impl=args.attn_impl,
                compute_dtype=args.compute_dtype,
                export_dir=args.export_dir)
            print(json.dumps({"recipe": recipe.name, **out}))
        return 0

    if args.cmd == "visualize":
        import os

        import numpy as np
        import optax

        from maskunet_tpu.core import checkpoint as ckpt_lib
        from maskunet_tpu.data import pipeline
        from maskunet_tpu.tasks.datasets import make_datasets
        from maskunet_tpu.train import loop, step as step_lib
        from maskunet_tpu.utils import visualize
        import jax

        _, val_ds, num_classes = make_datasets(recipe, args.data_root)
        cfg = loop.model_config(recipe, num_classes,
                                attn_impl=args.attn_impl,
                                compute_dtype=args.compute_dtype)
        tx = optax.adamw(recipe.lr, weight_decay=recipe.weight_decay)
        ts = loop.setup_state(recipe, cfg, tx)
        manager = ckpt_lib.CheckpointManager(args.workdir,
                                             recipe.checkpoint_name)
        if manager.has(args.tag):
            ts = manager.restore_for_inference(ts, args.tag)
        os.makedirs(args.out, exist_ok=True)
        example = val_ds[args.index]
        visualize.save_sample(example, os.path.join(args.out, "sample.png"))
        eval_step = jax.jit(step_lib.make_eval_step(cfg, recipe.task_config))
        batch = pipeline.to_device(
            {k: np.repeat(v[None], recipe.batch_size, axis=0)
             for k, v in example.items()})
        result = eval_step(ts, batch)
        visualize.save_prediction(
            example["image"], example["label"],
            np.asarray(result["pred"])[0],
            os.path.join(args.out, "prediction.png"))
        print(json.dumps({"saved": [os.path.join(args.out, "sample.png"),
                                    os.path.join(args.out,
                                                 "prediction.png")]}))
        return 0

    if args.cmd == "predict":
        import optax

        from maskunet_tpu.core import checkpoint as ckpt_lib
        from maskunet_tpu.tasks import predict as predict_lib
        from maskunet_tpu.train import loop

        if args.num_classes is not None:
            num_classes = args.num_classes
        else:
            from maskunet_tpu.tasks.datasets import make_datasets
            _, _, num_classes = make_datasets(recipe, args.data_root)
        cfg = loop.model_config(recipe, num_classes,
                                attn_impl=args.attn_impl,
                                compute_dtype=args.compute_dtype)
        tx = optax.adamw(recipe.lr, weight_decay=recipe.weight_decay)
        ts = loop.setup_state(recipe, cfg, tx)
        manager = ckpt_lib.CheckpointManager(args.workdir,
                                             recipe.checkpoint_name)
        ts = manager.restore_for_inference(ts, args.tag)
        written = predict_lib.predict_directory(
            recipe, ts, args.images, args.out, num_classes=num_classes,
            attn_impl=args.attn_impl, compute_dtype=args.compute_dtype,
            save_panels=args.panels, save_instances=args.instances,
            save_panoptic=args.panoptic)
        print(json.dumps({"written": len(written), "out": args.out}))
        return 0

    if args.cmd == "export":
        from maskunet_tpu import export as export_lib

        if args.num_classes is not None:
            num_classes = args.num_classes
        else:
            from maskunet_tpu.tasks.datasets import make_datasets
            _, _, num_classes = make_datasets(recipe, args.data_root)
        platforms = args.platforms.split(",") if args.platforms else None
        out = export_lib.export_serving_artifact(
            recipe, num_classes, args.workdir, args.tag, args.out,
            attn_impl=args.attn_impl, compute_dtype=args.compute_dtype,
            batch_size=args.batch_size, platforms=platforms,
            quantize=args.quantize,
            calibrate_images=args.calibrate_images)
        import os
        print(json.dumps({"exported": out,
                          "bytes": os.path.getsize(
                              os.path.join(out, export_lib.MODULE_NAME))}))
        return 0

    if args.cmd == "import-torch":
        import optax

        from maskunet_tpu.core import checkpoint as ckpt_lib
        from maskunet_tpu.train import loop
        from maskunet_tpu.utils import torch_import

        if args.num_classes is not None:
            num_classes = args.num_classes
        else:
            from maskunet_tpu.tasks.datasets import make_datasets
            _, _, num_classes = make_datasets(recipe, args.data_root)
        cfg = loop.model_config(recipe, num_classes,
                                attn_impl=args.attn_impl,
                                compute_dtype=args.compute_dtype)
        tx = optax.adamw(recipe.lr, weight_decay=recipe.weight_decay)
        ts = loop.setup_state(recipe, cfg, tx)
        sd = torch_import.load_torch_checkpoint(args.torch_checkpoint)
        params, mstate, report = torch_import.convert_state_dict(
            sd, ts.params, ts.model_state, embed_dim=cfg.embed_dim,
            with_boundary_head=cfg.with_boundary_head)
        if report["unexpected"]:
            print(f"warning: unmapped checkpoint keys: "
                  f"{report['unexpected']}", file=sys.stderr)
        ts = ts.replace(params=params, model_state=mstate)
        manager = ckpt_lib.CheckpointManager(args.workdir,
                                             recipe.checkpoint_name,
                                             async_saves=False)
        # write both tags: evaluate/predict/serve default to 'best',
        # resume/--init-from read 'latest'
        path = manager.save_best(ts)
        manager.save_latest(ts)
        # provenance sidecar: evaluate/predict/serve/export resolve
        # --attn-output-layout=auto from this
        ckpt_lib.write_import_meta(
            args.workdir, recipe.checkpoint_name,
            {"attn_output_layout": recipe.attn_output_layout,
             "source": args.torch_checkpoint})
        print(json.dumps({"imported": args.torch_checkpoint,
                          "checkpoint": path,
                          "attn_output_layout": recipe.attn_output_layout,
                          "ignored_keys": len(report["ignored"])}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
