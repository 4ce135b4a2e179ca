"""AOT model export: serialized StableHLO serving artifacts.

The reference ships no deployment story beyond "run the script with the
checkpoint present" (SURVEY.md §1 — the public interface is the script
itself). This module gives the TPU framework one: `export_serving_artifact`
freezes the *exact* folded serving computation (`serve.build_inference_fn`
— BN-folded, bf16-pre-cast, fixed serving masks) into a `jax.export`
StableHLO artifact with the weights baked in as constants, so the artifact
is a single self-contained file that can be shipped to a serving fleet and
executed without model code, checkpoint plumbing, or a Python dependency on
this package's model definition. `load_serving_artifact` turns it back into
the same `runner(images_uint8) -> class_maps` callable `serve.main` uses,
and `python -m maskunet_tpu.serve --artifact path` serves straight from it.

Artifact layout (a directory):
    model.jaxexport   serialized jax.export.Exported (StableHLO + consts)
    meta.json         img_size / num_classes / batch_size / recipe / dtypes

Forward-compatibility: the serialized form is jax.export's versioned
calling convention, deserializable by newer jax releases.
"""

from __future__ import annotations

import json
import os

import numpy as np

META_NAME = "meta.json"
MODULE_NAME = "model.jaxexport"


def export_serving_artifact(recipe, num_classes: int, workdir: str,
                            tag: str, out_dir: str, *,
                            attn_impl: str = "auto",
                            compute_dtype: str = "bfloat16",
                            batch_size: int | None = None,
                            platforms=None,
                            quantize: str | None = None,
                            calibrate_images: str | None = None) -> str:
    """Export the folded serving forward for `recipe` to `out_dir`.

    `platforms`: optional sequence like ("tpu", "cpu") to lower for
    multiple targets; default is the current backend only.
    `quantize="int8"`: bake int8 conv weights (4x smaller artifact,
    double MXU rate on v5e).
    """
    import jax

    from maskunet_tpu import serve

    forward, infer_params, masks, cfg = serve.build_inference_fn(
        recipe, num_classes, workdir, tag, attn_impl=attn_impl,
        compute_dtype=compute_dtype, batch_size=batch_size,
        quantize=quantize, calibrate_images=calibrate_images)
    batch = batch_size or recipe.batch_size

    # close over weights + serving masks: they become constants in the
    # StableHLO module, making the artifact self-contained (no separate
    # checkpoint to distribute, no skew between weights and code)
    @jax.jit
    def serving_fn(x):
        return forward(infer_params, x)

    spec = jax.ShapeDtypeStruct((batch, cfg.img_size, cfg.img_size, 3),
                                np.uint8)
    exported = jax.export.export(
        serving_fn,
        platforms=tuple(platforms) if platforms else None,
        # the flash path lowers to a Mosaic custom call; exporting it is
        # safe because we only replay on the TPU generation it targets
        disabled_checks=[
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ])(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, MODULE_NAME), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "recipe": recipe.name,
        "img_size": cfg.img_size,
        "num_classes": num_classes,
        "batch_size": batch,
        "compute_dtype": compute_dtype,
        "quantize": quantize,
        "calibrated": bool(calibrate_images),
        "attn_impl": cfg.resolve_attn_impl(),
        "platforms": list(exported.platforms),
        "input_shape": [batch, cfg.img_size, cfg.img_size, 3],
        "output": "uint8 class-id map [batch, img_size, img_size]",
    }
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_serving_artifact(path: str):
    """Load an exported artifact. Returns (runner, meta).

    `runner(images_uint8 [B,H,W,3]) -> class maps [B,H,W]` — the same
    contract as `serve.build_model_runner`, so the HTTP server can serve
    an artifact and a live checkpoint interchangeably.
    """
    import jax

    with open(os.path.join(path, META_NAME)) as f:
        meta = json.load(f)
    with open(os.path.join(path, MODULE_NAME), "rb") as f:
        exported = jax.export.deserialize(f.read())

    call = jax.jit(exported.call)

    def runner(images: np.ndarray) -> np.ndarray:
        return np.asarray(call(np.ascontiguousarray(images, np.uint8)))

    return runner, meta


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a checkpoint as a self-contained serving "
                    "artifact (StableHLO via jax.export)")
    ap.add_argument("--recipe", required=True)
    ap.add_argument("--workdir", default="runs")
    ap.add_argument("--tag", default="best")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--num-classes", type=int, required=True)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--attn-impl", default="auto",
                    choices=["auto", "dense", "flash"])
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--quantize", default=None, choices=["int8"])
    ap.add_argument("--calibrate-images", default=None,
                    help="with --quantize int8: sample-image dir for "
                         "static PTQ activation scales")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu")
    ap.add_argument("--platform", default=None,
                    help="jax platform to trace on (e.g. cpu)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from maskunet_tpu.tasks import recipes as recipes_lib
    recipe = recipes_lib.get(args.recipe)
    platforms = args.platforms.split(",") if args.platforms else None
    out = export_serving_artifact(
        recipe, args.num_classes, args.workdir, args.tag, args.out,
        attn_impl=args.attn_impl, compute_dtype=args.compute_dtype,
        batch_size=args.batch_size, platforms=platforms,
        quantize=args.quantize, calibrate_images=args.calibrate_images)
    with open(os.path.join(out, META_NAME)) as f:
        print(f.read())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
