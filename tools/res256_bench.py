"""Measure the advertised 256x256 capability (VERDICT r4 #7).

SCALING.md claims the flash kernel lets 65k-token (256 px) training fit a
single chip. This tool replaces the claim with numbers: inference and
train-step images/sec at 256x256 plus per-phase peak HBM, on the real TPU.

    python tools/res256_bench.py [--batches 1 2 4] [--img 256] [--steps 10]

Prints one JSON line per (phase, batch); non-TPU backends are refused
(CPU interpret-mode flash at 65k tokens is minutes/step and measures
nothing about the chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_hbm_gib() -> float | None:
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return round(peak / 2**30, 3) if peak else None


def compiled_hbm_gib(jfn, *args) -> dict | None:
    """XLA's own memory accounting for the compiled executable.

    Remote-device backends (the axon tunnel) don't expose runtime
    memory_stats, so the capability number comes from the compiler:
    argument + output + temp (activations/workspace) bytes of the exact
    executable being timed. This is the allocation XLA reserves — the
    binding figure for 'does it fit', independent of allocator noise.
    """
    try:
        ma = jfn.lower(*args).compile().memory_analysis()
        if ma is None:
            return None
        args_b = int(ma.argument_size_in_bytes)
        out_b = int(ma.output_size_in_bytes)
        tmp_b = int(ma.temp_size_in_bytes)
        # donated inputs alias outputs; XLA reports alias bytes separately
        alias_b = int(getattr(ma, "alias_size_in_bytes", 0))
        return {
            "hbm_args_gib": round(args_b / 2**30, 3),
            "hbm_temp_gib": round(tmp_b / 2**30, 3),
            "hbm_total_gib": round(
                (args_b + out_b + tmp_b - alias_b) / 2**30, 3),
        }
    except Exception:
        return None


def run(img: int, batch: int, steps: int, train: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.train import step as step_lib

    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=img,
                                compute_dtype="bfloat16",
                                attn_impl="flash")
    params, mstate = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, img, img, 3)).astype(np.float32))
    masks = mu.make_attention_masks(jax.random.key(1), batch, img)
    mask_plans = mu.precompute_mask_plans(masks)

    if train:
        labels = jnp.asarray(rng.integers(0, 150, (batch, img, img)))
        tx = optax.adamw(5e-5, weight_decay=1e-1)
        ts = state_lib.create(jax.random.key(2), params, mstate, tx,
                              masks=masks)
        fn = jax.jit(
            step_lib.make_train_step(cfg, step_lib.TaskConfig(), tx,
                                     mask_plans=mask_plans),
            donate_argnums=(0,))
        mem = compiled_hbm_gib(fn, ts, {"image": x, "label": labels})
        ts, m = fn(ts, {"image": x, "label": labels})
        assert np.isfinite(float(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(steps):
            ts, m = fn(ts, {"image": x, "label": labels})
        float(m["loss"])                 # host fetch = reliable fence
    else:
        infer_params = mu.cast_params_for_inference(
            mu.fold_bn_for_inference(params, mstate, cfg))

        @jax.jit
        def fwd(p, x):
            out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks,
                              train=False, folded=True,
                              mask_plans=mask_plans)
            return out.semantic

        mem = compiled_hbm_gib(fwd, infer_params, x)
        out = fwd(infer_params, x)
        assert np.isfinite(float(out[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fwd(infer_params, x)
        float(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    row = {
        "phase": "train" if train else "inference",
        "img_size": img,
        "batch": batch,
        "images_per_sec": round(batch * steps / dt, 2),
        "ms_per_image": round(1000 * dt / (batch * steps), 2),
        "peak_hbm_gib": peak_hbm_gib(),
    }
    if mem:
        row.update(mem)
    return row


def _child(img: int, batch: int, steps: int, phase: str) -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import jax

    if jax.default_backend() != "tpu":
        raise SystemExit("res256_bench measures the real chip; backend is "
                         f"{jax.default_backend()}")
    print(json.dumps(run(img, batch, steps, phase == "train")), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--child", nargs=2, default=None,
                    metavar=("PHASE", "BATCH"),
                    help="internal: one measurement in this process")
    args = ap.parse_args()
    if args.child:
        _child(args.img, int(args.child[1]), args.steps, args.child[0])
        return

    # one subprocess per (phase, batch): device memory_stats' peak is
    # cumulative for the process, so a shared process would attribute the
    # largest run's peak to every row
    import subprocess
    for batch in args.batches:
        for phase in ("inference", "train"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--img", str(args.img), "--steps", str(args.steps),
                   "--child", phase, str(batch)]
            try:
                res = subprocess.run(cmd, stdout=subprocess.PIPE,
                                     text=True, timeout=1800)
            except subprocess.TimeoutExpired:
                # a tunnel stall on one row must not lose the rest
                print(json.dumps({
                    "phase": phase, "img_size": args.img, "batch": batch,
                    "error": "child timed out (1800s)"}), flush=True)
                continue
            lines = [ln for ln in (res.stdout or "").splitlines() if ln]
            if res.returncode == 0 and lines:
                print(lines[-1], flush=True)
            else:
                # OOM / abort is a data point: the capability boundary
                print(json.dumps({
                    "phase": phase, "img_size": args.img, "batch": batch,
                    "error": f"child exited {res.returncode}"}), flush=True)


if __name__ == "__main__":
    main()
