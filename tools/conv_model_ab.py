"""In-model same-process A/B: direct conv vs im2col for the UNet trunk.

`tools/conv_ab.py`'s per-op microbench is dispatch-bound through the axon
tunnel (~1.1 ms floor per isolated op regardless of FLOPs — the whole
in-model conv trunk is ~4.7 ms), so per-shape ratios from it are
meaningless. This tool times the FULL jitted flagship forward (and
optionally the train step) twice: stock `lax.conv` vs `layers.conv2d`
monkeypatched to the im2col formulation (nine 3x3 taps concatenated into
one [B*H*W, 9*Cin] @ [9*Cin, Cout] matmul — contraction depth 9*Cin fills
the 128-deep MXU where Cin=64 uses half) for 3x3 SAME stride-1 convs.

Methodology per PERF.md: both variants compiled first, interleaved timing
rounds, min-of-repeats, scalar-fetch fence.

Usage: python tools/conv_model_ab.py [batch] [--train]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from maskunet_tpu.utils import compile_cache

compile_cache.enable()

from maskunet_tpu.core import layers
from maskunet_tpu.models import maskattn_unet as mu

_direct_conv2d = layers.conv2d


def _conv2d_im2col(params, x, *, stride: int = 1, padding: str = "SAME"):
    kernel = params["kernel"].astype(x.dtype)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if (kh, kw) == (1, 1) or stride != 1 or padding != "SAME":
        return _direct_conv2d(params, x, stride=stride, padding=padding)
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, i:i + h, j:j + w, :] for i in range(kh) for j in range(kw)]
    patches = jnp.concatenate(taps, axis=-1)            # [B,H,W,9C]
    wm = kernel.reshape(-1, kernel.shape[-1])           # [9C,Cout]
    y = jnp.einsum("bhwk,ko->bhwo", patches, wm)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 8
    do_train = "--train" in sys.argv
    steps = 20

    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    params, mstate = mu.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 3)).astype(np.float32))
    masks = mu.make_attention_masks(jax.random.key(1), batch, 128)
    infer_params = mu.cast_params_for_inference(
        mu.fold_bn_for_inference(params, mstate, cfg))

    def make_forward():
        @jax.jit
        def forward(p, x):
            out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks,
                              train=False, folded=True)
            return out.semantic
        return forward

    # trace/compile each variant with the patch in place
    print("compiling direct forward...", flush=True)
    t0 = time.perf_counter()
    fwd_direct = make_forward()
    yd = np.asarray(fwd_direct(infer_params, x), np.float32)
    print(f"direct forward ready ({time.perf_counter() - t0:.0f}s)",
          flush=True)
    layers.conv2d = _conv2d_im2col
    try:
        t0 = time.perf_counter()
        fwd_im2col = make_forward()
        yi = np.asarray(fwd_im2col(infer_params, x), np.float32)
        print(f"im2col forward ready ({time.perf_counter() - t0:.0f}s)",
              flush=True)
    finally:
        layers.conv2d = _direct_conv2d
    err = np.max(np.abs(yd - yi)) / max(np.max(np.abs(yd)), 1e-6)
    print(f"forward rel-err direct vs im2col: {err:.2e}")

    variants = [("direct", fwd_direct), ("im2col", fwd_im2col)]
    best = {n: float("inf") for n, _ in variants}
    for _ in range(3):
        for name, fn in variants:
            float(fn(infer_params, x)[0, 0, 0, 0])      # warm
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(infer_params, x)
            float(out[0, 0, 0, 0])                      # fence
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / steps)
    td, ti = best["direct"], best["im2col"]
    print(f"batch={batch} forward: direct {td * 1e3:.2f} ms "
          f"({batch / td:.1f} img/s)  im2col {ti * 1e3:.2f} ms "
          f"({batch / ti:.1f} img/s)  ratio {td / ti:.3f}")

    if do_train:
        import optax
        from maskunet_tpu.core import state as state_lib
        from maskunet_tpu.train import step as step_lib
        labels = jnp.asarray(rng.integers(0, 150, (batch, 128, 128)))
        tx = optax.adamw(5e-5, weight_decay=1e-1)
        batch_data = {"image": x, "label": labels}

        def make_step():
            ts = state_lib.create(jax.random.key(2), params, mstate, tx,
                                  masks=masks)
            st = jax.jit(step_lib.make_train_step(
                cfg, step_lib.TaskConfig(), tx))
            return ts, st

        print("compiling direct train step...", flush=True)
        ts_d, step_d = make_step()
        float(step_d(ts_d, batch_data)[1]["loss"])
        print("compiling im2col train step...", flush=True)
        layers.conv2d = _conv2d_im2col
        try:
            ts_i, step_i = make_step()
            float(step_i(ts_i, batch_data)[1]["loss"])
        finally:
            layers.conv2d = _direct_conv2d
        print("train variants ready", flush=True)
        tbest = {"direct": float("inf"), "im2col": float("inf")}
        for _ in range(3):
            for name, (ts0, st) in (("direct", (ts_d, step_d)),
                                    ("im2col", (ts_i, step_i))):
                ts1 = ts0
                float(st(ts1, batch_data)[1]["loss"])
                t0 = time.perf_counter()
                for _ in range(steps):
                    ts1, m = st(ts1, batch_data)
                float(m["loss"])
                tbest[name] = min(tbest[name],
                                  (time.perf_counter() - t0) / steps)
        td, ti = tbest["direct"], tbest["im2col"]
        print(f"batch={batch} train: direct {td * 1e3:.2f} ms "
              f"({batch / td:.1f} img/s)  im2col {ti * 1e3:.2f} ms "
              f"({batch / ti:.1f} img/s)  ratio {td / ti:.3f}")


if __name__ == "__main__":
    main()
