"""Same-process A/B of conv formulations on the real chip.

The conv trunk is ~4.7 ms of the ~11.7 ms batch-8 inference forward and a
similar share of training (PERF.md). Most convs have C_in in {64, 128}: as
a direct convolution the MXU contraction depth is C_in — 64 fills half of
the 128-deep systolic array. The im2col formulation concatenates the nine
3x3 taps into one [B*H*W, 9*C_in] @ [9*C_in, C_out] matmul whose
contraction depth 9*C_in >= 576 fills the MXU, at the price of writing the
9x-wider patch tensor through HBM.

Methodology per the PERF.md rules: compile all variants first, interleave
timing rounds, min-of-repeats, scalar-fetch fence.

Usage: python tools/conv_ab.py [batch]
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

# (H, W, Cin, Cout) for every 3x3 conv in the UNet trunk at 128px
# (models/maskattn_unet.py; counts = occurrences per forward)
SHAPES = [
    # 128x128: initial ConvBlock(3->64); up3 block1(128,128,res) +
    # block2(128->64, mid 64)
    (128, 128, 3, 64, 1),
    (128, 128, 64, 64, 2),
    (128, 128, 128, 128, 2),
    (128, 128, 128, 64, 1),
    # 64x64: down1 block1(64,64,res) + block2(64->128); up2
    # block1(256,256,res) + block2(256->64, mid 128)
    (64, 64, 64, 64, 2),
    (64, 64, 64, 128, 1),
    (64, 64, 128, 128, 1),
    (64, 64, 256, 256, 2),
    (64, 64, 256, 128, 1),
    (64, 64, 128, 64, 1),
    # 32x32: down2 block1(128,128,res) + block2(128->256); up1
    # block1(512,512,res) + block2(512->128, mid 256)
    (32, 32, 128, 128, 2),
    (32, 32, 128, 256, 1),
    (32, 32, 256, 256, 1),
    (32, 32, 512, 512, 2),
    (32, 32, 512, 256, 1),
    (32, 32, 256, 128, 1),
    # 16x16: down3 (256,256)x4; bottom1 256->512,512->512;
    # bottom2 512->512 x2; bottom3 512->256,256->256
    (16, 16, 256, 256, 5),
    (16, 16, 256, 512, 1),
    (16, 16, 512, 512, 3),
    (16, 16, 512, 256, 1),
]


def conv_direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(x, w):
    """3x3 SAME conv as one matmul over the 9-tap patch axis."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, i:i + h, j:j + wd, :] for i in range(3) for j in range(3)]
    patches = jnp.concatenate(taps, axis=-1)          # [B,H,W,9C]
    wm = w.reshape(-1, w.shape[-1])                   # [9C, Cout]
    y = jnp.einsum("bhwk,ko->bhwo", patches, wm,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def bench(fn, args, iters=30):
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))   # fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    tot_direct = tot_best = 0.0
    print(f"batch={batch} dtype=bf16   direct(us)  im2col(us)  ratio")
    for h, w, cin, cout, count in SHAPES:
        x = jnp.asarray(rng.normal(size=(batch, h, w, cin)), dtype)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) / 30, dtype)
        fd = jax.jit(conv_direct)
        fi = jax.jit(conv_im2col)
        # correctness
        yd = np.asarray(fd(x, k), np.float32)
        yi = np.asarray(fi(x, k), np.float32)
        err = np.max(np.abs(yd - yi)) / max(np.max(np.abs(yd)), 1e-6)
        td = bench(fd, (x, k))
        ti = bench(fi, (x, k))
        tot_direct += count * td
        tot_best += count * min(td, ti)
        flops = 2 * batch * h * w * 9 * cin * cout
        print(f"{h:4d}x{w:<4d} {cin:4d}->{cout:<4d} x{count}  "
              f"{td * 1e6:9.1f}  {ti * 1e6:9.1f}  {td / ti:5.2f}  "
              f"(direct {flops / td / 1e12:5.1f} TF/s, rel-err {err:.1e})")
    print(f"\nper-forward conv total: direct {tot_direct * 1e3:.2f} ms, "
          f"best-of {tot_best * 1e3:.2f} ms "
          f"({tot_direct / tot_best:.2f}x if switched per-shape)")
    print("CAVEAT: isolated per-op timings through the tunnel are "
          "dispatch-bound (~1.1 ms floor per op) — the ratios above are "
          "not decision-grade. Use tools/conv_model_ab.py, which swaps "
          "the formulation inside the whole jitted forward, before "
          "changing the model's conv path.")


if __name__ == "__main__":
    main()
