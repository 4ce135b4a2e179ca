"""Exact FLOPs accounting + measured MFU for inference and training.

VERDICT r3 #4: publish model FLOPs (convs + compacted attention) and the
measured MFU on the chip. The reference's figures/comparison.png claims
11 GFLOPs / 46 M params at 128^2; the code's actual model is 24.69 M
params (test-locked) — this tool does the same correction for FLOPs.

FLOPs model (per image, batch-independent):
- conv h*w*kh*kw*cin*cout MACs (x2 for FLOPs); backward 2x forward
  (dW and dX each cost one forward-equivalent).
- attention: fused QKV projection 3*L*C^2 MACs; score/PV matmuls
  L*Lk*C each, where Lk is the COMPACTED key count (the Bernoulli(0.5)
  mask halves the key set; capacity = _key_capacity(L)). Forward = 2
  score-shaped matmuls; merged backward = 5 (dv, dp, dk, dq, + the
  recomputed s) — see ops/flash_attention._bwd_kernel.
- AdamW update + BN/GELU/LN elementwise are O(params + activations)
  VPU work, not MXU FLOPs: excluded from MFU numerators (standard MFU
  convention), which makes the reported MFU slightly conservative as a
  utilization figure.

    python tools/mfu_report.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12   # TPU v5e: 197 TF/s bf16 per chip (public spec)


def conv_flops(h, w, kh, kw, cin, cout):
    return 2 * h * w * kh * kw * cin * cout


def convblock_flops(h, w, cin, cout, mid=None):
    mid = mid if mid is not None else cout
    return (conv_flops(h, w, 3, 3, cin, mid)
            + conv_flops(h, w, 3, 3, mid, cout))


def model_flops(img: int = 128, c_out: int = 150,
                compacted: bool = True) -> dict:
    """Per-image forward MXU FLOPs, split conv-trunk vs attention."""
    from maskunet_tpu.ops.flash_attention import (COMPACT_MIN_TOKENS,
                                                  _key_capacity)

    s = img
    conv = convblock_flops(s, s, 3, 64)                      # initial
    # down1: @s/2 res(64->64) + (64->128) + trailing BN
    conv += convblock_flops(s // 2, s // 2, 64, 64)
    conv += convblock_flops(s // 2, s // 2, 64, 128)
    # down2: @s/4 res(128) + (128->256)
    conv += convblock_flops(s // 4, s // 4, 128, 128)
    conv += convblock_flops(s // 4, s // 4, 128, 256)
    # down3: @s/8 res(256) + (256->256)
    conv += convblock_flops(s // 8, s // 8, 256, 256)
    conv += convblock_flops(s // 8, s // 8, 256, 256)
    # bottom @s/8: 256->512, 512->512, 512->256
    conv += convblock_flops(s // 8, s // 8, 256, 512)
    conv += convblock_flops(s // 8, s // 8, 512, 512)
    conv += convblock_flops(s // 8, s // 8, 512, 256)
    # up1 @s/4: cat 512 -> res(512) + (512->128, mid 256)
    conv += convblock_flops(s // 4, s // 4, 512, 512)
    conv += convblock_flops(s // 4, s // 4, 512, 128, mid=256)
    # up2 @s/2: cat 256 -> res(256) + (256->64, mid 128)
    conv += convblock_flops(s // 2, s // 2, 256, 256)
    conv += convblock_flops(s // 2, s // 2, 256, 64, mid=128)
    # up3 @s: cat 128 -> res(128) + (128->64, mid 64)
    conv += convblock_flops(s, s, 128, 128)
    conv += convblock_flops(s, s, 128, 64, mid=64)
    conv += conv_flops(s, s, 1, 1, 64, c_out)                # final head
    # bilinear upsample as matmuls: row expand [t, t/2] @ x, then col
    ups = 0
    for t, ch_in in ((s // 4, 256), (s // 2, 128), (s, 64)):
        # rows: [t, t/2] @ [t/2, t/2*ch] then cols; per channel ch_in
        ups += 2 * t * (t // 2) * (t // 2) * ch_in     # row expand
        ups += 2 * t * t * (t // 2) * ch_in            # col expand
    conv += ups

    attn_fwd = 0
    attn_bwd_extra = 0
    for l, c in ((((s // 2) ** 2), 128), (((s // 4) ** 2), 256),
                 (((s // 8) ** 2), 256), (((s // 4) ** 2), 128),
                 (((s // 2) ** 2), 64), ((s ** 2), 64)):
        lk = (_key_capacity(l) if compacted and l >= COMPACT_MIN_TOKENS
              else l)
        proj = 2 * l * c * 3 * c                       # fused QKV
        score_shaped = 2 * l * lk * c                  # one [L,Lk,C] matmul
        attn_fwd += proj + 2 * score_shaped            # QK^T + PV
        # backward: 5 score-shaped matmuls + d(QKV proj) 2x proj
        attn_bwd_extra += 2 * proj + 5 * score_shaped
    return {"conv_fwd": conv, "attn_fwd": attn_fwd,
            "fwd": conv + attn_fwd,
            "train": 3 * conv + attn_fwd + attn_bwd_extra}


def measure(batch: int) -> dict:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.train import step as step_lib

    cfg = mu.MaskAttnUNetConfig(c_out=150, img_size=128,
                                compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch, 128, 128, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 150, (batch, 128, 128)))
    params, mstate = mu.init(jax.random.key(0), cfg)
    masks = mu.make_attention_masks(jax.random.key(1), batch, 128)
    plans = mu.precompute_mask_plans(masks)

    fwd = jax.jit(lambda p, s, xx: mu.apply(
        p, s, xx, cfg=cfg, masks=masks, train=False,
        mask_plans=plans)[0].semantic)
    out = fwd(params, mstate, x)
    float(jnp.sum(out))
    best_f = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            out = fwd(params, mstate, x)
        float(jnp.sum(out))
        best_f = min(best_f, (time.perf_counter() - t0) / 20)

    tx = optax.adamw(5e-5, weight_decay=1e-1)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx,
                          masks=masks)
    train_step = jax.jit(step_lib.make_train_step(
        cfg, step_lib.TaskConfig(), tx), donate_argnums=(0,))
    bd = {"image": x, "label": labels}
    ts, m = train_step(ts, bd)
    float(m["loss"])
    best_t = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(15):
            ts, m = train_step(ts, bd)
        float(m["loss"])
        best_t = min(best_t, (time.perf_counter() - t0) / 15)
    return {"fwd_s": best_f, "train_s": best_t}


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fl = model_flops()
    fl_dense = model_flops(compacted=False)
    print("per-image MXU FLOPs @128^2, c_out=150:")
    print(f"  conv trunk fwd : {fl['conv_fwd'] / 1e9:7.2f} G")
    print(f"  attention fwd  : {fl['attn_fwd'] / 1e9:7.2f} G "
          f"(compacted; {fl_dense['attn_fwd'] / 1e9:.2f} G dense — the "
          f"reference's own claim is 11 G total)")
    print(f"  forward total  : {fl['fwd'] / 1e9:7.2f} G")
    print(f"  train total    : {fl['train'] / 1e9:7.2f} G")

    t = measure(batch)
    fwd_tf = batch * fl["fwd"] / t["fwd_s"] / 1e12
    train_tf = batch * fl["train"] / t["train_s"] / 1e12
    print(f"\nmeasured (batch {batch}, bf16, 1x v5e):")
    print(f"  inference: {t['fwd_s'] * 1e3:6.2f} ms "
          f"({batch / t['fwd_s']:6.1f} img/s)  {fwd_tf:5.1f} TF/s  "
          f"MFU {100 * fwd_tf * 1e12 / V5E_PEAK_BF16:4.1f}%")
    print(f"  train:     {t['train_s'] * 1e3:6.2f} ms "
          f"({batch / t['train_s']:6.1f} img/s)  {train_tf:5.1f} TF/s  "
          f"MFU {100 * train_tf * 1e12 / V5E_PEAK_BF16:4.1f}%")
    print("\nNote: elementwise work (BN/GELU/LN/dropout/AdamW/metrics) is"
          " excluded from the numerator (standard MFU convention); the"
          " dense-equivalent MFU (crediting compaction's skipped work)"
          f" would read {100 * batch * fl_dense['fwd'] / t['fwd_s'] / V5E_PEAK_BF16:4.1f}%"
          " on inference.")


if __name__ == "__main__":
    main()
