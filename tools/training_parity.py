"""Training-dynamics parity: JAX framework vs the torch oracle, lockstep.

Trains both implementations from identical weights on identical batches
(fixed attention masks, dropout off, AdamW with the reference
hyperparameters) and compares per-step losses. This validates the whole
training path — gradients through every layer, BatchNorm batch/running
statistics, AdamW semantics — not just the forward (which the test suite
already locks).

    python tools/training_parity.py [steps] [img_size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from maskunet_tpu.core import state as state_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.train import step as step_lib
    from torch_oracle import OracleUNet, load_params

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    img = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    c_out, batch, lr, wd = 5, 4, 1e-3, 1e-2

    cfg = mu.MaskAttnUNetConfig(c_out=c_out, img_size=img,
                                dropout_rate=0.0, attn_impl="dense")
    params, mstate = mu.init(jax.random.key(0), cfg)
    masks = mu.make_attention_masks(jax.random.key(1), batch, img)
    masks = tuple(m.at[..., 0].set(True) for m in masks)  # oracle NaN guard

    oracle = OracleUNet(3, c_out, img)
    load_params(oracle, jax.tree.map(np.asarray, params))
    oracle.train(True)
    opt = torch.optim.AdamW(oracle.parameters(), lr=lr, weight_decay=wd)
    criterion = torch.nn.CrossEntropyLoss()
    t_masks = [torch.from_numpy(np.asarray(m)) for m in masks]

    tx = optax.adamw(lr, weight_decay=wd)
    ts = state_lib.create(jax.random.key(2), params, mstate, tx, masks=masks)
    task = step_lib.TaskConfig()
    train_step = jax.jit(step_lib.make_train_step(cfg, task, tx))

    rng = np.random.default_rng(0)
    max_rel = 0.0
    for i in range(steps):
        x = rng.standard_normal((batch, img, img, 3)).astype(np.float32)
        y = rng.integers(0, c_out, (batch, img, img))

        ts, metrics = train_step(ts, {"image": jnp.asarray(x),
                                      "label": jnp.asarray(y)})
        jax_loss = float(metrics["loss"])

        opt.zero_grad()
        out = oracle(torch.from_numpy(x).permute(0, 3, 1, 2), t_masks)
        loss = criterion(out, torch.from_numpy(y).long())
        loss.backward()
        opt.step()
        torch_loss = float(loss)

        rel = abs(jax_loss - torch_loss) / max(abs(torch_loss), 1e-8)
        max_rel = max(max_rel, rel)
        print(f"step {i:3d}: jax {jax_loss:.6f} torch {torch_loss:.6f} "
              f"rel {rel:.2e}")

    print(f"max relative loss deviation over {steps} steps: {max_rel:.2e}")
    if max_rel > 0.02:
        raise SystemExit("training dynamics diverged beyond 2%")
    print("training-dynamics parity OK")


if __name__ == "__main__":
    main()
