"""Torch-TRAINED checkpoint migration parity (VERDICT r4 #4).

The literal-parity suite (tests/test_literal_parity.py) locks fresh-init
forwards and lockstep training; MIGRATING.md's promise is about *trained*
reference checkpoints (the reference saves its UNet state_dict after
training, ade_semantic.py:341-344 / :426). This test closes that loop
end-to-end:

  1. train the reference's LITERAL UNet (exec'd from /root/reference at
     test time, tests/literal_reference.py) for several epochs in torch
     on the synthetic dataset,
  2. torch.save the trained state_dict — a real reference-format .pth,
  3. `cli import-torch` it (sidecar records attn_output_layout =
     literal_view),
  4. `cli evaluate --mode semantic` through the standard restore path,
  5. evaluate the SAME trained torch model on the SAME val batches and
     assert loss/mIoU match within forward-numerics tolerance.

Both sides share the attention masks: ours from the checkpoint's
TrainState (drawn by loop.setup_state from recipe.seed at import time),
torch's injected via lit.inject_masks. Dropout is 0 on both sides (the
literal-parity harness policy). Slow tier: torch trains ~40 CPU steps at
64 px.
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

import literal_reference as lit

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not lit.available(),
                       reason="reference checkout not present"),
]

C_OUT, IMG, BATCH = 8, 64, 8


def _val_batches(recipe):
    """The val set exactly as loop.evaluate batches it: index order,
    batch 8, uint8 images -> f32/255 (data/pipeline.to_device)."""
    from maskunet_tpu.tasks.datasets import make_datasets

    _, val_ds, _ = make_datasets(recipe, None)
    assert len(val_ds) % BATCH == 0, "no pad_last rows expected"
    for i0 in range(0, len(val_ds), BATCH):
        ex = [val_ds[i] for i in range(i0, i0 + BATCH)]
        x = np.stack([e["image"] for e in ex]).astype(np.float32) / 255.0
        y = np.stack([e["label"] for e in ex]).astype(np.int64)
        yield x, y


def test_torch_trained_checkpoint_migrates_with_eval_parity(tmp_path,
                                                            capsys):
    import optax

    from maskunet_tpu import cli
    from maskunet_tpu.ops import metrics_ops
    from maskunet_tpu.tasks import recipes as recipes_lib
    from maskunet_tpu.tasks.datasets import make_datasets
    from maskunet_tpu.train import loop

    recipe = recipes_lib.get("synthetic_semantic")
    assert (recipe.num_classes, recipe.img_size,
            recipe.batch_size) == (C_OUT, IMG, BATCH)

    # the masks import-torch's setup_state will seed the checkpoint with
    cfg = loop.model_config(recipe, C_OUT, compute_dtype="float32")
    ts_tpl = loop.setup_state(recipe, cfg, optax.adamw(recipe.lr))
    masks = [np.asarray(jax.device_get(m)) for m in ts_tpl.masks]
    assert all(m.any(axis=-1).all() for m in masks), \
        "seeded masks left a fully-masked row (torch softmax would NaN)"

    # --- 1. torch-train the literal reference UNet -----------------------
    model = lit.make_literal_unet("ade", C_OUT, IMG)
    model.train(True)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
    criterion = torch.nn.CrossEntropyLoss()
    train_ds, _, _ = make_datasets(recipe, None)
    torch.manual_seed(0)
    order = np.random.default_rng(0).permutation(len(train_ds))
    losses = []
    with lit.inject_masks(masks):
        for epoch in range(5):
            for i0 in range(0, len(train_ds), BATCH):
                ex = [train_ds[int(i)] for i in order[i0:i0 + BATCH]]
                x = torch.from_numpy(
                    np.stack([e["image"] for e in ex]
                             ).astype(np.float32) / 255.0).permute(0, 3, 1, 2)
                y = torch.from_numpy(
                    np.stack([e["label"] for e in ex]).astype(np.int64))
                opt.zero_grad()
                loss = criterion(model(x), y)
                loss.backward()
                opt.step()
                losses.append(float(loss))
    assert losses[-1] < losses[0], f"torch side did not learn: {losses}"

    # --- 2./3. save the real trained .pth, import via the CLI ------------
    pth = tmp_path / "checkpoint_synth_trained.pth"
    torch.save(model.state_dict(), str(pth))
    rc = cli.main(["import-torch", "--recipe", recipe.name,
                   "--torch-checkpoint", str(pth),
                   "--workdir", str(tmp_path), "--num-classes", str(C_OUT),
                   "--platform", "cpu", "--compute-dtype", "float32"])
    assert rc == 0
    capsys.readouterr()

    # --- 4. cli evaluate through the standard restore/resolve path -------
    rc = cli.main(["evaluate", "--recipe", recipe.name, "--mode", "semantic",
                   "--workdir", str(tmp_path),
                   "--platform", "cpu", "--compute-dtype", "float32"])
    assert rc == 0
    ours = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # --- 5. torch-side eval on the same batches --------------------------
    model.eval()   # running BN stats — same as our eval step's train=False
    t_loss, t_miou, n = 0.0, 0.0, 0
    with lit.inject_masks(masks), torch.no_grad():
        for x, y in _val_batches(recipe):
            logits = model(torch.from_numpy(x).permute(0, 3, 1, 2))
            t_loss += float(criterion(logits, torch.from_numpy(y)))
            t_miou += float(metrics_ops.mean_iou(
                jnp.asarray(logits.permute(0, 2, 3, 1).numpy()),
                jnp.asarray(y), C_OUT))
            n += 1
    t_loss, t_miou = t_loss / n, t_miou / n

    assert ours["loss"] == pytest.approx(t_loss, rel=5e-3), \
        (ours["loss"], t_loss)
    assert ours["miou"] == pytest.approx(t_miou, abs=0.02), \
        (ours["miou"], t_miou)
