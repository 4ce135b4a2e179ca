"""Load the reference's LITERAL model classes for lockstep parity tests.

Unlike tests/torch_oracle.py (an independent transcription of the
documented equations), this module reads the reference source files at
/root/reference/code at test time, extracts the model class definitions
with `ast` (ClassDef nodes only — no module-level code runs), and execs
them under the installed torch. Parity tests built on this module
therefore exercise the reference's actual shipped code
(ade_semantic.py:152-314, city_instance.py:127-276), retiring the risk
that the transcription mis-read the reference.

Nothing from the reference is copied into this repo: the source is read
from the read-only checkout at import-from-disk time, and every test
using this module skips when that checkout is absent.

Mask determinism: the reference builds its attention mask from
`torch.randint(0, 2, (B, H, W))` on the first forward of each layer and
caches it on the module (ade_semantic.py:177-181). `inject_masks`
monkeypatches torch.randint with a queue of our fixed keep-masks so the
literal mask-construction code path (view / where / expand) runs
unchanged but deterministically, in forward order attn1..attn6.

Known-necessary instance patches (config, not code):
  * `model.norm = nn.LayerNorm([64, img, img])` — the reference hardcodes
    the 128x128 input shape (ade_semantic.py:281); tests run smaller.
  * `model.dropout.p = 0.0` — dropout randomness differs between torch
    and JAX; both sides run with dropout disabled (same policy as the
    oracle trajectory harness, tools/training_parity.py).
"""

from __future__ import annotations

import ast
import contextlib
import os

import numpy as np
import torch

REF_CODE = "/root/reference/code"

MODEL_CLASSES = ("Mask2FormerAttention", "ConvBlock", "DownSample",
                 "UpSample", "UNet")


def available() -> bool:
    return os.path.isdir(REF_CODE)


def load_classes(script_rel: str, names=MODEL_CLASSES) -> dict:
    """Exec the named class definitions from a reference script.

    Only ast.ClassDef segments are executed — module-level statements
    (data loading, training loops, plt.show) never run.
    """
    path = os.path.join(REF_CODE, script_rel)
    with open(path, encoding="utf-8") as f:
        src = f.read()
    lines = src.splitlines()
    segments = []
    for node in ast.parse(src).body:
        if isinstance(node, ast.ClassDef) and node.name in names:
            segments.append("\n".join(lines[node.lineno - 1:node.end_lineno]))
    missing = set(names) - {n.name for n in ast.parse(src).body
                            if isinstance(n, ast.ClassDef)}
    if missing:
        raise RuntimeError(f"{path}: classes not found: {sorted(missing)}")
    ns = {"torch": torch, "nn": torch.nn, "F": torch.nn.functional}
    exec(compile("\n\n".join(segments), path, "exec"), ns)  # noqa: S102
    return {n: ns[n] for n in names}


@contextlib.contextmanager
def inject_masks(keep_masks):
    """Patch torch.randint to return our fixed keep-masks, in call order.

    keep_masks: sequence of [B, L] bool arrays, True = key visible
    (maps to the reference's `binary_mask > 0.5` keep condition).
    """
    queue = [np.asarray(m) for m in keep_masks]
    orig = torch.randint

    def fake_randint(low, high, size, **kw):
        if (low, high) != (0, 2) or not queue:
            return orig(low, high, size, **kw)
        m = queue.pop(0)
        assert m.size == int(np.prod(size)), (m.shape, size)
        return torch.from_numpy(m.astype(np.int64)).reshape(size)

    torch.randint = fake_randint
    try:
        yield queue
    finally:
        torch.randint = orig


# ---------------------------------------------------------------------------
# Weight transfer: JAX pytree -> literal reference modules
# ---------------------------------------------------------------------------

def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def _load_convblock(mod, p):
    seq = mod.conv_block
    seq[0].weight.data = _t(p["conv1"]["kernel"]).permute(3, 2, 0, 1)
    seq[3].weight.data = _t(p["conv2"]["kernel"]).permute(3, 2, 0, 1)
    for bn, name in ((seq[1], "bn1"), (seq[4], "bn2")):
        bn.weight.data = _t(p[name]["scale"])
        bn.bias.data = _t(p[name]["offset"])


def _load_down(mod, p):
    _load_convblock(mod.maxpool_conv[1], p["block1"])
    _load_convblock(mod.maxpool_conv[2], p["block2"])
    mod.maxpool_conv[3].weight.data = _t(p["bn"]["scale"])
    mod.maxpool_conv[3].bias.data = _t(p["bn"]["offset"])


def _load_up(mod, p):
    _load_convblock(mod.conv[0], p["block1"])
    _load_convblock(mod.conv[1], p["block2"])
    mod.conv[2].weight.data = _t(p["bn"]["scale"])
    mod.conv[2].bias.data = _t(p["bn"]["offset"])


def _load_attn(mod, p):
    for lin, name in ((mod.query, "query"), (mod.key, "key"),
                      (mod.value, "value")):
        lin.weight.data = _t(p[name]["kernel"]).T
        lin.bias.data = _t(p[name]["bias"])
    mod.norm.weight.data = _t(p["norm"]["scale"])
    mod.norm.bias.data = _t(p["norm"]["offset"])


def load_literal_params(model, params: dict) -> None:
    """Load a maskunet_tpu param pytree into a literal reference UNet."""
    _load_convblock(model.initial_conv, params["initial"])
    for i in (1, 2, 3):
        _load_down(getattr(model, f"downsample{i}"), params[f"down{i}"])
        _load_up(getattr(model, f"upsample{i}"), params[f"up{i}"])
        _load_convblock(getattr(model, f"bottom{i}"), params[f"bottom{i}"])
    for i in range(1, 7):
        _load_attn(getattr(model, f"self_attention{i}"), params[f"attn{i}"])
    # final LayerNorm affine: ours is (H, W, C), the reference's [C, H, W]
    model.norm.weight.data = _t(params["final_norm"]["scale"]).permute(2, 0, 1)
    model.norm.bias.data = _t(params["final_norm"]["offset"]).permute(2, 0, 1)
    model.final_layer[0].weight.data = _t(
        params["final_conv"]["kernel"]).permute(3, 2, 0, 1)
    model.final_layer[0].bias.data = _t(params["final_conv"]["bias"])
    model.final_layer[1].weight.data = _t(params["final_bn"]["scale"])
    model.final_layer[1].bias.data = _t(params["final_bn"]["offset"])
    if hasattr(model, "embedding_head"):
        model.embedding_head[0].weight.data = _t(
            params["embed_conv"]["kernel"]).permute(3, 2, 0, 1)
        model.embedding_head[0].bias.data = _t(params["embed_conv"]["bias"])
        model.embedding_head[1].weight.data = _t(params["embed_bn"]["scale"])
        model.embedding_head[1].bias.data = _t(params["embed_bn"]["offset"])
    if hasattr(model, "boundary_head"):
        model.boundary_head[0].weight.data = _t(
            params["boundary_conv1"]["kernel"]).permute(3, 2, 0, 1)
        model.boundary_head[0].bias.data = _t(params["boundary_conv1"]["bias"])
        model.boundary_head[1].weight.data = _t(params["boundary_bn"]["scale"])
        model.boundary_head[1].bias.data = _t(params["boundary_bn"]["offset"])
        model.boundary_head[3].weight.data = _t(
            params["boundary_conv2"]["kernel"]).permute(3, 2, 0, 1)
        model.boundary_head[3].bias.data = _t(params["boundary_conv2"]["bias"])


def make_literal_unet(variant: str, c_out: int, img_size: int,
                      params: dict | None = None):
    """Construct a literal reference UNet and (optionally) load params.

    variant: 'ade' (ade_semantic.py single-head) or
             'city' (city_instance.py 3-head, embed_dim=16).
    """
    if variant == "ade":
        cls = load_classes("ade20k/ade_semantic.py")
        model = cls["UNet"](3, c_out)
    elif variant == "city":
        cls = load_classes("cityscapes/city_instance.py")
        model = cls["UNet"](3, c_out, embed_dim=16)
    else:
        raise ValueError(variant)
    if img_size != 128:
        # the reference hardcodes LayerNorm([64, 128, 128]); same semantics
        # at the test size (affine loaded below by load_literal_params)
        model.norm = torch.nn.LayerNorm([64, img_size, img_size])
    model.dropout.p = 0.0
    if params is not None:
        load_literal_params(model, params)
    return model
