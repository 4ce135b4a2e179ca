"""Import reference PyTorch checkpoints (`.pth` state_dicts) into
maskunet-tpu, and export back.

The reference saves bare `model.state_dict()` files (ade_semantic.py:344,
city_instance.py's EarlyStopping.save_checkpoint), optionally with
DataParallel `module.` prefixes (ade_semantic.py:360-368 strips them the
same way). This module maps those keys onto this package's
(params, model_state) pytrees so a user of the reference can carry
trained weights across without retraining:

    python -m maskunet_tpu.cli import-torch --recipe ade_semantic \
        --torch-checkpoint checkpoint_ade.pth --workdir runs/imported

Layout conversions (torch -> JAX/NHWC):
- Conv2d weight OIHW -> HWIO
- Linear weight [out, in] -> kernel [in, out]
- the final LayerNorm affine [C, H, W] -> [H, W, C]
- BatchNorm weight/bias -> scale/offset (params); running_mean/var ->
  mean/var (model_state); num_batches_tracked dropped
- DownSample/UpSample `emb_layer.*` dropped (dead code in the reference
  forward — ade_semantic.py:222-229, its output is never used)
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

_conv = lambda w: np.transpose(w, (2, 3, 1, 0))        # OIHW -> HWIO
_conv_inv = lambda w: np.transpose(w, (3, 2, 0, 1))
_linear = lambda w: np.transpose(w)                    # [out,in] -> [in,out]
_norm_chw = lambda w: np.transpose(w, (1, 2, 0))       # [C,H,W] -> [H,W,C]
_norm_chw_inv = lambda w: np.transpose(w, (2, 0, 1))
_id = lambda w: w

# each entry: (torch_key, tree name, path, torch->jax fn, jax->torch fn)
Entry = tuple[str, str, tuple[str, ...], Callable, Callable]


def _convblock(tprefix: str, path: tuple[str, ...]) -> list[Entry]:
    out: list[Entry] = []
    for tidx, conv, bn in (("0", "conv1", "bn1"), ("3", "conv2", "bn2")):
        bnidx = str(int(tidx) + 1)
        out.append((f"{tprefix}.{tidx}.weight", "params",
                    path + (conv, "kernel"), _conv, _conv_inv))
        out += _batchnorm(f"{tprefix}.{bnidx}", path + (bn,))
    return out


def _batchnorm(tprefix: str, path: tuple[str, ...]) -> list[Entry]:
    return [
        (f"{tprefix}.weight", "params", path + ("scale",), _id, _id),
        (f"{tprefix}.bias", "params", path + ("offset",), _id, _id),
        (f"{tprefix}.running_mean", "mstate", path + ("mean",), _id, _id),
        (f"{tprefix}.running_var", "mstate", path + ("var",), _id, _id),
    ]


def _attention(tprefix: str, path: tuple[str, ...]) -> list[Entry]:
    out: list[Entry] = []
    for name in ("query", "key", "value"):
        out.append((f"{tprefix}.{name}.weight", "params",
                    path + (name, "kernel"), _linear, _linear))
        out.append((f"{tprefix}.{name}.bias", "params",
                    path + (name, "bias"), _id, _id))
    out.append((f"{tprefix}.norm.weight", "params",
                path + ("norm", "scale"), _id, _id))
    out.append((f"{tprefix}.norm.bias", "params",
                path + ("norm", "offset"), _id, _id))
    return out


def _bias_conv(tkey: str, path: tuple[str, ...]) -> list[Entry]:
    return [
        (f"{tkey}.weight", "params", path + ("kernel",), _conv, _conv_inv),
        (f"{tkey}.bias", "params", path + ("bias",), _id, _id),
    ]


def mapping(embed_dim: int = 0,
            with_boundary_head: bool = False) -> list[Entry]:
    """The full reference-state_dict <-> pytree key table (module names
    from the reference UNet: ade_semantic.py:258-309 for the semantic
    model, city_instance.py:217-251 for the 3-head variant)."""
    out: list[Entry] = []
    out += _convblock("initial_conv.conv_block", ("initial",))
    for i in (1, 2, 3):
        out += _convblock(f"downsample{i}.maxpool_conv.1.conv_block",
                          (f"down{i}", "block1"))
        out += _convblock(f"downsample{i}.maxpool_conv.2.conv_block",
                          (f"down{i}", "block2"))
        out += _batchnorm(f"downsample{i}.maxpool_conv.3",
                          (f"down{i}", "bn"))
        out += _convblock(f"upsample{i}.conv.0.conv_block",
                          (f"up{i}", "block1"))
        out += _convblock(f"upsample{i}.conv.1.conv_block",
                          (f"up{i}", "block2"))
        out += _batchnorm(f"upsample{i}.conv.2", (f"up{i}", "bn"))
        out += _convblock(f"bottom{i}.conv_block", (f"bottom{i}",))
    for i in range(1, 7):
        out += _attention(f"self_attention{i}", (f"attn{i}",))
    out.append(("norm.weight", "params", ("final_norm", "scale"),
                _norm_chw, _norm_chw_inv))
    out.append(("norm.bias", "params", ("final_norm", "offset"),
                _norm_chw, _norm_chw_inv))
    out += _bias_conv("final_layer.0", ("final_conv",))
    out += _batchnorm("final_layer.1", ("final_bn",))
    if embed_dim:
        out += _bias_conv("embedding_head.0", ("embed_conv",))
        out += _batchnorm("embedding_head.1", ("embed_bn",))
    if with_boundary_head:
        out += _bias_conv("boundary_head.0", ("boundary_conv1",))
        out += _batchnorm("boundary_head.1", ("boundary_bn",))
        out += _bias_conv("boundary_head.3", ("boundary_conv2",))
    return out


def _get(tree: dict, path: tuple[str, ...]):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def strip_module_prefix(sd: dict) -> dict:
    """DataParallel checkpoints prefix every key with `module.`
    (ade_semantic.py:361 strips it identically)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_state_dict(sd: dict, params: dict, mstate: dict,
                       embed_dim: int = 0,
                       with_boundary_head: bool = False
                       ) -> tuple[dict, dict, dict]:
    """Reference state_dict (numpy-valued) -> (params, mstate, report).

    `params`/`mstate` are templates from `maskattn_unet.init` (shape and
    dtype source of truth); returns deep-copied trees with every mapped
    leaf replaced. Raises on missing keys or shape mismatches; the report
    lists ignored torch keys (dead emb_layers, num_batches_tracked)."""
    import copy

    sd = strip_module_prefix(sd)
    params = copy.deepcopy(params)
    mstate = copy.deepcopy(mstate)
    trees = {"params": params, "mstate": mstate}
    used = set()
    for tkey, tree_name, path, to_jax, _ in mapping(
            embed_dim, with_boundary_head):
        if tkey not in sd:
            raise KeyError(f"reference checkpoint is missing '{tkey}' "
                           f"(wanted for {'/'.join(path)})")
        tpl = _get(trees[tree_name], path)
        arr = to_jax(np.asarray(sd[tkey]))
        if arr.shape != tuple(np.shape(tpl)):
            raise ValueError(
                f"shape mismatch for '{tkey}' -> {'/'.join(path)}: "
                f"checkpoint {arr.shape} vs model {tuple(np.shape(tpl))} "
                f"(wrong c_out/img_size/embed_dim config?)")
        _set(trees[tree_name], path, arr.astype(np.asarray(tpl).dtype))
        used.add(tkey)
    ignored = sorted(set(sd) - used)
    unexpected = [k for k in ignored
                  if "emb_layer" not in k
                  and not k.endswith("num_batches_tracked")]
    return params, mstate, {"ignored": ignored, "unexpected": unexpected}


def export_state_dict(params: dict, mstate: dict, embed_dim: int = 0,
                      with_boundary_head: bool = False) -> dict:
    """(params, mstate) -> a reference-loadable state_dict (numpy values;
    `torch.load`-side consumers wrap with torch.from_numpy). BatchNorm
    num_batches_tracked is emitted as 0 — torch only uses it for
    momentum=None cumulative averaging, which the reference never does."""
    sd: dict[str, Any] = {}
    trees = {"params": params, "mstate": mstate}
    for tkey, tree_name, path, _, to_torch in mapping(
            embed_dim, with_boundary_head):
        sd[tkey] = to_torch(np.asarray(_get(trees[tree_name], path)))
        if tkey.endswith("running_var"):
            sd[tkey.replace("running_var", "num_batches_tracked")] = (
                np.asarray(0, dtype=np.int64))
    return sd


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a reference .pth on CPU and return numpy values."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a bare state_dict "
                         f"(the reference's torch.save format)")
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
