"""Checkpointing: full-train-state save/restore + cross-task transfer.

Capabilities mirrored from the reference (SURVEY.md §5):
- periodic / per-epoch / best-metric checkpoints (ade_semantic.py:341-344,
  410-412, 426) — cadence lives in the training loop; this module is the
  codec and the retention manager;
- resume = load into a matching state template;
- cross-task warm start that drops the classification head
  (`final_layer.*`, strict=False — city_semantic.py:333-338): here
  `transfer_params` merges any checkpoint leaf whose path+shape match and
  keeps the fresh init elsewhere, which subsumes head-swap and the
  3-head-variant transfer.

Improvements over the reference by design: optimizer state, step, RNG and
the cached attention masks are saved too (the reference saves only model
weights — resume restarts optimizer moments from zero), and writes are
atomic (tmp + rename) so a preempted TPU job can't leave a torn file.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


def _is_typed_key(x: Any) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key)


def _copy_leaf(x: Any) -> Any:
    """jnp.copy (not device_put, which short-circuits to the SAME buffer
    when the sharding already matches — aliasing would defeat the
    donation protection). Typed PRNG keys copy via their key data."""
    if _is_typed_key(x):
        return jax.random.wrap_key_data(
            jnp.copy(jax.random.key_data(x)))
    return jnp.copy(x)


@jax.jit
def _copy_arrays(arrays: list) -> list:
    # one compiled dispatch for the whole state: per-leaf eager copies
    # would pay per-op dispatch latency ~300 times (measured ~10 s
    # through the axon tunnel); jit outputs never alias inputs absent
    # explicit donation, so every output is a fresh buffer
    return [_copy_leaf(a) for a in arrays]


def _device_snapshot(state: Any) -> Any:
    """Donation-proof on-device snapshot: array leaves become fresh HBM
    buffers (same value/sharding); non-array leaves pass through."""
    leaves, treedef = jax.tree.flatten(state)
    idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    copies = _copy_arrays([leaves[i] for i in idx])
    out = list(leaves)
    for i, c in zip(idx, copies):
        out[i] = c
    return jax.tree.unflatten(treedef, out)


def _host_snapshot(state: Any) -> Any:
    """Synchronous D2H snapshot: kick off all leaf copies, then gather
    (the transfers overlap instead of running serially in device_get)."""
    for leaf in jax.tree.leaves(state):
        copy_async = getattr(leaf, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    return jax.device_get(state)


def _snapshot_for_async_save(state: Any) -> Any:
    """On-device snapshot when HBM headroom allows, host snapshot otherwise.

    The device snapshot pins a second full copy of the train state in HBM
    until the background D2H finishes — for a run already near HBM
    capacity that would turn an epoch-end save into a mid-training OOM,
    so fall back to the synchronous host path when the device reports
    insufficient headroom (1.5x the state size, leaving room for the next
    step's activations) or when the copy itself exhausts memory."""
    arrays = [l for l in jax.tree.leaves(state) if isinstance(l, jax.Array)]
    need = sum(l.nbytes for l in arrays)
    try:
        for dev in {d for l in arrays for d in l.devices()}:
            stats = dev.memory_stats() or {}
            limit, used = stats.get("bytes_limit"), stats.get("bytes_in_use")
            if limit is not None and used is not None \
                    and limit - used < need * 1.5:
                return _host_snapshot(state)
    except Exception:  # noqa: BLE001 — backends without memory_stats
        pass
    try:
        snapshot = _device_snapshot(state)
        # cheap (HBM-bandwidth copy); surfaces allocation failure HERE
        # rather than asynchronously inside a later train step
        jax.block_until_ready(snapshot)
        return snapshot
    except Exception as e:  # noqa: BLE001
        if "RESOURCE_EXHAUSTED" in repr(e) or "esource exhausted" in repr(e):
            return _host_snapshot(state)
        raise


def _unkey(tree: Any) -> Any:
    """Typed PRNG keys -> raw uint32 key data (msgpack-serializable)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_typed_key(x) else x, tree)


def _rekey(template: Any, tree: Any) -> Any:
    """Re-wrap key data wherever the template holds a typed PRNG key."""
    return jax.tree.map(
        lambda t, x: jax.random.wrap_key_data(x) if _is_typed_key(t) else x,
        template, tree)


def _import_meta_path(workdir: str, name: str) -> str:
    return os.path.join(workdir, f"{name}_import_meta.json")


def write_import_meta(workdir: str, name: str, meta: dict) -> str:
    """Record checkpoint provenance (e.g. a torch import's
    attn_output_layout) next to the checkpoint files, so inference
    commands can resolve model-semantics options automatically."""
    import json
    path = _import_meta_path(workdir, name)
    os.makedirs(workdir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path)
    return path


def read_import_meta(workdir: str, name: str) -> dict | None:
    """The sidecar written by `write_import_meta`, or None."""
    import json
    path = _import_meta_path(workdir, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save(path: str, state: Any) -> None:
    """Atomically serialize a pytree (e.g. TrainState) to `path`."""
    data = flax.serialization.to_bytes(_unkey(jax.device_get(state)))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore(path: str, template: Any) -> Any:
    """Deserialize into the structure of `template`."""
    with open(path, "rb") as f:
        raw = flax.serialization.from_bytes(_unkey(template), f.read())
    return _rekey(template, raw)


def restore_raw(path: str) -> dict:
    """Deserialize without a template: nested dict of arrays (for
    cross-model transfer where structures differ)."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def restore_inference(path: str, template: Any) -> Any:
    """Restore params / BN stats / masks / step into `template`, ignoring
    the optimizer state entirely.

    Inference consumers (serving, evaluate, predict, visualize) don't
    need optimizer moments, and requiring them to reconstruct the exact
    training optimizer (e.g. the same --lr-schedule, whose optax state
    has a different structure than a constant-lr AdamW) just to satisfy
    the full-state template is fragile. `template` is a TrainState built
    with any optimizer."""
    raw = restore_raw(path)
    # fetch only what inference needs — NOT the whole template (whose
    # optimizer moments are ~2x the param bytes and get discarded)
    params = flax.serialization.from_state_dict(
        jax.device_get(template.params), raw["params"])
    mstate = flax.serialization.from_state_dict(
        jax.device_get(template.model_state), raw["model_state"])
    out = template.replace(params=params, model_state=mstate,
                           step=raw.get("step", template.step))
    if template.masks is not None and raw.get("masks") is not None:
        masks = flax.serialization.from_state_dict(
            jax.device_get(template.masks), raw["masks"])
        out = out.replace(masks=masks)
    return out


def _flatten(tree: Any, prefix: tuple = ()) -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def transfer_params(init_params: dict, ckpt_params: dict,
                    drop_prefixes: tuple[str, ...] = ()) -> tuple[dict, list]:
    """Warm-start: take every checkpoint leaf whose path and shape match the
    freshly initialized params; keep the fresh init for dropped prefixes,
    missing keys, or shape mismatches (e.g. a different c_out head).

    Returns (merged_params, skipped_paths).
    """
    flat_ckpt = _flatten(ckpt_params)
    skipped = []

    def merge(path, leaf):
        key = tuple(str(p.key) for p in path)
        if any(key[0] == d or "/".join(key).startswith(d)
               for d in drop_prefixes):
            skipped.append(key)
            return leaf
        src = flat_ckpt.get(key)
        if src is None or np.shape(src) != np.shape(leaf):
            skipped.append(key)
            return leaf
        return src

    merged = jax.tree_util.tree_map_with_path(merge, init_params)
    return merged, skipped


class CheckpointManager:
    """best / latest / periodic retention, reference cadence semantics.

    Saves are asynchronous by default: the state is snapshotted to fresh
    DEVICE buffers synchronously (<1 ms of HBM copies — donation-proof),
    then D2H transfer + serialization + the atomic write all run on a
    background thread, so the train loop is stalled by neither disk I/O
    nor the device->host link (a full train state is ~280 MB; its D2H
    alone measured 8-25 s through the axon tunnel, and the reference's
    torch.save blocks the epoch loop). One save per tag is in flight at
    a time; `wait()` joins all pending writes (called automatically
    before restore)."""

    def __init__(self, directory: str, name: str = "checkpoint",
                 async_saves: bool = True):
        self.directory = directory
        self.name = name
        self.async_saves = async_saves
        self._pending: dict[str, Any] = {}
        self._errors: list[tuple[str, BaseException]] = []
        os.makedirs(directory, exist_ok=True)

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"{self.name}_{tag}.msgpack")

    def _save_thread(self, path: str, tag: str, snapshot: Any) -> None:
        try:
            # overlap the leaf D2H transfers instead of letting
            # device_get (inside save) fetch them serially
            for leaf in jax.tree.leaves(snapshot):
                copy_async = getattr(leaf, "copy_to_host_async", None)
                if copy_async is not None:
                    copy_async()
            save(path, snapshot)
        except BaseException as e:  # surfaced by wait()/has()/restore()
            self._errors.append((tag, e))

    def _save(self, tag: str, state: Any) -> str:
        import threading

        path = self._path(tag)
        if not self.async_saves:
            save(path, state)
            return path
        # A later (donating) train step deletes this state's device
        # buffers, so the values must be captured before dispatch returns
        # — but NOT on the host: D2H of a full train state (~280 MB) can
        # take many seconds on bandwidth-limited links (measured 8-25 s
        # per save through the axon tunnel, stalling every epoch end).
        # Instead snapshot on-device: a fresh HBM copy (<1 ms at chip
        # bandwidth) owns distinct buffers that donation cannot touch;
        # the background thread then does the slow D2H + serialization
        # + atomic write while the train loop keeps dispatching.
        # (Falls back to a synchronous host snapshot when HBM headroom
        # can't hold a second copy of the state.)
        snapshot = _snapshot_for_async_save(state)
        prev = self._pending.get(tag)
        if prev is not None:
            prev.join()
        self._raise_pending_errors()
        t = threading.Thread(target=self._save_thread,
                             args=(path, tag, snapshot), daemon=True)
        t.start()
        self._pending[tag] = t
        return path

    def _raise_pending_errors(self) -> None:
        if self._errors:
            tag, err = self._errors[0]
            self._errors.clear()
            raise RuntimeError(
                f"async checkpoint save '{tag}' failed — no durable "
                f"checkpoint was written") from err

    def wait(self) -> None:
        """Join all in-flight writes; re-raises the first save failure
        (a failed save must not be silently reported as success)."""
        for t in self._pending.values():
            t.join()
        self._pending.clear()
        self._raise_pending_errors()

    def save_best(self, state: Any) -> str:
        return self._save("best", state)

    def save_latest(self, state: Any) -> str:
        return self._save("latest", state)

    def restore(self, template: Any, tag: str = "latest") -> Any:
        self.wait()
        return restore(self._path(tag), template)

    def restore_for_inference(self, template: Any,
                              tag: str = "latest") -> Any:
        """Optimizer-agnostic restore (params/BN/masks/step only)."""
        self.wait()
        return restore_inference(self._path(tag), template)

    def has(self, tag: str = "latest") -> bool:
        self.wait()
        return os.path.exists(self._path(tag))
