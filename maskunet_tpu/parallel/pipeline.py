"""Pipeline parallelism: 2-stage GPipe over a `pipe` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.5 — its only
strategy is single-process DataParallel, ade_semantic.py:373). This module
adds the TPU-native PP seam the framework advertises: the MaskAttn-UNet
splits naturally at its encoder/decoder boundary (`models.maskattn_unet.
encode` / `decode`), and the executor below runs that split as a
fill-drain (GPipe) schedule over microbatches:

    tick t:   stage 0 (encoder) runs microbatch t
              stage 1 (decoder) runs microbatch t-1
              the (x1, x2, x3, x4) skip payload moves 0 -> 1 via ppermute

so for M microbatches the pipeline takes M+1 ticks with a single-tick
bubble — stage 0 computes microbatch t+1 while stage 1 decodes t.

Design notes (TPU-first, not a translation of anything in the reference):

- SPMD dispatch: inside `shard_map` every core runs the same program; the
  stage split is a `lax.cond` on `axis_index('pipe')`, so each core
  executes only its stage's branch at runtime. The UNet's two stages are
  heterogeneous (different params, different shapes), which rules out the
  stacked-stage `vmap` pipelining used for homogeneous transformer layers.
- Params are passed replicated: at 24.69 M params the weight memory is
  ICI-trivial and replication keeps the executor composable with the DP
  mesh; what PP buys here is *compute and activation* overlap (the decoder
  works while the encoder streams the next microbatch).
- DP composes via PARTIAL-MANUAL shard_map: on a ('data', 'pipe') mesh the
  executor is manual over `pipe` only (`axis_names={'pipe'}`) while `data`
  stays a GSPMD auto axis — the microbatch dimension rides in sharded over
  `data`, every jnp op inside the stages keeps global-batch semantics
  (cross-replica BatchNorm for free), and jax.grad outside the shard_map
  gets its param-gradient all-reduce over `data` inserted by GSPMD exactly
  as on the plain DP path. No collective in this file ever names `data`,
  so the deadlock ordering constraint below concerns `pipe` alone.
- The whole schedule is differentiable: `ppermute`'s transpose is the
  reverse permute, `cond`/`scan` transpose per branch, so
  `jax.grad(loss ∘ pipeline_apply)` yields exactly the gradients of the
  equivalent sequential per-microbatch loop (test-locked on an 8-device
  CPU mesh in tests/test_pipeline.py).
- BatchNorm semantics match the grad-accum path (train/step.py body()):
  batch statistics are per-microbatch, and running stats thread through
  the schedule in microbatch order — the encoder's state advances at tick
  t, the decoder's one tick later, which is the same sequential order.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:                                    # jax >= 0.5 public API
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from maskunet_tpu.core import layers
from maskunet_tpu.models import maskattn_unet as model

PIPE_AXIS = "pipe"
N_STAGES = 2

# model-state keys owned by each stage (encoder = stage 0)
ENCODER_STATE_KEYS = frozenset({
    "initial", "down1", "down2", "down3", "bottom1", "bottom2", "bottom3",
})


def make_pipe_mesh(devices=None) -> Mesh:
    """A 2-device mesh with the single `pipe` axis."""
    if devices is None:
        devices = jax.devices()[:N_STAGES]
    if len(devices) != N_STAGES:
        raise ValueError(f"pipeline mesh needs exactly {N_STAGES} devices, "
                         f"got {len(devices)}")
    return Mesh(np.asarray(devices), (PIPE_AXIS,))


def make_dp_pipe_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """A ('data', 'pipe') mesh: n_data-way data parallelism x the 2-stage
    pipeline. The `pipe` axis is innermost so each replica's two stages sit
    on ICI-adjacent devices (the skip payload crosses `pipe` every tick;
    gradients cross `data` once per step)."""
    from maskunet_tpu.parallel.mesh import DATA_AXIS

    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // N_STAGES
    if n_data * N_STAGES != len(devices):
        raise ValueError(f"dp x pp mesh {n_data}x{N_STAGES} != "
                         f"{len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, N_STAGES)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def validate_pipe_mesh(mesh: Mesh) -> Mesh:
    """Check `mesh` carries the 2-wide `pipe` axis (alone, or alongside a
    GSPMD-auto `data` axis for dp x pp)."""
    if PIPE_AXIS not in mesh.axis_names or mesh.shape[PIPE_AXIS] != N_STAGES:
        raise ValueError(
            f"pipeline mesh needs a '{PIPE_AXIS}' axis of size {N_STAGES}, "
            f"got {dict(mesh.shape)} — build it with make_pipe_mesh() or "
            f"make_dp_pipe_mesh(n_data)")
    return mesh


def _shard_map_pipe(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map manual over `pipe` only; any other mesh axis (e.g. `data`)
    stays auto so GSPMD shards/reduces over it around the executor."""
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, axis_names={PIPE_AXIS})
    except TypeError:   # pragma: no cover - older jax spells it `auto=`
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs,
                         auto=frozenset(mesh.axis_names) - {PIPE_AXIS})


def split_microbatches(batch_tree, n_micro: int):
    """[B, ...] -> [n_micro, B/n_micro, ...] on every leaf."""
    def split(a):
        if a.shape[0] % n_micro:
            raise ValueError(f"batch {a.shape[0]} not divisible by "
                             f"n_micro={n_micro}")
        return a.reshape((n_micro, a.shape[0] // n_micro) + a.shape[1:])
    return jax.tree.map(split, batch_tree)


def pipeline_apply(params: dict, state: dict, x_micro: jax.Array, *,
                   cfg: model.MaskAttnUNetConfig,
                   mesh: Mesh,
                   masks: tuple | None = None,
                   train: bool = False,
                   dropout_rng: jax.Array | None = None,
                   mask_plans: tuple | None = None):
    """Pipelined forward over pre-split microbatches.

    x_micro: [M, mb, H, W, c_in] (see `split_microbatches`). `masks` /
    `mask_plans` are sized for ONE microbatch and shared across all of
    them (the reference's cached-mask policy; pass fresh per-step masks
    from the train loop for the 'fresh' policy). Returns
    (ModelOutput with [M, mb, ...] leaves, new_model_state), both
    replicated across `pipe`.

    `mesh` may be the plain 2-device ('pipe',) mesh or a ('data', 'pipe')
    dp x pp mesh: the executor is manual over `pipe` only, so a `data`
    axis stays GSPMD-auto — shard the microbatch dim of `x_micro` over it
    (P(None, 'data')) and batch statistics / outputs / gradients keep
    global-batch DP semantics automatically.
    """
    validate_pipe_mesh(mesh)
    if train and cfg.dropout_rate > 0 and dropout_rng is None:
        raise ValueError("dropout_rng required when train=True")
    n_micro = x_micro.shape[0]
    mb = x_micro[0]

    # shape templates for the inter-stage payload and the decoder output,
    # so the cond branches can fabricate matching zeros
    payload_shape, _ = jax.eval_shape(
        lambda p, s, xx: model.encode(p, s, xx, cfg=cfg, masks=masks,
                                      train=train, mask_plans=mask_plans),
        params, state, mb)
    out_shape, _ = jax.eval_shape(
        lambda p, s, sk: model.decode(
            p, s, sk, cfg=cfg, masks=masks, train=train,
            dropout_rng=dropout_rng, mask_plans=mask_plans),
        params, state, payload_shape)

    def stepped(params, state, x_micro, masks, mask_plans, dropout_rng):
        rank = lax.axis_index(PIPE_AXIS)
        # jax>=0.7 tracks varying-manual-axes (VMA): the cond-on-rank needs
        # every branch output and carried value typed varying over 'pipe'.
        # CRITICAL ORDERING CONSTRAINT: an invariant->varying cast (pcast
        # or arithmetic-with-varying) transposes to a psum, so no such
        # boundary may sit INSIDE the cond branches — each rank transposes
        # only its own branch, and rank-divergent collective sequences
        # deadlock the backward (observed as an XLA:CPU rendezvous abort:
        # rank 0 waiting at an all-reduce while rank 1 waits at a
        # collective-permute). Therefore EVERY shard_map input is cast to
        # varying HERE, at the uniform top of the body — differentiable
        # floats arithmetically (x * varying-1, whose transpose psum sits
        # at this uniform point and is exactly the cross-stage param-grad
        # reduction), non-differentiable ints/bools/keys via pcast (no
        # cotangent ever flows through them) — so everything derived
        # inside the branches is varying from the start and the branches
        # stay collective-free in both directions.
        vone = rank * 0 + 1

        def vary(tree):  # differentiable (float) leaves
            return jax.tree.map(lambda a: a * vone.astype(a.dtype), tree)

        def vary_nd(tree):  # non-differentiable leaves (masks/plans/keys)
            if not hasattr(lax, "pcast"):  # pragma: no cover - older jax
                return tree
            def cast(a):
                vma = getattr(getattr(a, "aval", None), "vma", frozenset())
                if PIPE_AXIS in vma:
                    return a
                return lax.pcast(a, (PIPE_AXIS,), to="varying")
            return jax.tree.map(cast, tree)

        params = vary(params)
        state = vary(state)
        x_micro = vary(x_micro)
        masks = vary_nd(masks)
        mask_plans = vary_nd(mask_plans)
        dropout_rng = vary_nd(dropout_rng)
        payload0 = vary(jax.tree.map(
            lambda t: jnp.zeros(t.shape, t.dtype), payload_shape))
        out_zeros = vary(jax.tree.map(
            lambda t: jnp.zeros(t.shape, t.dtype), out_shape))

        use_dropout = train and cfg.dropout_rate > 0
        dshapes = model.decoder_dropout_shapes(cfg, x_micro.shape[1])

        def tick(carry, t):
            payload_in, st = carry
            # encoder input for this tick (clamped past the last microbatch
            # during the drain tick; that compute is discarded)
            xmb = lax.dynamic_index_in_dim(
                x_micro, jnp.minimum(t, n_micro - 1), axis=0, keepdims=False)
            # dropout keep masks are drawn HERE, outside the stage dispatch,
            # and enter it as plain bool operands: no RNG key may live
            # inside the cond (a key-typed branch residual trips a jax
            # partial-eval bug — the other branch pads the slot with float0
            # and the aval typematch fails). Known cost: the encoder rank
            # generates masks it never uses (a cond can't DCE per rank) —
            # accepted, the RBG primitive is near-free on TPU
            # (core/layers.dropout docstring) and gating it behind a
            # rank cond would put keys back inside a branch
            if use_dropout:
                d_rng = jax.random.fold_in(
                    jax.random.wrap_key_data(dropout_rng), t - 1)
                r1, r2 = jax.random.split(d_rng)
                dmasks = (
                    layers.dropout_keep_mask(r1, cfg.dropout_rate,
                                             dshapes[0]),
                    layers.dropout_keep_mask(r2, cfg.dropout_rate,
                                             dshapes[1]))
            else:
                dmasks = None

            def gate(valid, new_st, old_st):
                # BN running stats must advance exactly once per REAL
                # microbatch: the fill tick (decoder on a zeros payload)
                # and the drain tick (encoder re-running the clamped last
                # microbatch) would otherwise pollute them vs the
                # sequential loop
                return jax.tree.map(
                    lambda n, o: jnp.where(valid, n, o), new_st, old_st)

            def enc_branch(op):
                _, st, _ = op
                skips, enc_s = model.encode(
                    params, st, xmb, cfg=cfg, masks=masks, train=train,
                    mask_plans=mask_plans)
                new_st = gate(t < n_micro, {**st, **enc_s}, st)
                return skips, out_zeros, new_st

            def dec_branch(op):
                payload_in, st, dmasks = op
                out, dec_s = model.decode(
                    params, st, payload_in, cfg=cfg, masks=masks,
                    train=train, mask_plans=mask_plans,
                    dropout_masks=dmasks)
                new_st = gate(t >= 1, {**st, **dec_s}, st)
                return payload0, out, new_st

            # jax.checkpoint AROUND the cond serves two purposes: (1) the
            # GPipe-standard memory profile (stage activations recomputed
            # in backward instead of saved across the whole schedule), and
            # (2) it gives the dispatch a UNIFORM residual set (just the
            # operands) — without it, cond's partial-eval rejects the two
            # heterogeneous branches' branch-specific residuals (e.g. the
            # decoder's dropout mask) when differentiated.
            def dispatched(op):
                return lax.cond(rank == 0, enc_branch, dec_branch, op)

            payload_out, out, new_st = jax.checkpoint(dispatched)(
                (payload_in, st, dmasks))
            payload_next = jax.tree.map(
                lambda a: lax.ppermute(a, PIPE_AXIS, [(0, 1)]), payload_out)
            return (payload_next, new_st), out

        (_, final_st), outs = lax.scan(
            tick, (payload0, state), jnp.arange(n_micro + 1))
        # decoder outputs are valid at ticks 1..M; the encoder rank emitted
        # zeros throughout, so a plain psum replicates rank 1's values
        outs = jax.tree.map(
            lambda a: lax.psum(a[1:], PIPE_AXIS), outs)
        # each rank's final state is authoritative only for its own stage's
        # keys (the other half went stale one tick after the split)
        merged = {}
        for key, sub in final_st.items():
            own = 0 if key in ENCODER_STATE_KEYS else 1
            merged[key] = jax.tree.map(
                lambda a: lax.psum(
                    jnp.where(rank == own, a, jnp.zeros_like(a)), PIPE_AXIS),
                sub)
        return outs, merged

    fn = _shard_map_pipe(
        stepped, mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()))
    # None-valued optionals (masks / plans / rng) are empty pytrees — the
    # P() prefix specs cover them with zero leaves. The rng crosses the
    # boundary as raw uint32 (see the dropout-mask comment in tick).
    rng_raw = None
    if dropout_rng is not None:
        rng_raw = (jax.random.key_data(dropout_rng)
                   if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key)
                   else dropout_rng)
    return fn(params, state, x_micro, masks, mask_plans, rng_raw)
