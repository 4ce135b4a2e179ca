"""MaskAttn-UNet as a pure function over explicit params/state pytrees.

Reproduces the reference topology exactly (ade_semantic.py:258-314; 128x128
spatial sizes in brackets):

    x   [B,128,128,3]  (NHWC here; reference is NCHW)
    x1 = ConvBlock(3->64)                              [128^2, 64]
    x2 = Down(64->128)   @64^2 ; attn1(128ch, 4096 tok)
    x3 = Down(128->256)  @32^2 ; attn2(256ch, 1024 tok)
    x4 = Down(256->256)  @16^2 ; attn3(256ch,  256 tok)
    x4 = ConvBlock(256->512); ConvBlock(512->512); ConvBlock(512->256)
    x  = Up(cat(x3)=512->128) @32^2 ; dropout(0.3); attn4(128ch, 1024)
    x  = Up(cat(x2)=256->64)  @64^2 ; dropout(0.3); attn5(64ch,  4096)
    x  = Up(cat(x1)=128->64)  @128^2;                attn6(64ch, 16384)
    x  = LayerNorm over [H,W,C] jointly             (ade_semantic.py:281)
    out= Conv1x1(64->c_out) -> BN -> ReLU           (ade_semantic.py:283-287)

Faithful behavioral details kept on purpose:
- ReLU is applied to the logits before cross-entropy (reference head).
- Down blocks end with an extra BatchNorm after the ConvBlock's own BN
  (ade_semantic.py:215-220), Up blocks likewise (ade_semantic.py:237-241).
- Skip concat order is [skip, x] on the channel axis (ade_semantic.py:253).
- The reference's dead `emb_layer`s (diffusion leftovers, never called,
  ade_semantic.py:222-225) are NOT reproduced.
- The reference returns each attention block's [B, HW, C] output through a
  raw `.view(B, C, H, W)` — a memory reinterpret that scrambles channels
  across space (ade_semantic.py:190; all 9 scripts). The default here is
  the intended transpose; set `attn_output_layout='literal_view'` to
  reproduce the reference's shipped behavior bit-for-bit (required when
  running torch-imported reference checkpoints faithfully). Discovered and
  pinned by tests/test_literal_parity.py.

The cityscapes-instance variant (city_instance.py:216-276) is covered by
config flags: `embed_dim>0` adds the 16-d embedding head and
`with_boundary_head` adds the (loss-unused) boundary head; `forward` then
returns (semantic_out, boundary_map, embeddings).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskunet_tpu.core import layers
from maskunet_tpu.ops import attention


@dataclasses.dataclass(frozen=True)
class MaskAttnUNetConfig:
    c_in: int = 3
    c_out: int = 150
    img_size: int = 128
    embed_dim: int = 0          # >0 adds the instance-embedding head
    with_boundary_head: bool = False
    dropout_rate: float = 0.3
    attn_impl: str = "auto"     # 'dense' | 'flash' | 'auto'
    compute_dtype: str = "float32"   # 'float32' | 'bfloat16'
    remat_attention: bool = False    # jax.checkpoint the attention blocks
                                     # (recompute in backward; trades FLOPs
                                     # for HBM at large batch)
    attn_output_layout: str = "transpose"  # 'transpose' | 'literal_view'
    # The reference reshapes its [B, HW, C] attention output back to
    # [B, C, H, W] with a raw `.view(...)` — a memory REINTERPRET, not a
    # transpose (ade_semantic.py:190; identical in all 9 scripts) — which
    # scrambles channels across space after every attention block.
    # 'transpose' (default) is the intended inverse of the input flatten;
    # 'literal_view' reproduces the reference's shipped scramble bit-for-
    # bit (use for lockstep parity and for running imported reference
    # checkpoints faithfully). Verified against the literal classes in
    # tests/test_literal_parity.py.

    @property
    def multi_head_output(self) -> bool:
        return self.embed_dim > 0 or self.with_boundary_head

    def resolve_attn_impl(self) -> str:
        if self.attn_impl != "auto":
            return self.attn_impl
        return "flash" if jax.default_backend() == "tpu" else "dense"


class ModelOutput(NamedTuple):
    semantic: jax.Array                 # [B, H, W, c_out]
    boundary: jax.Array | None = None   # [B, H, W, 1]
    embeddings: jax.Array | None = None  # [B, H, W, embed_dim]


# Attention token counts per layer, as fractions of img_size (topology above).
_ATTN_SCALES = (2, 4, 8, 4, 2, 1)   # attn1..attn6 operate at img_size // scale
ATTN_CHANNELS = (128, 256, 256, 128, 64, 64)


def attention_mask_sizes(img_size: int) -> tuple[int, ...]:
    return tuple((img_size // s) ** 2 for s in _ATTN_SCALES)


def make_attention_masks(rng: jax.Array, batch: int,
                         img_size: int = 128) -> tuple[jax.Array, ...]:
    """One Bernoulli(0.5) key mask per attention layer, [B, L_i] bool.

    The reference generates one random mask per layer and caches it for the
    whole run (ade_semantic.py:177-181); reproduce that by generating this
    pytree once from a fixed seed and reusing it every step ('cached'
    policy), or regenerate per step for the 'fresh' policy.
    """
    keys = jax.random.split(rng, 6)
    return tuple(
        attention.random_key_mask(k, batch, n)
        for k, n in zip(keys, attention_mask_sizes(img_size))
    )


def precompute_mask_plans(masks: tuple[jax.Array, ...] | None
                          ) -> tuple | None:
    """Per-layer K/V compaction plans for a run-cached mask pytree.

    The flash path compacts K/V to the visible keys on layers with
    >= COMPACT_MIN_TOKENS tokens; the slot assignment (cumsum+scatter)
    depends only on the mask, which is generated once and reused for the
    whole run ('cached' policy, the reference's semantics). Precomputing
    it here and passing the result as `apply(..., mask_plans=...)` moves
    that work out of the per-step graph. Entries for non-compacted layers
    are None. Derived data: recompute whenever the masks change (e.g.
    after a checkpoint restore); never checkpoint plans themselves.
    """
    from maskunet_tpu.ops import flash_attention as fa

    if masks is None:
        return None
    return tuple(
        fa.plan_compaction(m) if (m is not None
                                  and m.shape[-1] >= fa.COMPACT_MIN_TOKENS)
        else None
        for m in masks)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _convblock_init(key, cin, cout, mid=None, residual=False):
    mid = mid or cout
    k1, k2 = jax.random.split(key)
    params = {
        "conv1": layers.conv2d_init(k1, cin, mid, 3, use_bias=False),
        "conv2": layers.conv2d_init(k2, mid, cout, 3, use_bias=False),
    }
    bn1_p, bn1_s = layers.batchnorm_init(mid)
    bn2_p, bn2_s = layers.batchnorm_init(cout)
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state, residual


def _convblock(p, s, x, *, train, residual, folded=False):
    if folded:
        # BN affines pre-folded into the conv kernels/biases
        # (fold_bn_for_inference); eval-only fast path
        h = layers.conv2d(p["conv1"], x)
        h = layers.gelu(h)
        h = layers.conv2d(p["conv2"], h)
        return (layers.gelu(x + h) if residual else h), {}
    h = layers.conv2d(p["conv1"], x)
    h, s1 = layers.batchnorm(p["bn1"], s["bn1"], h, train=train)
    h = layers.gelu(h)
    h = layers.conv2d(p["conv2"], h)
    h, s2 = layers.batchnorm(p["bn2"], s["bn2"], h, train=train)
    out = layers.gelu(x + h) if residual else h
    return out, {"bn1": s1, "bn2": s2}


def _down_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    p1, s1, _ = _convblock_init(k1, cin, cin, residual=True)
    p2, s2, _ = _convblock_init(k2, cin, cout)
    bn_p, bn_s = layers.batchnorm_init(cout)
    return ({"block1": p1, "block2": p2, "bn": bn_p},
            {"block1": s1, "block2": s2, "bn": bn_s})


def _down(p, s, x, *, train, folded=False):
    x = layers.max_pool_2x(x)
    if folded:
        x, _ = _convblock(p["block1"], None, x, train=False,
                          residual=True, folded=True)
        x, _ = _convblock(p["block2"], None, x, train=False,
                          residual=False, folded=True)
        return x, {}
    x, s1 = _convblock(p["block1"], s["block1"], x, train=train, residual=True)
    x, s2 = _convblock(p["block2"], s["block2"], x, train=train, residual=False)
    x, sbn = layers.batchnorm(p["bn"], s["bn"], x, train=train)
    return x, {"block1": s1, "block2": s2, "bn": sbn}


def _up_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    p1, s1, _ = _convblock_init(k1, cin, cin, residual=True)
    p2, s2, _ = _convblock_init(k2, cin, cout, mid=cin // 2)
    bn_p, bn_s = layers.batchnorm_init(cout)
    return ({"block1": p1, "block2": p2, "bn": bn_p},
            {"block1": s1, "block2": s2, "bn": bn_s})


def _up(p, s, x, skip, *, train, folded=False):
    x = layers.upsample_2x_bilinear(x)
    x = jnp.concatenate([skip, x], axis=-1)   # [skip, x] order, ref :253
    if folded:
        x, _ = _convblock(p["block1"], None, x, train=False,
                          residual=True, folded=True)
        x, _ = _convblock(p["block2"], None, x, train=False,
                          residual=False, folded=True)
        return x, {}
    x, s1 = _convblock(p["block1"], s["block1"], x, train=train, residual=True)
    x, s2 = _convblock(p["block2"], s["block2"], x, train=train, residual=False)
    x, sbn = layers.batchnorm(p["bn"], s["bn"], x, train=train)
    return x, {"block1": s1, "block2": s2, "bn": sbn}


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def init(rng: jax.Array, cfg: MaskAttnUNetConfig) -> tuple[dict, dict]:
    """Returns (params, state) pytrees."""
    keys = iter(jax.random.split(rng, 24))
    params, state = {}, {}

    def add_block(name, p, s):
        params[name] = p
        state[name] = s

    p, s, _ = _convblock_init(next(keys), cfg.c_in, 64)
    add_block("initial", p, s)
    for i, (cin, cout) in enumerate([(64, 128), (128, 256), (256, 256)], 1):
        p, s = _down_init(next(keys), cin, cout)
        add_block(f"down{i}", p, s)
    for i, ch in enumerate(ATTN_CHANNELS, 1):
        params[f"attn{i}"] = attention.attention_init(next(keys), ch)
    for i, (cin, cout) in enumerate([(256, 512), (512, 512), (512, 256)], 1):
        p, s, _ = _convblock_init(next(keys), cin, cout)
        add_block(f"bottom{i}", p, s)
    for i, (cin, cout) in enumerate([(512, 128), (256, 64), (128, 64)], 1):
        p, s = _up_init(next(keys), cin, cout)
        add_block(f"up{i}", p, s)

    n = cfg.img_size
    params["final_norm"] = layers.layernorm_init((n, n, 64))
    params["final_conv"] = layers.conv2d_init(next(keys), 64, cfg.c_out, 1)
    bn_p, bn_s = layers.batchnorm_init(cfg.c_out)
    params["final_bn"], state["final_bn"] = bn_p, bn_s

    if cfg.embed_dim > 0:
        params["embed_conv"] = layers.conv2d_init(next(keys), 64, cfg.embed_dim, 1)
        bn_p, bn_s = layers.batchnorm_init(cfg.embed_dim)
        params["embed_bn"], state["embed_bn"] = bn_p, bn_s
    if cfg.with_boundary_head:
        params["boundary_conv1"] = layers.conv2d_init(next(keys), cfg.c_out, 32, 3)
        bn_p, bn_s = layers.batchnorm_init(32)
        params["boundary_bn"], state["boundary_bn"] = bn_p, bn_s
        params["boundary_conv2"] = layers.conv2d_init(next(keys), 32, 1, 1)

    return params, state


def apply(params: dict, state: dict, x: jax.Array, *,
          cfg: MaskAttnUNetConfig,
          masks: tuple[jax.Array, ...] | None = None,
          train: bool = False,
          dropout_rng: jax.Array | None = None,
          mesh=None,
          folded: bool = False,
          mask_plans: tuple | None = None) -> tuple[ModelOutput, dict]:
    """Forward pass. x: [B, H, W, c_in] NHWC. Returns (output, new_state).

    `masks`: per-attention-layer boolean key masks (see
    `make_attention_masks`); None disables masking (all keys visible).

    `mask_plans`: `precompute_mask_plans(masks)` when `masks` is cached
    for the run — skips the per-step compaction slot assignment on the
    flash path. MUST be derived from this exact `masks` pytree; None
    recomputes in-graph (required for per-step 'fresh' masks).

    `mesh`: optional jax.sharding.Mesh with ('data', 'model') axes. When
    given, activations are annotated batch-over-'data' throughout and the
    512-channel bottleneck is additionally sharded channels-over-'model'
    (the tensor-parallel seam; GSPMD propagates matching kernel shardings).

    `folded`: eval-only serving fast path — `params` came from
    `fold_bn_for_inference` (every BatchNorm affine pre-folded into its
    conv), so all BN ops are skipped; `state` may be None.
    """
    skips, enc_state = encode(params, state, x, cfg=cfg, masks=masks,
                              train=train, mesh=mesh, folded=folded,
                              mask_plans=mask_plans)
    out, dec_state = decode(params, state, skips, cfg=cfg, masks=masks,
                            train=train, dropout_rng=dropout_rng, mesh=mesh,
                            folded=folded, mask_plans=mask_plans)
    return out, {**enc_state, **dec_state}


def _fwd_ctx(params, masks, mask_plans, *, cfg, mesh, train):
    """Shared closures for the two forward stages (attention + TP seam)."""
    impl = cfg.resolve_attn_impl()
    plans = mask_plans if mask_plans is not None else (None,) * len(masks)

    def constrain(h, spec_channels_tp=False):
        if mesh is None:
            return h
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data", None, None, "model" if spec_channels_tp else None)
        return jax.lax.with_sharding_constraint(h, NamedSharding(mesh, spec))

    def attn(i, h):
        fn = lambda p, x_, m, pl_: attention.spatial_attention(  # noqa: E731
            p, x_, m, impl=impl, mesh=mesh, plan=pl_,
            output_layout=cfg.attn_output_layout)
        if cfg.remat_attention and train:
            fn = jax.checkpoint(fn)
        return fn(params[f"attn{i}"], h, masks[i - 1], plans[i - 1])

    return constrain, attn


def encode(params: dict, state: dict, x: jax.Array, *,
           cfg: MaskAttnUNetConfig,
           masks: tuple[jax.Array, ...] | None = None,
           train: bool = False,
           mesh=None,
           folded: bool = False,
           mask_plans: tuple | None = None):
    """Encoder stage: initial conv, down1-3 + attn1-3, bottleneck.

    First half of `apply` (reference topology ade_semantic.py:289-301);
    split out so the pipeline-parallel executor (`parallel/pipeline.py`)
    can place it on its own pipeline stage. Returns
    ((x1, x2, x3, x4), new_state_subset): the three skip activations plus
    the bottleneck output — exactly the tensors that cross the
    encoder/decoder seam.
    """
    if folded and train:
        raise ValueError("folded params are eval-only")
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    x = x.astype(dtype)
    new_state = {}
    masks = masks if masks is not None else (None,) * 6
    constrain, attn = _fwd_ctx(params, masks, mask_plans, cfg=cfg,
                               mesh=mesh, train=train)

    sget = (lambda k: None) if folded else (lambda k: state[k])
    x1, new_state["initial"] = _convblock(
        params["initial"], sget("initial"), x, train=train, residual=False,
        folded=folded)
    x2, new_state["down1"] = _down(params["down1"], sget("down1"), x1,
                                   train=train, folded=folded)
    x2 = attn(1, x2)
    x3, new_state["down2"] = _down(params["down2"], sget("down2"), x2,
                                   train=train, folded=folded)
    x3 = attn(2, x3)
    x4, new_state["down3"] = _down(params["down3"], sget("down3"), x3,
                                   train=train, folded=folded)
    x4 = attn(3, x4)

    for i in (1, 2, 3):
        x4, new_state[f"bottom{i}"] = _convblock(
            params[f"bottom{i}"], sget(f"bottom{i}"), x4,
            train=train, residual=False, folded=folded)
        # TP seam: shard the 512-wide bottleneck channels over 'model'
        x4 = constrain(x4, spec_channels_tp=(i < 3))

    return (x1, x2, x3, x4), new_state


def decode(params: dict, state: dict, skips, *,
           cfg: MaskAttnUNetConfig,
           masks: tuple[jax.Array, ...] | None = None,
           train: bool = False,
           dropout_rng: jax.Array | None = None,
           mesh=None,
           folded: bool = False,
           mask_plans: tuple | None = None,
           dropout_masks: tuple | None = None) -> tuple[ModelOutput, dict]:
    """Decoder stage: up1-3 + attn4-6 + dropout, final norm, head(s).

    Second half of `apply` (reference topology ade_semantic.py:303-313);
    consumes the `(x1, x2, x3, x4)` skips produced by `encode`.

    `dropout_masks`: optional pair of precomputed boolean keep masks
    (shapes from `decoder_dropout_shapes`) replacing in-graph RNG — the
    pipeline executor draws them outside its stage dispatch.
    """
    if folded and train:
        raise ValueError("folded params are eval-only")
    x1, x2, x3, x4 = skips
    new_state = {}
    masks = masks if masks is not None else (None,) * 6
    keep_masks = dropout_masks if dropout_masks is not None else (None, None)
    if (train and cfg.dropout_rate > 0 and dropout_masks is None):
        if dropout_rng is None:
            raise ValueError("dropout_rng required when train=True")
        drop_rngs = jax.random.split(dropout_rng, 2)
    else:
        drop_rngs = (None, None)
    _, attn = _fwd_ctx(params, masks, mask_plans, cfg=cfg,
                       mesh=mesh, train=train)
    sget = (lambda k: None) if folded else (lambda k: state[k])

    h, new_state["up1"] = _up(params["up1"], sget("up1"), x4, x3,
                              train=train, folded=folded)
    h = layers.dropout(h, rate=cfg.dropout_rate, rng=drop_rngs[0],
                       train=train, keep_mask=keep_masks[0])
    h = attn(4, h)
    h, new_state["up2"] = _up(params["up2"], sget("up2"), h, x2,
                              train=train, folded=folded)
    h = layers.dropout(h, rate=cfg.dropout_rate, rng=drop_rngs[1],
                       train=train, keep_mask=keep_masks[1])
    h = attn(5, h)
    h, new_state["up3"] = _up(params["up3"], sget("up3"), h, x1,
                              train=train, folded=folded)
    h = attn(6, h)
    h = layers.layernorm(params["final_norm"], h)

    sem = layers.conv2d(params["final_conv"], h)
    if not folded:
        sem, new_state["final_bn"] = layers.batchnorm(
            params["final_bn"], state["final_bn"], sem, train=train)
    sem = jax.nn.relu(sem)   # faithful: ReLU on logits (ade_semantic.py:286)

    boundary = embeddings = None
    if cfg.embed_dim > 0:
        e = layers.conv2d(params["embed_conv"], h)
        if not folded:
            e, new_state["embed_bn"] = layers.batchnorm(
                params["embed_bn"], state["embed_bn"], e, train=train)
        embeddings = jax.nn.relu(e)
    if cfg.with_boundary_head:
        b = layers.conv2d(params["boundary_conv1"], sem)
        if not folded:
            b, new_state["boundary_bn"] = layers.batchnorm(
                params["boundary_bn"], state["boundary_bn"], b, train=train)
        b = jax.nn.relu(b)
        boundary = layers.conv2d(params["boundary_conv2"], b)

    return ModelOutput(sem, boundary, embeddings), new_state


def decoder_dropout_shapes(cfg: MaskAttnUNetConfig,
                           batch: int) -> tuple[tuple, tuple]:
    """Shapes of the two decoder dropout sites (after up1 and up2) for
    precomputed keep masks (`decode(..., dropout_masks=...)`)."""
    n = cfg.img_size
    return ((batch, n // 4, n // 4, 128), (batch, n // 2, n // 2, 64))


def param_count(params: dict) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def _bn_affine(bn_params: dict, bn_state: dict, eps: float = 1e-5):
    """Eval-mode BatchNorm as per-channel (a, b): y = a*x + b."""
    a = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + eps)
    return a, bn_params["offset"] - bn_state["mean"] * a


def _fold_conv(conv_p: dict, a, b) -> dict:
    """Absorb affine y = a*conv(x) + b into the conv kernel (HWIO: out
    channels on the last axis) and bias."""
    out = {"kernel": conv_p["kernel"] * a}
    bias = conv_p.get("bias")
    out["bias"] = (bias * a + b) if bias is not None else b
    return out


def fold_bn_for_inference(params: dict, state: dict,
                          cfg: MaskAttnUNetConfig) -> dict:
    """Fold every eval-mode BatchNorm (an affine given running stats) into
    the preceding conv's kernel/bias — including the Down/Up blocks'
    *second* trailing BN (the reference's double-BN block boundaries,
    ade_semantic.py:215-220/237-241, fold as two chained affines). The
    returned params run with `apply(..., folded=True)`, which executes no
    BN ops at all: ~30 fewer elementwise passes over activations on the
    serving path. Exactness: affine-into-conv folding is algebraically
    exact in f32; cast to bf16 after folding for serving.
    """
    def fold_block(bp, bs, extra=None):
        a1, b1 = _bn_affine(bp["bn1"], bs["bn1"])
        a2, b2 = _bn_affine(bp["bn2"], bs["bn2"])
        if extra is not None:    # trailing Down/Up BN: chain the affines
            a3, b3 = _bn_affine(*extra)
            a2, b2 = a2 * a3, b2 * a3 + b3
        return {"conv1": _fold_conv(bp["conv1"], a1, b1),
                "conv2": _fold_conv(bp["conv2"], a2, b2)}

    out: dict = {}
    out["initial"] = fold_block(params["initial"], state["initial"])
    for name in ("down1", "down2", "down3", "up1", "up2", "up3"):
        p, s = params[name], state[name]
        out[name] = {
            "block1": fold_block(p["block1"], s["block1"]),
            "block2": fold_block(p["block2"], s["block2"],
                                 extra=(p["bn"], s["bn"])),
        }
    for name in ("bottom1", "bottom2", "bottom3"):
        out[name] = fold_block(params[name], state[name])
    for i in range(1, 7):
        out[f"attn{i}"] = params[f"attn{i}"]
    out["final_norm"] = params["final_norm"]
    a, b = _bn_affine(params["final_bn"], state["final_bn"])
    out["final_conv"] = _fold_conv(params["final_conv"], a, b)
    if cfg.embed_dim > 0:
        a, b = _bn_affine(params["embed_bn"], state["embed_bn"])
        out["embed_conv"] = _fold_conv(params["embed_conv"], a, b)
    if cfg.with_boundary_head:
        a, b = _bn_affine(params["boundary_bn"], state["boundary_bn"])
        out["boundary_conv1"] = _fold_conv(params["boundary_conv1"], a, b)
        out["boundary_conv2"] = params["boundary_conv2"]
    return out


def calibrate_activation_scales(params: dict, forward, batches) -> dict:
    """Record per-conv input absolute maxima by running the FOLDED float
    model over calibration batches.

    `forward(params, x)` must call the model UN-jitted at the python
    level (the recorder wraps `layers.conv2d`); the whole recorded
    forward is then traced ONCE here and compiled — `params` is closed
    over (not a jit argument) so the recorder's id-keyed node map
    survives jit's pytree flatten/unflatten, and each calibration chunk
    costs one compiled device step instead of an eager per-op dispatch
    storm (~40 convs × per-op latency; measured minutes through a
    remote-device tunnel, seconds compiled). Returns
    ``{"path/to/conv": max}`` for every 4-D conv, consumable by
    `quantize_params_for_inference(act_scales=...)`: static activation
    scales drop the per-call max-reduce (and its fusion barrier) from the
    int8 serving path, at the standard PTQ risk that unseen activations
    beyond the calibrated max saturate at the int8 clip.
    """
    from maskunet_tpu.core import layers

    def is_conv(node):
        return (isinstance(node, dict) and "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 4)

    paths: dict[int, str] = {}

    def index(node, path):
        if is_conv(node):
            paths[id(node)] = "/".join(path)
        elif isinstance(node, dict):
            for k, v in node.items():
                index(v, path + (k,))

    index(params, ())
    orig = layers.conv2d

    def recorded_step(chunk):
        """Traced once: the forward with per-conv |input| maxima as
        outputs. The conv2d monkeypatch is active only during tracing;
        the compiled computation carries the max-reduces."""
        local: dict[str, Any] = {}

        def recording_conv2d(p, x, **kw):
            key = paths.get(id(p))
            if key is not None:
                m = jnp.max(jnp.abs(x.astype(jnp.float32)))
                local[key] = (m if key not in local
                              else jnp.maximum(local[key], m))
            return orig(p, x, **kw)

        layers.conv2d = recording_conv2d
        try:
            forward(params, chunk)
        finally:
            layers.conv2d = orig
        return local

    step = jax.jit(recorded_step)
    records: dict[str, Any] = {}
    for b in batches:
        out = step(b)
        for k, v in out.items():
            records[k] = v if k not in records else jnp.maximum(
                records[k], v)
    # one gather for all convs at the end — no per-conv host syncs
    for v in records.values():
        copy_async = getattr(v, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    scales = {k: float(v) for k, v in records.items()}

    if not scales:
        raise RuntimeError(
            "calibration recorded no conv activations — `forward` must "
            "call the model without its own jit wrapper (the recorder "
            "monkeypatches layers.conv2d during the trace) and must "
            "execute at least one conv")
    return scales


def quantize_params_for_inference(params: dict,
                                  act_scales: dict | None = None) -> dict:
    """Post-training int8 quantization of the folded conv weights.

    Per-output-channel symmetric scales: ``w_scale[c] = max|K[...,c]|/127``,
    ``kernel_q = round(K / w_scale)`` (int8). `layers.conv2d` detects the
    quantized form and runs the int8xint8->int32 conv with dynamic
    per-tensor activation quantization — on v5e the MXU's int8 rate is 2x
    bf16, and int8 constants quarter the exported-artifact size. Only 4-D
    conv kernels are touched (the attention linears feed the Pallas flash
    kernel and stay bf16); apply to the output of `fold_bn_for_inference`.
    An optional deployment trade (serve/export ``--quantize int8``): exact
    class-map parity with the bf16 path is NOT guaranteed — the error
    bound is test-locked in tests/test_quantize.py instead.

    Targets the TPU MXU. XLA:CPU executes int8 convs on a slow scalar
    path (minutes per 64px batch-8 forward) — fine for the tiny-model
    tests, not for CPU serving.

    `act_scales` (from `calibrate_activation_scales`): static per-conv
    activation scales baked in as ``a_scale`` — drops the per-call
    dynamic max-reduce; activations beyond the calibrated max saturate
    at the int8 clip.
    """
    def quant(leaf_dict, path):
        k = leaf_dict["kernel"].astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)),
                            1e-12) / 127.0
        kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
        out = {"kernel_q": kq, "w_scale": scale}
        if act_scales is not None:
            name = "/".join(path)
            if name not in act_scales:
                raise ValueError(
                    f"no calibrated activation scale for conv {name!r} — "
                    "it was not exercised during calibration (the "
                    "calibration forward must run every conv the serving "
                    "config will execute)")
            out["a_scale"] = jnp.float32(
                max(act_scales[name], 1e-12) / 127.0)
        if "bias" in leaf_dict:
            out["bias"] = leaf_dict["bias"]
        return out

    def walk(node, path=()):
        if isinstance(node, dict):
            if "kernel" in node and node["kernel"].ndim == 4:
                return quant(node, path)
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params)


def cast_params_for_inference(params: dict, dtype=jnp.bfloat16) -> dict:
    """Pre-cast matmul/conv weights to the compute dtype for serving.

    Training keeps f32 master weights (cast in-graph per step), but at
    inference that doubles the per-step weight HBM traffic (profile: the
    f32 copy/slice-start DMAs of conv kernels are ~2 ms/step at batch 8).
    Norm scales/offsets stay f32 — they participate in f32 statistics
    arithmetic.
    """
    def cast(path, leaf):
        name = str(path[-1].key) if path else ""
        if name in ("kernel", "bias"):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)
