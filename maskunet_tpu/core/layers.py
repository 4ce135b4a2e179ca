"""Functional NN layer library (pure init/apply, explicit pytrees).

This is the framework's substrate: every layer is a pair of pure functions —
``*_init(key, ...) -> params`` and an apply function — with parameters and
mutable statistics (BatchNorm running mean/var) carried in explicit pytrees.
Nothing is hidden in objects, so everything composes with jit/grad/vmap/pjit
and shards cleanly over a device mesh.

Layout is NHWC (TPU-native; channels on the 128-lane minor dimension) with
HWIO conv kernels — NOT the reference's NCHW (ade_semantic.py:168 works on
[B,C,H,W]). Numerics match the reference layer equations:

- Conv2d 3x3 pad 1 / 1x1, optional bias        (ade_semantic.py:199,202,284)
- BatchNorm2d: torch semantics — biased batch var for normalization, unbiased
  var into running stats, momentum 0.1, eps 1e-5 (ade_semantic.py:200)
- GELU: exact erf form (torch nn.GELU default)  (ade_semantic.py:201)
- LayerNorm over arbitrary trailing axes        (ade_semantic.py:161,281)
- MaxPool2d(2)                                  (ade_semantic.py:216)
- Upsample(scale=2, bilinear, align_corners=True) (ade_semantic.py:235)
- Dropout(p) with 1/(1-p) train-time scaling    (ade_semantic.py:273)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from maskunet_tpu.core import initializers as init

Params = dict
State = dict


# ---------------------------------------------------------------------------
# Dense / conv
# ---------------------------------------------------------------------------

def conv2d_init(key: jax.Array, cin: int, cout: int, ksize: int,
                use_bias: bool = True) -> Params:
    wkey, bkey = jax.random.split(key)
    p = {"kernel": init.conv_kernel(wkey, ksize, ksize, cin, cout)}
    if use_bias:
        p["bias"] = init.torch_uniform(bkey, (cout,), cin * ksize * ksize)
    return p


def conv2d(params: Params, x: jax.Array, *, stride: int = 1,
           padding: str = "SAME") -> jax.Array:
    """NHWC conv with HWIO kernel. bf16 inputs accumulate in f32 on the
    TPU MXU by default; an explicit preferred_element_type is avoided
    because its transpose rule breaks mixed-dtype autodiff.

    Params holding ``kernel_q``/``w_scale`` (from
    `maskattn_unet.quantize_params_for_inference`) route through the
    int8 path: dynamic per-tensor symmetric activation quantization,
    int8xint8->int32 conv (double MXU rate vs bf16 on v5e), f32 dequant
    by ``act_scale * w_scale[cout]``. Serving-only — `round` has no
    gradient."""
    if "kernel_q" in params:
        xf = x.astype(jnp.float32)
        if "a_scale" in params:
            # static calibrated scale (quantize_params_for_inference
            # act_scales): no per-call max-reduce / fusion barrier;
            # out-of-calibration activations saturate at the clip
            a = params["a_scale"]
        else:
            # dynamic, per-SAMPLE (not per-batch): a whole-batch max
            # would make each image's quantization grid — and therefore
            # its prediction — depend on what it was co-batched with,
            # breaking the serving stack's batch-composition invariance
            a = (jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
                 / 127.0)
            a = jnp.maximum(a, 1e-12)
        xq = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, params["kernel_q"],
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (a * params["w_scale"])
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def linear_init(key: jax.Array, cin: int, cout: int,
                use_bias: bool = True) -> Params:
    wkey, bkey = jax.random.split(key)
    p = {"kernel": init.linear_kernel(wkey, cin, cout)}
    if use_bias:
        p["bias"] = init.torch_uniform(bkey, (cout,), cin)
    return p


def linear(params: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def batchnorm_init(c: int) -> tuple[Params, State]:
    params = {"scale": jnp.ones((c,)), "offset": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


def batchnorm(params: Params, state: State, x: jax.Array, *, train: bool,
              momentum: float = 0.1, eps: float = 1e-5) -> tuple[jax.Array, State]:
    """BatchNorm over (N, H, W) per channel, torch semantics.

    Under a data-parallel mesh the reductions below run over the *global*
    (sharded) batch — XLA inserts the cross-replica collectives — i.e.
    cross-replica BN. (The reference's DataParallel computes per-replica
    stats; cross-replica is the better-converging default. Documented choice.)
    """
    if train:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)  # biased
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + params["offset"]
    return y.astype(x.dtype), new_state


def layernorm_init(shape: tuple[int, ...]) -> Params:
    return {"scale": jnp.ones(shape), "offset": jnp.zeros(shape)}


def layernorm(params: Params, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing axes covered by the affine param shape.

    With scale shape (C,), normalizes the channel axis (attention norm,
    ade_semantic.py:161); with scale shape (H, W, C), normalizes jointly over
    space and channels (the UNet's `nn.LayerNorm([64,128,128])`,
    ade_semantic.py:281 — torch normalizes over C,H,W; NHWC equivalent here).
    """
    naxes = params["scale"].ndim
    axes = tuple(range(x.ndim - naxes, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["offset"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pooling / resampling / misc
# ---------------------------------------------------------------------------

def gelu(x: jax.Array) -> jax.Array:
    """GELU matching torch nn.GELU (exact erf form) in f32.

    In bf16 the tanh approximation is used instead: its max absolute
    deviation from exact erf-GELU (~3e-3, near |x|=2) is below bf16's
    own rounding step (eps ~8e-3), so the results are indistinguishable
    at bf16 precision — and the erf polynomial costs ~1.5 ms of the
    ~6 ms conv trunk per batch-8 forward on v5e (tools/trunk_breakdown
    .py). f32 paths (parity/oracle tests, f32 recipes) keep exact erf.
    """
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def max_pool_2x(x: jax.Array) -> jax.Array:
    """MaxPool2d(kernel=2, stride=2) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    ).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True bilinear interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return m


def upsample_2x_bilinear(x: jax.Array) -> jax.Array:
    """Upsample(scale_factor=2, mode=bilinear, align_corners=True) on NHWC.

    Implemented as two small dense interpolation matmuls (out x in weight
    matrices are tiny — at most 256x128) so the op rides the MXU instead of
    a gather — the TPU-friendly formulation of `nn.Upsample`
    (ade_semantic.py:235).
    """
    _, h, w, _ = x.shape
    # matmul inputs stay in the model compute dtype (bf16 MXU rate is
    # 4-8x the f32 rate); accumulation is f32 via preferred_element_type
    mh = jnp.asarray(_interp_matrix_np(h, 2 * h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix_np(w, 2 * w), dtype=x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    y = jnp.einsum("pw,bowc->bopc", mw, y, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def dropout(x: jax.Array, *, rate: float, rng: jax.Array | None,
            train: bool, keep_mask: jax.Array | None = None) -> jax.Array:
    """Inverted dropout (ade_semantic.py:304-307 uses rate 0.3).

    Uses the hardware RNG primitive (`lax.rng_bit_generator`) instead of
    counter-based threefry: threefry bit generation cost ~0.7 ms/step at
    this model's dropout shapes (train_breakdown r3) while the RBG path
    is near-free. Still deterministic per `rng` key (the key data seeds
    the generator); dropout streams are not parity-locked to anything.

    `keep_mask`: precomputed boolean keep mask (see `dropout_keep_mask`),
    used instead of drawing bits from `rng` — the pipeline-parallel
    executor draws masks outside its stage dispatch so no RNG value
    crosses the cond boundary."""
    if not train or rate == 0.0:
        return x
    keep = dropout_keep_mask(rng, rate, x.shape) if keep_mask is None \
        else keep_mask
    return jnp.where(keep, x / (1.0 - rate), 0).astype(x.dtype)


def dropout_keep_mask(rng: jax.Array, rate: float, shape) -> jax.Array:
    """Boolean keep mask for `dropout` (True = keep), RBG-based."""
    kd = jax.random.key_data(rng).astype(jnp.uint32).reshape(-1)
    seed = jnp.concatenate([kd, kd ^ jnp.uint32(0x9E3779B9)])[:4]
    _, bits = jax.lax.rng_bit_generator(seed, shape, dtype=jnp.uint32)
    return bits >= jnp.uint32(max(round(rate * 2**32), 1))
