"""int8 post-training quantization of the folded serving path.

Quantized serving is an explicit deployment trade (serve/export
``--quantize int8``): these tests lock the error envelope — per-element
weight dequant bound, conv-level closeness, model-level logit error and
argmax agreement — rather than bit-parity, which int8 cannot give.
Random-init models are the worst case for argmax agreement (logits
cluster near zero); trained models separate classes far more.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskunet_tpu.core import layers
from maskunet_tpu.models import maskattn_unet as mu
from maskunet_tpu.tasks import recipes as recipes_lib


@pytest.fixture(scope="module")
def tiny():
    cfg = mu.MaskAttnUNetConfig(c_out=8, img_size=32, attn_impl="dense",
                                compute_dtype="float32")
    params, state = mu.init(jax.random.key(0), cfg)
    folded = mu.fold_bn_for_inference(params, state, cfg)
    return cfg, folded, mu.quantize_params_for_inference(folded)


def test_quantized_param_structure(tiny):
    cfg, folded, q = tiny
    conv = q["initial"]["conv1"]
    assert conv["kernel_q"].dtype == jnp.int8
    assert conv["w_scale"].shape == (folded["initial"]["conv1"]
                                     ["kernel"].shape[-1],)
    # attention linears (2-D kernels) are untouched — they feed the
    # flash kernel path
    assert "kernel" in q["attn1"]["query"]
    # the final head conv is quantized too
    assert "kernel_q" in q["final_conv"]


def test_weight_dequant_bound(tiny):
    # symmetric round-to-nearest: |K - Kq*scale| <= scale/2 per element
    _, folded, q = tiny
    k = np.asarray(folded["initial"]["conv1"]["kernel"], np.float32)
    kq = np.asarray(q["initial"]["conv1"]["kernel_q"], np.float32)
    s = np.asarray(q["initial"]["conv1"]["w_scale"], np.float32)
    assert np.all(np.abs(k - kq * s) <= s / 2 + 1e-9)


def test_conv2d_int8_close_to_float(rng):
    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    p = layers.conv2d_init(k1, 16, 32, 3)
    x = jax.random.normal(k2, (2, 8, 8, 16))
    y = layers.conv2d(p, x)
    kf = np.asarray(p["kernel"], np.float32)
    scale = np.maximum(np.abs(kf).max(axis=(0, 1, 2)), 1e-12) / 127.0
    pq = {"kernel_q": jnp.asarray(np.clip(np.round(kf / scale), -127, 127),
                                  jnp.int8),
          "w_scale": jnp.asarray(scale), "bias": p["bias"]}
    yq = layers.conv2d(pq, x)
    rel = float(jnp.sqrt(jnp.mean((y - yq) ** 2))
                / jnp.sqrt(jnp.mean(y ** 2)))
    assert rel < 0.02


def test_model_level_error_envelope(tiny):
    cfg, folded, q = tiny
    masks = mu.make_attention_masks(jax.random.key(2), 2, 32)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    outf, _ = mu.apply(folded, None, x, cfg=cfg, masks=masks,
                       train=False, folded=True)
    outq, _ = mu.apply(q, None, x, cfg=cfg, masks=masks,
                       train=False, folded=True)
    lf = np.asarray(outf.semantic, np.float32)
    lq = np.asarray(outq.semantic, np.float32)
    rel = np.sqrt(np.mean((lf - lq) ** 2)) / np.sqrt(np.mean(lf ** 2))
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert rel < 0.10, rel
    assert agree > 0.85, agree


def test_quantized_runner_and_artifact(tmp_path):
    from maskunet_tpu import export as export_lib
    from maskunet_tpu import serve

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    runner, img_size = serve.build_model_runner(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=2, quantize="int8")
    images = np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 3)).astype(np.uint8)
    out = runner(images)
    assert out.shape == (2, 32, 32) and out.max() < 8

    q_dir, f_dir = tmp_path / "q", tmp_path / "f"
    for d, quant in ((q_dir, "int8"), (f_dir, None)):
        export_lib.export_serving_artifact(
            rec, 8, "/tmp/nonexistent_workdir", "best", str(d),
            compute_dtype="float32", batch_size=2, quantize=quant)
    qb = (q_dir / export_lib.MODULE_NAME).stat().st_size
    fb = (f_dir / export_lib.MODULE_NAME).stat().st_size
    assert qb < 0.45 * fb, (qb, fb)   # int8 constants shrink the artifact
    qrunner, meta = export_lib.load_serving_artifact(str(q_dir))
    assert meta["quantize"] == "int8"
    # NOT bit-exact vs the live runner (unlike the float artifact):
    # recompiling the deserialized module may reorder the f32 max-reduce
    # behind the dynamic activation scale, and a 1-ULP scale difference
    # flips round() on .5 boundaries. Lock semantic agreement instead.
    agree = (qrunner(images) == out).mean()
    assert agree > 0.95, agree


def test_int8_batch_composition_invariance():
    """Per-SAMPLE activation scales: an image's quantized prediction must
    not depend on what it was co-batched with (the serving stack's
    batch-composition invariance; a whole-batch max scale would break it)."""
    from maskunet_tpu import serve

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    runner, _ = serve.build_model_runner(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=2, quantize="int8")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    bright = np.full((32, 32, 3), 255, np.uint8)
    dark = np.zeros((32, 32, 3), np.uint8)
    a = runner(np.stack([img, bright]))[0]
    b = runner(np.stack([img, dark]))[0]
    np.testing.assert_array_equal(a, b)


def test_calibrated_static_scales(tiny):
    """PTQ calibration: recorded per-conv activation maxima bake in as
    static a_scale (no per-call max-reduce), and the statically-quantized
    model stays close to float on calibration-distribution data."""
    cfg, folded, q_dyn = tiny
    masks = mu.make_attention_masks(jax.random.key(2), 2, 32)

    def fwd(p, x):   # eager on purpose: calibration wraps layers.conv2d
        out, _ = mu.apply(p, None, x, cfg=cfg, masks=masks,
                          train=False, folded=True)
        return out.semantic

    batches = [jax.random.uniform(jax.random.key(i), (2, 32, 32, 3))
               for i in range(3)]
    scales = mu.calibrate_activation_scales(folded, fwd, batches)
    n_convs = len(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, l: 1 if str(p[-1].key) == "kernel_q" else None,
            q_dyn)))
    assert len(scales) == n_convs
    assert all(v > 0 for v in scales.values())
    assert "initial/conv1" in scales

    q = mu.quantize_params_for_inference(folded, act_scales=scales)
    assert float(q["initial"]["conv1"]["a_scale"]) > 0
    lf = np.asarray(fwd(folded, batches[0]), np.float32)
    lq = np.asarray(fwd(q, batches[0]), np.float32)
    rel = np.sqrt(np.mean((lf - lq) ** 2)) / np.sqrt(np.mean(lf ** 2))
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert rel < 0.12, rel
    assert agree > 0.85, agree


def test_int8_composes_with_bf16_cast():
    """The production TPU combo is quantize=int8 + compute_dtype=bfloat16
    (cast_params_for_inference runs after quantization): int8 kernels and
    f32 w_scales must survive the cast untouched, bf16 biases must feed
    the f32 dequant cleanly."""
    import jax.numpy as jnp

    from maskunet_tpu import serve

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    forward, params, masks, cfg = serve.build_inference_fn(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="bfloat16", batch_size=2, quantize="int8")
    conv = params["initial"]["conv1"]
    assert conv["kernel_q"].dtype == jnp.int8
    assert conv["w_scale"].dtype == jnp.float32
    assert conv["bias"].dtype == jnp.bfloat16
    out = np.asarray(forward(params,
                             np.zeros((2, 32, 32, 3), np.uint8)))
    assert out.shape == (2, 32, 32) and out.max() < 8


def test_serve_calibrate_images(tmp_path):
    """serve/export --calibrate-images: static scales from a sample-image
    directory, through the real serving build path."""
    import cv2

    from maskunet_tpu import serve

    d = tmp_path / "cal"
    d.mkdir()
    rng = np.random.default_rng(11)
    for i in range(2):
        cv2.imwrite(str(d / f"c{i}.png"),
                    rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    forward, params, masks, cfg = serve.build_inference_fn(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=2, quantize="int8",
        calibrate_images=str(d))
    assert float(params["initial"]["conv1"]["a_scale"]) > 0
    out = np.asarray(forward(params,
                             np.zeros((2, 32, 32, 3), np.uint8)))
    assert out.shape == (2, 32, 32) and out.max() < 8

    with pytest.raises(ValueError, match="requires --quantize"):
        serve.build_inference_fn(
            rec, 8, "/tmp/nonexistent_workdir", "best",
            compute_dtype="float32", batch_size=2,
            calibrate_images=str(d))

    # a count not divisible by the serving batch still calibrates (the
    # ragged tail is padded by repetition, not dropped) ...
    cv2.imwrite(str(d / "c2.png"),
                rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    forward, params, masks, cfg = serve.build_inference_fn(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=2, quantize="int8",
        calibrate_images=str(d))
    assert float(params["initial"]["conv1"]["a_scale"]) > 0

    # ... and an empty calibration directory fails loudly (the dataset
    # fail-fasts on no images; serve's own empty-check is defense-in-depth)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises((FileNotFoundError, ValueError),
                       match="[Nn]o (calibration )?images"):
        serve.build_inference_fn(
            rec, 8, "/tmp/nonexistent_workdir", "best",
            compute_dtype="float32", batch_size=2, quantize="int8",
            calibrate_images=str(empty))


def test_unknown_quantize_mode_raises():
    from maskunet_tpu import serve
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    with pytest.raises(ValueError, match="unknown quantize mode"):
        serve.build_inference_fn(rec, 8, "/tmp/nonexistent_workdir",
                                 "best", compute_dtype="float32",
                                 batch_size=2, quantize="int4")
