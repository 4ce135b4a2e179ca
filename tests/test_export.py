"""AOT export: StableHLO serving artifacts round-trip exactly.

The exported artifact must compute bit-identically to the live
`serve.build_model_runner` path — it is the same folded forward frozen
through jax.export — and must be loadable with no model code involved.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from maskunet_tpu import export as export_lib
from maskunet_tpu import serve
from maskunet_tpu.tasks import recipes as recipes_lib


@pytest.fixture(scope="module")
def tiny_recipe():
    return dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                               img_size=32, batch_size=2)


@pytest.fixture(scope="module")
def artifact(tiny_recipe, tmp_path_factory):
    out = tmp_path_factory.mktemp("aot") / "artifact"
    export_lib.export_serving_artifact(
        tiny_recipe, 8, "/tmp/nonexistent_workdir", "best", str(out),
        compute_dtype="float32", batch_size=2)
    return str(out)


def test_artifact_files_and_meta(artifact):
    assert os.path.exists(os.path.join(artifact, export_lib.MODULE_NAME))
    with open(os.path.join(artifact, export_lib.META_NAME)) as f:
        meta = json.load(f)
    assert meta["img_size"] == 32
    assert meta["num_classes"] == 8
    assert meta["batch_size"] == 2
    assert meta["input_shape"] == [2, 32, 32, 3]
    assert meta["attn_impl"] in ("dense", "flash")


def test_roundtrip_matches_live_runner(artifact, tiny_recipe):
    # NOTE: the live runner and the export trace fresh-init params from the
    # same seeded setup_state, so outputs must agree bit-exactly
    runner, meta = export_lib.load_serving_artifact(artifact)
    live, img_size = serve.build_model_runner(
        tiny_recipe, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=2)
    images = np.random.default_rng(0).integers(
        0, 255, (2, img_size, img_size, 3)).astype(np.uint8)
    np.testing.assert_array_equal(runner(images), live(images))


def test_loaded_runner_contract(artifact):
    runner, meta = export_lib.load_serving_artifact(artifact)
    images = np.zeros((2, 32, 32, 3), np.uint8)
    out = runner(images)
    assert out.shape == (2, 32, 32)
    assert out.dtype == np.uint8
    assert out.max() < 8


def test_served_from_artifact(artifact):
    # the HTTP server can serve an artifact interchangeably with a live
    # checkpoint: same batcher + handler stack on the loaded runner
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2

    runner, meta = export_lib.load_serving_artifact(artifact)
    batcher = serve._Batcher(runner, meta["batch_size"], max_wait_ms=5.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        serve.make_handler(batcher, meta["img_size"], meta["num_classes"]))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        img = np.random.default_rng(1).integers(
            0, 255, (40, 48, 3)).astype(np.uint8)
        _, jpg = cv2.imencode(".jpg", img)
        req = urllib.request.Request(url + "/predict", data=jpg.tobytes(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            mask = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                                cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (32, 32)
    finally:
        httpd.shutdown()


def test_multiplatform_export(tiny_recipe, tmp_path):
    # a CPU dev box can emit an artifact that also carries the TPU
    # lowering (jax.export multi-platform): build fleet artifacts
    # without a chip attached. (The flash-attention path must be
    # exported on a TPU host; this covers the dense path.)
    out = tmp_path / "mp"
    export_lib.export_serving_artifact(
        tiny_recipe, 8, "/tmp/nonexistent_workdir", "best", str(out),
        compute_dtype="float32", batch_size=2, platforms=["cpu", "tpu"])
    runner, meta = export_lib.load_serving_artifact(str(out))
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    assert runner(np.zeros((2, 32, 32, 3), np.uint8)).shape == (2, 32, 32)


def test_cli_export_subcommand(tiny_recipe, tmp_path, monkeypatch):
    # go through the real CLI wiring (recipe lookup happens by name, so
    # register the tiny recipe under a temp name)
    from maskunet_tpu import cli

    monkeypatch.setitem(recipes_lib.RECIPES, "tiny_export_test",
                        dataclasses.replace(tiny_recipe,
                                            name="tiny_export_test"))
    out = tmp_path / "art"
    rc = cli.main(["export", "--recipe", "tiny_export_test",
                   "--workdir", "/tmp/nonexistent_workdir",
                   "--num-classes", "8", "--out", str(out),
                   "--compute-dtype", "float32"])
    assert rc == 0
    runner, meta = export_lib.load_serving_artifact(str(out))
    assert meta["recipe"] == "tiny_export_test"
    out_map = runner(np.zeros((2, 32, 32, 3), np.uint8))
    assert out_map.shape == (2, 32, 32)
