"""HTTP serving: micro-batcher and handler, in-process on an ephemeral port."""

import dataclasses
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import cv2
import jax
import numpy as np
import pytest

from maskunet_tpu import serve
from maskunet_tpu.tasks import recipes as recipes_lib


@pytest.fixture(scope="module")
def server():
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    runner, img_size = serve.build_model_runner(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=2)   # fresh init is fine
    runner(np.zeros((2, img_size, img_size, 3), np.uint8))  # warm compile
    batcher = serve._Batcher(runner, 2, max_wait_ms=5.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(batcher, img_size, 8))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _png_mask(url: str, payload: bytes) -> np.ndarray:
    req = urllib.request.Request(url + "/predict", data=payload,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        data = r.read()
    return cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = r.read()
    assert b'"status": "ok"' in body


def test_predict_roundtrip(server):
    img = np.random.default_rng(0).integers(
        0, 255, (48, 40, 3)).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    mask = _png_mask(server, jpg.tobytes())
    assert mask.shape == (32, 32)
    assert mask.max() < 8


def test_predict_concurrent_batching(server):
    rng = np.random.default_rng(1)
    payloads = []
    for _ in range(4):
        ok, jpg = cv2.imencode(
            ".jpg", rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
        payloads.append(jpg.tobytes())
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        masks = list(ex.map(lambda p: _png_mask(server, p), payloads))
    assert all(m.shape == (32, 32) for m in masks)


def test_predict_raw_format(server):
    """?format=raw returns the class map as raw uint8 bytes (no PNG
    encode — the cheap path for throughput-bound callers), identical to
    the PNG-decoded mask for the same payload."""
    img = np.random.default_rng(2).integers(
        0, 255, (40, 40, 3)).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    png_mask = _png_mask(server, jpg.tobytes())
    req = urllib.request.Request(server + "/predict?format=raw",
                                 data=jpg.tobytes(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "application/octet-stream"
        raw = np.frombuffer(r.read(), np.uint8).reshape(32, 32)
    np.testing.assert_array_equal(raw, png_mask)


def test_keepalive_connection_reuse(server):
    """The handler speaks HTTP/1.1 keep-alive: two requests down ONE
    persistent connection both succeed (per-request TCP+thread setup is
    what capped the old req/s on small hosts)."""
    import http.client
    import urllib.parse

    img = np.random.default_rng(4).integers(
        0, 255, (32, 32, 3)).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    conn = http.client.HTTPConnection(
        urllib.parse.urlparse(server).netloc, timeout=120)
    try:
        sock_id = None
        for _ in range(2):
            conn.request("POST", "/predict", body=jpg.tobytes())
            r = conn.getresponse()
            assert r.status == 200
            r.read()
            this_sock = id(conn.sock)
            assert sock_id in (None, this_sock), "connection was re-made"
            sock_id = this_sock
    finally:
        conn.close()


def test_predict_rejects_garbage(server):
    req = urllib.request.Request(server + "/predict", data=b"junk",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert exc.value.code == 404


def test_draining_healthz_503_but_predict_still_served():
    """During a graceful drain, /healthz flips to 503 (load balancers
    stop routing) while the accept loop stays alive — requests already
    connected or parked in the listen backlog are still answered rather
    than reset at server_close()."""
    batcher = serve._Batcher(lambda x: x[..., 0], 2, max_wait_ms=1.0)
    evt = threading.Event()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(batcher, 32, 8, draining=evt))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert b'"status": "ok"' in r.read()
        evt.set()
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(url + "/healthz", timeout=30)
        assert exc.value.code == 503
        assert b"draining" in exc.value.read()
        ok, jpg = cv2.imencode(".jpg", np.zeros((32, 32, 3), np.uint8))
        mask = _png_mask(url, jpg.tobytes())
        assert mask.shape == (32, 32)
    finally:
        httpd.shutdown()


def test_serving_masks_batch_size_invariant():
    """The same image must produce the same mask regardless of the server
    batch size it is run at (VERDICT r1 weak #5): serving broadcasts one
    canonical mask row across the batch."""
    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=2)
    img = np.random.default_rng(3).integers(
        0, 255, (32, 32, 3)).astype(np.uint8)
    outs = []
    for batch in (1, 3):
        runner, _ = serve.build_model_runner(
            rec, 8, "/tmp/nonexistent_workdir", "best",
            compute_dtype="float32", batch_size=batch)
        feed = np.repeat(img[None], batch, axis=0)
        outs.append(np.asarray(runner(feed)[0]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_dp_serving_matches_single_device():
    """`serve --n-data N` shards the serving batch over a data mesh; the
    class maps must equal the single-device runner's bit-exactly (DP is
    math-preserving: params replicated, batch split)."""
    from maskunet_tpu.parallel import mesh as mesh_lib

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=4)
    images = np.random.default_rng(5).integers(
        0, 255, (4, 32, 32, 3)).astype(np.uint8)
    single, _ = serve.build_model_runner(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=4)
    sharded, _ = serve.build_model_runner(
        rec, 8, "/tmp/nonexistent_workdir", "best",
        compute_dtype="float32", batch_size=4,
        mesh=mesh_lib.make_mesh(n_data=4, devices=jax.devices()[:4]))
    np.testing.assert_array_equal(single(images), sharded(images))


def test_dp_serving_rejects_indivisible_batch():
    from maskunet_tpu.parallel import mesh as mesh_lib

    rec = dataclasses.replace(recipes_lib.get("synthetic_semantic"),
                              img_size=32, batch_size=3)
    with pytest.raises(ValueError, match="must divide"):
        serve.build_inference_fn(
            rec, 8, "/tmp/nonexistent_workdir", "best",
            compute_dtype="float32", batch_size=3,
            mesh=mesh_lib.make_mesh(n_data=4, devices=jax.devices()[:4]))


@pytest.mark.slow
def test_graceful_shutdown_on_sigterm():
    """SIGTERM must stop the server cleanly (exit 0, drained log line) —
    fleet schedulers rotate serving tasks with SIGTERM and accepted
    requests must not be dropped on the floor."""
    import json
    import signal
    import subprocess
    import sys
    import time

    proc = subprocess.Popen(
        [sys.executable, "-m", "maskunet_tpu.serve",
         "--recipe", "synthetic_semantic", "--num-classes", "8",
         "--workdir", "/tmp/nonexistent_workdir", "--port", "0",
         "--platform", "cpu", "--compute-dtype", "float32"],
        stdout=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()          # blocks until warm
        assert json.loads(line)["serving"] == "synthetic_semantic"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
        out = proc.stdout.read()
        assert '"shutdown": "SIGTERM"' in out
        assert '"drained": true' in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_artifact_rejects_baked_in_flags():
    """--artifact serves a frozen computation; flags that were fixed at
    export time (--quantize/--n-data/--batch-size/--num-classes) must
    fail loud instead of being silently ignored."""
    for extra in (["--quantize", "int8"], ["--n-data", "4"],
                  ["--batch-size", "2"], ["--num-classes", "8"]):
        with pytest.raises(SystemExit):
            serve.main(["--artifact", "/nonexistent", *extra])


def test_batcher_survives_malformed_request():
    """A bad payload shape fails its batch; the worker thread stays
    alive and later requests still succeed (ADVICE r1)."""
    import queue as queue_mod
    import threading as threading_mod

    def run(images):
        return images[..., 0]

    # long max_wait + pre-filled queue force both requests into ONE
    # batch, so np.stack of mismatched shapes deterministically raises
    batcher = serve._Batcher.__new__(serve._Batcher)
    batcher._run = run
    batcher.batch_size = 2
    batcher.max_wait = 1.0
    batcher.predict_timeout_s = 30.0
    batcher._q = queue_mod.Queue()
    batcher._lock = threading_mod.Lock()
    batcher.stats = {"requests": 0, "errors": 0, "batches": 0,
                     "batched_images": 0, "run_ms_ema": 0.0}
    good = np.zeros((8, 8, 3), np.uint8)
    bad = np.zeros((9, 8, 3), np.uint8)     # np.stack will raise
    slots = [({}, threading_mod.Event()) for _ in range(2)]
    batcher._q.put((good, *slots[0]))
    batcher._q.put((bad, *slots[1]))
    batcher._resolve_q = queue_mod.Queue(3)
    batcher._thread = threading_mod.Thread(target=batcher._worker,
                                           daemon=True)
    batcher._thread.start()
    threading_mod.Thread(target=batcher._resolve_loop, daemon=True).start()
    for slot, done in slots:
        assert done.wait(30)
        assert "error" in slot              # the whole batch failed loud
    assert batcher._thread.is_alive()
    out = batcher.predict(good)             # still serving
    assert out.shape == (8, 8)
    assert batcher.metrics()["errors"] == 2


def test_metrics_endpoint(server):
    img = np.random.default_rng(5).integers(
        0, 255, (32, 32, 3)).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    _png_mask(server, jpg.tobytes())
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        import json
        m = json.loads(r.read())
    assert m["requests"] >= 1
    assert m["batches"] >= 1
    assert 0.0 < m["avg_batch_fill"] <= 1.0
    assert m["run_ms_ema"] > 0.0


def test_batcher_sheds_abandoned_requests():
    """A request that timed out (client already got its 503) is dropped
    from batch assembly instead of still consuming model time
    (ADVICE r2): the worker only sees live requests."""
    import queue as queue_mod
    import threading as threading_mod

    ran = []

    def run(images):
        ran.append(len(images))
        return images[..., 0]

    batcher = serve._Batcher.__new__(serve._Batcher)
    batcher._run = run
    batcher.batch_size = 2
    batcher.max_wait = 0.01
    batcher.predict_timeout_s = 30.0
    batcher._q = queue_mod.Queue()
    batcher._lock = threading_mod.Lock()
    batcher.stats = {"requests": 0, "errors": 0, "batches": 0,
                     "batched_images": 0, "shed": 0, "run_ms_ema": 0.0}
    img = np.zeros((8, 8, 3), np.uint8)
    # pre-abandoned request (its client timed out before the worker ran)
    dead_slot, dead_done = {"abandoned": True}, threading_mod.Event()
    live_slot, live_done = {}, threading_mod.Event()
    batcher._q.put((img, dead_slot, dead_done))
    batcher._q.put((img, live_slot, live_done))
    batcher._resolve_q = queue_mod.Queue(3)
    batcher._thread = threading_mod.Thread(target=batcher._worker,
                                           daemon=True)
    batcher._thread.start()
    threading_mod.Thread(target=batcher._resolve_loop, daemon=True).start()
    assert live_done.wait(30)
    assert "result" in live_slot
    assert not dead_done.is_set()           # never processed
    m = batcher.metrics()
    assert m["shed"] == 1
    # the model batch contained only the live request (padded), never ran
    # a batch solely for the dead one
    assert m["batches"] == 1


def test_batcher_pipeline_keeps_results_per_request():
    """The one-deep dispatch pipeline (batch N fetched only after batch
    N+1 is in flight) must still route every caller its own result —
    a burst spanning many batches with per-request payloads."""
    import queue as queue_mod
    import threading as threading_mod

    def run(images):                    # identity-ish, tags preserved
        return images[..., 0].astype(np.int32) * 2

    batcher = serve._Batcher.__new__(serve._Batcher)
    batcher._run = run
    batcher.batch_size = 2
    batcher.max_wait = 0.005
    batcher.predict_timeout_s = 30.0
    batcher._q = queue_mod.Queue()
    batcher._lock = threading_mod.Lock()
    batcher.stats = {"requests": 0, "errors": 0, "batches": 0,
                     "batched_images": 0, "shed": 0, "run_ms_ema": 0.0}
    batcher._resolve_q = queue_mod.Queue(3)
    batcher._thread = threading_mod.Thread(target=batcher._worker,
                                           daemon=True)
    batcher._thread.start()
    threading_mod.Thread(target=batcher._resolve_loop, daemon=True).start()

    n = 9                               # odd: exercises a padded batch
    results = [None] * n

    def call(k):
        img = np.full((4, 4, 3), k, np.uint8)
        results[k] = batcher.predict(img)

    threads = [threading_mod.Thread(target=call, args=(k,))
               for k in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    for k in range(n):
        assert results[k] is not None
        np.testing.assert_array_equal(
            results[k], np.full((4, 4), 2 * k, np.int32))
    m = batcher.metrics()
    assert m["requests"] == n and m["errors"] == 0
