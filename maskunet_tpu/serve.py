"""HTTP inference server: batched low-latency mask prediction.

The production-serving layer the reference has no analog of. A stdlib
ThreadingHTTPServer accepts image uploads and returns class-id mask PNGs;
requests are micro-batched (collect up to `batch_size` requests or
`max_wait_ms`, run one jitted forward, fan results back out), so the TPU
sees full batches under load while single requests stay low-latency.

    python -m maskunet_tpu.serve --recipe ade_semantic --workdir runs/ade \
        --port 8799 [--num-classes 151]

    curl -s -X POST --data-binary @image.jpg \
        http://localhost:8799/predict > mask.png
    curl -s http://localhost:8799/healthz
"""

from __future__ import annotations

import contextlib
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Batcher:
    """Micro-batching executor: blocks callers until their result is ready."""

    def __init__(self, run_batch, batch_size: int, max_wait_ms: float = 10.0,
                 predict_timeout_s: float = 300.0, pipeline_depth: int = 3):
        self._run = run_batch
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1e3
        # generous default: the timeout also covers any first-request jit
        # compile when the runner wasn't pre-warmed (serve.main pre-warms)
        self.predict_timeout_s = predict_timeout_s
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        # handler-tracked in-flight count: covers accept -> model run ->
        # response written, which the queue alone cannot see (a dequeued
        # batch being computed, or a result not yet sent to the socket)
        self._inflight = 0
        self.stats = {"requests": 0, "errors": 0, "batches": 0,
                      "batched_images": 0, "shed": 0, "run_ms_ema": 0.0}
        # dispatched-but-unfetched batches ride this bounded queue to a
        # dedicated resolver thread: the worker keeps assembling and
        # dispatching while up to `pipeline_depth` batches' device
        # results are still in flight. On a remote/tunneled chip the
        # blocking result fetch costs a full RTT (~3x the batch compute,
        # tools/serve_breakdown.py) — a one-deep pipeline left the chip
        # idle most of that; put() blocking when full is the
        # backpressure that bounds result-buffer memory.
        self._resolve_q: queue.Queue = queue.Queue(max(1, pipeline_depth))
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          daemon=True)
        self._resolver.start()

    @contextlib.contextmanager
    def track(self):
        """Context manager marking one request in flight (handler-scoped)."""
        with self._lock:
            self._inflight += 1
        try:
            yield
        finally:
            with self._lock:
                self._inflight -= 1

    def pending(self) -> int:
        """Requests accepted but not yet fully responded to."""
        with self._lock:
            return self._inflight

    def metrics(self) -> dict:
        with self._lock:
            s = dict(self.stats)
        s["avg_batch_fill"] = (s["batched_images"] / s["batches"]
                               / self.batch_size if s["batches"] else 0.0)
        s["queue_depth"] = self._q.qsize()
        return s

    def predict(self, image: np.ndarray) -> np.ndarray:
        done = threading.Event()
        slot: dict = {}
        self._q.put((image, slot, done))
        if not done.wait(self.predict_timeout_s):
            # mark abandoned so the worker sheds it instead of spending
            # model time on a request whose client already got a 503 —
            # under sustained overload serving ghosts would only prolong
            # the backlog the timeout exists to cut
            slot["abandoned"] = True
            raise TimeoutError("prediction timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["result"]

    def _worker(self) -> None:
        # Dispatch loop: assembles batches and hands the (async) device
        # results to the resolver thread via the bounded _resolve_q. The
        # worker never blocks on a device fetch, so batch N's round-trip
        # latency (dominant through a remote-device tunnel) overlaps the
        # assembly AND device compute of the next `pipeline_depth`
        # batches; an idle queue still resolves immediately, so lone
        # requests pay no extra latency.
        while True:
            first = self._q.get()
            items = [first]
            deadline = time.monotonic() + self.max_wait
            while len(items) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            live = [it for it in items if not it[1].get("abandoned")]
            if len(live) != len(items):
                with self._lock:
                    self.stats["shed"] += len(items) - len(live)
            items = live
            if not items:
                continue
            # batch assembly inside the try: a malformed request (wrong
            # shape/dtype) must fail its batch, not kill this singleton
            # worker thread and hang every future predict()
            t0 = time.monotonic()
            try:
                images = np.stack([im for im, _, _ in items])
                pad = self.batch_size - len(items)
                if pad:
                    images = np.concatenate(
                        [images, np.repeat(images[-1:], pad, axis=0)])
                preds = self._run(images)   # async dispatch, no fetch
            except Exception as e:  # noqa: BLE001
                for _, slot, done in items:
                    slot["error"] = repr(e)
                    done.set()
                with self._lock:
                    self.stats["errors"] += len(items)
                    self.stats["batches"] += 1
                    self.stats["batched_images"] += len(items)
                continue
            self._resolve_q.put((preds, items, t0))   # blocks when full

    def _resolve_loop(self) -> None:
        while True:
            self._resolve(self._resolve_q.get())

    def _resolve(self, entry) -> None:
        """Fetch a dispatched batch's results and wake its callers."""
        preds, items, t0 = entry
        try:
            # ONE whole-batch fetch: np.asarray blocks until the device
            # values are ready (JAX deferred errors also surface here);
            # per-item np.asarray(preds[i]) on a device array would issue
            # a separate slice + transfer round trip per request
            preds = np.asarray(preds)
            for i, (_, slot, done) in enumerate(items):
                slot["result"] = preds[i]
                done.set()
            with self._lock:
                self.stats["requests"] += len(items)
        except Exception as e:  # noqa: BLE001
            for _, slot, done in items:
                if not done.is_set():
                    slot["error"] = repr(e)
                    done.set()
            with self._lock:
                self.stats["errors"] += len(items)
        with self._lock:
            self.stats["batches"] += 1
            self.stats["batched_images"] += len(items)
            # time from batch assembly to results ready; overlapped
            # batches legitimately report more than pure device time
            ms = (time.monotonic() - t0) * 1e3
            ema = self.stats["run_ms_ema"]
            self.stats["run_ms_ema"] = round(
                ms if ema == 0.0 else 0.9 * ema + 0.1 * ms, 2)


def build_inference_fn(recipe, num_classes: int, workdir: str, tag: str,
                       *, attn_impl: str = "auto",
                       compute_dtype: str = "bfloat16",
                       batch_size: int | None = None,
                       quantize: str | None = None,
                       calibrate_images: str | None = None,
                       mesh=None):
    """Builds the folded serving forward and its operands.

    Returns ``(forward, infer_params, masks, cfg)`` where ``forward(params,
    x_uint8)`` is a jitted class-map prediction. The serving masks and
    their compaction plans are baked into the closure as a consistent
    pair (a plan is only valid for the exact mask it was computed from,
    so accepting caller-supplied masks would silently mispair them);
    `masks` is returned for inspection/export metadata only. Shared by
    the live server (`build_model_runner`) and the AOT exporter
    (`maskunet_tpu.export`), so both serve exactly the same computation.

    `mesh`: optional data-parallel mesh (`parallel.mesh.make_mesh`) — the
    serving batch shards over the ``data`` axis (params replicated), so a
    multi-chip host serves one large batch cooperatively. The batch size
    must divide by the data-axis size. Not supported for export (the
    artifact is per-chip; shard at the request router instead).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from maskunet_tpu.core import checkpoint as ckpt_lib
    from maskunet_tpu.models import maskattn_unet as mu
    from maskunet_tpu.train import loop as loop_lib

    cfg = loop_lib.model_config(recipe, num_classes, attn_impl=attn_impl,
                                compute_dtype=compute_dtype)
    tx = optax.adamw(recipe.lr, weight_decay=recipe.weight_decay)
    ts = loop_lib.setup_state(recipe, cfg, tx)
    manager = ckpt_lib.CheckpointManager(workdir, recipe.checkpoint_name)
    if manager.has(tag):
        ts = manager.restore_for_inference(ts, tag)

    # serving masks: broadcast the checkpoint's first mask row across the
    # batch, so a given image scores identically regardless of server
    # batch size or which slot it lands in (the training-style per-slot
    # masks would make predictions depend on traffic)
    batch = batch_size or recipe.batch_size
    if ts.masks is not None:
        ts = ts.replace(masks=tuple(
            jnp.broadcast_to(m[:1], (batch,) + m.shape[1:])
            for m in ts.masks))

    # serving fast path: fold all BN affines into the convs, then
    # pre-cast to the compute dtype (PERF.md: no BN passes + no f32
    # weight DMAs per step)
    if mesh is not None and batch % mesh.shape["data"] != 0:
        raise ValueError(
            f"serving batch {batch} must divide by the data-axis size "
            f"{mesh.shape['data']}")

    infer_params = mu.fold_bn_for_inference(ts.params, ts.model_state, cfg)
    if quantize == "int8":
        # optional deployment trade: int8 convs (double MXU rate, 4x
        # smaller conv constants); error bound test-locked, not bit-parity
        act_scales = None
        if calibrate_images:
            # PTQ calibration over sample images: static per-conv
            # activation scales (no per-call max-reduce)
            from maskunet_tpu.tasks.predict import _DirectoryDataset
            cal_ds = _DirectoryDataset(calibrate_images, cfg.img_size)
            if len(cal_ds) == 0:
                raise ValueError(
                    f"no calibration images found in {calibrate_images}")
            imgs = np.stack([cal_ds[i]["image"]
                             for i in range(len(cal_ds))])

            def fwd_eager(p, chunk):   # un-jitted: calibration wraps
                # conv2d and jits the recorded forward itself
                mu.apply(p, None,
                         jnp.asarray(chunk, jnp.float32) / 255.0,
                         cfg=cfg, masks=ts.masks, train=False,
                         folded=True)

            # every provided image participates; the ragged tail chunk is
            # padded by repetition (duplicates add no new activation
            # maxima) because the serving masks are fixed at `batch`
            chunks = []
            for i in range(0, len(imgs), batch):
                c = imgs[i:i + batch]
                if len(c) < batch:
                    c = np.concatenate(
                        [c, np.repeat(c[-1:], batch - len(c), axis=0)])
                chunks.append(c)
            print(json.dumps({"calibration_images": len(imgs),
                              "calibration_batches": len(chunks)}),
                  flush=True)
            act_scales = mu.calibrate_activation_scales(
                infer_params, fwd_eager, chunks)
        infer_params = mu.quantize_params_for_inference(
            infer_params, act_scales=act_scales)
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    elif calibrate_images:
        raise ValueError("--calibrate-images requires --quantize int8")
    if compute_dtype == "bfloat16":
        infer_params = mu.cast_params_for_inference(infer_params)

    masks = ts.masks
    if mesh is not None:
        # params replicated, per-slot masks + batch sharded on `data`
        from maskunet_tpu.parallel import mesh as mesh_lib
        infer_params = jax.device_put(infer_params,
                                      mesh_lib.replicated(mesh))
        if masks is not None:
            masks = jax.device_put(masks, mesh_lib.batch_sharding(mesh))

    # compaction plans from the FINAL serving masks (post-broadcast,
    # post-sharding) — constant for the server's lifetime; masks and
    # plans are closed over together so they cannot be mispaired
    mask_plans = mu.precompute_mask_plans(masks)

    @jax.jit
    def forward(params, x):
        out, _ = mu.apply(params, None,
                          x.astype(jnp.float32) / 255.0, cfg=cfg,
                          masks=masks, train=False, folded=True,
                          mesh=mesh, mask_plans=mask_plans)
        return jnp.argmax(out.semantic, axis=-1).astype(jnp.uint8)

    return forward, infer_params, masks, cfg


def build_model_runner(recipe, num_classes: int, workdir: str, tag: str,
                       *, attn_impl: str = "auto",
                       compute_dtype: str = "bfloat16",
                       batch_size: int | None = None,
                       quantize: str | None = None,
                       calibrate_images: str | None = None,
                       mesh=None):
    """Returns (runner(images_uint8 [B,H,W,3]) -> class maps, img_size)."""
    forward, infer_params, masks, cfg = build_inference_fn(
        recipe, num_classes, workdir, tag, attn_impl=attn_impl,
        compute_dtype=compute_dtype, batch_size=batch_size,
        quantize=quantize, calibrate_images=calibrate_images, mesh=mesh)

    # runners return the (async) jax Array — callers index/np.asarray it
    # when they need values, which lets the batcher pipeline dispatches
    if mesh is None:
        def runner(images: np.ndarray):
            return forward(infer_params, images)
    else:
        from maskunet_tpu.parallel import mesh as mesh_lib

        def runner(images: np.ndarray):
            x = mesh_lib.shard_batch(mesh, np.ascontiguousarray(images))
            return forward(infer_params, x)

    return runner, cfg.img_size


def make_handler(batcher: _Batcher, img_size: int, num_classes: int,
                 draining: threading.Event | None = None):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: a client reusing its connection skips the
        # TCP handshake AND the thread spawn per request (ThreadingHTTP-
        # Server starts one thread per CONNECTION) — on a small host the
        # per-request setup otherwise rivals the model time. Safe because
        # every response path below sends Content-Length (send_error
        # does too).
        protocol_version = "HTTP/1.1"
        # Idle kept-alive connections must not pin their handler thread
        # (and fd) forever: BaseHTTPRequestHandler applies this as the
        # socket timeout, and a timeout between requests closes the
        # connection (handle_one_request -> close_connection). 30 s
        # covers any sane client reuse gap; well-behaved pools reconnect
        # transparently.
        timeout = 30

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                if draining is not None and draining.is_set():
                    # unhealthy-while-draining: load balancers stop
                    # routing here while already-accepted (and
                    # listen-backlog) requests still complete
                    body = json.dumps({"status": "draining"}).encode()
                    self.send_response(503)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                body = json.dumps({"status": "ok",
                                   "img_size": img_size,
                                   "num_classes": num_classes}).encode()
            elif self.path == "/metrics":
                # serving observability: request/error counts, batch fill
                # ratio (how full the TPU batches run), model time EMA
                body = json.dumps(batcher.metrics()).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path.split("?", 1)[0] != "/predict":
                self.send_error(404)
                return
            with batcher.track():
                self._predict()

        def _predict(self):
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            buf = np.frombuffer(data, np.uint8)
            img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if img is None:
                self.send_error(400, "could not decode image")
                return
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (img_size, img_size),
                             interpolation=cv2.INTER_LINEAR)
            try:
                mask = batcher.predict(img)
            except TimeoutError as e:
                self.send_error(503, str(e))
                return
            except RuntimeError as e:
                self.send_error(500, str(e))
                return
            if "format=raw" in self.path:
                # raw row-major uint8 class ids, [img_size, img_size]:
                # skips the PNG encode (host CPU, not model, bounds a
                # loaded 1-core server — see PERF.md serving breakdown)
                body = mask.tobytes()
                ctype = "application/octet-stream"
            else:
                ok, png = cv2.imencode(".png", mask)
                body = png.tobytes()
                ctype = "image/png"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe")
    ap.add_argument("--artifact", default=None,
                    help="serve a jax.export artifact directory "
                         "(maskunet_tpu.export) instead of building the "
                         "model from a checkpoint")
    ap.add_argument("--workdir", default="runs")
    ap.add_argument("--tag", default="best")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--num-classes", type=int, default=None)
    ap.add_argument("--port", type=int, default=8799)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-wait-ms", type=float, default=10.0)
    ap.add_argument("--pipeline-depth", type=int, default=3,
                    help="dispatched-but-unfetched batches kept in "
                         "flight; hides the device->host result round "
                         "trip (raise on high-latency links)")
    ap.add_argument("--predict-timeout-s", type=float, default=300.0,
                    help="per-request wall clock before a 503")
    ap.add_argument("--drain-timeout-s", type=float, default=10.0,
                    help="max seconds to drain in-flight batches on "
                         "SIGTERM/SIGINT before exiting")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="int8-quantize the conv weights (double MXU "
                         "rate; error bound test-locked, not bit-parity)")
    ap.add_argument("--calibrate-images", default=None,
                    help="with --quantize int8: directory of sample "
                         "images for PTQ calibration (static activation "
                         "scales instead of per-call dynamic ones)")
    ap.add_argument("--n-data", type=int, default=None,
                    help="data-parallel serving mesh size: the batch "
                         "shards over N chips (must divide batch size)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()

    if args.artifact:
        # artifacts are frozen per-chip computations: mesh/quantize/batch
        # choices were baked at export time — fail loud instead of
        # silently serving something other than what the flags ask for
        for flag, name in ((args.n_data, "--n-data"),
                           (args.quantize, "--quantize"),
                           (args.calibrate_images, "--calibrate-images"),
                           (args.batch_size, "--batch-size"),
                           (args.num_classes, "--num-classes")):
            if flag is not None:
                ap.error(f"{name} cannot be combined with --artifact "
                         "(it was fixed at export time)")
        from maskunet_tpu import export as export_lib
        runner, meta = export_lib.load_serving_artifact(args.artifact)
        num_classes = meta["num_classes"]
        img_size = meta["img_size"]
        batch = meta["batch_size"]
        served = meta.get("recipe", args.artifact)
    else:
        if not args.recipe:
            ap.error("--recipe is required unless --artifact is given")
        from maskunet_tpu.tasks import recipes as recipes_lib

        recipe = recipes_lib.get(args.recipe)
        # reference-imported checkpoints must serve with the attention
        # layout their weights encode (import-torch records it)
        from maskunet_tpu.core import checkpoint as _ckpt_meta
        meta_sc = _ckpt_meta.read_import_meta(args.workdir,
                                              recipe.checkpoint_name)
        layout = (meta_sc or {}).get("attn_output_layout", "transpose")
        if layout != recipe.attn_output_layout:
            import dataclasses
            recipe = dataclasses.replace(recipe, attn_output_layout=layout)
            print(f"attention-output layout: {layout} "
                  f"(from import sidecar)", flush=True)
        if args.num_classes is not None:
            num_classes = args.num_classes
        else:
            from maskunet_tpu.tasks.datasets import make_datasets
            _, _, num_classes = make_datasets(recipe, args.data_root)
        batch = args.batch_size or recipe.batch_size

        mesh = None
        if args.n_data is not None:
            import jax

            from maskunet_tpu.parallel import mesh as mesh_lib
            # "use N chips": unlike training (whole-host mesh), a serving
            # process may own a subset of the host's devices
            mesh = mesh_lib.make_mesh(
                n_data=args.n_data,
                devices=jax.devices()[:args.n_data])
        runner, img_size = build_model_runner(
            recipe, num_classes, args.workdir, args.tag,
            compute_dtype=args.compute_dtype, batch_size=batch,
            quantize=args.quantize,
            calibrate_images=args.calibrate_images, mesh=mesh)
        served = args.recipe
    # warm the compile before accepting traffic
    runner(np.zeros((batch, img_size, img_size, 3), np.uint8))
    batcher = _Batcher(runner, batch, args.max_wait_ms,
                       predict_timeout_s=args.predict_timeout_s,
                       pipeline_depth=args.pipeline_depth)

    # default listen backlog (5) refuses connections under bursty load
    # long before the batcher is saturated
    ThreadingHTTPServer.request_queue_size = 128
    draining = threading.Event()
    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port),
        make_handler(batcher, img_size, num_classes, draining=draining))

    # graceful shutdown: SIGTERM/SIGINT flip /healthz to 503 (load
    # balancers stop routing) but KEEP the accept loop alive while the
    # drain runs — connections already completed in the kernel listen
    # backlog (up to request_queue_size deep) still need to be accepted
    # and answered; calling server.shutdown() first would RST them at
    # server_close() while reporting a clean drain. Only after a
    # sustained-quiet window (or the drain deadline) does the accept
    # loop stop.
    import signal

    def _drain_then_stop(signame: str) -> None:
        print(json.dumps({"shutdown": signame}), flush=True)
        deadline = time.monotonic() + args.drain_timeout_s
        quiet = 0   # consecutive idle polls required: a connection can
        # be accepted (or parked in the listen backlog) before its
        # handler thread reaches track(), so a single pending()==0
        # sample can race ahead of a request still being parsed —
        # demand a short sustained-quiet window instead. Drain is
        # measured on the handler-tracked in-flight count, not queue
        # emptiness: the queue goes empty the moment the worker
        # dequeues a batch, while its requests are still being
        # computed and their responses written.
        while time.monotonic() < deadline:
            if batcher.pending() == 0:
                quiet += 1
                if quiet >= 10:   # 0.5 s of continuous quiet
                    break
            else:
                quiet = 0
            time.sleep(0.05)
        server.shutdown()

    def _term(signum, frame):
        if draining.is_set():
            return   # second signal: drain already in progress
        draining.set()
        threading.Thread(target=_drain_then_stop,
                         args=(signal.Signals(signum).name,),
                         daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)

    print(json.dumps({"serving": served, "port": args.port,
                      "batch_size": batch, "img_size": img_size}),
          flush=True)
    server.serve_forever()
    server.server_close()
    print(json.dumps({"stopped": served,
                      "drained": batcher.pending() == 0}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
