"""Decompose the serving req/s ceiling on this host (VERDICT r3 #5).

The question: serve_bench measured ~158 req/s while the same batch-8
model does ~700 img/s — is the 4.5x gap closable, or is it the 1-core
host? This tool measures each stage of a request's host-side life
separately, then the in-process ceilings with the HTTP layer removed:

  A. model-only ceiling: runner() batches back-to-back (what bench.py
     calls inference img/s, re-measured here through the serving build).
  B. batcher ceiling: _Batcher.predict from N in-process threads — adds
     queue/Event wakeups and the worker loop, still no HTTP/decode.
  C. per-request host CPU: JPEG decode, cvtColor+resize, PNG encode,
     raw tobytes — timed standalone.

The printed arithmetic compares 1 core's budget (1s / per-request host
CPU) against the measured HTTP numbers: if B >> measured HTTP req/s and
C's sum * measured-req/s ~ 1 core-second/second, the bound is host CPU,
not the serving design. Run serve_bench before/after the keep-alive +
raw-format changes for the closable part.

    python tools/serve_breakdown.py [batch] [threads]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import cv2

    from maskunet_tpu import serve
    from maskunet_tpu.tasks import recipes as recipes_lib

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    rec = recipes_lib.get("ade_semantic")
    runner, img_size = serve.build_model_runner(
        rec, 150, "/tmp/nonexistent_serve_breakdown", "best",
        compute_dtype="bfloat16", batch_size=batch)
    x = np.zeros((batch, img_size, img_size, 3), np.uint8)
    np.asarray(runner(x))   # warm compile

    # --- A: model-only ceiling (pipelined dispatch like the batcher) ---
    iters = 60
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pending = None
        for _ in range(iters):
            out = runner(x)
            if pending is not None:
                np.asarray(pending)
            pending = out
        np.asarray(pending)
        best = min(best, (time.perf_counter() - t0) / iters)
    model_img_s = batch / best
    print(f"A. model-only ceiling : {model_img_s:7.1f} img/s "
          f"({best * 1e3:.2f} ms / batch-{batch})")

    # --- B: batcher ceiling, in-process threads, no HTTP ---
    batcher = serve._Batcher(runner, batch, max_wait_ms=5.0)
    img = np.zeros((img_size, img_size, 3), np.uint8)
    n_req = 600
    done = [0]
    lock = threading.Lock()

    def worker(n):
        for _ in range(n):
            batcher.predict(img)
            with lock:
                done[0] += 1

    per = n_req // threads
    ts = [threading.Thread(target=worker, args=(per,)) for _ in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    m = batcher.metrics()
    batcher_req_s = done[0] / wall
    print(f"B. batcher ceiling    : {batcher_req_s:7.1f} req/s "
          f"({threads} threads, batch fill {m['avg_batch_fill']:.2f})")

    # --- C: per-request host CPU stages ---
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (160, 160, 3)).astype(np.uint8)
    ok, jpg = cv2.imencode(".jpg", src)
    jpg = np.frombuffer(jpg.tobytes(), np.uint8)
    mask = rng.integers(0, 150, (img_size, img_size)).astype(np.uint8)

    def timeit(fn, iters=300):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    stages = {
        "jpeg_decode": timeit(lambda: cv2.imdecode(jpg, cv2.IMREAD_COLOR)),
        "cvt_resize": timeit(lambda: cv2.resize(
            cv2.cvtColor(src, cv2.COLOR_BGR2RGB), (img_size, img_size),
            interpolation=cv2.INTER_LINEAR)),
        "png_encode": timeit(lambda: cv2.imencode(".png", mask)),
        "raw_tobytes": timeit(lambda: mask.tobytes()),
    }
    print("C. per-request host CPU stages:")
    for k, v in stages.items():
        print(f"     {k:12s}: {v * 1e6:7.0f} us")
    png_path = (stages["jpeg_decode"] + stages["cvt_resize"]
                + stages["png_encode"])
    raw_path = (stages["jpeg_decode"] + stages["cvt_resize"]
                + stages["raw_tobytes"])
    ncpu = os.cpu_count() or 1
    print(f"\n   cv2-work budget on {ncpu} core(s): "
          f"{ncpu / png_path:6.0f} req/s (png) / "
          f"{ncpu / raw_path:6.0f} req/s (raw) — excludes HTTP parse, "
          f"threading, and the load generator sharing the core(s)")
    print(json.dumps({"model_img_s": round(model_img_s, 1),
                      "batcher_req_s": round(batcher_req_s, 1),
                      "stage_us": {k: round(v * 1e6)
                                   for k, v in stages.items()},
                      "cores": ncpu}))


if __name__ == "__main__":
    main()
