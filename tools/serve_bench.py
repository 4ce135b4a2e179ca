"""End-to-end HTTP serving throughput on the real chip.

Starts the serving stack in-process (micro-batcher + ThreadingHTTPServer
on an ephemeral port), fires concurrent JPEG POSTs, and reports req/s,
latency percentiles, and the batcher's fill ratio.

    python tools/serve_bench.py [n_requests] [concurrency]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()
    import cv2

    from maskunet_tpu import serve
    from maskunet_tpu.tasks import recipes as recipes_lib

    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    concurrency = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    rec = recipes_lib.get("ade_semantic")
    runner, img_size = serve.build_model_runner(
        rec, 150, "/tmp/nonexistent_serve_bench", "best",
        compute_dtype="bfloat16", batch_size=8)
    runner(np.zeros((8, img_size, img_size, 3), np.uint8))  # warm compile
    batcher = serve._Batcher(runner, 8, max_wait_ms=5.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(batcher, img_size, 150))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    rng = np.random.default_rng(0)
    payloads = []
    for _ in range(8):
        img = rng.integers(0, 255, (160, 160, 3)).astype(np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        payloads.append(jpg.tobytes())

    latencies = []
    lat_lock = threading.Lock()

    def post(i):
        req = urllib.request.Request(url + "/predict",
                                     data=payloads[i % len(payloads)],
                                     method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=120) as r:
            r.read()
        with lat_lock:
            latencies.append(time.perf_counter() - t0)

    # warmup
    post(0)
    import concurrent.futures
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(concurrency) as pool:
        list(pool.map(post, range(n_requests)))
    wall = time.perf_counter() - t0
    httpd.shutdown()

    lat = np.sort(np.array(latencies[1:]))
    m = batcher.metrics()
    print(json.dumps({
        "requests": n_requests,
        "concurrency": concurrency,
        "req_per_sec": round(n_requests / wall, 1),
        "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1e3, 1),
        "avg_batch_fill": round(m["avg_batch_fill"], 3),
        "model_ms_ema": m["run_ms_ema"],
    }))


if __name__ == "__main__":
    main()
