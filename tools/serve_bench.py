"""End-to-end HTTP serving throughput on the real chip.

Starts the serving stack in-process (micro-batcher + ThreadingHTTPServer
on an ephemeral port), fires concurrent JPEG POSTs from SEPARATE client
processes (an in-process load generator shares the server's GIL and
caps the measurement), and reports req/s, latency percentiles, and the
batcher's fill ratio.

    python tools/serve_bench.py [n_requests] [concurrency] [client_procs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def client(url: str, n_requests: int, concurrency: int,
           raw: bool = False) -> None:
    """Load-generator subprocess: POST loop, latencies JSON to stdout.

    Uses one persistent HTTP/1.1 connection per worker thread — the
    realistic production pattern (and what the server's keep-alive
    support is for); a fresh TCP connection per request re-measures
    kernel connection setup, not the serving stack."""
    import concurrent.futures
    import http.client
    import urllib.parse

    import cv2

    rng = np.random.default_rng(os.getpid())
    payloads = []
    for _ in range(8):
        img = rng.integers(0, 255, (160, 160, 3)).astype(np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        payloads.append(jpg.tobytes())

    netloc = urllib.parse.urlparse(url).netloc
    path = "/predict" + ("?format=raw" if raw else "")
    local = threading.local()
    latencies = []
    failures = [0]
    lock = threading.Lock()

    def post(i):
        t0 = time.perf_counter()
        for attempt in range(3):   # kernel may refuse past the backlog
            conn = getattr(local, "conn", None)
            try:
                if conn is None:
                    conn = local.conn = http.client.HTTPConnection(
                        netloc, timeout=120)
                conn.request("POST", path, body=payloads[i % len(payloads)])
                r = conn.getresponse()
                r.read()
                if r.status >= 500:
                    # a 5xx (shed/timeout) is a RESULT, not a harness
                    # error: count it and keep the run alive. send_error
                    # responses carry Connection: close — drop the dead
                    # connection NOW or the thread's next request burns a
                    # failed attempt + retry sleep on it (latency skew)
                    local.conn = None
                    conn.close()
                    with lock:
                        failures[0] += 1
                    return
                break
            except (ConnectionError, OSError, http.client.HTTPException):
                local.conn = None
                if conn is not None:
                    conn.close()
                if attempt == 2:
                    with lock:
                        failures[0] += 1
                    return
                time.sleep(0.05 * (attempt + 1))
        with lock:
            latencies.append(time.perf_counter() - t0)

    post(0)   # per-process warmup (excluded from the timed window)
    latencies.clear()
    failures[0] = 0
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(concurrency) as pool:
        list(pool.map(post, range(n_requests)))
    wall = time.perf_counter() - t0
    print(json.dumps({"wall": wall, "latencies": latencies,
                      "failures": failures[0]}))


def main() -> None:
    if sys.argv[1:2] == ["--client"]:
        client(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
               raw="--raw" in sys.argv)
        return

    from maskunet_tpu.utils import compile_cache
    compile_cache.enable()

    from maskunet_tpu import serve
    from maskunet_tpu.tasks import recipes as recipes_lib

    raw = "--raw" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--raw"]
    n_requests = int(argv[0]) if len(argv) > 0 else 400
    concurrency = int(argv[1]) if len(argv) > 1 else 16
    n_procs = int(argv[2]) if len(argv) > 2 else 4

    rec = recipes_lib.get("ade_semantic")
    runner, img_size = serve.build_model_runner(
        rec, 150, "/tmp/nonexistent_serve_bench", "best",
        compute_dtype="bfloat16", batch_size=8)
    runner(np.zeros((8, img_size, img_size, 3), np.uint8))  # warm compile
    batcher = serve._Batcher(runner, 8, max_wait_ms=5.0)
    ThreadingHTTPServer.request_queue_size = 128   # hold bursts > backlog
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.make_handler(batcher, img_size, 150))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    per = max(n_requests // n_procs, 1)
    conc = max(concurrency // n_procs, 1)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--client", url,
         str(per), str(conc)] + (["--raw"] if raw else []),
        stdout=subprocess.PIPE, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for _ in range(n_procs)]
    outs = [p.communicate()[0] for p in procs]
    httpd.shutdown()

    latencies: list[float] = []
    walls = []
    failed = 0
    for out in outs:
        rec_out = json.loads(out.splitlines()[-1])
        latencies.extend(rec_out["latencies"])
        walls.append(rec_out["wall"])
        failed += rec_out.get("failures", 0)
    # clients overlap (subprocess startup is outside their timed window);
    # the slowest client's window spans the whole loaded period
    wall = max(walls)
    lat = np.sort(np.array(latencies))
    m = batcher.metrics()
    # all-failure runs must still report the diagnostics that explain
    # the outage (failed_requests, batch fill) instead of dying on an
    # empty-percentile IndexError
    print(json.dumps({
        "requests": per * n_procs,
        "concurrency": conc * n_procs,
        "client_procs": n_procs,
        "response_format": "raw" if raw else "png",
        "req_per_sec": round(len(latencies) / wall, 1),
        "failed_requests": failed,
        "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1) if len(lat)
        else None,
        "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1e3, 1)
        if len(lat) else None,
        "avg_batch_fill": round(m["avg_batch_fill"], 3),
        "model_ms_ema": m["run_ms_ema"],
    }))


if __name__ == "__main__":
    main()
