"""Host input-pipeline throughput: decode -> resize -> batch -> device.

SURVEY.md §7 flags the input pipeline as a throughput risk: the
reference decodes with cv2 in the main process (no workers) and would
input-starve a chip running at 680 img/s. This measures what this
repo's threaded pipeline actually sustains, end to end into device
memory, on a real-layout on-disk dataset (fake-generated; same decode
path as real data):

    python tools/make_fake_dataset.py ade /tmp/fake_ade_bench --n 256
    python tools/data_bench.py /tmp/fake_ade_bench [batch] [epochs]

Prints one JSON line per thread count: images/sec from disk into a
device array (uint8 feed + on-device f32/255 happens in the consumer's
train step, not here — this is the host-side + H2D budget).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fake_ade_bench"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    if not os.path.isdir(root):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "make_fake_dataset.py"),
             "ade", root, "--n", "256"], check=True)

    import jax

    from maskunet_tpu.data.ade20k import ADE20KSemanticDataset
    from maskunet_tpu.data import pipeline

    ds = ADE20KSemanticDataset(root, "training", img_size=128)
    n = len(ds)
    if n < batch:
        raise SystemExit(
            f"dataset at {root} has {n} images < batch {batch} "
            "(drop_last=True yields zero batches); use a smaller batch "
            "or point at a larger dataset")
    for threads in (1, 4, 8, 16):
        batches = pipeline.BatchIterator(ds, batch, shuffle=True, seed=0,
                                         drop_last=True,
                                         num_threads=threads)
        # warm one epoch (page cache, thread pools, device alloc)
        with pipeline.Prefetcher(batches.epoch(0)) as pf:
            for b in pf:
                last = b
        jax.block_until_ready(last["image"])
        t0 = time.perf_counter()
        images = 0
        for e in range(1, epochs + 1):
            with pipeline.Prefetcher(batches.epoch(e)) as pf:
                for b in pf:
                    last = b
                    images += int(b["image"].shape[0])
        jax.block_until_ready(last["image"])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "dataset_images": n, "batch": batch, "threads": threads,
            "img_per_sec": round(images / dt, 1),
            # thread scaling is bounded by the host's core count — on a
            # 1-core box every thread count measures per-core throughput
            "host_cores": os.cpu_count(),
        }))


if __name__ == "__main__":
    main()
