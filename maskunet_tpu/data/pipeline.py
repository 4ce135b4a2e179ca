"""Host-staged input pipeline: decode -> resize -> batch -> prefetch -> device.

The reference decodes with cv2 in the main process with zero workers
(DataLoader(pin_memory=True) only, ade_semantic.py:97-98) and is input-bound
on fast accelerators (SURVEY.md §3.1 hot loop 3). Here:

- datasets are plain objects with `__len__` and `__getitem__(i) -> dict of
  numpy arrays` (decode + cv2-semantics resize on the host);
- a thread pool decodes ahead of the training step;
- batches travel to the device as uint8 and are converted to f32/255 on
  device (ToTensor semantics, 4x less PCIe/DMA traffic);
- a double-buffered prefetcher overlaps host decode with device compute.

Batching is static-shape: training drops the final partial batch (XLA would
recompile per shape — and the reference's cached attention mask breaks on
partial batches anyway, ade_semantic.py:177-181); evaluation pads the final
batch and reports a `valid` mask.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import Iterator, Protocol

import numpy as np


class Dataset(Protocol):
    def __len__(self) -> int: ...
    def __getitem__(self, idx: int) -> dict[str, np.ndarray]: ...


def _stack(examples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples]) for k in keys}


class BatchIterator:
    """Seeded, shuffled, thread-decoded batch iterator over one epoch."""

    def __init__(self, dataset: Dataset, batch_size: int, *,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 pad_last: bool = False, num_threads: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_threads = num_threads

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last and not self.pad_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        bs = self.batch_size
        with concurrent.futures.ThreadPoolExecutor(self.num_threads) as pool:
            # pipeline two batches ahead
            pending: list[list[concurrent.futures.Future]] = []
            starts = list(range(0, len(order), bs))
            for start in starts:
                idxs = order[start:start + bs]
                if len(idxs) < bs:
                    if self.drop_last and not self.pad_last:
                        continue
                pending.append([pool.submit(self.dataset.__getitem__, int(i))
                                for i in idxs])
                while len(pending) > 2:
                    yield self._finish(pending.pop(0))
            while pending:
                yield self._finish(pending.pop(0))

    def _finish(self, futures) -> dict[str, np.ndarray]:
        examples = [f.result() for f in futures]
        batch = _stack(examples)
        n = len(examples)
        if self.pad_last and n < self.batch_size:
            pad = self.batch_size - n
            batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in batch.items()}
        batch["valid"] = np.arange(self.batch_size if self.pad_last
                                   else n) < n
        return batch


def to_device(batch: dict[str, np.ndarray], *, sharding=None) -> dict:
    """Move a host batch to device; uint8 images become f32/255 there."""
    import jax
    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        if sharding is not None and not sharding.is_fully_addressable:
            # multi-process mesh: every process decodes the identical
            # global batch (seeded pipeline); supply the local shards
            # directly — device_put would run a cross-process equality
            # collective on every array of every step
            arr = jax.make_array_from_callback(
                v.shape, sharding, lambda idx, a=v: a[idx])
        elif sharding is not None:
            arr = jax.device_put(v, sharding)
        else:
            arr = jax.device_put(v)
        if k == "image" and v.dtype == np.uint8:
            arr = arr.astype(jnp.float32) / 255.0
        out[k] = arr
    return out


class Prefetcher:
    """Background thread that keeps `depth` device-resident batches ready.

    Use as a context manager (or call `close()`): a consumer that stops
    early (break / max_batches) would otherwise leave the worker blocked
    on a full queue forever, leaking the thread, the decode pool of the
    underlying generator, and device-resident batches.
    """

    def __init__(self, iterator: Iterator[dict[str, np.ndarray]], *,
                 sharding=None, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(iterator,), daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that gives up once close() is called."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self, iterator):
        try:
            try:
                for batch in iterator:
                    if not self._put(to_device(batch,
                                               sharding=self._sharding)):
                        return
            finally:
                # release the generator's resources (e.g. the decode
                # thread pool inside BatchIterator.epoch) promptly
                close = getattr(iterator, "close", None)
                if close is not None:
                    close()
        except BaseException as e:  # surface errors at the consumer
            self._put(e)
            return
        self._put(None)

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item
