"""Threaded host ingest with device prefetch.

TPU-native replacement for the reference's torch DataLoader workers +
``pin_memory`` (``/root/reference/gloria/datasets/data_module.py:22-30``):
a thread pool runs the (numpy/cv2, GIL-releasing) per-item pipeline and the
collate, while a small queue keeps the next batches already transferred to
device HBM — so the accelerator never waits on the host (double buffering).
"""

from __future__ import annotations

import queue
import threading
from queue import Full
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np


class PrefetchLoader:
    """Iterable over device-ready batches.

    dataset:   indexable returning instance dicts
    collate:   list[instance] → batch dict of numpy arrays
    to_device: batch dict → device batch (e.g. jax.device_put with sharding);
               identity when None.

    Multi-host: ``batch_size`` is always the GLOBAL batch.  With
    ``process_count > 1`` every process draws the SAME epoch order (the
    shuffle RNG is seeded by ``seed + epoch`` only) and then keeps the
    contiguous rows ``[process_index·L, (process_index+1)·L)`` of each
    global batch (L = batch_size / process_count) — the slice layout
    ``jax.make_array_from_process_local_data`` expects, so the assembled
    global array equals the single-host batch row-for-row (replaces the
    reference's Lightning `DistributedSampler` striding).
    """

    def __init__(
        self,
        dataset,
        collate: Callable,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        to_device: Callable | None = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"global batch_size={batch_size} not divisible by "
                f"process_count={process_count}")
        if not (0 <= process_index < max(1, process_count)):
            raise ValueError(f"process_index={process_index} out of range for "
                             f"process_count={process_count}")
        self.dataset = dataset
        self.collate = collate
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.to_device = to_device or (lambda b: b)
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self.epoch = 0
        self.sample_weights: np.ndarray | None = None  # for curriculum reweighting

    def __len__(self) -> int:
        n = len(self.dataset)
        n_batches = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        if self.process_count > 1 and not self.drop_last and n_batches:
            # a trailing partial global batch smaller than process_count rows
            # cannot give every process at least one row — it is dropped
            if n % self.batch_size and n % self.batch_size < self.process_count:
                n_batches -= 1
        return n_batches

    def _epoch_order(self) -> np.ndarray:
        rng = np.random.RandomState(self.seed + self.epoch)
        n = len(self.dataset)
        if self.sample_weights is not None:
            p = np.asarray(self.sample_weights, np.float64)
            p = p / p.sum()
            return rng.choice(n, size=n, replace=True, p=p)
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator[dict]:
        order = self._epoch_order()
        self.epoch += 1
        n_batches = len(self)
        batch_idxs = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_batches)]
        if self.process_count > 1:
            # keep this process's contiguous slice of each global batch; a
            # ragged final batch is truncated to per-process-even size so the
            # cross-host assembly stays rectangular
            local = []
            for idxs in batch_idxs:
                rows = len(idxs) // self.process_count
                local.append(idxs[self.process_index * rows : (self.process_index + 1) * rows])
            batch_idxs = local

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                # one builder thread per in-flight batch: a two-level fan-out
                # (per-item pool.map under concurrent builds) thrashes the GIL
                # and measured SLOWER than sequential; whole-batch builders
                # scale because the heavy per-item work (cv2 decode/resize,
                # the native ingest call) releases the GIL
                if True:
                    def build(idxs):
                        items = [self.dataset[int(i)] for i in idxs]
                        return self.collate(items)

                    pending = []
                    it = iter(batch_idxs)
                    # keep `prefetch` batch builds in flight
                    inner = ThreadPoolExecutor(max(self.prefetch, min(self.num_workers, 4)))
                    try:
                        for _ in range(self.prefetch):
                            idxs = next(it, None)
                            if idxs is not None:
                                pending.append(inner.submit(build, idxs))
                        while pending:
                            if stop.is_set():
                                return
                            batch = pending.pop(0).result()
                            idxs = next(it, None)
                            if idxs is not None:
                                pending.append(inner.submit(build, idxs))
                            # bounded put that re-checks stop: the consumer may
                            # abandon the epoch early (limit_train_batches) and
                            # a blocking put would leak this thread + executors
                            while True:
                                if stop.is_set():
                                    return
                                try:
                                    out_q.put(batch, timeout=0.2)
                                    break
                                except Full:
                                    continue
                    finally:
                        inner.shutdown(wait=False, cancel_futures=True)
            except Exception as exc:  # surface worker errors to the consumer
                _put_until_stopped(exc)
            finally:
                _put_until_stopped(None)

        def _put_until_stopped(item):
            # the sentinel/exception must not be dropped while the consumer is
            # alive (it would block on get() forever), nor block forever once
            # the consumer has stopped
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return
                except Full:
                    continue

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield self.to_device(item)
        finally:
            stop.set()
