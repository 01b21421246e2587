"""Host-side batching + prefetch feeding the device mesh.

TPU-native replacement for the reference's torch ``DataLoader``
(``codes/data/__init__.py:6-37``): worker threads decode/crop on host CPU, a
bounded queue holds collated numpy batches, and the consumer overlaps host→device
transfer with compute by keeping ``prefetch_device`` batches already device-put
with batch-axis sharding (the ``pin_memory`` + H2D-copy role, done the XLA way).
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)  # e.g. per-sample category labels
        else:
            out[key] = vals
    return out


class TrainLoader:
    """Infinite shuffled batch iterator with threaded workers.

    drop_last semantics (reference ``data/__init__.py:14``): only full batches
    are emitted. Deterministic given ``seed`` and single-worker; with multiple
    workers batch *composition* is deterministic, arrival order of epochs
    interleaves.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 seed: int = 0, queue_depth: int = 8,
                 host_index: Optional[int] = None, host_count: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        # Multi-host SPMD: each host draws a disjoint interleaved batch stream
        # from the same seeded permutation (jax.process_index/count by default),
        # so a global step consumes host_count × batch_size distinct samples.
        if host_index is None:
            try:
                import jax

                host_index, host_count = jax.process_index(), jax.process_count()
            except Exception:
                host_index, host_count = 0, 1
        self.host_index = host_index
        self.host_count = max(1, host_count or 1)
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._threads = []
        self._started = False

    def _index_stream(self):
        rng = random.Random(self.seed)
        n = len(self.dataset)
        # Repeat the shuffled epoch enough times that at least one full batch
        # exists even when the dataset is smaller than the batch (debug runs).
        reps = max(1, -(-self.batch_size // n))
        batch_idx = 0
        while True:
            order = []
            for _ in range(reps):
                ep = list(range(n))
                rng.shuffle(ep)
                order.extend(ep)
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                if batch_idx % self.host_count == self.host_index:
                    yield order[i:i + self.batch_size]
                batch_idx += 1

    def _worker(self, batches_q):
        while not self._stop.is_set():
            try:
                idxs = batches_q.get(timeout=0.2)
            except queue.Empty:
                continue
            samples = [self.dataset[i] for i in idxs]
            batch = collate(samples)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def _start(self):
        self._started = True
        self._idx_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)

        def feeder():
            for idxs in self._index_stream():
                if self._stop.is_set():
                    return
                while not self._stop.is_set():
                    try:
                        self._idx_q.put(idxs, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._threads.append(threading.Thread(target=feeder, daemon=True))
        for _ in range(self.num_workers):
            self._threads.append(
                threading.Thread(target=self._worker, args=(self._idx_q,), daemon=True))
        for t in self._threads:
            t.start()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if not self._started:
            self._start()
        while True:
            yield self._q.get()

    def stop(self):
        self._stop.set()
        # drain so workers blocked on a full queue can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=1.0)


class EvalLoader:
    """Sequential batch-1 iterator (reference val/test loader semantics)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __iter__(self):
        for i in range(len(self.dataset)):
            yield self.dataset[i]

    def __len__(self):
        return len(self.dataset)


class DeviceFeeder:
    """Wraps a host batch iterator; keeps N batches device-put ahead of compute."""

    def __init__(self, host_iter, mesh, keys=("LR", "HR"), prefetch: int = 2):
        # shard_local_batch: in a multi-process run each process's loader
        # yields its host-interleaved LOCAL batch; the global batch is
        # assembled from the per-process shards (single-process: plain
        # device_put with batch sharding, unchanged)
        from esrganplus_tpu.parallel import shard_local_batch

        self._host = iter(host_iter)
        self._mesh = mesh
        self._keys = keys
        self._prefetch = prefetch
        self._shard = shard_local_batch
        self._buf = []

    def _pull(self):
        batch = next(self._host)
        arrs = tuple(batch[k] for k in self._keys)
        return self._shard(self._mesh, arrs), batch

    def __iter__(self):
        while True:
            while len(self._buf) < self._prefetch:
                self._buf.append(self._pull())
            yield self._buf.pop(0)


def create_dataloader(dataset, dataset_opt: Dict, seed: int = 0):
    """Reference factory surface (``codes/data/__init__.py:6-19``)."""
    if dataset_opt.get("phase") == "train":
        return TrainLoader(
            dataset,
            batch_size=dataset_opt.get("batch_size", 16),
            num_workers=dataset_opt.get("n_workers", 4),
            seed=seed,
        )
    return EvalLoader(dataset)
