"""Host data loader: threaded decode/augment → fixed-shape uint8 batches.

Replaces torch DataLoader (reference trainer.py:150-200 DataModule) with a
thread-pool pipeline tuned for the TPU feed: workers decode JPEG + augment
(all uint8), batches are preassembled into contiguous arrays, and a
prefetch queue keeps ``prefetch`` batches ready so the device never waits
on the host (double-buffering; SURVEY §7 hard-part 4). Shapes are static
either way: train drops the tail batch (``drop_last=True``); eval keeps
every sample by zero-padding the tail to batch_size with sentinel label
-1 (``drop_last=False`` — consumers mask ``y < 0``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    """Minimal deterministic prefetching loader.

    Args:
        dataset: object with __len__ and __getitem__(idx, rng) → (np, label).
        batch_size: global batch size (pre-sharding).
        shuffle: reshuffle each epoch (seeded).
        num_workers: decode threads.
        seed: base seed; per-item rng = default_rng(seed*1e6 + epoch*len + idx).
        drop_last: True (train) drops the tail partial batch. False (eval)
            KEEPS every sample while preserving static shapes: the tail
            batch is zero-padded to batch_size with sentinel label -1 —
            consumers must mask y < 0 (the eval step does). The reference
            evaluates with drop_last=False; silently dropping up to
            batch_size-1 val samples would skew accuracy.
        shard_id / num_shards: multi-HOST data sharding (the torch
            DistributedSampler role): ``batch_size`` stays the GLOBAL
            batch; process p yields only its contiguous
            batch_size/num_shards sub-block of every global batch, in
            process order — exactly the local slice
            parallel.mesh.shard_batch feeds to
            jax.make_array_from_process_local_data, so the assembled
            global array is bit-identical to the single-host run.
            Epoch order/rngs depend only on (seed, epoch, global idx),
            never on the sharding, and every process sees the same
            __len__/steps_per_epoch. On a padded tail batch each shard
            pads its own block to size (pad rows carry label -1 and are
            masked either way).
    """

    def __init__(self,
                 dataset: Any,
                 batch_size: int,
                 shuffle: bool = False,
                 num_workers: int = 4,
                 seed: int = 0,
                 prefetch: int = 2,
                 drop_last: bool = True,
                 shard_id: int = 0,
                 num_shards: int = 1):
        if not 0 <= shard_id < num_shards:
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        if batch_size % num_shards:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{num_shards} host shards")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.local_batch = batch_size // num_shards
        self.epoch = 0
        self.start_batch = 0
        self._probe_shape: Optional[Tuple[Tuple[int, ...], Any]] = None

    def __len__(self) -> int:
        if self.drop_last:
            return len(self.dataset) // self.batch_size
        return -(-len(self.dataset) // self.batch_size)

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Position the next iteration pass.

        ``start_batch`` skips the first batches of the epoch WITHOUT
        decoding them — exact mid-epoch resume: the epoch's batch order
        and every per-item rng depend only on (seed, epoch, idx), so the
        batches actually yielded are bit-identical to the ones an
        uninterrupted pass would produce at the same positions.
        """
        self.epoch = epoch
        self.start_batch = start_batch

    def _item_rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch * len(self.dataset) + idx) & 0x7FFFFFFF)

    def _fetch(self, idx: int) -> Tuple[np.ndarray, int]:
        item = self.dataset.__getitem__(int(idx), self._item_rng(int(idx)))
        return item

    def _item_shape(self) -> Tuple[Tuple[int, ...], Any]:
        """Per-item (shape, dtype) — only needed when a shard's very
        first yielded block is all-pad. Datasets may expose an
        ``item_shape`` property ((shape, dtype), no decode); otherwise
        item 0 is fetched once to establish it."""
        if self._probe_shape is None:
            declared = getattr(self.dataset, "item_shape", None)
            if declared is not None:
                shape, dtype = declared
                self._probe_shape = (tuple(shape), np.dtype(dtype))
            else:
                x0, _ = self._fetch(0)
                x0 = np.asarray(x0)
                self._probe_shape = (x0.shape, x0.dtype)
        return self._probe_shape

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        n_batches = len(self)
        if n_batches == 0:
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(min(self.start_batch, n_batches), n_batches):
                        if stop.is_set():
                            return
                        # this process's contiguous block of global batch b
                        lo = b * self.batch_size + self.shard_id * self.local_batch
                        hi = min(lo + self.local_batch,
                                 min((b + 1) * self.batch_size, n))
                        idxs = order[lo:hi] if hi > lo else order[:0]
                        items = list(pool.map(self._fetch, idxs))
                        if items:
                            xs = np.stack([it[0] for it in items])
                            ys = np.asarray([it[1] for it in items],
                                            dtype=np.int32)
                            if self._probe_shape is None:
                                self._probe_shape = (xs.shape[1:], xs.dtype)
                        else:
                            # a tail batch can leave a later shard empty;
                            # its block is all pad rows of the item shape
                            shp, dt = self._item_shape()
                            xs = np.zeros((0,) + shp, dt)
                            ys = np.zeros((0,), np.int32)
                        pad = self.local_batch - len(items)
                        if pad:  # tail batch (drop_last=False): keep the
                            # compiled shape, mark pad rows with label -1
                            xs = np.concatenate(
                                [xs, np.zeros((pad,) + xs.shape[1:],
                                              xs.dtype)])
                            ys = np.concatenate(
                                [ys, np.full((pad,), -1, np.int32)])
                        while not stop.is_set():
                            try:
                                out_q.put((xs, ys), timeout=0.5)
                                break
                            except queue.Full:
                                continue
            except BaseException as e:  # surface worker errors to the consumer
                _safe_put(out_q, e, stop)
            else:
                _safe_put(out_q, None, stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can observe stop and exit
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def _safe_put(q: "queue.Queue", item, stop: threading.Event) -> None:
    """Enqueue without deadlocking if the consumer has gone away."""
    while True:
        try:
            q.put(item, timeout=0.5)
            return
        except queue.Full:
            if stop.is_set():
                return
