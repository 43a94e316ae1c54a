"""Thread-prefetched batching loader with per-host sharding.

Replaces the reference's torch DataLoader + DistributedSampler
(/root/reference/parallel_wavegan/bin/train.py:1311-1361): epoch-shuffled
index sampling, Collater batching, and a background prefetch thread so
host-side feature reads overlap the device step. Per-host sharding takes
every ``num_shards``-th utterance after the epoch shuffle — the JAX analog
of DistributedSampler(rank, world_size).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class DataLoader:
    """Iterate fixed-shape batches forever (or per-epoch).

    Args:
        dataset: indexable dataset of numpy items.
        collater: callable(list_of_items) -> dict of numpy arrays.
        batch_size: per-host batch size.
        shuffle: reshuffle indices each epoch.
        drop_last: drop the trailing incomplete batch (required for static
            shapes; always True in training).
        shard_index / num_shards: per-host sharding of the index stream.
        prefetch: number of batches to keep ready in the background.
    """

    def __init__(
        self,
        dataset,
        collater,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.collater = collater
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.epoch = 0

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx[self.shard_index :: self.num_shards]

    def epoch_batches(self, epoch: int):
        """Yield the batches of one epoch (no prefetch; for eval loops)."""
        idx = self._epoch_indices(epoch)
        n = len(idx)
        end = n - (n % self.batch_size) if self.drop_last else n
        for i in range(0, end, self.batch_size):
            items = [self.dataset[j] for j in idx[i : i + self.batch_size]]
            yield self.collater(items)

    @property
    def batches_per_epoch(self) -> int:
        n = len(self._epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        """Infinite prefetched batch stream (training)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            epoch = self.epoch
            try:
                while not stop.is_set():
                    got_one = False
                    for batch in self.epoch_batches(epoch):
                        got_one = True
                        while not stop.is_set():
                            try:
                                q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
                    epoch += 1
                    self.epoch = epoch
                    if not got_one:
                        raise RuntimeError("dataset yields no complete batch")
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
