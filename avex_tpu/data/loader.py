"""DataLoader: seeded shuffling, batching, parallel decode, prefetch.

Counterpart of the reference's torch ``DataLoader`` setup
(avex/data/dataset.py:521-636). Host-side numpy batching where
``num_workers`` threads decode/augment items concurrently (the reference's
spawn-context worker processes; threads suffice here because the native WAV
decoder and numpy release the GIL) while a producer thread assembles batches
in deterministic order and keeps ``prefetch`` of them ready for the
accelerator. ``set_epoch`` reseeds the shuffle like
``DistributedSampler.set_epoch``.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np


class DataLoader:
    """Batched iterator over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 0,
        prefetch: int = 2,
        shard_process: Optional[int] = None,
        num_shards: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self.prefetch = prefetch
        # Multi-host: each process reads its own contiguous shard
        # (the DistributedSampler analogue, dataset.py:521-526).
        self.shard_process = shard_process
        self.num_shards = num_shards

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle for a new epoch (DistributedSampler analogue)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 1_000_003 + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        if self.num_shards > 1 and self.shard_process is not None:
            idx = idx[self.shard_process :: self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        for start in range(0, end, self.batch_size):
            chunk = idx[start : start + self.batch_size]
            items = [self.dataset[int(i)] for i in chunk]
            yield self.collate_fn(items)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            yield from self._batches()
            return
        # num_workers threads decode items concurrently; a producer thread
        # pipelines `prefetch + 1` batches of in-flight item futures, collates
        # them in deterministic batch order, and keeps `prefetch` finished
        # batches queued while the accelerator runs the current step.
        idx = self._indices()
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        chunks = [idx[s : s + self.batch_size] for s in range(0, end, self.batch_size)]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer() -> None:
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    pending: deque = deque()
                    chunk_iter = iter(chunks)

                    def submit_next() -> None:
                        chunk = next(chunk_iter, None)
                        if chunk is not None:
                            pending.append(
                                [pool.submit(self.dataset.__getitem__, int(i)) for i in chunk]
                            )

                    for _ in range(self.prefetch + 1):
                        submit_next()
                    while pending:
                        items = [f.result() for f in pending.popleft()]
                        q.put(self.collate_fn(items))
                        submit_next()
            except BaseException as err:  # surface worker errors to the consumer
                q.put(err)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            batch = q.get()
            if batch is sentinel:
                break
            if isinstance(batch, BaseException):
                thread.join()
                raise batch
            yield batch
        thread.join()
