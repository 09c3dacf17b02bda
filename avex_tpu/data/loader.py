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
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

# --- process-worker plumbing (spawn-context; ≈ reference dataset.py:528-636).
# The dataset + collate_fn ship once per worker via the initializer; tasks
# then carry only (batch_idx, indices, shm slot). Large arrays travel through
# a pre-allocated shared-memory slot ring (pickling a ~50 MB batch through
# the result pipe is 4-5x slower than a shm memcpy — the torch loader's
# shared-memory tensor strategy, rebuilt in numpy).
_WORKER_DATASET = None
_WORKER_COLLATE = None
_WORKER_SHM = {}


def _init_worker(dataset, collate_fn) -> None:
    global _WORKER_DATASET, _WORKER_COLLATE
    _WORKER_DATASET = dataset
    _WORKER_COLLATE = collate_fn


def _worker_shm(name: str):
    from multiprocessing import shared_memory

    if name not in _WORKER_SHM:
        _WORKER_SHM[name] = shared_memory.SharedMemory(name=name)
    return _WORKER_SHM[name]


def _worker_load_batch(
    batch_idx: int, indices, seed: int, epoch: int, accepts_rng: bool, slot_name=None
):
    items = [_WORKER_DATASET[int(i)] for i in indices]
    if accepts_rng:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, batch_idx]))
        batch = _WORKER_COLLATE(items, rng=rng)
    else:
        batch = _WORKER_COLLATE(items)
    if slot_name is None:
        return batch
    shm = _worker_shm(slot_name)
    offset = 0
    layout = []
    small = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.nbytes >= 1 << 16:
            dst = np.ndarray(value.shape, value.dtype, buffer=shm.buf, offset=offset)
            dst[...] = value
            layout.append((key, value.shape, value.dtype.str, offset))
            offset += value.nbytes
        else:
            small[key] = value
    return {"__shm_layout__": layout, "__small__": small}


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
        worker_mode: str = "auto",
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
        #: "process" = spawn-context worker pool (true decode/collate
        #: parallelism, the reference's strategy); "thread" = in-process pool
        #: (no spawn cost, but Python-level collate serializes on the GIL);
        #: "auto" = processes when dataset + collate_fn pickle, else threads.
        self.worker_mode = worker_mode
        self._process_pool: Optional[ProcessPoolExecutor] = None
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

    def _chunks(self) -> list:
        idx = self._indices()
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        return [idx[s : s + self.batch_size] for s in range(0, end, self.batch_size)]

    def _batch_rng(self, batch_idx: int) -> Optional[np.random.Generator]:
        """Per-batch generator — collation randomness (window crops, noise,
        mixup) is a pure function of (seed, epoch, batch index), identical for
        any ``num_workers``. ``None`` for collate_fns without an rng param."""
        if not self._collate_accepts_rng:
            return None
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, batch_idx])
        )

    @property
    def _collate_accepts_rng(self) -> bool:
        if not hasattr(self, "_accepts_rng_cache"):
            from avex_tpu.data.collate import accepts_rng

            self._accepts_rng_cache = accepts_rng(self.collate_fn)
        return self._accepts_rng_cache

    def _load_batch(self, batch_idx: int, chunk) -> Dict[str, np.ndarray]:
        items = [self.dataset[int(i)] for i in chunk]
        rng = self._batch_rng(batch_idx)
        if rng is not None:
            return self.collate_fn(items, rng=rng)
        return self.collate_fn(items)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        for batch_idx, chunk in enumerate(self._chunks()):
            yield self._load_batch(batch_idx, chunk)

    def _resolve_worker_mode(self) -> str:
        if self.worker_mode in ("process", "thread"):
            return self.worker_mode
        import pickle

        try:
            pickle.dumps(self.dataset)
            pickle.dumps(self.collate_fn)
            return "process"
        except Exception:
            return "thread"

    def _get_process_pool(self) -> ProcessPoolExecutor:
        """Persistent spawn-context pool (reused across epochs; spawn cost is
        paid once per loader, not per epoch)."""
        if self._process_pool is None:
            import multiprocessing as mp

            self._process_pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("spawn"),
                initializer=_init_worker,
                initargs=(self.dataset, self.collate_fn),
            )
        return self._process_pool

    def _ensure_shm_slots(self, slot_bytes: int) -> Dict[str, object]:
        """Persistent shm slot ring (workers cache their mappings by name, so
        slots must live for the loader's lifetime, not one epoch)."""
        if getattr(self, "_shm_slots", None) is None:
            from multiprocessing import shared_memory

            self._shm_slots = {}
            for _ in range(self.prefetch + self.num_workers):
                shm = shared_memory.SharedMemory(create=True, size=max(slot_bytes, 1))
                self._shm_slots[shm.name] = shm
        return self._shm_slots

    def __del__(self):  # pragma: no cover - interpreter-shutdown ordering
        pool = getattr(self, "_process_pool", None)
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
        for shm in (getattr(self, "_shm_slots", None) or {}).values():
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            yield from self._batches()
            return
        # Whole batches (decode + augment + collate) run on workers —
        # collation is the host bottleneck at TPU throughputs, so it must
        # parallelize too. A producer keeps `prefetch + num_workers` batches
        # in flight and emits them in deterministic order; per-batch seeded
        # rngs keep results identical to the sequential path regardless of
        # worker count or mode.
        mode = self._resolve_worker_mode()
        chunks = self._chunks()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        # Early-close support: when the consumer abandons the iterator
        # (`next(iter(loader))`, a break mid-epoch), the finally block sets
        # `stop` and drains the queue so the producer never blocks forever on
        # q.put — otherwise each abandoned iterator would pin shm slots and
        # in-flight worker futures for the loader's lifetime.
        stop = threading.Event()

        def guarded_put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            thread_pool = None
            free_slots: deque = deque()
            try:
                if mode == "process":
                    pool = self._get_process_pool()
                    if not chunks:
                        return
                    # Size the shm slot ring from the first batch (batches
                    # are static-shape by construction; the tail batch is
                    # never larger).
                    first = self._load_batch(0, chunks[0])
                    if not guarded_put(first):
                        return
                    slot_bytes = sum(
                        v.nbytes
                        for v in first.values()
                        if isinstance(v, np.ndarray) and v.nbytes >= 1 << 16
                    )
                    shm_slots = self._ensure_shm_slots(slot_bytes)
                    free_slots.extend(shm_slots.keys())

                    def submit(batch_idx, chunk):
                        slot = free_slots.popleft()
                        future = pool.submit(
                            _worker_load_batch, batch_idx, list(map(int, chunk)),
                            self.seed, self.epoch, self._collate_accepts_rng, slot,
                        )
                        return future, slot

                    def collect(entry):
                        future, slot = entry
                        payload = future.result()
                        batch = dict(payload["__small__"])
                        shm = shm_slots[slot]
                        for key, shape, dtype, offset in payload["__shm_layout__"]:
                            batch[key] = np.ndarray(
                                shape, np.dtype(dtype), buffer=shm.buf, offset=offset
                            ).copy()
                        free_slots.append(slot)
                        return batch

                    remaining = list(enumerate(chunks))[1:]
                else:
                    thread_pool = ThreadPoolExecutor(max_workers=self.num_workers)

                    def submit(batch_idx, chunk):
                        return thread_pool.submit(self._load_batch, batch_idx, chunk)

                    def collect(entry):
                        return entry.result()

                    remaining = list(enumerate(chunks))

                pending: deque = deque()
                chunk_iter = iter(remaining)

                def submit_next() -> None:
                    nxt = next(chunk_iter, None)
                    if nxt is not None:
                        pending.append(submit(nxt[0], nxt[1]))

                in_flight = self.prefetch + self.num_workers
                if mode == "process":
                    in_flight = len(free_slots)
                for _ in range(in_flight):
                    submit_next()
                while pending and not stop.is_set():
                    if not guarded_put(collect(pending.popleft())):
                        break
                    submit_next()
                # collect abandoned futures so shm slots return to the ring
                while pending:
                    try:
                        collect(pending.popleft())
                    except Exception:
                        pass
            except BaseException as err:  # surface worker errors to the consumer
                guarded_put(err)
            finally:
                if thread_pool is not None:
                    thread_pool.shutdown(wait=False)
                guarded_put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    break
                if isinstance(batch, BaseException):
                    thread.join()
                    raise batch
                yield batch
            thread.join()
        finally:
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=10)
