"""Optional Grain-backed data pipeline (the jax-ecosystem input library).

SURVEY §7 names Grain as the input-pipeline option for the TPU build; this
adapter exposes our ``AudioDataset`` + ``Collater`` through ``grain`` so
users get its deterministic multiprocess prefetching and — the feature the
torch reference has no answer to — **checkpointable data iterators**: the
exact mid-epoch position serializes with ``get_state``/``set_state`` and can
be stored alongside the orbax model checkpoint for perfect training resume.

Select with ``RunConfig.data_pipeline = "grain"`` (default stays the native
loader, which has no extra dependency).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["GrainDataLoader", "grain_available"]


def grain_available() -> bool:
    """True when the optional ``grain`` dependency is importable."""
    try:
        import grain  # noqa: F401

        return True
    except ImportError:
        return False


class GrainDataLoader:
    """Grain pipeline with the native ``DataLoader``'s interface.

    Yields the same batches as ``DataLoader(shuffle=..., seed=...)``-style
    iteration (our Collater runs as the grain batch_fn with a per-epoch
    seeded rng), plus:

    - ``worker_count`` multiprocess prefetching managed by grain,
    - ``iterator_state()`` / ``restore_iterator(state)`` for mid-epoch
      checkpointing of the active iterator.
    """

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
        if not grain_available():  # pragma: no cover - env without grain
            raise ImportError("grain is not installed; use the native DataLoader")
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.shard_process = shard_process
        self.num_shards = num_shards
        self._live_iterator = None

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle for a new epoch (DistributedSampler analogue)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.num_shards > 1 and self.shard_process is not None:
            n = len(range(self.shard_process, n, self.num_shards))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _build(self):
        import grain

        ds = grain.MapDataset.source(self.dataset)
        if self.shuffle:
            ds = ds.shuffle(seed=self.seed * 1_000_003 + self.epoch)
        if self.num_shards > 1 and self.shard_process is not None:
            ds = ds.slice(slice(self.shard_process, None, self.num_shards))

        collate = self.collate_fn
        from avex_tpu.data.collate import accepts_rng

        collate_takes_rng = accepts_rng(collate)
        seed, epoch, batch_size = self.seed, self.epoch, self.batch_size

        # The batch index derives from the post-shuffle element position, NOT
        # a closure counter: grain's multiprocess prefetch gives each worker
        # its own closure copy, and a restored iterator restarts closures —
        # both would replay/duplicate augmentation seeds. Positions within a
        # batch are contiguous, so positions[0] // batch_size is the true
        # global batch index under any worker count or resume point.
        ds = ds.map_with_index(lambda position, item: (position, item))

        def batch_fn(indexed_items):
            positions = [p for p, _ in indexed_items]
            items = [item for _, item in indexed_items]
            if collate_takes_rng:
                batch_idx = min(positions) // batch_size
                rng = np.random.default_rng(
                    np.random.SeedSequence([seed, epoch, batch_idx])
                )
                return collate(items, rng=rng)
            return collate(items)

        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last, batch_fn=batch_fn)
        iter_ds = ds.to_iter_dataset()
        if self.num_workers > 0:
            import grain.multiprocessing as gmp  # noqa: F401

            iter_ds = iter_ds.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.num_workers)
            )
        return iter_ds

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._live_iterator = iter(self._build())
        yield from self._live_iterator

    # -- checkpointable-iterator surface (grain's headline feature) --------

    def iterator_state(self) -> Optional[Dict[str, Any]]:
        """Serializable mid-epoch position of the active iterator."""
        if self._live_iterator is None:
            return None
        return {"epoch": self.epoch, "grain": self._live_iterator.get_state()}

    def restore_iterator(self, state: Dict[str, Any]) -> Iterator[Dict[str, np.ndarray]]:
        """Resume iteration exactly where ``iterator_state`` was captured."""
        self.epoch = state["epoch"]
        iterator = iter(self._build())
        iterator.set_state(state["grain"])
        self._live_iterator = iterator
        return iterator
