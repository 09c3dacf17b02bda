"""HDF5 embedding cache: extraction, storage, validation, lazy loading.

Counterpart of ``avex/evaluation/embedding_utils.py`` and the cache-validity
check in ``avex/utils/utils.py:477``. File layout and metadata attributes are
kept interoperable with the reference:

- one dataset per layer: ``embeddings_{i}`` (plus ``labels``), with root attrs
  ``aggregation``, ``layer_names``, ``multi_layer``, ``num_samples``
  (≈ embedding_utils.py:147-161);
- filenames follow ``{save_dir}/{dataset}_{model}/embedding_{split}_{layer_id}.h5``
  (run_evaluate.py:191-224).

Extraction overlaps TPU compute with host HDF5 writes: the device loop runs
ahead (async dispatch) while the previous batch's embeddings stream to disk.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import h5py
import numpy as np

logger = logging.getLogger(__name__)


def layer_id_for(layers: Sequence[Union[str, int]]) -> str:
    """Stable id naming a layer selection in cache filenames."""
    return "_".join(str(layer).replace(".", "-") for layer in layers) or "last_layer"


def cache_path(
    save_dir: str, dataset_name: str, model_name: str, split: str, layers
) -> Path:
    """Cache file path following the reference naming scheme."""
    base = Path(save_dir) / f"{dataset_name}_{model_name}"
    return base / f"embedding_{split}_{layer_id_for(layers)}.h5"


def embedding_cache_matches(
    path: Union[str, Path],
    aggregation: str,
    layer_names: Sequence[str],
) -> bool:
    """True when an existing cache file matches the requested configuration
    (≈ utils/utils.py:477 ``_embedding_cache_matches``)."""
    path = Path(path)
    if not path.exists():
        return False
    try:
        with h5py.File(path, "r") as f:
            if f.attrs.get("aggregation") != aggregation:
                return False
            stored = [str(n) for n in f.attrs.get("layer_names", [])]
            return stored == [str(n) for n in layer_names]
    except OSError:
        return False


def extract_embeddings_to_cache(
    model,
    loader,
    path: Union[str, Path],
    aggregation: str = "none",
    layers: Optional[Sequence[Union[str, int]]] = None,
    mesh=None,
) -> Path:
    """Run the backbone over a loader and stream embeddings into HDF5.

    The jitted extraction dispatches asynchronously; the HDF5 append of batch
    N-1 overlaps the TPU computing batch N (the reference's streaming path,
    embedding_utils.py:164-349, without its manual chunk-size heuristics —
    h5py's resizable datasets handle growth).

    ``mesh``: shard each batch along the mesh's data axis so extraction runs
    data-parallel across every chip (the BASELINE "batched on v5e-8"
    workload); variables are replicated once. Per-sample results are
    identical to single-device extraction — pooling never crosses the batch
    axis.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if layers is not None:
        model.register_hooks_for_layers(list(layers))
    layer_names = list(model._hook_layers)

    if mesh is not None:
        from avex_tpu.parallel import replicate

        model.variables = replicate(model.variables, mesh)

    tmp = path.with_suffix(".h5.tmp")
    num_samples = 0
    with h5py.File(tmp, "w") as f:
        datasets: List[h5py.Dataset] = []
        labels_ds = None
        pending = None  # (embeddings_list, labels) from the previous batch

        def flush(embs_labels):
            nonlocal num_samples, labels_ds
            embs, labels = embs_labels
            embs = [np.asarray(e) for e in embs]  # sync point
            if not datasets:
                for i, e in enumerate(embs):
                    datasets.append(
                        f.create_dataset(
                            f"embeddings_{i}",
                            shape=(0,) + e.shape[1:],
                            maxshape=(None,) + e.shape[1:],
                            dtype="float32",
                            chunks=(min(64, max(1, e.shape[0])),) + e.shape[1:],
                        )
                    )
                if labels is not None:
                    labels_ds = f.create_dataset(
                        "labels",
                        shape=(0,) + labels.shape[1:],
                        maxshape=(None,) + labels.shape[1:],
                        dtype=labels.dtype,
                    )
            n = embs[0].shape[0]
            for ds, e in zip(datasets, embs):
                ds.resize(num_samples + n, axis=0)
                ds[num_samples:] = e
            if labels_ds is not None and labels is not None:
                labels_ds.resize(num_samples + n, axis=0)
                labels_ds[num_samples:] = labels
            num_samples += n

        for batch in loader:
            wav, mask = batch["raw_wav"], batch.get("padding_mask")
            if mesh is not None:
                from avex_tpu.parallel import shard_batch

                device = {"raw_wav": wav}
                if mask is not None:
                    device["padding_mask"] = mask
                device = shard_batch(device, mesh)
                wav, mask = device["raw_wav"], device.get("padding_mask")
            embs = model.extract_embeddings(
                wav,
                padding_mask=mask,
                aggregation=aggregation,
            )
            if not isinstance(embs, list):
                embs = [embs]
            labels = batch.get("label")
            if pending is not None:
                flush(pending)  # overlaps with the dispatch above
            pending = (embs, None if labels is None else np.asarray(labels))
        if pending is not None:
            flush(pending)

        f.attrs["aggregation"] = aggregation
        f.attrs["layer_names"] = [str(n) for n in layer_names]
        f.attrs["multi_layer"] = len(datasets) > 1
        f.attrs["num_samples"] = num_samples
        f.attrs["embedding_dims"] = [int(ds.shape[-1]) for ds in datasets]
    os.replace(tmp, path)
    logger.info("Cached %d samples x %d layer(s) to %s", num_samples, len(layer_names), path)
    return path


def load_cached_embeddings(
    path: Union[str, Path],
) -> Tuple[List[np.ndarray], Optional[np.ndarray], Dict]:
    """Load a cache fully into memory: (per-layer arrays, labels, metadata)."""
    with h5py.File(path, "r") as f:
        metadata = dict(f.attrs)
        embs = []
        i = 0
        while f"embeddings_{i}" in f:
            embs.append(np.asarray(f[f"embeddings_{i}"]))
            i += 1
        labels = np.asarray(f["labels"]) if "labels" in f else None
    return embs, labels, metadata


def estimated_cache_bytes(path: Union[str, Path]) -> int:
    """Uncompressed footprint estimate from dataset shapes
    (≈ embedding_manager.py:146-160)."""
    total = 0
    with h5py.File(path, "r") as f:
        for key in f:
            ds = f[key]
            total += int(np.prod(ds.shape)) * ds.dtype.itemsize
    return total


class HDF5EmbeddingDataset:
    """Lazy windowed view over a cache file, map-style like AudioDataset
    (≈ embedding_utils.py:862-1430). Safe to pickle (reopens per process)."""

    def __init__(self, path: Union[str, Path]) -> None:
        self.path = str(path)
        self._file: Optional[h5py.File] = None
        with h5py.File(self.path, "r") as f:
            self.num_samples = int(f.attrs["num_samples"])
            self.num_layers = sum(1 for k in f if k.startswith("embeddings_"))
            self.has_labels = "labels" in f
            self.metadata = dict(f.attrs)

    def _ensure_open(self) -> h5py.File:
        if self._file is None:
            self._file = h5py.File(self.path, "r")
        return self._file

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        f = self._ensure_open()
        item: Dict[str, np.ndarray] = {}
        for i in range(self.num_layers):
            item[f"embeddings_{i}"] = np.asarray(f[f"embeddings_{i}"][idx])
        if self.has_labels:
            item["label"] = np.asarray(f["labels"][idx])
        return item

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_file"] = None
        return state
