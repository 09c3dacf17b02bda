"""Dataset backends: synthetic / local files / HuggingFace datasets.

The reference delegates dataset construction to the private ``esp_data``
package (avex/data/dataset.py:17-22); avex-tpu ships a small local backend
with the same role: a map-style dataset of
``{"raw_wav": np.ndarray, "label": int|str, "text_label": str?}`` items,
constructed from a :class:`avex_tpu.configs.DatasetConfig`.
"""

from __future__ import annotations

import csv
import hashlib
import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from avex_tpu.configs import DatasetConfig

logger = logging.getLogger(__name__)


class AudioDataset:
    """Map-style dataset base: ``len`` + integer ``__getitem__``."""

    def __init__(self, label_names: Optional[List[str]] = None) -> None:
        self.label_names = label_names or []

    @property
    def num_classes(self) -> int:
        """Number of distinct labels this dataset yields."""
        return len(self.label_names)

    def label_map(self) -> Dict[str, int]:
        """label name → index mapping."""
        return {name: i for i, name in enumerate(self.label_names)}

    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:  # pragma: no cover
        raise NotImplementedError


class SyntheticAudioDataset(AudioDataset):
    """Deterministic synthetic bioacoustic-ish clips for tests and benches.

    Each class is a band-limited chirp at a class-specific base frequency
    plus seeded noise, so probes genuinely learn something separable.
    """

    def __init__(self, cfg: DatasetConfig) -> None:
        self.cfg = cfg
        super().__init__(label_names=[f"class_{i}" for i in range(cfg.num_classes)])
        self.sample_rate = cfg.sample_rate
        self.length = int(cfg.clip_seconds * cfg.sample_rate)

    def __len__(self) -> int:
        return self.cfg.num_samples

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        label = idx % self.cfg.num_classes
        rng = np.random.default_rng(self.cfg.seed * 100003 + idx)
        t = np.arange(self.length, dtype=np.float32) / self.sample_rate
        base = 400.0 * (label + 1)
        sweep = base * (1.0 + 0.3 * t)
        wav = 0.3 * np.sin(2 * np.pi * sweep * t).astype(np.float32)
        wav += 0.05 * rng.standard_normal(self.length).astype(np.float32)
        return {
            "raw_wav": wav,
            "label": label,
            "text_label": f"a recording of {self.label_names[label]}",
        }


class LocalAudioDataset(AudioDataset):
    """Directory of ``.wav``/``.npy`` clips + a csv/jsonl metadata file.

    Metadata columns: ``path`` (relative to the dataset dir) and the
    configured ``label_column``; optional ``text_column``.
    """

    def __init__(self, cfg: DatasetConfig) -> None:
        self.cfg = cfg
        root = Path(cfg.path or ".")
        self.root = root
        meta_file = None
        for candidate in ("metadata.csv", "metadata.jsonl", "meta.csv"):
            if (root / candidate).exists():
                meta_file = root / candidate
                break
        if meta_file is None:
            raise FileNotFoundError(f"No metadata.csv/jsonl under {root}")
        self.rows: List[Dict[str, Any]] = []
        if meta_file.suffix == ".csv":
            with open(meta_file) as f:
                self.rows = list(csv.DictReader(f))
        else:
            with open(meta_file) as f:
                self.rows = [json.loads(line) for line in f if line.strip()]
        labels = sorted({str(r[cfg.label_column]) for r in self.rows})
        super().__init__(label_names=labels)
        self._label_to_idx = {name: i for i, name in enumerate(labels)}

    def __len__(self) -> int:
        return len(self.rows)

    def _load_audio(self, path: Path) -> np.ndarray:
        if path.suffix == ".npy":
            return np.load(path).astype(np.float32)
        if path.suffix in (".wav", ".flac"):
            # Native C++ decode (WAV or FLAC, sniffed by magic) + windowed-
            # sinc resample to the configured rate; avex_tpu/_native.
            from avex_tpu._native import decode_audio, resample

            wav, sr = decode_audio(str(path), mono=True)
            if sr != self.cfg.sample_rate:
                wav = resample(wav, sr, self.cfg.sample_rate)
            return wav
        raise ValueError(f"Unsupported audio format: {path}")

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        row = self.rows[idx]
        wav = self._load_audio(self.root / row["path"])
        if self.cfg.audio_max_length_seconds:
            wav = wav[: int(self.cfg.audio_max_length_seconds * self.cfg.sample_rate)]
        label = self._label_to_idx[str(row[self.cfg.label_column])]
        item = {"raw_wav": wav, "label": label}
        if self.cfg.text_column and self.cfg.text_column in row:
            item["text_label"] = row[self.cfg.text_column]
        return item


class ManifestAudioDataset(AudioDataset):
    """JSONL/CSV manifest at any fsspec path + audio under ``data_root``.

    The shape of the reference's BirdSet legacy splits
    (avex/data/birdset_train_splits.py:22-47): a manifest whose rows carry a
    ``path`` column (relative to a data root, or absolute/remote) plus a
    single- or multi-label column (a scalar or a list of eBird codes).
    Manifest and audio fetches go through :mod:`avex_tpu.io` (fsspec +
    retry), so ``gs://`` works wherever credentials/network exist while
    local manifests work offline.
    """

    def __init__(self, cfg: DatasetConfig) -> None:
        import io as _stdio

        from avex_tpu import io as aio

        self.cfg = cfg
        if not cfg.path:
            raise ValueError("manifest dataset requires `path` (the manifest file)")
        text = aio.read_text(cfg.path)
        if cfg.path.endswith(".csv"):
            self.rows = list(csv.DictReader(_stdio.StringIO(text)))
        else:
            self.rows = [json.loads(line) for line in text.splitlines() if line.strip()]
        self.data_root = cfg.data_root or ""
        labels: set = set()
        self.multilabel = False
        for row in self.rows:
            lab = row[cfg.label_column]
            if isinstance(lab, (list, tuple)):
                self.multilabel = True
                labels.update(str(x) for x in lab)
            else:
                labels.add(str(lab))
        super().__init__(label_names=sorted(labels))
        self._label_to_idx = {name: i for i, name in enumerate(self.label_names)}

    def __len__(self) -> int:
        return len(self.rows)

    def _resolve(self, rel: str) -> str:
        if not self.data_root or "://" in rel or rel.startswith("/"):
            return rel
        return self.data_root.rstrip("/") + "/" + rel

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        from avex_tpu import io as aio
        from avex_tpu._native import decode_audio_bytes, resample

        row = self.rows[idx]
        wav, sr = decode_audio_bytes(aio.read_bytes(self._resolve(str(row["path"]))))
        if sr and sr != self.cfg.sample_rate:
            wav = resample(wav, int(sr), self.cfg.sample_rate)
        if self.cfg.audio_max_length_seconds:
            wav = wav[: int(self.cfg.audio_max_length_seconds * self.cfg.sample_rate)]
        lab = row[self.cfg.label_column]
        if isinstance(lab, (list, tuple)):
            label: Any = [self._label_to_idx[str(x)] for x in lab]
        else:
            label = self._label_to_idx[str(lab)]
        item = {"raw_wav": wav, "label": label}
        if self.cfg.text_column and self.cfg.text_column in row:
            item["text_label"] = row[self.cfg.text_column]
        return item


class HFAudioDataset(AudioDataset):
    """HuggingFace ``datasets`` adapter (audio + label columns).

    Audio decoding does NOT require HF's soundfile/torchcodec extras: when
    the hub cell arrives undecoded (``{"bytes": ..., "path": ...}``) the
    native WAV/FLAC decoders handle it, with resampling to the configured
    rate. Decoded cells (``{"array", "sampling_rate"}``) pass through.
    """

    def __init__(self, cfg: DatasetConfig) -> None:
        import datasets as hfds

        self.cfg = cfg
        if cfg.subset:
            self.ds = hfds.load_dataset(cfg.path, cfg.subset, split=cfg.split or "train")
        else:
            self.ds = hfds.load_dataset(cfg.path, split=cfg.split or "train")
        try:
            import soundfile  # noqa: F401
        except ImportError:
            # No soundfile: ask HF for raw bytes and decode natively.
            audio_feature = self.ds.features.get(cfg.audio_column)
            if audio_feature is not None and hasattr(audio_feature, "decode"):
                self.ds = self.ds.cast_column(
                    cfg.audio_column, type(audio_feature)(decode=False)
                )
        feature = self.ds.features.get(cfg.label_column)
        if hasattr(feature, "names"):
            labels = list(feature.names)
        else:
            labels = sorted({str(x) for x in self.ds[cfg.label_column]})
        super().__init__(label_names=labels)
        self._label_to_idx = {name: i for i, name in enumerate(labels)}

    def __len__(self) -> int:
        return len(self.ds)

    def _decode_cell(self, audio: Any) -> tuple:
        """(wav float32, sample_rate or None) from any HF audio cell shape."""
        from avex_tpu._native import decode_audio, decode_audio_bytes

        if isinstance(audio, dict):
            if audio.get("array") is not None:
                return (
                    np.asarray(audio["array"], dtype=np.float32),
                    audio.get("sampling_rate"),
                )
            if audio.get("bytes"):
                return decode_audio_bytes(audio["bytes"])
            if audio.get("path"):
                return decode_audio(str(audio["path"]))
            raise ValueError(f"Undecodable HF audio cell: keys={sorted(audio)}")
        if isinstance(audio, (str, bytes)):
            return (
                decode_audio_bytes(audio)
                if isinstance(audio, bytes)
                else decode_audio(audio)
            )
        return np.asarray(audio, dtype=np.float32), None

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        row = self.ds[int(idx)]
        wav, sr = self._decode_cell(row[self.cfg.audio_column])
        if wav.ndim == 2:
            wav = wav.mean(axis=-1 if wav.shape[-1] <= 2 else 0)
        if sr and sr != self.cfg.sample_rate:
            from avex_tpu._native import resample

            wav = resample(wav, int(sr), self.cfg.sample_rate)
        label = row[self.cfg.label_column]
        if not isinstance(label, int):
            label = self._label_to_idx[str(label)]
        return {"raw_wav": wav, "label": label}


class ConcatenatedDataset(AudioDataset):
    """Merge datasets under a concat policy (≈ avex/data/dataset.py:99-150).

    - ``hard``: label spaces must match exactly;
    - ``overlap``: use the intersection of label names;
    - ``soft``: union of label names.
    """

    def __init__(self, datasets: Sequence[AudioDataset], policy: str = "hard") -> None:
        names_list = [ds.label_names for ds in datasets]
        if policy == "hard":
            for names in names_list[1:]:
                if names != names_list[0]:
                    raise ValueError("hard concat requires identical label spaces")
            merged = list(names_list[0])
        elif policy == "overlap":
            common = set(names_list[0])
            for names in names_list[1:]:
                common &= set(names)
            merged = sorted(common)
        elif policy == "soft":
            union: List[str] = []
            for names in names_list:
                for n in names:
                    if n not in union:
                        union.append(n)
            merged = union
        else:
            raise ValueError(f"Unknown concat policy: {policy}")
        super().__init__(label_names=merged)
        self._map = {n: i for i, n in enumerate(merged)}
        self._index: List[tuple] = []
        self.datasets = list(datasets)
        for d_idx, ds in enumerate(self.datasets):
            for i in range(len(ds)):
                local_label = ds.label_names[ds[i]["label"]] if policy != "hard" else None
                if policy == "overlap" and local_label not in self._map:
                    continue
                self._index.append((d_idx, i))

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        d_idx, i = self._index[idx]
        item = dict(self.datasets[d_idx][i])
        name = self.datasets[d_idx].label_names[item["label"]]
        item["label"] = self._map[name]
        return item


class RelabeledDataset(AudioDataset):
    """View of a dataset with labels remapped into a shared label space."""

    def __init__(self, base: AudioDataset, label_names: Sequence[str]) -> None:
        super().__init__(label_names=list(label_names))
        self.base = base
        shared = self.label_map()
        self._remap = {
            i: shared[name] for i, name in enumerate(base.label_names)
        }

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        item = dict(self.base[idx])
        lab = item["label"]
        if isinstance(lab, (list, tuple)):
            item["label"] = [self._remap[int(x)] for x in lab]
        else:
            item["label"] = self._remap[int(lab)]
        return item


def align_label_spaces(datasets: Sequence[Optional[AudioDataset]]) -> List[Optional[AudioDataset]]:
    """Put related splits onto one shared (sorted-union) label space.

    Splits loaded from separate per-split sources (e.g. the BirdSet legacy
    manifests, one JSONL per split) each derive their own label→index map
    from their own rows; pairing them without alignment silently permutes
    class indices between train and test (every metric corrupted) or
    crashes one-hot encoding when a split holds a class the train split
    lacks. Identical label spaces pass through unwrapped.
    """
    present = [ds for ds in datasets if ds is not None]
    if not present:
        return list(datasets)
    first = present[0].label_names
    if all(ds.label_names == first for ds in present):
        return list(datasets)
    union = sorted({name for ds in present for name in ds.label_names})
    return [None if ds is None else RelabeledDataset(ds, union) for ds in datasets]


_BACKENDS = {
    "synthetic": SyntheticAudioDataset,
    "local": LocalAudioDataset,
    "manifest": ManifestAudioDataset,
    "hf": HFAudioDataset,
}


def dataset_from_config(cfg: DatasetConfig) -> AudioDataset:
    """Instantiate the configured backend (the esp_data entry-point analogue)."""
    if cfg.kind not in _BACKENDS:
        raise ValueError(f"Unknown dataset kind: {cfg.kind}")
    ds = _BACKENDS[cfg.kind](cfg)
    for transform in cfg.transformations:
        ds = apply_transform(ds, transform)
    return ds


def apply_transform(ds: AudioDataset, transform: Dict[str, Any]) -> AudioDataset:
    """Apply a named dataset transform (≈ avex/data/transforms.py)."""
    kind = transform.get("kind") or transform.get("name")
    if kind == "rl_subsample":
        # Deterministic subsample by ratio/max_samples (transforms.py:135).
        ratio = transform.get("ratio", 1.0)
        max_samples = transform.get("max_samples")
        seed = transform.get("seed", 0)
        n = len(ds)
        keep = int(n * ratio)
        if max_samples is not None:
            keep = min(keep, int(max_samples))
        rng = np.random.default_rng(seed)
        indices = sorted(rng.permutation(n)[:keep].tolist())
        return SubsetDataset(ds, indices)
    if kind == "train_val_split":
        # Deterministic hash-based split (transforms.py:34).
        split = transform.get("split", "train")
        val_fraction = transform.get("val_fraction", 0.1)
        indices = []
        for i in range(len(ds)):
            h = int(hashlib.md5(f"{i}".encode()).hexdigest(), 16) % 1000
            is_val = h < val_fraction * 1000
            if (split == "val") == is_val:
                indices.append(i)
        return SubsetDataset(ds, indices)
    raise ValueError(f"Unknown dataset transform: {kind}")


class SubsetDataset(AudioDataset):
    """Index-filtered view of another dataset."""

    def __init__(self, base: AudioDataset, indices: List[int]) -> None:
        super().__init__(label_names=base.label_names)
        self.base = base
        self.indices = indices

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.base[self.indices[idx]]
