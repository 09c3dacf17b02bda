"""Data pipeline: datasets, collation, augmentation, loaders.

``build_dataloaders`` is the public entry point, mirroring
``avex/data/dataset.py:423``: dataset configs → per-split loaders plus the
label map / class count derived from the (possibly concatenated) train split.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax

from avex_tpu.configs import DatasetCollectionConfig, RunConfig
from avex_tpu.data.collate import Collater, MixupAugmenter, NoiseAugmenter
from avex_tpu.data.dataset import (
    AudioDataset,
    ConcatenatedDataset,
    HFAudioDataset,
    LocalAudioDataset,
    SubsetDataset,
    SyntheticAudioDataset,
    dataset_from_config,
)
from avex_tpu.data.loader import DataLoader

logger = logging.getLogger(__name__)

__all__ = [
    "AudioDataset",
    "SyntheticAudioDataset",
    "LocalAudioDataset",
    "HFAudioDataset",
    "ConcatenatedDataset",
    "SubsetDataset",
    "dataset_from_config",
    "Collater",
    "NoiseAugmenter",
    "MixupAugmenter",
    "DataLoader",
    "build_dataloaders",
]


def _build_split(configs, policy: str) -> Optional[AudioDataset]:
    if not configs:
        return None
    datasets = [dataset_from_config(c) for c in configs]
    if len(datasets) == 1:
        return datasets[0]
    return ConcatenatedDataset(datasets, policy=policy)


def build_dataloaders(
    config: RunConfig,
    num_classes_override: Optional[int] = None,
) -> Tuple[Optional[DataLoader], Optional[DataLoader], Optional[DataLoader], Dict[str, int], int]:
    """RunConfig → (train, val, test) loaders + label map + num_classes.

    Mirrors ``build_dataloaders`` (dataset.py:423-636): per-split datasets with
    the configured concat policy, collaters wired to the model's target clip
    length and augmentation policy (eval splits never augment and center-crop),
    multi-host sharding when more than one jax process participates.
    """
    ds_cfg: DatasetCollectionConfig = config.dataset_config
    train_ds = _build_split(ds_cfg.train_datasets, ds_cfg.concat_policy)
    val_ds = _build_split(ds_cfg.val_datasets, ds_cfg.concat_policy)
    test_ds = _build_split(ds_cfg.test_datasets, ds_cfg.concat_policy)

    ref = train_ds or val_ds or test_ds
    if ref is None:
        raise ValueError("No datasets configured")
    label_map = ref.label_map()
    num_classes = num_classes_override or ref.num_classes

    audio_cfg = config.model_spec.audio_config
    sr = audio_cfg.sample_rate if audio_cfg else config.sr
    if audio_cfg and audio_cfg.target_length_samples:
        target_len = audio_cfg.target_length_samples
    else:
        target_len = sr  # 1 second fallback
    window_selection = audio_cfg.window_selection if audio_cfg else "random"
    one_hot = True  # reference collater always emits one/multi-hot (dataset.py:342-373)

    num_shards = jax.process_count()
    shard = jax.process_index() if num_shards > 1 else None

    def make_loader(ds, train: bool) -> Optional[DataLoader]:
        if ds is None:
            return None
        collater = Collater(
            target_len=target_len,
            num_classes=num_classes,
            window_selection=window_selection,
            multilabel=config.multilabel,
            one_hot=one_hot,
            augmentations=config.augmentations if train else None,
            sample_rate=sr,
            seed=config.seed,
            train=train,
        )
        loader_cls = DataLoader
        if getattr(config, "data_pipeline", "native") == "grain":
            from avex_tpu.data.grain_loader import GrainDataLoader

            loader_cls = GrainDataLoader
        # Multi-host: every process must contribute equal, divisible batches
        # each step (multi-controller jax), so remainders are dropped for all
        # splits — the DistributedSampler-with-drop_last analogue.
        drop_last = train or num_shards > 1
        return loader_cls(
            ds,
            batch_size=config.training_params.batch_size,
            collate_fn=collater,
            shuffle=train,
            drop_last=drop_last,
            seed=config.seed,
            num_workers=config.num_workers,
            shard_process=shard,
            num_shards=num_shards if num_shards > 1 else 1,
        )

    return (
        make_loader(train_ds, True),
        make_loader(val_ds, False),
        make_loader(test_ds, False),
        label_map,
        num_classes,
    )
