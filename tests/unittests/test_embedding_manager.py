"""EmbeddingDataSource: compute-or-load with the memory-bounded strategy.

Counterpart of reference avex/evaluation/embedding_manager.py:53-469 —
the one §2.7 component that previously had no direct test.
"""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import DatasetConfig, ModelSpec
from avex_tpu.data import Collater, DataLoader
from avex_tpu.data.dataset import SyntheticAudioDataset
from avex_tpu.evaluation.embedding_cache import HDF5EmbeddingDataset
from avex_tpu.evaluation.embedding_manager import (
    EmbeddingDataSource,
    InMemoryEmbeddingDataset,
)


@pytest.fixture(scope="module")
def backbone():
    spec = ModelSpec(
        name="beats",
        pretrained=False,
        init_config={
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 96,
            "encoder_attention_heads": 4,
            "embed_dim": 32,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "encoder_layerdrop": 0.0,
        },
        audio_config={"representation": "raw", "normalize": False, "target_length_seconds": 1},
    )
    return avex_tpu.build_model_from_spec(spec, num_classes=None, return_features_only=True)


def _loader(n=12):
    ds = SyntheticAudioDataset(
        DatasetConfig(name="s", kind="synthetic", num_samples=n, num_classes=3, clip_seconds=1.0)
    )
    return DataLoader(
        ds, batch_size=4, collate_fn=Collater(target_len=16000, num_classes=3, train=False),
        shuffle=False, drop_last=False, num_workers=0,
    )


def test_compute_then_reuse_cache(tmp_path, backbone):
    path = tmp_path / "emb.h5"
    source = EmbeddingDataSource(
        backbone, path, layers=["last_layer"], aggregation="mean"
    )
    ds = source.get_dataset(_loader())
    assert isinstance(ds, InMemoryEmbeddingDataset)
    assert len(ds) == 12
    item = ds[0]
    assert item["embeddings_0"].shape == (64,)
    assert "label" in item
    assert source.embedding_dims() == [64]

    # Second call with a matching cache must NOT recompute.
    mtime = path.stat().st_mtime
    ds2 = source.get_dataset(_loader())
    assert path.stat().st_mtime == mtime
    np.testing.assert_array_equal(ds.embeddings[0], ds2.embeddings[0])


def test_streaming_when_over_memory_limit(tmp_path, backbone):
    """Footprint estimate above the limit -> lazy HDF5 dataset (reference
    :85-113, :375-377)."""
    path = tmp_path / "emb.h5"
    source = EmbeddingDataSource(
        backbone, path, layers=["last_layer"], aggregation="mean",
        memory_limit_bytes=128,  # far below any real cache
    )
    ds = source.get_dataset(_loader())
    assert isinstance(ds, HDF5EmbeddingDataset)
    item = ds[3]
    assert item["embeddings_0"].shape == (64,)


def test_aggregation_mismatch_invalidates_cache(tmp_path, backbone):
    """A cache written under a different aggregation is recomputed, not
    silently reused (reference _embedding_cache_matches semantics)."""
    path = tmp_path / "emb.h5"
    EmbeddingDataSource(backbone, path, layers=["last_layer"], aggregation="mean").get_dataset(
        _loader()
    )
    mtime = path.stat().st_mtime
    source = EmbeddingDataSource(backbone, path, layers=["last_layer"], aggregation="max")
    ds = source.get_dataset(_loader())
    assert path.stat().st_mtime != mtime, "stale-aggregation cache was reused"
    assert isinstance(ds, InMemoryEmbeddingDataset)


def test_overwrite_forces_recompute(tmp_path, backbone):
    path = tmp_path / "emb.h5"
    EmbeddingDataSource(backbone, path, layers=["last_layer"], aggregation="mean").get_dataset(
        _loader()
    )
    mtime = path.stat().st_mtime
    EmbeddingDataSource(
        backbone, path, layers=["last_layer"], aggregation="mean", overwrite=True
    ).get_dataset(_loader())
    assert path.stat().st_mtime != mtime


def test_trainer_factory_wires_grad_checkpointing(tmp_path, backbone):
    """TrainerFactory.create_trainer flips the model's remat rebuild when
    gradient_checkpointing is configured (≈ reference trainer_factory.py:38-180)."""
    from avex_tpu.configs import (
        DatasetCollectionConfig,
        RunConfig,
        TrainingParams,
    )
    from avex_tpu.data import build_dataloaders
    from avex_tpu.training.trainer_factory import TrainerFactory

    config = RunConfig(
        model_spec=ModelSpec(
            name="beats", pretrained=False,
            init_config=dict(backbone.cfg.model_dump()),
            audio_config={"representation": "raw", "normalize": False,
                          "target_length_seconds": 1},
        ),
        training_params=TrainingParams(
            train_epochs=1, lr=1e-3, batch_size=4, gradient_checkpointing=True
        ),
        dataset_config=DatasetCollectionConfig(
            train_datasets=[DatasetConfig(name="s", kind="synthetic", num_samples=8,
                                          num_classes=3, clip_seconds=1.0)]
        ),
        output_dir=str(tmp_path / "run"),
        num_workers=0,
    )
    train_loader, _v, _t, _lm, num_classes = build_dataloaders(config)
    model = avex_tpu.build_model_from_spec(config.model_spec, num_classes=num_classes)
    trainer = TrainerFactory.create_trainer(model, config, train_loader)
    assert getattr(model.cfg, "remat", False) is True  # remat rebuild happened
    assert trainer.steps_per_epoch == 2
