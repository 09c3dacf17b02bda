"""End-to-end CLIP contrastive training through the Trainer."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import (
    DatasetCollectionConfig,
    DatasetConfig,
    ModelSpec,
    RunConfig,
    TrainingParams,
)
from avex_tpu.data import build_dataloaders
from avex_tpu.training import Trainer


@pytest.mark.slow
def test_clip_contrastive_training(tmp_path):
    """Audio-text contrastive loss decreases on synthetic paired data."""
    config = RunConfig(
        model_spec=ModelSpec(
            name="clip",
            pretrained=False,
            text_model_name="roberta-base",
            projection_dim=32,
            # tiny text tower: the full roberta-base is too slow for a CPU test
            extra_config={"text_encoder": {"vocab_size": 2000, "dim": 32, "layers": 1,
                                           "heads": 4, "ffn_dim": 64, "max_positions": 80}},
            audio_config={
                "n_fft": 400,
                "hop_length": 160,
                "win_length": 400,
                "n_mels": 64,
                "representation": "mel_spectrogram",
                "normalize": True,
                "target_length_seconds": 1,
            },
        ),
        training_params=TrainingParams(train_epochs=2, lr=1e-3, batch_size=8),
        dataset_config=DatasetCollectionConfig(
            train_datasets=[
                DatasetConfig(name="s", kind="synthetic", num_samples=32, num_classes=4)
            ]
        ),
        output_dir=str(tmp_path / "clip_run"),
        label_type="text",
        loss_function="clip",
        metrics=["accuracy"],
        seed=0,
        num_workers=0,
    )
    train_loader, _v, _t, _lm, _nc = build_dataloaders(config)

    model = avex_tpu.build_model_from_spec(config.model_spec, num_classes=None)
    trainer = Trainer(model, config, train_loader)
    batch = next(iter(train_loader))
    assert "text_label" in batch

    result = trainer.train()
    losses = [h["train"]["loss"] for h in result["history"]]
    assert all(np.isfinite(l) for l in losses)
    assert "a2t_accuracy" in result["history"][-1]["train"]
