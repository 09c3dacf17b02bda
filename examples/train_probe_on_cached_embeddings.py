#!/usr/bin/env python
"""Offline probe transfer: cache embeddings once, train probes cheaply.

The core BEANS/BirdSet evaluation pattern — backbone forward happens once
per dataset, probe sweeps reuse the HDF5 cache.
"""

import tempfile
from pathlib import Path

from avex_tpu.configs import (
    DatasetConfig, EvaluateConfig, EvaluationSet, ExperimentConfig,
    BenchmarkEvaluationConfig, ModelSpec, ProbeConfig, RunConfig, TrainingParams,
    DatasetCollectionConfig,
)
from avex_tpu.run_evaluate import main as run_evaluate

save_dir = Path(tempfile.mkdtemp(prefix="avex_tpu_example_"))

config = EvaluateConfig(
    experiments=[ExperimentConfig(
        run_name="beats_linear_probe",
        run_config=RunConfig(
            model_spec=ModelSpec(name="beats", pretrained=False, init_config={
                "encoder_layers": 2, "encoder_embed_dim": 64,
                "encoder_ffn_embed_dim": 96, "encoder_attention_heads": 4,
                "embed_dim": 32, "dropout": 0.0, "attention_dropout": 0.0,
                "encoder_layerdrop": 0.0},
                audio_config={"representation": "raw", "normalize": False,
                              "target_length_seconds": 1}),
            training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=8),
            dataset_config=DatasetCollectionConfig(),
            output_dir=str(save_dir / "runs")),
        pretrained=False,
        probe_config=ProbeConfig(probe_type="linear", target_layers=["last_layer"],
                                 aggregation="mean"),
    )],
    dataset_config=BenchmarkEvaluationConfig(evaluation_sets=[EvaluationSet(
        name="synthetic",
        train=DatasetConfig(name="train", kind="synthetic", num_samples=48, num_classes=3),
        test=DatasetConfig(name="test", kind="synthetic", num_samples=12, num_classes=3, seed=9),
        metrics=["accuracy"])]),
    save_dir=str(save_dir),
    training_params=TrainingParams(train_epochs=5, lr=5e-3, batch_size=8),
    eval_modes=["probe", "retrieval", "clustering"],
)

results = run_evaluate(config)
print(results[0]["metrics"])
