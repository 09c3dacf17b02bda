"""YAML + CLI config merging (BaseCLIConfig.from_sources semantics)."""

import pytest

from avex_tpu.configs import EvaluateConfig, RunConfig, deep_update


def test_deep_update_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = deep_update(base, {"a": {"b": 10}, "e": 4})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # original untouched


def test_run_config_from_sources_with_patches(tmp_path):
    cfg_yaml = tmp_path / "run.yml"
    cfg_yaml.write_text(
        """
model_spec: {name: beats, pretrained: false}
training_params: {train_epochs: 2, lr: 1.0e-3, batch_size: 8}
dataset_config:
  train_datasets:
    - {name: s, kind: synthetic, num_samples: 8, num_classes: 2}
output_dir: /tmp/x
"""
    )
    config = RunConfig.from_sources(
        str(cfg_yaml),
        ["training_params.lr=0.01", "seed=7", "metrics=[accuracy,roc_auc]"],
    )
    assert config.training_params.lr == 0.01  # CLI wins
    assert config.training_params.train_epochs == 2  # YAML preserved
    assert config.seed == 7
    assert config.metrics == ["accuracy", "roc_auc"]


def test_nested_dataset_config_path(tmp_path):
    ds_yaml = tmp_path / "datasets.yml"
    ds_yaml.write_text(
        """
train_datasets:
  - {name: s, kind: synthetic, num_samples: 8, num_classes: 2}
"""
    )
    cfg_yaml = tmp_path / "run.yml"
    cfg_yaml.write_text(
        f"""
model_spec: {{name: beats, pretrained: false}}
training_params: {{train_epochs: 1, lr: 1.0e-3, batch_size: 4}}
dataset_config: {ds_yaml}
output_dir: /tmp/x
"""
    )
    config = RunConfig.from_sources(str(cfg_yaml))
    assert config.dataset_config.train_datasets[0].num_samples == 8


def test_forbidden_extra_field_fails(tmp_path):
    cfg_yaml = tmp_path / "run.yml"
    cfg_yaml.write_text(
        """
model_spec: {name: beats, pretrained: false}
training_params: {train_epochs: 1, lr: 1.0e-3, batch_size: 4}
dataset_config: {}
output_dir: /tmp/x
not_a_real_field: true
"""
    )
    with pytest.raises(Exception):
        RunConfig.from_sources(str(cfg_yaml))


def test_multilabel_requires_bce():
    import pytest as _pytest

    from avex_tpu.configs import (
        DatasetCollectionConfig, ModelSpec, TrainingParams,
    )

    with _pytest.raises(ValueError, match="multilabel"):
        RunConfig(
            model_spec=ModelSpec(name="beats"),
            training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=4),
            dataset_config=DatasetCollectionConfig(),
            output_dir="/tmp/x",
            multilabel=True,
            loss_function="cross_entropy",
        )
