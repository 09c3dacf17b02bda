"""CLI patch parsing + checkpoint-introspection helpers (pure-python edges).

These utilities sit under every `-p key=value` invocation (reference
configs.py:733-764 YAML+CLI merge) and under load_model's num_classes
auto-extraction (reference load.py:314-420), but previously were only
exercised indirectly through from_sources round-trips.
"""

import numpy as np
import pytest

from avex_tpu.configs import _parse_cli_value, _patch_to_nested
from avex_tpu.utils.loaders import extract_num_classes, process_state_dict


# ---------------------------------------------------------------------------
# `-p key=value` parsing: YAML semantics like the reference's click CLI
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("3", 3),
        ("2.5e-4", 2.5e-4),
        ("true", True),
        ("false", False),
        ("null", None),
        ("[probe,retrieval]", ["probe", "retrieval"]),
        ("[1, 2, 3]", [1, 2, 3]),
        ("plain_string", "plain_string"),
        ("gs://bucket/path.yml", "gs://bucket/path.yml"),
    ],
)
def test_parse_cli_value_yaml_semantics(raw, expected):
    assert _parse_cli_value(raw) == expected


def test_patch_to_nested_dotted_keys():
    assert _patch_to_nested("training_params.lr", 1e-4) == {
        "training_params": {"lr": 1e-4}
    }
    assert _patch_to_nested("a.b.c", 1) == {"a": {"b": {"c": 1}}}
    assert _patch_to_nested("top", "v") == {"top": "v"}


def test_patches_override_yaml_deeply(tmp_path):
    """CLI patches deep-merge over the YAML (CLI wins), leaving untouched
    siblings intact — the reference's deep_update contract."""
    from avex_tpu.configs import RunConfig

    (tmp_path / "cfg.yml").write_text(
        """
model_spec: {name: beats, pretrained: false}
training_params: {train_epochs: 3, lr: 0.001, batch_size: 16}
dataset_config:
  train_datasets:
    - {name: s, kind: synthetic, num_samples: 8, num_classes: 2}
output_dir: /tmp/x
"""
    )
    config = RunConfig.from_sources(
        str(tmp_path / "cfg.yml"),
        ["training_params.lr=5e-4", "metrics=[accuracy,mAP]"],
    )
    assert config.training_params.lr == 5e-4
    assert config.training_params.batch_size == 16  # sibling untouched
    assert config.metrics == ["accuracy", "mAP"]


# ---------------------------------------------------------------------------
# num_classes auto-extraction from checkpoint classifier weights
# ---------------------------------------------------------------------------


def test_extract_num_classes_torch_linear_layout():
    # torch Linear stores (out, in)
    state = {"classifier.weight": np.zeros((11, 768)), "classifier.bias": np.zeros(11)}
    assert extract_num_classes(state) == 11


def test_extract_num_classes_flax_kernel_layout():
    # flax Dense stores (in, out)
    state = {"classifier.kernel": np.zeros((768, 7))}
    assert extract_num_classes(state) == 7


def test_extract_num_classes_prefixed_and_predictor():
    state = {"backbone.predictor.weight": np.zeros((527, 768))}
    assert extract_num_classes(state) == 527
    assert extract_num_classes({"encoder.layer.weight": np.zeros((3, 3, 4, 8))}) is None


def test_process_state_dict_strips_wrapper_prefixes():
    """module./model. prefixes are normalized (reference _process_state_dict,
    utils/utils.py:509-570)."""
    state = {
        "module.backbone.fc1.weight": np.zeros((4, 4)),
        "module.classifier.weight": np.zeros((5, 4)),
    }
    normalized = process_state_dict(state)
    assert "backbone.fc1.weight" in normalized
    assert extract_num_classes(state) == 5  # extraction normalizes internally
