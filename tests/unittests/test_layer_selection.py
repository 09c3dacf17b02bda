"""Layer-selector resolution semantics on ModelBase.

Dedicated counterpart of the reference's
tests/unittests/test_base_model_all_layers.py: int / negative-int / ``all`` /
``last_layer`` selectors, order-preserving dedup, and the error contract
(reference avex/models/base_model.py:101-200).
"""

import pytest

from avex_tpu.models.base import ModelBase


class _FakeModel(ModelBase):
    LAYERS = [
        "patch_embed",
        "encoder.layers.0.fc2",
        "encoder.layers.1.fc2",
        "encoder.layers.2.fc2",
        "classifier",
    ]

    def _discover_embedding_layers(self):
        self._layer_names = list(self.LAYERS)


@pytest.fixture
def model():
    return _FakeModel(device="cpu")


def test_int_and_negative_int_selectors(model):
    assert model.register_hooks_for_layers([0, 2]) == [
        "patch_embed",
        "encoder.layers.1.fc2",
    ]
    assert model.register_hooks_for_layers([-1]) == ["classifier"]


def test_all_expands_in_forward_order_with_dedup(model):
    resolved = model.register_hooks_for_layers(["encoder.layers.1.fc2", "all"])
    # explicit selection first, then the full list, order-preserving dedup
    assert resolved[0] == "encoder.layers.1.fc2"
    assert set(resolved) == set(_FakeModel.LAYERS)
    assert len(resolved) == len(_FakeModel.LAYERS)


def test_last_layer_skips_classification_heads(model):
    assert model.register_hooks_for_layers(["last_layer"]) == ["encoder.layers.2.fc2"]


def test_mixed_selectors_dedup(model):
    resolved = model.register_hooks_for_layers([3, "encoder.layers.2.fc2", "last_layer"])
    assert resolved == ["encoder.layers.2.fc2"]


def test_out_of_range_index_error(model):
    with pytest.raises(ValueError, match="out of range"):
        model.register_hooks_for_layers([17])


def test_unknown_layer_name_error_lists_available(model):
    with pytest.raises(ValueError, match="not found in model"):
        model.register_hooks_for_layers(["encoder.layers.9.fc2"])


def test_bool_selector_rejected(model):
    # True would silently index like 1 — the reference treats that as a bug.
    with pytest.raises(TypeError, match="bool"):
        model.register_hooks_for_layers([True])


def test_layer_map_and_deregister(model):
    layer_map = model.get_model_layer_map()
    assert layer_map[0] == "patch_embed"
    assert layer_map[len(_FakeModel.LAYERS) - 1] == "classifier"
    model.register_hooks_for_layers(["all"])
    model.deregister_all_hooks()
    assert model._hook_layers == []


def test_last_layer_when_everything_is_a_head():
    class _HeadsOnly(ModelBase):
        def _discover_embedding_layers(self):
            self._layer_names = ["classifier"]

    model = _HeadsOnly(device="cpu")
    # falls back to the final layer rather than erroring (reference parity)
    assert model.register_hooks_for_layers(["last_layer"]) == ["classifier"]
