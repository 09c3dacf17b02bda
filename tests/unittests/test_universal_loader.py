"""Universal checkpoint loader: format dispatch, guards, prefix adaptation.

Mirrors the reference's loader/validation suites
(reference tests/unittests/test_safetensors_validation.py and
avex/utils/utils.py:350-570 behaviors) against real files on disk.
"""

import numpy as np
import pytest

from avex_tpu.utils.loaders import (
    MIN_PUBLISHED_SAFETENSORS_BYTES,
    load_safetensors,
    load_torch_checkpoint,
    process_state_dict,
    universal_load,
)


def _write_safetensors(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, str(path))
    return str(path)


def test_safetensors_roundtrip_and_size_guard(tmp_path):
    big = {"w": np.arange(512, dtype=np.float32).reshape(16, 32)}
    path = _write_safetensors(tmp_path / "model.safetensors", big)
    state = load_safetensors(path)
    np.testing.assert_array_equal(state["w"], big["w"])

    # An (almost) empty upload is refused outright, like the reference's
    # assert_safetensors_has_weights guard.
    tiny = _write_safetensors(tmp_path / "empty.safetensors", {"b": np.zeros(1, np.float32)})
    import os

    assert os.path.getsize(tiny) < MIN_PUBLISHED_SAFETENSORS_BYTES
    with pytest.raises(ValueError, match="suspiciously small"):
        load_safetensors(tiny)


def test_safetensors_bf16_fallback(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    weight = torch.linspace(-2, 2, 600, dtype=torch.bfloat16).reshape(20, 30)
    path = tmp_path / "bf16.safetensors"
    save_file({"proj.weight": weight}, str(path))
    state = load_safetensors(str(path))
    # either the ml_dtypes-native bf16 numpy array or the torch-fallback fp32
    # upcast is acceptable — values must match exactly either way
    loaded = np.asarray(state["proj.weight"], dtype=np.float32)
    np.testing.assert_array_equal(loaded, weight.float().numpy())


def test_torch_checkpoint_nested_keys_and_flatten(tmp_path):
    torch = pytest.importorskip("torch")
    inner = {
        "encoder": {"layer0": {"weight": torch.ones(3, 4)}},
        "classifier.weight": torch.zeros(5, 3),
    }
    path = tmp_path / "ckpt.pt"
    torch.save({"model_state_dict": inner, "epoch": 3}, str(path))
    state = load_torch_checkpoint(str(path))
    assert set(state) == {"encoder.layer0.weight", "classifier.weight"}
    assert state["encoder.layer0.weight"].shape == (3, 4)


def test_universal_load_sniffs_extensionless_safetensors(tmp_path):
    tensors = {"w": np.ones((40, 40), np.float32)}
    raw = _write_safetensors(tmp_path / "weights.safetensors", tensors)
    unlabeled = tmp_path / "weights_no_ext"
    unlabeled.write_bytes(open(raw, "rb").read())
    state = universal_load(str(unlabeled))
    np.testing.assert_array_equal(state["w"], tensors["w"])


def test_universal_load_sniffs_extensionless_torch(tmp_path):
    torch = pytest.importorskip("torch")
    path = tmp_path / "blob"
    torch.save({"state_dict": {"w": torch.full((2, 2), 7.0)}}, str(path))
    state = universal_load(str(path))
    assert float(state["w"][0, 0]) == 7.0


def test_process_state_dict_drop_classifier_and_adapt_prefix():
    state = {
        "module.encoder.weight": np.zeros((4, 4)),
        "module.classifier.weight": np.zeros((10, 4)),
        "module.classifier.bias": np.zeros(10),
    }
    backbone_only = process_state_dict(state, drop_classifier=True)
    assert set(backbone_only) == {"encoder.weight"}

    # adapt_prefix adds the target prefix only when the checkpoint lacks it
    adapted = process_state_dict(state, adapt_prefix="backbone.")
    assert "backbone.encoder.weight" in adapted
    already = process_state_dict(
        {"backbone.encoder.weight": np.zeros(2)}, adapt_prefix="backbone."
    )
    assert set(already) == {"backbone.encoder.weight"}


def test_process_state_dict_strips_stacked_prefixes():
    # torch.compile-then-DDP checkpoints stack wrappers: module._orig_mod.
    state = {"module._orig_mod.encoder.weight": np.zeros(3)}
    assert set(process_state_dict(state)) == {"encoder.weight"}
