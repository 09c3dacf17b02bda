"""Public API surface: registry, factory, load_model, embedding extraction.

Mirrors the reference's test_api_{registry,factory,load}.py coverage, plus an
end-to-end slice: reference torch weights exported to safetensors →
``load_model`` → output parity with the torch oracle.
"""

import json

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec


def test_public_api_exports():
    for name in [
        "load_model",
        "register_model",
        "get_model_spec",
        "list_models",
        "describe_model",
        "list_model_layers",
        "register_model_class",
        "get_model_class",
        "list_model_classes",
        "build_model",
        "build_model_from_spec",
        "get_checkpoint_path",
        "load_label_mapping",
    ]:
        assert hasattr(avex_tpu, name), name


def test_official_models_registered():
    info = avex_tpu.list_models(verbose=False)
    assert "esp_aves2_sl_beats_all" in info
    assert info["esp_aves2_sl_beats_all"]["architecture"] == "beats"
    assert info["esp_aves2_sl_beats_all"]["checkpoint"].startswith("hf://EarthSpeciesProject/")
    assert len(info) >= 10


def test_get_model_spec_returns_copy():
    spec = avex_tpu.get_model_spec("esp_aves2_sl_beats_all")
    spec.pretrained = True
    assert avex_tpu.get_model_spec("esp_aves2_sl_beats_all").pretrained is False


def test_get_model_spec_unknown_raises():
    with pytest.raises(KeyError, match="not found"):
        avex_tpu.get_model_spec("nonexistent_model")


def test_describe_model():
    desc = avex_tpu.describe_model("esp_aves2_sl_beats_all")
    assert desc["model_spec"]["name"] == "beats"
    assert desc["model_spec"]["init_config"]["encoder_layers"] == 12
    assert desc["checkpoint_path"].endswith(".safetensors")


def test_register_model_roundtrip():
    spec = ModelSpec(name="beats", pretrained=False, init_config={"encoder_layers": 2})
    avex_tpu.register_model("tiny_beats_test", spec, overwrite=True)
    loaded = avex_tpu.get_model_spec("tiny_beats_test")
    assert loaded.init_config["encoder_layers"] == 2
    with pytest.raises(ValueError, match="already registered"):
        avex_tpu.register_model("tiny_beats_test", spec)


def _tiny_beats_spec(num_mel_bins=128):
    return ModelSpec(
        name="beats",
        pretrained=False,
        init_config={
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4,
            "embed_dim": 32,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "encoder_layerdrop": 0.0,
        },
        audio_config={"representation": "raw", "normalize": False},
    )


def test_build_model_from_spec_and_layers():
    model = avex_tpu.build_model_from_spec(_tiny_beats_spec(), num_classes=3)
    layers = model.get_model_layers()
    assert layers[0] == "backbone.post_extract_proj"
    assert layers[-1] == "backbone.encoder.layers.1.fc2"
    layer_map = model.get_model_layer_map()
    assert layer_map[0] == "backbone.post_extract_proj"

    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    logits = model(wav)
    assert logits.shape == (2, 3)


def test_layer_selector_resolution():
    model = avex_tpu.build_model_from_spec(_tiny_beats_spec(), num_classes=None)
    assert model.register_hooks_for_layers(["last_layer"]) == ["backbone.encoder.layers.1.fc2"]
    assert model.register_hooks_for_layers([0]) == ["backbone.post_extract_proj"]
    assert model.register_hooks_for_layers([-1]) == ["backbone.encoder.layers.1.fc2"]
    assert model.register_hooks_for_layers(["all"]) == model.get_model_layers()
    with pytest.raises(TypeError):
        model.register_hooks_for_layers([True])
    with pytest.raises(ValueError):
        model.register_hooks_for_layers(["not_a_layer"])


def test_extract_embeddings_aggregations():
    model = avex_tpu.build_model_from_spec(_tiny_beats_spec())
    wav = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1

    model.register_hooks_for_layers(["last_layer"])
    seq = model.extract_embeddings(wav, aggregation="none")
    assert seq.ndim == 3 and seq.shape[0] == 2 and seq.shape[2] == 64

    pooled = model.extract_embeddings(wav, aggregation="mean")
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(seq).mean(axis=1), atol=1e-5, rtol=1e-5
    )
    mx = model.extract_embeddings(wav, aggregation="max")
    np.testing.assert_allclose(np.asarray(mx), np.asarray(seq).max(axis=1), atol=1e-5)
    cls = model.extract_embeddings(wav, aggregation="cls_token")
    np.testing.assert_allclose(np.asarray(cls), np.asarray(seq)[:, 0, :], atol=1e-6)

    model.register_hooks_for_layers(["all"])
    multi = model.extract_embeddings(wav, aggregation="mean")
    assert multi.shape == (2, 64 * 3)  # post_extract_proj + 2 fc2 layers
    as_list = model.extract_embeddings(wav, aggregation="none")
    assert isinstance(as_list, list) and len(as_list) == 3


def test_extract_embeddings_without_registration_raises():
    model = avex_tpu.build_model_from_spec(_tiny_beats_spec())
    with pytest.raises(ValueError, match="No hooks registered"):
        model.extract_embeddings(np.zeros((1, 16000), dtype=np.float32))


@pytest.mark.slow
def test_load_model_end_to_end_with_safetensors(tmp_path, rng):
    """Reference torch weights → safetensors → load_model → output parity."""
    import torch
    from safetensors.torch import save_file

    from tests.utils.reference_oracle import load_reference_beats

    ref = load_reference_beats()
    cfg_dict = dict(
        embed_dim=32,
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_layerdrop=0.0,
    )
    torch.manual_seed(1)
    ref_model = ref.beats.BEATs(ref.beats.BEATsConfig(**cfg_dict)).eval()

    # Export like the official pipeline: wrapper-level keys + classifier.
    num_classes = 4
    torch.manual_seed(2)
    classifier = torch.nn.Linear(64, num_classes)
    # clone() breaks the shared-tensor aliasing of the rel-pos bias table
    # (layers alias layer 0's table) so safetensors will serialize it.
    state = {f"backbone.{k}": v.clone().contiguous() for k, v in ref_model.state_dict().items()}
    state["classifier.weight"] = classifier.weight.detach().contiguous()
    state["classifier.bias"] = classifier.bias.detach().contiguous()
    ckpt = tmp_path / "model.safetensors"
    save_file(state, str(ckpt))

    label_map = {str(i): f"species_{i}" for i in range(num_classes)}
    map_path = tmp_path / "label_map.json"
    map_path.write_text(json.dumps(label_map))

    spec_yaml = tmp_path / "spec.yml"
    spec_yaml.write_text(
        "\n".join(
            [
                f"checkpoint_path: {ckpt}",
                f"class_mapping_path: {map_path}",
                "model_spec:",
                "  name: beats",
                "  pretrained: false",
                "  init_config:",
            ]
            + [f"    {k}: {v}" for k, v in cfg_dict.items()]
        )
    )

    model = avex_tpu.load_model(str(spec_yaml))
    assert model.num_classes == num_classes  # from classifier weights
    assert model.label_mapping == label_map

    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        feats, _ = ref_model(torch.from_numpy(wav), disable_layerdrop=True)
        expected = classifier(feats.mean(dim=1)).numpy()
    ours = np.asarray(model(wav))
    np.testing.assert_allclose(ours, expected, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_load_model_features_only(tmp_path, rng):
    model = avex_tpu.build_model_from_spec(_tiny_beats_spec(), return_features_only=True)
    wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    feats = model(wav)
    assert feats.ndim == 3 and feats.shape[-1] == 64


def test_list_model_layers():
    avex_tpu.register_model(
        "tiny_beats_layers_test", _tiny_beats_spec(), overwrite=True
    )
    layers = avex_tpu.list_model_layers("tiny_beats_layers_test")
    assert layers == [
        "backbone.post_extract_proj",
        "backbone.encoder.layers.0.fc2",
        "backbone.encoder.layers.1.fc2",
    ]
