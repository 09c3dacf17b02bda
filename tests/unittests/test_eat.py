"""EAT: ViT-base structure, fbank frontend integration, conversion."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.utils.tree import count_params


def _spec():
    return ModelSpec(
        name="eat_hf",
        pretrained=False,
        eat_norm_mean=-5.553,
        eat_norm_std=4.606,
        audio_config={"representation": "raw", "normalize": False},
    )


@pytest.mark.slow
def test_vit_base_parameter_count():
    """ViT-base trunk: 12 blocks x 7,087,872 + patch embed (1ch 16x16)
    196,  + cls + 2 extra LayerNorms."""
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=None,
                                           return_features_only=True)
    n = count_params(model.variables["params"])
    # patch_embed 1*16*16*768+768 = 197,376; blocks 12*7,087,872 = 85,054,464;
    # cls 768; pre_norm+norm 4*768 = 3,072
    assert n == 197_376 + 85_054_464 + 768 + 3_072, n


@pytest.mark.slow
def test_forward_token_grid(rng):
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=None,
                                           return_features_only=True)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    feats = model(wav)
    # (128 mel / 16) x (1024 frames / 16) = 8 x 64 = 512 patches + CLS
    assert feats.shape == (2, 513, 768)

    layers = model.get_model_layers()
    assert layers[0] == "backbone.model.blocks.0.attn.proj"
    assert len(layers) == 12
    model.register_hooks_for_layers(["last_layer"])
    emb = model.extract_embeddings(wav, aggregation="cls_token")
    assert emb.shape == (2, 768)


@pytest.mark.slow
def test_classifier_pooling(rng):
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=5)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    assert model(wav).shape == (2, 5)


@pytest.mark.slow
def test_conversion_fairseq_and_wrapper_naming():
    from avex_tpu.models.eat import Model as EATWrapper, convert_eat_state_dict

    model = EATWrapper(num_classes=None, return_features_only=True, pretrained=False)
    params = model.variables["params"]

    # fairseq-style naming
    state = {
        "modality_encoders.IMAGE.local_encoder.proj.weight": np.transpose(
            np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1)
        ),
        "modality_encoders.IMAGE.local_encoder.proj.bias": np.asarray(
            params["patch_embed"]["bias"]
        ),
        "modality_encoders.IMAGE.context_encoder.norm.weight": np.asarray(
            params["pre_norm"]["scale"]
        ) + 1.0,
        "modality_encoders.IMAGE.context_encoder.norm.bias": np.asarray(
            params["pre_norm"]["bias"]
        ),
        "modality_encoders.IMAGE.extra_tokens": np.asarray(params["cls_token"]),
        "norm.weight": np.asarray(params["norm"]["scale"]),
        "norm.bias": np.asarray(params["norm"]["bias"]),
        "_ema.something": np.zeros(3),  # must be skipped
    }
    for i in range(12):
        node = params[f"blocks_{i}"]
        base = f"blocks.{i}"
        state[f"{base}.norm1.weight"] = np.asarray(node["norm1"]["scale"])
        state[f"{base}.norm1.bias"] = np.asarray(node["norm1"]["bias"])
        state[f"{base}.attn.qkv.weight"] = np.asarray(node["qkv"]["kernel"]).T
        state[f"{base}.attn.qkv.bias"] = np.asarray(node["qkv"]["bias"])
        state[f"{base}.attn.proj.weight"] = np.asarray(node["proj"]["kernel"]).T
        state[f"{base}.attn.proj.bias"] = np.asarray(node["proj"]["bias"])
        state[f"{base}.norm2.weight"] = np.asarray(node["norm2"]["scale"])
        state[f"{base}.norm2.bias"] = np.asarray(node["norm2"]["bias"])
        state[f"{base}.mlp.fc1.weight"] = np.asarray(node["fc1"]["kernel"]).T
        state[f"{base}.mlp.fc1.bias"] = np.asarray(node["fc1"]["bias"])
        state[f"{base}.mlp.fc2.weight"] = np.asarray(node["fc2"]["kernel"]).T
        state[f"{base}.mlp.fc2.bias"] = np.asarray(node["fc2"]["bias"])

    converted = convert_eat_state_dict(state)
    assert count_params(converted["params"]) == count_params(params)
    model.load_state_dict(state)
    np.testing.assert_allclose(
        np.asarray(model.variables["params"]["pre_norm"]["scale"]),
        np.asarray(params["pre_norm"]["scale"]) + 1.0,
        atol=1e-6,
    )

    # wrapper-style naming round-trips too
    wrapped = {f"backbone.model.{k}" if not k.startswith(("modality", "_ema")) else k: v
               for k, v in state.items()}
    converted2 = convert_eat_state_dict(wrapped)
    assert count_params(converted2["params"]) == count_params(params)
