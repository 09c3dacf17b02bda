"""ResNet: torchvision-exact parameter counts, forward, conversion."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.utils.tree import count_params


def _spec(variant):
    return ModelSpec(
        name=variant,
        pretrained=False,
        audio_config={
            "n_fft": 800,
            "hop_length": 160,
            "win_length": 800,
            "n_mels": 128,
            "representation": "mel_spectrogram",
            "normalize": True,
        },
    )


@pytest.mark.parametrize(
    "variant,expected",
    [
        ("resnet18", 11_689_512),
        pytest.param("resnet50", 25_557_032, marks=pytest.mark.slow),
    ],
)
def test_parameter_counts_match_torchvision(variant, expected):
    model = avex_tpu.build_model_from_spec(_spec(variant), num_classes=1000)
    assert count_params(model.variables["params"]) == expected


@pytest.mark.slow
def test_forward_and_embeddings(rng):
    model = avex_tpu.build_model_from_spec(_spec("resnet18"), num_classes=5)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    logits = model(wav)
    assert logits.shape == (2, 5)

    layers = model.get_model_layers()
    assert layers == [f"backbone.layer{i}" for i in range(1, 5)]
    model.register_hooks_for_layers(["backbone.layer4"])
    emb = model.extract_embeddings(wav, aggregation="none")
    assert emb.ndim == 4 and emb.shape[1] == 512  # NCHW


@pytest.mark.slow
def test_conversion_from_torchvision_keys(rng):
    """Synthetic torchvision-style state dict loads into every leaf."""
    from avex_tpu.models.resnet import Model as ResNetModelWrapper, convert_resnet_state_dict

    model = ResNetModelWrapper(variant="resnet18", num_classes=7, pretrained=False)
    params = model.variables["params"]
    batch_stats = model.variables["batch_stats"]

    state = {}

    def add_convbn(conv_key, bn_key, node, stats):
        state[conv_key] = np.transpose(np.asarray(node["conv"]["kernel"]), (3, 2, 0, 1)) + 0.01
        state[f"{bn_key}.weight"] = np.asarray(node["bn"]["scale"])
        state[f"{bn_key}.bias"] = np.asarray(node["bn"]["bias"])
        state[f"{bn_key}.running_mean"] = np.asarray(stats["bn"]["mean"])
        state[f"{bn_key}.running_var"] = np.asarray(stats["bn"]["var"])

    state["conv1.weight"] = np.transpose(np.asarray(params["conv1"]["kernel"]), (3, 2, 0, 1))
    state["bn1.weight"] = np.asarray(params["bn1"]["scale"])
    state["bn1.bias"] = np.asarray(params["bn1"]["bias"])
    state["bn1.running_mean"] = np.asarray(batch_stats["bn1"]["mean"])
    state["bn1.running_var"] = np.asarray(batch_stats["bn1"]["var"])

    from avex_tpu.models.resnet import RESNET_VARIANTS

    _bt, depths = RESNET_VARIANTS["resnet18"]
    for stage_i, depth in enumerate(depths, start=1):
        for j in range(depth):
            flax_name = f"layer{stage_i}_{j}"
            node, stats = params[flax_name], batch_stats[flax_name]
            for c in (1, 2):
                add_convbn(
                    f"layer{stage_i}.{j}.conv{c}.weight",
                    f"layer{stage_i}.{j}.bn{c}",
                    node[f"cb{c}"],
                    stats[f"cb{c}"],
                )
            if "down" in node:
                add_convbn(
                    f"layer{stage_i}.{j}.downsample.0.weight",
                    f"layer{stage_i}.{j}.downsample.1",
                    node["down"],
                    stats["down"],
                )
    state["classifier.weight"] = np.asarray(params["classifier"]["kernel"]).T
    state["classifier.bias"] = np.asarray(params["classifier"]["bias"])

    converted = convert_resnet_state_dict(state, "resnet18", num_classes=7)
    from avex_tpu.utils.tree import count_params

    assert count_params(converted["params"]) + count_params(converted["batch_stats"]) == (
        count_params(params) + count_params(batch_stats)
    )
    model.load_state_dict(state)
    np.testing.assert_allclose(
        np.asarray(model.variables["params"]["conv1"]["kernel"]),
        np.asarray(params["conv1"]["kernel"]),
        atol=1e-6,
    )
