"""EfficientNet: structure (torchvision-exact param count), layer discovery,
weight conversion round-trip, frontend integration."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.models.efficientnet import (
    Model as EffNetModel,
    convert_efficientnet_state_dict,
    stage_config,
)
from avex_tpu.utils.tree import count_params


def _spec(variant="b0"):
    return ModelSpec(
        name="efficientnet",
        pretrained=False,
        efficientnet_variant=variant,
        audio_config={
            "sample_rate": 16000,
            "n_fft": 800,
            "hop_length": 160,
            "win_length": 800,
            "window": "hann",
            "n_mels": 128,
            "representation": "mel_spectrogram",
            "normalize": True,
        },
    )


@pytest.mark.slow
def test_b0_parameter_count_matches_torchvision():
    """torchvision efficientnet_b0(num_classes=1000) has 5,288,548 params."""
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=1000)
    n = count_params(model.variables["params"])
    assert n == 5_288_548, n


def test_b1_depths():
    depths = [n for (_t, _c, n, _s, _k) in stage_config("b1")]
    assert depths == [2, 3, 3, 4, 4, 5, 2]


@pytest.mark.slow
def test_forward_and_layer_discovery(rng):
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=7)
    layers = model.get_model_layers()
    assert layers[0] == "model.features.0.0"
    assert layers[-1] == "model.features.8.0"
    # B0: stages 2-7 have expand_ratio 6 -> 2+2+3+3+4+1 = 15 block.3.0 layers.
    assert len(layers) == 17
    assert "model.features.1.0.block.3.0" not in layers  # expand_ratio=1 stage

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    logits = model(wav)
    assert logits.shape == (2, 7)


@pytest.mark.slow
def test_extract_embeddings_4d_and_probe(rng):
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=None)
    model.register_hooks_for_layers(["model.features.8.0"])
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    emb = model.extract_embeddings(wav, aggregation="none")
    assert emb.ndim == 4 and emb.shape[:2] == (2, 1280)  # NCHW like the reference

    from avex_tpu.configs import ProbeConfig
    from avex_tpu.probes import build_probe_from_config

    probe = build_probe_from_config(
        ProbeConfig(probe_type="linear", target_layers=["model.features.8.0"], aggregation="none",
                    target_length=16000),
        num_classes=3,
        base_model=model,
    )
    assert probe(wav).shape == (2, 3)


@pytest.mark.slow
def test_conversion_roundtrip():
    """A torchvision-key-format state dict maps onto every flax leaf."""
    import jax

    model = EffNetModel(num_classes=10, pretrained=False, audio_config=None)
    params = model.variables["params"]
    batch_stats = model.variables["batch_stats"]

    # Build a synthetic torchvision-style state dict from the flax shapes.
    state = {}

    def conv_to_torch(kernel):
        return np.transpose(np.asarray(kernel), (3, 2, 0, 1))

    def add_convbn(torch_prefix, node, stats):
        state[f"{torch_prefix}.0.weight"] = conv_to_torch(node["conv"]["kernel"])
        state[f"{torch_prefix}.1.weight"] = np.asarray(node["bn"]["scale"]) + 0.5
        state[f"{torch_prefix}.1.bias"] = np.asarray(node["bn"]["bias"]) + 0.25
        state[f"{torch_prefix}.1.running_mean"] = np.asarray(stats["bn"]["mean"]) + 0.1
        state[f"{torch_prefix}.1.running_var"] = np.asarray(stats["bn"]["var"]) + 0.2

    add_convbn("features.0", params["features_0"], batch_stats["features_0"])
    for stage_i, (t, _c, n, _s, _k) in enumerate(stage_config("b0"), start=1):
        for j in range(n):
            name = f"features_{stage_i}_{j}"
            node, stats = params[name], batch_stats[name]
            base = f"features.{stage_i}.{j}.block"
            if t != 1:
                add_convbn(f"{base}.0", node["expand"], stats["expand"])
                dw, se, proj = 1, 2, 3
            else:
                dw, se, proj = 0, 1, 2
            add_convbn(f"{base}.{dw}", node["dw"], stats["dw"])
            for tn, fn in (("fc1", "se_fc1"), ("fc2", "se_fc2")):
                state[f"{base}.{se}.{tn}.weight"] = conv_to_torch(node[fn]["kernel"])
                state[f"{base}.{se}.{tn}.bias"] = np.asarray(node[fn]["bias"])
            add_convbn(f"{base}.{proj}", node["project"], stats["project"])
    add_convbn("features.8", params["features_8"], batch_stats["features_8"])
    state["classifier.1.weight"] = np.asarray(params["classifier"]["kernel"]).T + 1.0
    state["classifier.1.bias"] = np.asarray(params["classifier"]["bias"])

    converted = convert_efficientnet_state_dict(state, "b0", num_classes=10)
    # Every param/batch-stat leaf must be covered by the conversion.
    n_conv = count_params(converted["params"]) + count_params(converted["batch_stats"])
    n_orig = count_params(params) + count_params(batch_stats)
    assert n_conv == n_orig

    model.load_state_dict(state)
    np.testing.assert_allclose(
        np.asarray(model.variables["params"]["features_0"]["bn"]["scale"]),
        np.asarray(params["features_0"]["bn"]["scale"]) + 0.5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.variables["batch_stats"]["features_8"]["bn"]["mean"]),
        np.asarray(batch_stats["features_8"]["bn"]["mean"]) + 0.1,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.variables["params"]["classifier"]["kernel"]),
        np.asarray(params["classifier"]["kernel"]) + 1.0,
        atol=1e-6,
    )


@pytest.mark.slow  # full EfficientNet + mel frontend x3 (~40 s)
def test_pooled_aggregation_over_4d_conv_maps(rng):
    """The reference wrapper pools 4D (B,C,H,W) conv maps over the time axis
    then flattens to (B, C*H) (efficientnet.py:296-314); the base contract
    (raise on 4D) applies only to models without the override."""
    import jax.numpy as jnp

    from avex_tpu.models.efficientnet import Model

    model = Model(
        pretrained=False,
        return_features_only=True,
        audio_config={"representation": "mel_spectrogram", "n_mels": 64},
    )
    model.register_hooks_for_layers(["model.features.8.0"])
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    raw = np.asarray(model.extract_embeddings(wav, aggregation="none"))
    assert raw.ndim == 4
    mean = np.asarray(model.extract_embeddings(wav, aggregation="mean"))
    np.testing.assert_allclose(mean, raw.mean(axis=-1).reshape(2, -1), rtol=1e-5)
    mx = np.asarray(model.extract_embeddings(wav, aggregation="max"))
    np.testing.assert_allclose(mx, raw.max(axis=-1).reshape(2, -1), rtol=1e-5)
