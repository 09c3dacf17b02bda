"""AVES (HuBERT-base): structure, framing, embedding taps, conversion."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.utils.tree import count_params


def _spec():
    return ModelSpec(name="aves_bio", pretrained=False, audio_config=None)


@pytest.mark.slow
def test_parameter_count_matches_hubert_base():
    """Analytic HuBERT-base count: conv extractor 4,200,448 (+1,024 GroupNorm
    affine) + feature projection 394,  + pos conv + 12 encoder layers of
    7,087,872 — totals 94,370,816 for the inference model (no mask_emb)."""
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=None,
                                           return_features_only=True)
    n = count_params(model.variables["params"])
    assert n == 94_370_816, n


@pytest.mark.slow
def test_forward_framing_and_embeddings(rng):
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=None,
                                           return_features_only=True)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    feats = model(wav)
    # conv stack: hop 320 -> 49 frames for 1s @ 16kHz (valid framing)
    assert feats.shape == (2, 49, 768)

    layers = model.get_model_layers()
    assert layers[0] == "model.encoder.transformer.layers.0.feed_forward.output_dense"
    assert len(layers) == 12
    model.register_hooks_for_layers(["last_layer"])
    emb = model.extract_embeddings(wav, aggregation="mean")
    assert emb.shape == (2, 768)


@pytest.mark.slow
def test_classifier_head(rng):
    model = avex_tpu.build_model_from_spec(_spec(), num_classes=6)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    assert model(wav).shape == (2, 6)


@pytest.mark.slow
def test_conversion_covers_all_params():
    """A synthetic torchaudio-style state dict maps onto every flax leaf."""
    from avex_tpu.models.aves import CONV_LAYERS, Model as AVESWrapper, convert_aves_state_dict

    model = AVESWrapper(num_classes=None, return_features_only=True, pretrained=False)
    params = model.variables["params"]

    state = {}
    for i, (ch, k, s) in enumerate(CONV_LAYERS):
        kern = np.asarray(params["feature_extractor"][f"conv_{i}"]["kernel"])
        state[f"feature_extractor.conv_layers.{i}.conv.weight"] = np.transpose(kern, (2, 1, 0))
    gn = params["feature_extractor"]["group_norm"]
    state["feature_extractor.conv_layers.0.layer_norm.weight"] = np.asarray(gn["scale"])
    state["feature_extractor.conv_layers.0.layer_norm.bias"] = np.asarray(gn["bias"])
    state["encoder.feature_projection.layer_norm.weight"] = np.asarray(params["fp_layer_norm"]["scale"])
    state["encoder.feature_projection.layer_norm.bias"] = np.asarray(params["fp_layer_norm"]["bias"])
    state["encoder.feature_projection.projection.weight"] = np.asarray(params["fp_projection"]["kernel"]).T
    state["encoder.feature_projection.projection.bias"] = np.asarray(params["fp_projection"]["bias"])
    # weight-normed pos conv: write g/v pair whose fold reproduces the kernel
    pos = np.transpose(np.asarray(params["pos_conv"]["kernel"]), (2, 1, 0))
    norm = np.sqrt(np.sum(pos**2, axis=(0, 1), keepdims=True))
    state["encoder.transformer.pos_conv_embed.conv.weight_g"] = norm
    state["encoder.transformer.pos_conv_embed.conv.weight_v"] = pos
    state["encoder.transformer.pos_conv_embed.conv.bias"] = np.asarray(params["pos_conv"]["bias"])
    state["encoder.transformer.layer_norm.weight"] = np.asarray(params["encoder_layer_norm"]["scale"])
    state["encoder.transformer.layer_norm.bias"] = np.asarray(params["encoder_layer_norm"]["bias"])
    for i in range(12):
        node = params[f"layers_{i}"]
        base = f"encoder.transformer.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{base}.attention.{name}.weight"] = np.asarray(node[name]["kernel"]).T
            state[f"{base}.attention.{name}.bias"] = np.asarray(node[name]["bias"])
        state[f"{base}.layer_norm.weight"] = np.asarray(node["layer_norm"]["scale"])
        state[f"{base}.layer_norm.bias"] = np.asarray(node["layer_norm"]["bias"])
        state[f"{base}.feed_forward.intermediate_dense.weight"] = np.asarray(node["intermediate_dense"]["kernel"]).T
        state[f"{base}.feed_forward.intermediate_dense.bias"] = np.asarray(node["intermediate_dense"]["bias"])
        state[f"{base}.feed_forward.output_dense.weight"] = np.asarray(node["output_dense"]["kernel"]).T
        state[f"{base}.feed_forward.output_dense.bias"] = np.asarray(node["output_dense"]["bias"])
        state[f"{base}.final_layer_norm.weight"] = np.asarray(node["final_layer_norm"]["scale"])
        state[f"{base}.final_layer_norm.bias"] = np.asarray(node["final_layer_norm"]["bias"])

    converted = convert_aves_state_dict(state)
    assert count_params(converted["params"]) == count_params(params)
    # Pos-conv weight-norm folding must reproduce the original kernel.
    np.testing.assert_allclose(
        np.asarray(converted["params"]["pos_conv"]["kernel"]),
        np.asarray(params["pos_conv"]["kernel"]),
        atol=1e-5,
    )
