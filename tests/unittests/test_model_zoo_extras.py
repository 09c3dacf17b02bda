"""ATST, BirdMAE, Perch wrappers: structure, forwards, conversion coverage."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.utils.tree import count_params


@pytest.mark.slow
def test_atst_forward_and_timestamp_embedding(rng):
    model = avex_tpu.build_model_from_spec(
        ModelSpec(name="atst", pretrained=False), num_classes=None
    )
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    timestamp = model(wav)
    # 1s @ 16kHz -> 101 frames (center stft) -> 25 patch tokens; 768*12 feats.
    assert timestamp.shape == (2, 25, 768 * 12)
    layers = model.get_model_layers()
    assert layers == [f"atst.blocks.{i}" for i in range(12)]
    model.register_hooks_for_layers(["last_layer"])
    emb = model.extract_embeddings(wav, aggregation="mean")
    assert emb.shape == (2, 768)


@pytest.mark.slow
def test_atst_conversion(rng):
    from avex_tpu.models.atst import Model as ATSTWrapper, convert_atst_state_dict

    model = ATSTWrapper(pretrained=False)
    params = model.variables["params"]
    state = {
        "patch_embed.proj.weight": np.transpose(
            np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1)
        ),
        "patch_embed.proj.bias": np.asarray(params["patch_embed"]["bias"]),
        # reference pos_embed carries a class-token slot at index 0 that the
        # converter strips (the "cut" path skips it, atst_frame.py:914)
        "pos_embed": np.concatenate(
            [np.zeros((1, 1, 768), np.float32), np.asarray(params["pos_embed"])], axis=1
        ),
        "norm.weight": np.asarray(params["norm"]["scale"]),
        "norm.bias": np.asarray(params["norm"]["bias"]),
    }
    for i in range(12):
        node = params[f"blocks_{i}"]
        base = f"blocks.{i}"
        state[f"{base}.norm1.weight"] = np.asarray(node["norm1"]["scale"])
        state[f"{base}.norm1.bias"] = np.asarray(node["norm1"]["bias"])
        state[f"{base}.attn.qkv.weight"] = np.asarray(node["qkv"]["kernel"]).T
        state[f"{base}.attn.proj.weight"] = np.asarray(node["proj"]["kernel"]).T
        state[f"{base}.attn.proj.bias"] = np.asarray(node["proj"]["bias"])
        state[f"{base}.norm2.weight"] = np.asarray(node["norm2"]["scale"])
        state[f"{base}.norm2.bias"] = np.asarray(node["norm2"]["bias"])
        state[f"{base}.mlp.fc1.weight"] = np.asarray(node["fc1"]["kernel"]).T
        state[f"{base}.mlp.fc1.bias"] = np.asarray(node["fc1"]["bias"])
        state[f"{base}.mlp.fc2.weight"] = np.asarray(node["fc2"]["kernel"]).T
        state[f"{base}.mlp.fc2.bias"] = np.asarray(node["fc2"]["bias"])
    converted = convert_atst_state_dict(state)
    # qkv has no bias (qkv_bias=False): counts match exactly.
    assert count_params(converted["params"]) == count_params(params)


@pytest.mark.slow
def test_birdmae_base_forward(rng):
    model = avex_tpu.build_model_from_spec(
        ModelSpec(name="birdmae", pretrained=False, model_id="DBD-research-group/Bird-MAE-base"),
        num_classes=None,
        return_features_only=True,
    )
    wav = rng.standard_normal((1, 32000)).astype(np.float32) * 0.1
    feats = model(wav)
    # (1024 frames/16) x (128 mels/16) = 64x8 = 512 patches + CLS, 768-d base
    assert feats.shape == (1, 513, 768)


@pytest.mark.slow
def test_perch_interface(rng):
    model = avex_tpu.build_model_from_spec(ModelSpec(name="perch", pretrained=False))
    wav = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1  # 1s -> padded to 5s
    out = model.infer(wav)
    assert out["logits"].shape == (2, 10932)
    assert out["embedding"].shape == (2, 1280)
    emb = model.extract_embeddings(wav)
    assert emb.shape == (2, 1280)
    # >5s input center-crops
    long_wav = rng.standard_normal((1, 200000)).astype(np.float32) * 0.1
    assert model.infer(long_wav)["logits"].shape == (1, 10932)
    # extract_fn is pure and jit-composable (online probes/serving/export
    # compose it into larger programs) and matches extract_embeddings.
    import jax

    fn = jax.jit(model.extract_fn(("embedding",), "none"))
    pure = np.asarray(fn(model.variables, wav, None))
    np.testing.assert_allclose(pure, np.asarray(emb), rtol=1e-5, atol=1e-6)


def test_surfperch_class_resolution():
    from avex_tpu.models.perch import SurfPerchModel

    cls = avex_tpu.get_model_class("surfperch")
    assert cls is SurfPerchModel


def test_birdnet_requires_optional_dependency():
    with pytest.raises(ImportError, match="birdnetlib"):
        avex_tpu.build_model_from_spec(ModelSpec(name="birdnet", pretrained=False))


@pytest.mark.slow
def test_perch_keras_conversion_roundtrip(rng):
    """A Keras-applications-style EfficientNet-B1 variable dump (the TF-Hub
    Perch backbone naming) maps onto every flax leaf, layouts included."""
    from avex_tpu.models.efficientnet import stage_config
    from avex_tpu.models.perch import Model as PerchModel

    model = PerchModel(pretrained=False)
    params = model.variables["params"]
    stats = model.variables["batch_stats"]

    state = {}

    def add_conv(keras_name, node, depthwise=False, prefix="tfhub_model/"):
        kernel = np.asarray(node["conv"]["kernel"] if "conv" in node else node["kernel"])
        if depthwise:  # flax (H, W, 1, C) -> keras (H, W, C, 1)
            state[f"{prefix}{keras_name}/depthwise_kernel:0"] = kernel.transpose(0, 1, 3, 2)
        else:  # flax HWIO == keras HWIO
            state[f"{prefix}{keras_name}/kernel:0"] = kernel
        if "bias" in node:
            state[f"{prefix}{keras_name}/bias:0"] = np.asarray(node["bias"])

    def add_bn(keras_name, node, stat, prefix="tfhub_model/"):
        state[f"{prefix}{keras_name}/gamma:0"] = np.asarray(node["bn"]["scale"])
        state[f"{prefix}{keras_name}/beta:0"] = np.asarray(node["bn"]["bias"])
        state[f"{prefix}{keras_name}/moving_mean:0"] = np.asarray(stat["bn"]["mean"])
        state[f"{prefix}{keras_name}/moving_variance:0"] = np.asarray(stat["bn"]["var"])

    add_conv("stem_conv", params["features_0"])
    add_bn("stem_bn", params["features_0"], stats["features_0"])
    letters = "abcdefghijklmnop"
    for stage_i, (t, _c, n, _s, _k) in enumerate(stage_config("b1"), start=1):
        for j in range(n):
            node, stat = params[f"features_{stage_i}_{j}"], stats[f"features_{stage_i}_{j}"]
            kb = f"block{stage_i}{letters[j]}"
            if t != 1:
                add_conv(f"{kb}_expand_conv", node["expand"])
                add_bn(f"{kb}_expand_bn", node["expand"], stat["expand"])
            add_conv(f"{kb}_dwconv", node["dw"], depthwise=True)
            add_bn(f"{kb}_bn", node["dw"], stat["dw"])
            add_conv(f"{kb}_se_reduce", node["se_fc1"])
            add_conv(f"{kb}_se_expand", node["se_fc2"])
            add_conv(f"{kb}_project_conv", node["project"])
            add_bn(f"{kb}_project_bn", node["project"], stat["project"])
    add_conv("top_conv", params["features_8"])
    add_bn("top_bn", params["features_8"], stats["features_8"])
    state["tfhub_model/predictions/kernel:0"] = np.asarray(params["classifier"]["kernel"])
    state["tfhub_model/predictions/bias:0"] = np.asarray(params["classifier"]["bias"])

    # Perturb every dumped value: after loading, every flax leaf must move by
    # exactly the same delta — proving full coverage AND correct layouts (a
    # wrong transpose would not reproduce original + delta elementwise).
    import jax

    original_leaves = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(params)]
    original_stats = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(stats)]
    state = {k: np.asarray(v) + 0.125 for k, v in state.items()}
    model.load_state_dict(state)
    for orig, new_leaf in zip(
        original_leaves, jax.tree_util.tree_leaves(model.variables["params"])
    ):
        np.testing.assert_allclose(np.asarray(new_leaf), orig + 0.125, atol=1e-6)
    for orig, new_leaf in zip(
        original_stats, jax.tree_util.tree_leaves(model.variables["batch_stats"])
    ):
        np.testing.assert_allclose(np.asarray(new_leaf), orig + 0.125, atol=1e-6)
