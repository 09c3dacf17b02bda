"""Elementwise oracle: Keras EfficientNet-B1 → Flax conversion (Perch path).

The Perch / SurfPerch checkpoints ship as TF SavedModels whose backbone
follows Keras-applications EfficientNet naming (reference avex/models/perch.py
wraps them via TF-Hub). This suite validates the full offline conversion
chain against a *real* TensorFlow model — the same technique as the
reference's torch-oracle tests (e.g. tests/unittests/test_batched_fbank.py):

    keras model → variable dump ({path: numpy}, what scripts/convert_perch_tf.py
    emits) → convert_keras_efficientnet_state → convert_efficientnet_state_dict
    → Flax EfficientNetModel(bn_eps=1e-3, tf_same_padding=True)

and asserts the pooled 1280-d embedding matches TF elementwise. The input is
deliberately even-sized so every stride-2 conv exercises TF 'SAME' asymmetric
padding — the case torchvision-style symmetric padding gets wrong.

Requires TensorFlow; skipped where it is not installed (the shipped package
never imports TF).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from avex_tpu.models.efficientnet import EfficientNetModel  # noqa: E402
from avex_tpu.models.perch import (  # noqa: E402
    Model as PerchModel,
    convert_keras_efficientnet_state,
    perch_frontend,
)
from avex_tpu.utils.tree import merge_converted_params  # noqa: E402

pytestmark = pytest.mark.slow


def _build_keras_b1(input_shape):
    keras = tf.keras
    model = keras.applications.EfficientNetB1(
        weights=None, include_top=False, pooling="avg", input_shape=input_shape
    )
    # Randomize every variable (kernels AND BatchNorm moving statistics — the
    # init values mean=0/var=1 would mask mean/var key swaps and the eps
    # mismatch this test exists to catch).
    rng = np.random.default_rng(7)
    for v in model.variables:
        shape = tuple(v.shape)
        name = getattr(v, "path", None) or v.name
        if "moving_variance" in name:
            v.assign((rng.uniform(0.25, 2.0, shape)).astype(np.float32))
        else:
            v.assign((rng.standard_normal(shape) * 0.05).astype(np.float32))
    return model


def _dump_variables(model):
    """{path:0 : numpy} — the exact artifact scripts/convert_perch_tf.py writes
    (TF resource-variable names carry the ':0' suffix; keras-3 paths do not,
    so both spellings are exercised)."""
    dump = {}
    for i, v in enumerate(model.variables):
        name = getattr(v, "path", None) or v.name
        if not name.endswith(":0") and i % 2 == 0:
            name = name + ":0"
        dump[name] = v.numpy()
    return dump


def _normalized_input(model, x_nhwc):
    """Output of the model's input Normalization layer (the converted Flax
    backbone starts at stem_conv; Keras prepends Rescaling+Normalization)."""
    keras = tf.keras
    norm_layers = [l for l in model.layers if isinstance(l, keras.layers.Normalization)]
    assert norm_layers, "keras EfficientNet should embed a Normalization layer"
    sub = keras.Model(model.input, norm_layers[0].output)
    return sub(x_nhwc, training=False).numpy()


def _flax_from_dump(dump, input_shape):
    import jax
    import jax.numpy as jnp

    from avex_tpu.models.efficientnet import convert_efficientnet_state_dict

    module = EfficientNetModel(
        variant="b1", num_classes=None, bn_eps=1e-3, tf_same_padding=True
    )
    dummy = jnp.zeros((1, 3) + input_shape[:2], jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy)
    torch_style = convert_keras_efficientnet_state(dump, "b1")
    converted = convert_efficientnet_state_dict(torch_style, "b1", num_classes=None)
    variables = merge_converted_params(variables, converted, strict=True)
    return module, variables


def test_keras_b1_pooled_embedding_matches_elementwise(rng):
    """Even-sized input: every stride-2 conv hits asymmetric SAME padding."""
    input_shape = (96, 64, 3)
    keras_model = _build_keras_b1(input_shape)
    x_nhwc = (rng.standard_normal((2,) + input_shape) * 50 + 128).astype(np.float32)

    tf_pooled = keras_model(x_nhwc, training=False).numpy()  # (2, 1280)
    x_norm = _normalized_input(keras_model, x_nhwc)

    module, variables = _flax_from_dump(_dump_variables(keras_model), input_shape)
    x_nchw = np.transpose(x_norm, (0, 3, 1, 2))
    _feats, aux = module.apply(variables, x_nchw)
    np.testing.assert_allclose(np.asarray(aux["pooled"]), tf_pooled, rtol=2e-3, atol=2e-4)


def test_perch_wrapper_loads_keras_dump_and_matches_backbone(rng):
    """End-to-end: PerchModel.load_state_dict on a raw keras dump, then
    infer() over a 5 s / 32 kHz waveform matches the keras backbone applied
    to our frontend's output."""
    wav = (rng.standard_normal((1, 160000)) * 0.05).astype(np.float32)
    spec = np.asarray(perch_frontend(wav))  # (1, 160, frames)
    frames = spec.shape[-1]

    input_shape = (160, frames, 3)
    keras_model = _build_keras_b1(input_shape)

    perch = PerchModel(pretrained=False)
    perch.load_state_dict(_dump_variables(keras_model))
    ours = np.asarray(perch.infer(wav)["embedding"])  # (1, 1280)

    # Keras applies Rescaling+Normalization before the backbone; feed it a
    # pre-inverted input so the backbone sees exactly our spectrogram.
    x_backbone = np.repeat(spec[:, :, :, None], 3, axis=3)  # NHWC
    x_raw = _invert_preprocessing(keras_model, x_backbone)
    tf_pooled = keras_model(x_raw, training=False).numpy()
    np.testing.assert_allclose(ours, tf_pooled, rtol=2e-3, atol=2e-4)


def _invert_preprocessing(model, x_backbone_nhwc):
    """Invert the keras Rescaling+Normalization input layers so the backbone
    receives exactly ``x_backbone_nhwc``."""
    keras = tf.keras
    x = x_backbone_nhwc
    for layer in reversed(model.layers):
        if isinstance(layer, keras.layers.Normalization):
            mean = np.asarray(layer.mean).reshape(1, 1, 1, -1)
            var = np.asarray(layer.variance).reshape(1, 1, 1, -1)
            x = x * np.sqrt(var) + mean
        elif isinstance(layer, keras.layers.Rescaling):
            x = (x - layer.offset) / layer.scale
    return x.astype(np.float32)
