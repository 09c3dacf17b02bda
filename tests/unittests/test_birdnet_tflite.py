"""BirdNet TFLite adapter driven against a real TFLite graph.

The reference exercises birdnetlib only on developer machines; here the
adapter's manual-interpreter path (clip scores + penultimate embeddings,
reference birdnet.py:273-359) is validated against a genuine
``tf.lite.Interpreter`` running a tiny keras-converted model — both the
two-output (old BirdNet) format and the single-output format where the
embedding tensor must be located by search.

Requires TensorFlow; skipped where it is not installed.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from avex_tpu.models.birdnet import Model, TFLiteBackend  # noqa: E402

pytestmark = pytest.mark.slow

INPUT_LEN = 1200
EMB_DIM = 16
N_CLASSES = 5


def _tiny_keras(two_outputs: bool):
    keras = tf.keras
    inp = keras.Input(shape=(INPUT_LEN,), name="waveform")
    h = keras.layers.Dense(EMB_DIM, activation="relu", name="embedding")(inp)
    logits = keras.layers.Dense(N_CLASSES, name="logits")(h)
    outputs = [logits, h] if two_outputs else logits
    model = keras.Model(inp, outputs)
    rng = np.random.default_rng(3)
    for v in model.variables:
        v.assign((rng.standard_normal(tuple(v.shape)) * 0.3).astype(np.float32))
    return model


def _to_tflite(model, tmp_path, name):
    converter = tf.lite.TFLiteConverter.from_keras_model(model)
    path = tmp_path / name
    path.write_bytes(converter.convert())
    return str(path)


def _keras_embedding(model, x):
    sub = tf.keras.Model(model.input, model.get_layer("embedding").output)
    return sub(x, training=False).numpy()


@pytest.mark.parametrize("two_outputs", [True, False])
def test_backend_predict_and_embed_match_keras(tmp_path, rng, two_outputs):
    model = _tiny_keras(two_outputs)
    backend = TFLiteBackend(_to_tflite(model, tmp_path, "m.tflite"))
    assert backend.input_samples == INPUT_LEN
    assert backend.num_classes == N_CLASSES

    x = rng.standard_normal((1, INPUT_LEN)).astype(np.float32)
    keras_out = model(x, training=False)
    keras_logits = (keras_out[0] if two_outputs else keras_out).numpy()[0]
    np.testing.assert_allclose(backend.predict(x[0]), keras_logits, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        backend.embed(x[0]), _keras_embedding(model, x)[0], rtol=1e-5, atol=1e-5
    )


def test_model_wrapper_chunks_pads_and_aggregates(tmp_path, rng):
    model = _tiny_keras(two_outputs=False)
    path = _to_tflite(model, tmp_path, "m.tflite")
    wrapper = Model(model_path=path)
    assert wrapper.num_classes == N_CLASSES

    # Two clips: one shorter than the input window (padded), one spanning
    # exactly two windows (scores max-pooled, embeddings mean-pooled).
    short = rng.standard_normal(INPUT_LEN // 2).astype(np.float32)
    double = rng.standard_normal(2 * INPUT_LEN).astype(np.float32)

    scores_short = wrapper(short)
    assert scores_short.shape == (1, N_CLASSES)
    padded = np.pad(short, (0, INPUT_LEN - len(short)))[None]
    np.testing.assert_allclose(
        scores_short[0],
        (model(padded, training=False)).numpy()[0],
        rtol=1e-5,
        atol=1e-5,
    )

    emb = wrapper.extract_embeddings(double[None])
    assert emb.shape == (1, EMB_DIM)
    w1, w2 = double[:INPUT_LEN][None], double[INPUT_LEN : 2 * INPUT_LEN][None]
    expected = (_keras_embedding(model, w1)[0] + _keras_embedding(model, w2)[0]) / 2
    np.testing.assert_allclose(emb[0], expected, rtol=1e-5, atol=1e-5)

    per_window = wrapper.extract_embeddings(double[None], aggregation="none")
    assert per_window.shape == (1, 2, EMB_DIM)


def test_chunk_trailing_window_minlen_semantics(tmp_path, rng):
    """birdnetlib split semantics: a trailing remainder >= minlen (half the
    window) gets a final zero-padded chunk; a shorter remainder is dropped
    (birdnetlib 'requires >= 1.5 s of audio' per chunk)."""
    model = _tiny_keras(two_outputs=False)
    wrapper = Model(model_path=_to_tflite(model, tmp_path, "m.tflite"))

    # Remainder of 2/3 window >= minlen: kept and padded.
    tail = 2 * INPUT_LEN // 3
    clip = rng.standard_normal(2 * INPUT_LEN + tail).astype(np.float32)
    windows = wrapper._chunk(clip)
    assert windows.shape == (3, INPUT_LEN)
    np.testing.assert_array_equal(windows[0], clip[:INPUT_LEN])
    np.testing.assert_array_equal(windows[1], clip[INPUT_LEN : 2 * INPUT_LEN])
    np.testing.assert_array_equal(windows[2][:tail], clip[2 * INPUT_LEN :])
    np.testing.assert_array_equal(windows[2][tail:], 0)

    # Remainder of 1/3 window < minlen: dropped (reference birdnet.py:382).
    short_tail = rng.standard_normal(2 * INPUT_LEN + INPUT_LEN // 3).astype(np.float32)
    assert wrapper._chunk(short_tail).shape == (2, INPUT_LEN)

    # Exact multiples still produce exactly len/n windows (no empty tail).
    assert wrapper._chunk(clip[: 2 * INPUT_LEN]).shape == (2, INPUT_LEN)
    assert wrapper._chunk(clip[:INPUT_LEN]).shape == (1, INPUT_LEN)


def test_missing_backends_raise_clear_error():
    with pytest.raises(ImportError, match="birdnetlib"):
        Model()
