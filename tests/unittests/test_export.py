"""Export subsystem: jax2tf SavedModel / TFLite round-trips.

avex-tpu addition (reference ships no exporter — but its deployment targets
are exactly these formats: TFLite for BirdNet, birdnet.py:273-359; SavedModel
for Perch, perch.py:26-47). The contract under test: an exported artifact,
run by TF/TFLite with no JAX anywhere, reproduces the JAX model's outputs.
"""

import json

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec

tf = pytest.importorskip("tensorflow")

# TF import + per-test jax2tf conversion keep this module out of the fast tier.
pytestmark = pytest.mark.slow


def _tiny_spec():
    return ModelSpec(
        name="beats",
        pretrained=False,
        init_config={
            "encoder_layers": 1,
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


@pytest.fixture(scope="module")
def model():
    return avex_tpu.build_model_from_spec(_tiny_spec())


@pytest.fixture(scope="module")
def clip_batch():
    rng = np.random.default_rng(11)
    return (rng.standard_normal((3, 16000)) * 0.1).astype(np.float32)


def _jax_embedding(model, wavs):
    model.register_hooks_for_layers(["last_layer"])
    return np.asarray(
        model.extract_embeddings(wavs, aggregation="mean")
    )


def test_savedmodel_roundtrip_polymorphic_batch(model, clip_batch, tmp_path):
    """Polymorphic-batch SavedModel matches JAX for two different batch sizes
    through one exported artifact."""
    from avex_tpu.export import export_savedmodel

    out = export_savedmodel(
        model, tmp_path / "sm", mode="embed", layers=["last_layer"],
        aggregation="mean", clip_seconds=1.0,
    )
    loaded = tf.saved_model.load(str(out))
    serve = loaded.signatures["serving_default"]
    for n in (1, 3):
        got = serve(waveform=tf.constant(clip_batch[:n]))["output"].numpy()
        want = _jax_embedding(model, clip_batch[:n])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_savedmodel_metadata_sidecar(model, tmp_path):
    from avex_tpu.export import export_savedmodel

    out = export_savedmodel(
        model, tmp_path / "sm", mode="embed", clip_seconds=1.0,
    )
    meta = json.loads((out / "avex_tpu_export.json").read_text())
    assert meta["mode"] == "embed"
    assert meta["n_samples"] == 16000
    assert meta["sample_rate"] == 16000
    assert meta["layers"] == ["last_layer"]


def test_tflite_roundtrip_embed(model, clip_batch, tmp_path):
    """TFLite flatbuffer runs under tf.lite.Interpreter (zero JAX) and
    matches the JAX embeddings."""
    from avex_tpu.export import export_tflite

    path = tmp_path / "m.tflite"
    blob = export_tflite(
        model, path, mode="embed", layers=["last_layer"], aggregation="mean",
        clip_seconds=1.0, batch_size=1,
    )
    assert path.read_bytes() == blob
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    outd = interp.get_output_details()[0]
    assert tuple(inp["shape"]) == (1, 16000)
    interp.set_tensor(inp["index"], clip_batch[:1])
    interp.invoke()
    got = interp.get_tensor(outd["index"])
    want = _jax_embedding(model, clip_batch[:1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tflite_float16_quantization_shrinks_and_stays_close(model, clip_batch):
    from avex_tpu.export import export_tflite

    full = export_tflite(model, mode="embed", clip_seconds=1.0)
    quant = export_tflite(model, mode="embed", clip_seconds=1.0, quantize_float16=True)
    assert len(quant) < 0.75 * len(full)

    interp = tf.lite.Interpreter(model_content=quant)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    outd = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], clip_batch[:1])
    interp.invoke()
    got = interp.get_tensor(outd["index"])
    want = _jax_embedding(model, clip_batch[:1])
    # float16 weights: expect ~1e-3-level drift, same ballpark as bf16.
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-3


def test_logits_mode_exports_classifier_head(clip_batch, tmp_path):
    """mode='logits' exports the classifier forward (frontend in-graph)."""
    from avex_tpu.export import export_savedmodel

    model = avex_tpu.build_model_from_spec(_tiny_spec(), num_classes=7)
    out = export_savedmodel(
        model, tmp_path / "sm", mode="logits", clip_seconds=1.0, batch_size=2,
    )
    loaded = tf.saved_model.load(str(out))
    serve = loaded.signatures["serving_default"]
    got = serve(waveform=tf.constant(clip_batch[:2]))["output"].numpy()
    assert got.shape == (2, 7)
    want = np.asarray(model.forward(model.process_audio(clip_batch[:2])))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Export matrix across the zoo (round-4): the edge-relevant CNNs
# (EfficientNet / Perch — batch_stats under jax2tf), a second transformer
# family (AVES/HuBERT — conv extractor + layer-norm encoder), and an
# int8-quantized BEATs (integer dot legalization). Reference deployment
# targets these formats serve: birdnet.py:273-359 (TFLite), perch.py:26-47
# (SavedModel).
# ---------------------------------------------------------------------------


def _effnet_model():
    spec = ModelSpec(
        name="efficientnet",
        pretrained=False,
        efficientnet_variant="b0",
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
    return avex_tpu.build_model_from_spec(spec, num_classes=7)


def _perch_model():
    spec = ModelSpec(
        name="perch",
        pretrained=False,
        audio_config={"sample_rate": 32000, "representation": "raw", "normalize": False},
    )
    return avex_tpu.build_model_from_spec(spec)


def _aves_model():
    spec = ModelSpec(name="aves_bio", pretrained=False, audio_config=None)
    return avex_tpu.build_model_from_spec(
        spec, num_classes=None, return_features_only=True
    )


def _beats_int8_model():
    model = avex_tpu.build_model_from_spec(_tiny_spec())
    model.quantize("int8")
    return model


# (name, build, clip_seconds, n_samples, atol) — atol absorbs accumulated
# batch-norm/conv reassociation differences between XLA-CPU and TFLite kernels.
EXPORT_MATRIX = [
    ("efficientnet_b0", _effnet_model, 1.0, 16000, 1e-4),
    ("perch_b1", _perch_model, 5.0, 160000, 1e-4),
    ("aves_hubert", _aves_model, 1.0, 16000, 1e-4),
]


@pytest.mark.parametrize("name,build,clip_s,n_samples,atol",
                         EXPORT_MATRIX, ids=[m[0] for m in EXPORT_MATRIX])
def test_export_matrix_tflite_roundtrip(name, build, clip_s, n_samples, atol):
    """Each zoo family exports to a TFLite flatbuffer that runs under
    tf.lite.Interpreter (no JAX) and reproduces the JAX embeddings."""
    from avex_tpu.export import export_tflite

    model = build()
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal((1, n_samples)) * 0.1).astype(np.float32)

    blob = export_tflite(
        model, mode="embed", layers=["last_layer"], aggregation="mean",
        clip_seconds=clip_s, batch_size=1,
    )
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    outd = interp.get_output_details()[0]
    assert tuple(inp["shape"]) == (1, n_samples)
    interp.set_tensor(inp["index"], wav)
    interp.invoke()
    got = interp.get_tensor(outd["index"])

    want = _jax_embedding(model, wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)


def test_int8_w8a8_does_not_legalize_to_tflite():
    """MEASURED non-legalization (kept deliberately green): the W8A8
    dynamic-quant path emits a raw s8×s8→s32 ``dot_general``
    (avex_tpu/quant/__init__.py:104), and TF 2.21's TFLite converter
    rejects it — ``tfl.fully_connected`` accepts float or QI8-*typed*
    operands, not raw ``tensor<...xi8>``. Edge int8 therefore goes through
    TFLite's own quantization on a FLOAT export (``quantize_float16`` or
    TFLite PTQ), never through the on-device W8A8 mode; support table in
    docs/export.md. If a TF upgrade ever legalizes this, the test failing
    is the signal to flip the docs."""
    from tensorflow.lite.python.convert_phase import ConverterError

    from avex_tpu.export import export_tflite

    model = _beats_int8_model()
    with pytest.raises(ConverterError, match="fully_connected"):
        export_tflite(
            model, mode="embed", layers=["last_layer"], aggregation="mean",
            clip_seconds=1.0, batch_size=1,
        )


@pytest.mark.parametrize("name,build,clip_s,n_samples,atol",
                         EXPORT_MATRIX, ids=[m[0] for m in EXPORT_MATRIX])
def test_export_matrix_savedmodel_batch_stats(name, build, clip_s, n_samples,
                                              atol, tmp_path):
    """The matrix families also round-trip through SavedModel (the Perch
    deployment format) with a polymorphic batch axis — the batch-stats CNNs
    are the interesting cells (collections under jax2tf)."""
    from avex_tpu.export import export_savedmodel

    model = build()
    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)

    out = export_savedmodel(
        model, tmp_path / "sm", mode="embed", layers=["last_layer"],
        aggregation="mean", clip_seconds=clip_s,
    )
    loaded = tf.saved_model.load(str(out))
    serve = loaded.signatures["serving_default"]
    for n in (1, 2):
        got = serve(waveform=tf.constant(wav[:n]))["output"].numpy()
        want = _jax_embedding(model, wav[:n])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)


def test_cli_export_tflite(tmp_path):
    """avex-tpu export: spec YAML → .tflite artifact on disk."""
    import yaml
    from click.testing import CliRunner

    from avex_tpu.cli import cli

    spec_path = tmp_path / "tiny.yml"
    spec_path.write_text(yaml.safe_dump(_tiny_spec().model_dump(exclude_none=True)))
    out = tmp_path / "tiny.tflite"
    result = CliRunner().invoke(
        cli,
        ["export", "-m", str(spec_path), "-o", str(out), "--clip-seconds", "1",
         "--random-weights"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert out.stat().st_size > 1000
    interp = tf.lite.Interpreter(model_path=str(out))
    interp.allocate_tensors()
    assert tuple(interp.get_input_details()[0]["shape"]) == (1, 16000)
