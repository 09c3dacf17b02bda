"""End-task validation of int8 quantization and TFLite export.

Round-3 validated int8 only as pooled-embedding relative error (1.2e-2);
these tests close the loop the reference's tolerance regime actually cares
about (tests/fixtures/evaluate_end_to_end_metric_baselines.json — atol
0.12): a probe trained on FLOAT embeddings must still classify correctly
when fed

- embeddings from the SAME model quantized to W8A8 int8
  (``Model.quantize("int8")``), and
- embeddings produced by the TFLite-exported artifact of that model
  (the jax2tf → TFLite legalization path, ``avex_tpu.export``),

over the pinned real-audio corpus (real cicada WAV + real FLAC recordings +
naturalistic synthesis — see tests/integration/conftest.py). This is the
"embedding-space compatibility" contract serving relies on: quantized or
exported backends can be swapped under an already-trained probe.
"""

import csv

import numpy as np
import pytest

from tests.integration.conftest import CLIP, SR

ATOL = 0.12  # the reference's end-to-end metric tolerance regime


def _load_split(root, split):
    """Decode one split of the real-audio corpus into (wavs, labels)."""
    from avex_tpu._native import decode_audio

    rows = list(csv.DictReader(open(root / split / "metadata.csv")))
    wavs = np.zeros((len(rows), CLIP), np.float32)
    labels = []
    for i, row in enumerate(rows):
        wav, sr = decode_audio(str(root / split / row["path"]))
        assert sr == SR
        wavs[i, : min(len(wav), CLIP)] = wav[:CLIP]
        labels.append(row["label"])
    classes = sorted(set(labels))
    y = np.asarray([classes.index(l) for l in labels])
    return wavs, y


def _tiny_beats(seed: int = 42):
    from avex_tpu.models.beats import Model as BEATsWrapper

    model = BEATsWrapper(
        pretrained=False,
        seed=seed,
        init_config={
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 96,
            "encoder_attention_heads": 4,
            "embed_dim": 32,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "encoder_layerdrop": 0.0,
        },
        audio_config={
            "representation": "raw",
            "normalize": False,
            "target_length_seconds": 1,
            "window_selection": "center",
        },
        return_features_only=True,
    )
    model.register_hooks_for_layers(["last_layer"])
    return model


def _embed(model, wavs):
    return np.asarray(model.extract_embeddings(wavs, aggregation="mean"), np.float32)


def _probe_accuracy(train_x, train_y, test_x, test_y):
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=2000, random_state=0)
    clf.fit(train_x, train_y)
    return clf, float(clf.score(test_x, test_y))


@pytest.mark.integration
@pytest.mark.slow
def test_probe_trained_on_float_embeddings_survives_int8(real_audio_dir):
    model = _tiny_beats()
    train_x, train_y = (lambda w, y: (_embed(model, w), y))(*_load_split(real_audio_dir, "train"))
    test_w, test_y = _load_split(real_audio_dir, "test")
    test_x_float = _embed(model, test_w)
    clf, acc_float = _probe_accuracy(train_x, train_y, test_x_float, test_y)
    assert acc_float >= 0.6, f"float baseline probe failed to learn ({acc_float})"

    model.quantize("int8")
    test_x_int8 = _embed(model, test_w)
    acc_int8 = float(clf.score(test_x_int8, test_y))

    # Embedding drift sanity: int8 embeddings stay close to float ones.
    rel = np.linalg.norm(test_x_int8 - test_x_float) / np.linalg.norm(test_x_float)
    assert rel < 0.05, f"int8 embedding drift {rel:.3f}"
    assert abs(acc_int8 - acc_float) <= ATOL, (acc_float, acc_int8)


@pytest.mark.integration
@pytest.mark.slow
def test_probe_survives_fast_frontend(real_audio_dir):
    """bf16 EfficientNet defaults to the DEFAULT-precision (bf16-operand)
    rDFT/mel frontend (round 4, 14.3 -> 11.25 ms/batch on v5e). Its measured
    2.1e-2 last-layer feature drift must not move probe metrics: train the
    probe on HIGHEST-frontend embeddings, evaluate on DEFAULT-frontend
    embeddings, same tolerance regime as the int8 swap above."""
    import jax

    from avex_tpu.models.efficientnet import Model as EffNet

    model = EffNet(
        pretrained=False,
        return_features_only=True,
        compute_dtype="bfloat16",
        seed=7,
        audio_config={
            "sample_rate": SR,
            "n_fft": 800,
            "hop_length": 160,
            "win_length": 800,
            "n_mels": 128,
            "representation": "mel_spectrogram",
            "normalize": True,
        },
    )
    # Random-weight B0's deepest layer is not linearly separable on this
    # corpus (8 stages of random conv+BN+SiLU wash out the signal); the stem
    # + a mid-stage projection are, and together they cover both the
    # least- and a several-stages-amplified view of the frontend drift.
    model.register_hooks_for_layers(
        ["model.features.0.0", "model.features.2.0.block.3.0"]
    )

    model.audio_processor.precision = jax.lax.Precision.HIGHEST
    train_w, train_y = _load_split(real_audio_dir, "train")
    test_w, test_y = _load_split(real_audio_dir, "test")
    train_x = _embed(model, train_w)
    test_x_ref = _embed(model, test_w)
    clf, acc_ref = _probe_accuracy(train_x, train_y, test_x_ref, test_y)
    assert acc_ref >= 0.6, f"HIGHEST-frontend baseline probe failed to learn ({acc_ref})"

    model.audio_processor.precision = jax.lax.Precision.DEFAULT
    model._jit_cache.clear()  # precision is baked in at trace time
    test_x_fast = _embed(model, test_w)
    acc_fast = float(clf.score(test_x_fast, test_y))

    rel = np.linalg.norm(test_x_fast - test_x_ref) / np.linalg.norm(test_x_ref)
    assert rel < 0.08, f"fast-frontend embedding drift {rel:.3f}"
    assert abs(acc_fast - acc_ref) <= ATOL, (acc_ref, acc_fast)


@pytest.mark.integration
@pytest.mark.slow
def test_probe_trained_on_float_embeddings_survives_tflite(real_audio_dir, tmp_path):
    tf = pytest.importorskip("tensorflow")

    from avex_tpu.export import export_tflite

    model = _tiny_beats()
    train_x, train_y = (lambda w, y: (_embed(model, w), y))(*_load_split(real_audio_dir, "train"))
    test_w, test_y = _load_split(real_audio_dir, "test")
    test_x_float = _embed(model, test_w)
    clf, acc_float = _probe_accuracy(train_x, train_y, test_x_float, test_y)
    assert acc_float >= 0.6, f"float baseline probe failed to learn ({acc_float})"

    blob = export_tflite(
        model, tmp_path / "tiny_beats.tflite", clip_seconds=1.0, batch_size=1
    )
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    rows = []
    for wav in test_w:
        interp.set_tensor(inp["index"], wav[None].astype(np.float32))
        interp.invoke()
        rows.append(np.asarray(interp.get_tensor(out["index"]))[0])
    test_x_tflite = np.stack(rows)

    rel = np.linalg.norm(test_x_tflite - test_x_float) / np.linalg.norm(test_x_float)
    assert rel < 0.02, f"tflite embedding drift {rel:.3f}"
    acc_tflite = float(clf.score(test_x_tflite, test_y))
    assert abs(acc_tflite - acc_float) <= ATOL, (acc_float, acc_tflite)
