"""End-to-end eval baseline on real audio files with pinned metrics.

Mirror of the reference's real-data metric baseline
(tests/fixtures/evaluate_end_to_end_metric_baselines.json +
tests/integration/eval_end_to_end_harness.py:44-100): the full evaluate
pipeline — WAV decode (native C++), resample 48k→16k, windowing, embedding
extraction, probe training — runs on actual audio files on disk and the test
metrics must match the committed fixture within the reference's tolerance
regime (atol 0.12 / rtol 0.05).

Audio classes:
  - ``insect``: real field recording (Diceroprocta eugraphica cicada, WAV)
    from the reference's sample set, read at runtime from /root/reference
    (not copied), windowed into clips.
  - ``dove`` / ``inat``: the reference's two real FLAC recordings (Xeno-canto
    Streptopelia turtur; iNaturalist 246886), decoded by the native FLAC
    decoder (MD5-verified) — the full FLAC → window → embed path on real
    bioacoustic audio.
  - ``chirp`` / ``noise``: deterministic naturalistic synthesis (FM bird-like
    chirps with harmonics; pink-ish noise beds) written as real 16-bit WAV
    files so the entire file-decode path is exercised. Zero-egress environment:
    genuinely recorded audio beyond the reference samples is not fetchable —
    documented deviation; the BEANS wiring itself is one config away
    (avex_tpu/data/beans.py) when network exists.
"""

import csv
import json
from pathlib import Path

import numpy as np
import pytest

from avex_tpu.configs import (
    BenchmarkEvaluationConfig,
    DatasetConfig,
    EvaluateConfig,
    EvaluationSet,
    ExperimentConfig,
    ModelSpec,
    ProbeConfig,
    RunConfig,
    TrainingParams,
    DatasetCollectionConfig,
)
from avex_tpu.run_evaluate import main as run_evaluate_main

REFERENCE_WAV = Path(
    "/root/reference/tests/samples/insectset_459/"
    "Diceroprocta_eugraphica_IN50366825_110124_cut.wav"
)
REFERENCE_FLACS = {
    "dove": Path(
        "/root/reference/tests/samples/animalspeak2/16khz/Xeno-canto/"
        "XC564654-200602-006_NR5N6_20h14_Sturtur.flac"
    ),
    "inat": Path(
        "/root/reference/tests/samples/animalspeak2/16khz/iNaturalist/246886.flac"
    ),
}
FIXTURE = Path(__file__).parent.parent / "fixtures" / "real_audio_metric_baselines.json"
SR = 16000
CLIP = SR  # 1-second clips


def _chirp(rng: np.random.Generator, n: int) -> np.ndarray:
    """FM bird-like chirp train with harmonics + decay envelopes."""
    t = np.arange(n) / SR
    out = np.zeros(n, np.float32)
    for start in np.cumsum(rng.uniform(0.08, 0.25, size=8)):
        if start > t[-1] - 0.1:
            break
        dur = rng.uniform(0.04, 0.12)
        f0 = rng.uniform(2000, 5000)
        sweep = rng.uniform(-1500, 1500)
        seg = (t >= start) & (t < start + dur)
        ts = t[seg] - start
        env = np.sin(np.pi * ts / dur) ** 2
        phase = 2 * np.pi * (f0 * ts + 0.5 * sweep * ts**2 / dur)
        out[seg] += env * (np.sin(phase) + 0.3 * np.sin(2 * phase))
    return (0.3 * out).astype(np.float32)


def _noise(rng: np.random.Generator, n: int) -> np.ndarray:
    """Pink-ish noise bed (1/f-shaped white noise)."""
    spectrum = np.fft.rfft(rng.standard_normal(n))
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    shaped = np.fft.irfft(spectrum / np.sqrt(freqs), n)
    return (0.15 * shaped / np.abs(shaped).max()).astype(np.float32)


@pytest.fixture(scope="module")
def real_audio_dir(tmp_path_factory):
    from scipy.io import wavfile

    from avex_tpu._native import resample

    root = tmp_path_factory.mktemp("real_audio")
    rows = []

    if not REFERENCE_WAV.exists():  # pragma: no cover - reference tree absent
        pytest.skip("reference sample audio unavailable")

    from avex_tpu._native import decode_audio

    def add_windows(source: Path, label: str) -> None:
        wav, sr = decode_audio(str(source))
        wav = resample(wav, sr, SR)
        n_windows = len(wav) // (CLIP // 2) - 1  # 50% overlap windows
        for i in range(min(n_windows, 14)):
            seg = wav[i * CLIP // 2 : i * CLIP // 2 + CLIP]
            name = f"{label}_{i}.wav"
            wavfile.write(root / name, SR, (seg * 32767).astype(np.int16))
            rows.append({"path": name, "label": label})

    add_windows(REFERENCE_WAV, "insect")
    for label, flac in REFERENCE_FLACS.items():
        if flac.exists():
            add_windows(flac, label)

    rng = np.random.default_rng(7)
    for i in range(14):
        wavfile.write(root / f"chirp_{i}.wav", SR, (_chirp(rng, CLIP) * 32767).astype(np.int16))
        rows.append({"path": f"chirp_{i}.wav", "label": "chirp"})
        wavfile.write(root / f"noise_{i}.wav", SR, (_noise(rng, CLIP) * 32767).astype(np.int16))
        rows.append({"path": f"noise_{i}.wav", "label": "noise"})

    # deterministic interleaved split: train/val/test per class
    splits = {"train": [], "val": [], "test": []}
    by_label: dict = {}
    for row in rows:
        by_label.setdefault(row["label"], []).append(row)
    for items in by_label.values():
        for j, row in enumerate(items):
            splits["test" if j % 7 == 5 else "val" if j % 7 == 6 else "train"].append(row)

    for split, split_rows in splits.items():
        sub = root / split
        sub.mkdir(exist_ok=True)
        for row in split_rows:
            (sub / row["path"]).symlink_to(root / row["path"])
        with open(sub / "metadata.csv", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["path", "label"])
            writer.writeheader()
            writer.writerows(split_rows)
    return root


def _tiny_model_spec():
    return ModelSpec(
        name="beats",
        pretrained=False,
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
    )


@pytest.mark.integration
@pytest.mark.slow
def test_real_audio_linear_probe_matches_baseline(real_audio_dir, tmp_path):
    def split(name, sub):
        return DatasetConfig(
            name=name, kind="local", path=str(real_audio_dir / sub), num_classes=5,
            clip_seconds=1.0, sample_rate=SR,
        )

    eval_set = EvaluationSet(
        name="real_audio_bench",
        train=split("real_train", "train"),
        val=split("real_val", "val"),
        test=split("real_test", "test"),
        metrics=["accuracy", "balanced_accuracy"],
    )
    config = EvaluateConfig(
        experiments=[
            ExperimentConfig(
                run_name="tiny_beats_real",
                run_config=RunConfig(
                    model_spec=_tiny_model_spec(),
                    training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=8),
                    dataset_config=DatasetCollectionConfig(),
                    output_dir=str(tmp_path / "runs"),
                ),
                pretrained=False,
                probe_config=ProbeConfig(
                    probe_type="linear",
                    target_layers=["last_layer"],
                    aggregation="mean",
                    target_length=CLIP,
                ),
            )
        ],
        dataset_config=BenchmarkEvaluationConfig(
            name="real_bench", evaluation_sets=[eval_set]
        ),
        save_dir=str(tmp_path / "eval"),
        training_params=TrainingParams(train_epochs=8, lr=5e-3, batch_size=8),
        device="cpu",
        seed=42,
        num_workers=2,
        eval_modes=["probe"],
    )
    results = run_evaluate_main(config)
    assert len(results) == 1
    metrics = results[0]["metrics"]["probe"]

    baseline = json.loads(FIXTURE.read_text())
    tol = baseline["tolerances"]
    for key, expected in baseline["metrics"].items():
        actual = float(metrics[key])
        assert actual == pytest.approx(expected, abs=tol["atol"], rel=tol["rtol"]), (
            key, actual, expected
        )
