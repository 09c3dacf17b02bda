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

import json
from pathlib import Path

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

# The real_audio_dir fixture (and the corpus it builds) lives in
# tests/integration/conftest.py, shared with the int8/TFLite end-task tests.
FIXTURE = Path(__file__).parent.parent / "fixtures" / "real_audio_metric_baselines.json"
SR = 16000
CLIP = SR  # 1-second clips


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
