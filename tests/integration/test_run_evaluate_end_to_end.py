"""End-to-end evaluation harness on a tiny synthetic benchmark.

Mirrors the reference's eval_end_to_end_harness
(tests/integration/eval_end_to_end_harness.py:44-100 +
test_run_evaluate_end_to_end.py): build a tiny benchmark config
programmatically, run the full run_evaluate pipeline across probe types ×
offline/online, and check metrics, cache reuse and persisted artifacts.
"""

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
            "window_selection": "random",
        },
    )


def _eval_config(tmp_path, probe_cfg: ProbeConfig, eval_modes):
    def split(name, n, seed):
        return DatasetConfig(
            name=name, kind="synthetic", num_samples=n, num_classes=3, seed=seed,
            clip_seconds=1.0,
        )

    eval_set = EvaluationSet(
        name="synth_benchmark",
        train=split("synth_train", 24, 0),
        val=split("synth_val", 9, 1),
        test=split("synth_test", 9, 2),
        metrics=["accuracy", "balanced_accuracy"],
    )
    run_config = RunConfig(
        model_spec=_tiny_model_spec(),
        training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=8),
        dataset_config=DatasetCollectionConfig(),
        output_dir=str(tmp_path / "runs"),
    )
    return EvaluateConfig(
        experiments=[
            ExperimentConfig(
                run_name="tiny_beats",
                run_config=run_config,
                pretrained=False,
                probe_config=probe_cfg,
            )
        ],
        dataset_config=BenchmarkEvaluationConfig(
            name="tiny_bench", evaluation_sets=[eval_set]
        ),
        save_dir=str(tmp_path / "eval"),
        training_params=TrainingParams(train_epochs=4, lr=5e-3, batch_size=8),
        device="cpu",
        seed=42,
        num_workers=0,
        eval_modes=list(eval_modes),
    )


@pytest.mark.integration
@pytest.mark.slow  # full eval pipeline (~23 s; round-5 re-tier)
def test_offline_linear_probe_with_retrieval_and_clustering(tmp_path):
    config = _eval_config(
        tmp_path,
        ProbeConfig(probe_type="linear", target_layers=["last_layer"], aggregation="mean"),
        eval_modes=["probe", "retrieval", "clustering"],
    )
    results = run_evaluate_main(config)
    assert len(results) == 1
    metrics = results[0]["metrics"]
    assert 0.0 <= metrics["probe"]["test_accuracy"] <= 1.0
    assert metrics["probe"]["test_accuracy"] >= 0.3  # separable synthetic, chance=1/3
    assert "roc_auc" in metrics["retrieval"]
    assert "ari" in metrics["clustering"]

    # Persisted artifacts.
    save_dir = Path(config.save_dir)
    assert (save_dir / "evaluation_metadata.jsonl").exists()
    assert (save_dir / "summary.csv").exists()

    # probe_info is first-class in the JSONL (the reference log-scrapes
    # these facts — scripts/icassp/extract_metrics_from_logs.py; ours feed
    # scripts/analysis/ directly).
    with open(save_dir / "evaluation_metadata.jsonl") as f:
        record = json.loads(f.readline())
    info = record["probe_info"]
    assert info["probe_type"] == "linear"
    assert info["layers"] == ["last_layer"]
    assert info["probe_trainable"] > 0
    assert info["probe_total"] == info["probe_trainable"]
    assert info["base_trainable"] == 0  # frozen backbone
    assert info["base_total"] > info["probe_total"]
    assert "layer_weights" not in info  # single layer learns no weighting
    caches = list((save_dir / "embeddings").rglob("*.h5"))
    assert caches, "embedding caches were not written"

    # Second run must reuse the cache (files untouched).
    mtimes = {p: p.stat().st_mtime for p in caches}
    run_evaluate_main(config)
    for p, mtime in mtimes.items():
        assert p.stat().st_mtime == mtime, f"cache {p} was recomputed"


@pytest.mark.integration
@pytest.mark.slow
def test_online_attention_probe(tmp_path):
    config = _eval_config(
        tmp_path,
        ProbeConfig(
            probe_type="attention",
            target_layers=["all"],
            aggregation="none",
            num_heads=4,
            num_layers=1,
            online_training=True,
        ),
        eval_modes=["probe"],
    )
    results = run_evaluate_main(config)
    assert 0.0 <= results[0]["metrics"]["probe"]["test_accuracy"] <= 1.0
    # Multi-layer probe: normalized learned layer weights persist with the
    # record (consumed by scripts/analysis/plots.py plot_layer_weights).
    weights = results[0]["probe_info"]["layer_weights"]
    assert len(weights) >= 2
    assert abs(sum(weights) - 1.0) < 1e-6


@pytest.mark.integration
@pytest.mark.slow
def test_online_unfrozen_finetune(tmp_path):
    config = _eval_config(
        tmp_path,
        ProbeConfig(
            probe_type="linear",
            target_layers=["last_layer"],
            aggregation="mean",
            freeze_backbone=False,
        ),
        eval_modes=["probe"],
    )
    results = run_evaluate_main(config)
    assert 0.0 <= results[0]["metrics"]["probe"]["test_accuracy"] <= 1.0


@pytest.mark.integration
@pytest.mark.slow
def test_offline_multi_layer_transformer_probe(tmp_path):
    """Offline × multi-layer: 'all' layers cached to a multi-dataset HDF5,
    learned layer weights + projectors + a sequence head trained from it —
    the remaining cell of the reference's e2e matrix
    (test_run_evaluate_end_to_end.py:1-50: probes × frozen × layers × modes)."""
    config = _eval_config(
        tmp_path,
        ProbeConfig(
            probe_type="transformer",
            target_layers=["all"],
            aggregation="none",
            num_heads=4,
            num_layers=1,
        ),
        eval_modes=["probe"],
    )
    results = run_evaluate_main(config)
    assert 0.0 <= results[0]["metrics"]["probe"]["test_accuracy"] <= 1.0
    caches = list((Path(config.save_dir) / "embeddings").rglob("*.h5"))
    assert caches
    import h5py

    with h5py.File(caches[0]) as f:
        assert bool(f.attrs["multi_layer"]) is True
        assert "embeddings_1" in f  # >1 layer cached


@pytest.mark.integration
@pytest.mark.slow
def test_offline_probe_on_multilabel_manifest_benchmark(tmp_path):
    """BirdSet-shaped offline eval entirely offline: a JSONL manifest of wav
    files with multi-label eBird-code rows (the legacy-split format,
    kind="manifest") through the full harness with a mAP metric. Pins the
    multilabel collation path: each clip's label must multi-hot ALL its
    codes (the bug this guards: the single-label collater silently kept
    only the first)."""
    import json as _json

    from scipy.io import wavfile

    sr = 16000
    rng = np.random.default_rng(3)
    codes = ["codeA", "codeB", "codeC"]

    def write_split(name, n, seed):
        root = tmp_path / "audio" / name
        root.mkdir(parents=True)
        rows = []
        rng = np.random.default_rng(seed)
        for i in range(n):
            cls = i % 3
            t = np.arange(sr, dtype=np.float32) / sr
            wav = 0.3 * np.sin(2 * np.pi * 400.0 * (cls + 1) * t)
            wav += 0.05 * rng.standard_normal(sr).astype(np.float32)
            wavfile.write(root / f"c{i}.wav", sr, (wav * 32767).astype(np.int16))
            labels = [codes[cls]] if i % 2 else [codes[cls], codes[(cls + 1) % 3]]
            rows.append({"path": f"audio/{name}/c{i}.wav", "ebird_code": labels})
        manifest = tmp_path / f"{name}.jsonl"
        manifest.write_text("\n".join(_json.dumps(r) for r in rows))
        return DatasetConfig(
            name=f"manifest_{name}", kind="manifest", path=str(manifest),
            data_root=str(tmp_path), label_column="ebird_code", sample_rate=sr,
        )

    eval_set = EvaluationSet(
        name="manifest_benchmark",
        train=write_split("train", 18, 0),
        val=write_split("val", 6, 1),
        test=write_split("test", 6, 2),
        metrics=["mAP"],
        multilabel=True,
    )
    run_config = RunConfig(
        model_spec=_tiny_model_spec(),
        training_params=TrainingParams(train_epochs=2, lr=5e-3, batch_size=6),
        dataset_config=DatasetCollectionConfig(),
        output_dir=str(tmp_path / "runs"),
    )
    config = EvaluateConfig(
        experiments=[
            ExperimentConfig(
                run_name="tiny_beats_ml",
                run_config=run_config,
                pretrained=False,
                probe_config=ProbeConfig(
                    probe_type="linear", target_layers=["last_layer"], aggregation="mean"
                ),
            )
        ],
        dataset_config=BenchmarkEvaluationConfig(
            name="manifest_bench", evaluation_sets=[eval_set]
        ),
        save_dir=str(tmp_path / "eval"),
        training_params=TrainingParams(train_epochs=2, lr=5e-3, batch_size=6),
        device="cpu",
        seed=42,
        num_workers=0,
        eval_modes=["probe"],
    )
    results = run_evaluate_main(config)
    metrics = results[0]["metrics"]["probe"]
    assert any(k.startswith("test_") for k in metrics)
    map_key = next(k for k in metrics if "map" in k.lower() or "average_precision" in k.lower())
    assert 0.0 <= metrics[map_key] <= 1.0

    # The multilabel collation itself: half the clips carry TWO codes.
    from avex_tpu.data import Collater
    from avex_tpu.data.dataset import dataset_from_config

    ds = dataset_from_config(eval_set.train)
    collate = Collater(target_len=sr, num_classes=3, train=False, multilabel=True)
    batch = collate([ds[i] for i in range(4)])
    assert batch["label"].shape == (4, 3)
    assert batch["label"].sum() == 6  # rows 0/2 have 2 codes, rows 1/3 have 1
