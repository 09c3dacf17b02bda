"""BEANS real-benchmark harness — activates on first network access.

Mirror of the reference's tiny-BEANS end-to-end metric baseline
(tests/fixtures/evaluate_end_to_end_metric_baselines.json: dogs subset, probe
eval, pinned metrics). Zero-egress here, so the harness is network-gated like
the official-checkpoint suite; the offline equivalents run on real local
audio instead (tests/integration/test_real_audio_baseline.py).

With network:
  - the dogs task loads through the HF backend (data/beans.py preset),
  - rl_subsample trims it to the reference's tiny size,
  - a linear probe over tiny-BEATs embeddings trains and is scored,
  - metrics pin into tests/fixtures/beans_dogs_metric_baselines.json on
    first run (strict-compare afterwards, reference tolerances).
"""

import json
import socket
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent.parent / "fixtures" / "beans_dogs_metric_baselines.json"

pytestmark = pytest.mark.slow


def _network_available() -> bool:
    try:
        socket.getaddrinfo("huggingface.co", 443)
        return True
    except OSError:
        return False


requires_network = pytest.mark.skipif(
    not _network_available(),
    reason="HF hub unreachable (zero-egress environment) — harness activates with network",
)


@requires_network
@pytest.mark.integration
def test_beans_dogs_linear_probe(tmp_path):
    from avex_tpu.configs import (
        BenchmarkEvaluationConfig,
        DatasetCollectionConfig,
        EvaluateConfig,
        EvaluationSet,
        ExperimentConfig,
        ModelSpec,
        ProbeConfig,
        RunConfig,
        TrainingParams,
    )
    from avex_tpu.data.beans import beans_config
    from avex_tpu.run_evaluate import main as run_evaluate_main

    def split(name):
        cfg = beans_config("dogs", name)
        # The reference's tiny harness: rl_subsample ratio 0.05, max 10.
        return cfg.model_copy(
            update={
                "transformations": [
                    {"kind": "rl_subsample", "ratio": 0.05, "max_samples": 10, "seed": 0}
                ],
                "clip_seconds": 1.0,
            }
        )

    config = EvaluateConfig(
        experiments=[
            ExperimentConfig(
                run_name="tiny_beats_beans",
                run_config=RunConfig(
                    model_spec=ModelSpec(
                        name="beats",
                        pretrained=False,
                        init_config={
                            "encoder_layers": 2, "encoder_embed_dim": 64,
                            "encoder_ffn_embed_dim": 96, "encoder_attention_heads": 4,
                            "embed_dim": 32, "dropout": 0.0, "attention_dropout": 0.0,
                            "encoder_layerdrop": 0.0,
                        },
                        audio_config={
                            "representation": "raw", "normalize": False,
                            "target_length_seconds": 1, "window_selection": "center",
                        },
                    ),
                    training_params=TrainingParams(train_epochs=1, lr=1e-3, batch_size=4),
                    dataset_config=DatasetCollectionConfig(),
                    output_dir=str(tmp_path / "runs"),
                ),
                pretrained=False,
                probe_config=ProbeConfig(
                    probe_type="linear", target_layers=["last_layer"],
                    aggregation="mean", target_length=16000,
                ),
            )
        ],
        dataset_config=BenchmarkEvaluationConfig(
            name="beans_tiny",
            evaluation_sets=[
                EvaluationSet(
                    name="beans_dogs",
                    train=split("train"),
                    val=split("validation"),
                    test=split("test"),
                    metrics=["accuracy", "balanced_accuracy"],
                )
            ],
        ),
        save_dir=str(tmp_path / "eval"),
        training_params=TrainingParams(train_epochs=4, lr=5e-3, batch_size=4),
        device="cpu",
        seed=42,
        num_workers=0,
        eval_modes=["probe"],
    )
    metrics = run_evaluate_main(config)[0]["metrics"]["probe"]
    observed = {
        k: float(v) for k, v in metrics.items() if k.startswith("test_") and k != "test_loss"
    }

    if not FIXTURE.exists():
        FIXTURE.write_text(
            json.dumps(
                {"tolerances": {"atol": 0.12, "rtol": 0.05}, "metrics": observed},
                indent=2,
            )
        )
        pytest.skip(f"pinned first BEANS baseline: {observed}")

    baseline = json.loads(FIXTURE.read_text())
    tol = baseline["tolerances"]
    for key, expected in baseline["metrics"].items():
        assert float(observed[key]) == pytest.approx(
            expected, abs=tol["atol"], rel=tol["rtol"]
        ), (key, observed[key], expected)
