"""Experiment tracking: run ids, config snapshots, summary CSVs, leaderboard."""

import csv
import json
import subprocess
import sys
from pathlib import Path

from avex_tpu.utils.tracking import (
    create_experiment_summary_csvs,
    get_config_from_metadata,
    load_experiment_metadata,
    read_jsonl,
    save_experiment_metadata,
)


class _Cfg:
    """Config stand-in with model_dump (pydantic protocol)."""

    def __init__(self, **kw):
        self._kw = kw

    def model_dump(self, mode="json"):
        return dict(self._kw)


def test_experiment_metadata_roundtrip(tmp_path):
    cfg = _Cfg(run_name="exp1", lr=1e-3, model={"name": "beats"})
    save_experiment_metadata(tmp_path, cfg, "checkpoint_epoch_0", {"val_acc": 0.5})
    # second row with a DIFFERENT metric set — columns must stay aligned
    save_experiment_metadata(
        tmp_path, cfg, "best_model", {"val_acc": 0.7, "val_map": 0.6}, is_best=True
    )
    save_experiment_metadata(tmp_path, cfg, "final_model", {"val_acc": 0.65}, is_final=True)

    rows = load_experiment_metadata(tmp_path)
    assert len(rows) == 3
    assert rows[0]["id"] == "exp1"
    assert rows[1]["is_best"] is True and rows[1]["is_final"] is False
    assert rows[1]["val_map"] == "0.6"
    assert rows[0].get("val_map") in (None, "")  # union-of-columns, no misalignment

    config = get_config_from_metadata(rows, prefer="final")
    assert config == {"run_name": "exp1", "lr": 0.001, "model": {"name": "beats"}}
    best_cfg = get_config_from_metadata(rows, prefer="best")
    assert best_cfg["run_name"] == "exp1"


def test_summary_csvs_and_leaderboard(tmp_path):
    results = [
        {
            "experiment": "beats_linear",
            "evaluation_set": "watkins",
            "metrics": {"probe": {"test_accuracy": 0.9, "test_loss": 0.2},
                        "retrieval": {"roc_auc": 0.8}},
        },
        {
            "experiment": "beats_linear",
            "evaluation_set": "dogs",
            "metrics": {"probe": {"test_accuracy": 0.7, "test_loss": 0.5}},
        },
        {
            "experiment": "eat_mlp",
            "evaluation_set": "watkins",
            "metrics": {"probe": {"test_accuracy": 0.6, "test_loss": 0.7}},
        },
    ]
    create_experiment_summary_csvs(results, tmp_path, global_csv_path=tmp_path / "global.csv")

    assert (tmp_path / "summary.csv").exists()
    simple = list(csv.DictReader(open(tmp_path / "summary_simple.csv")))
    assert simple[0]["probe.test_accuracy"] == "0.9"
    assert {p.name for p in (tmp_path / "summaries").glob("*.csv")} == {
        "watkins.csv", "dogs.csv",
    }
    # global CSV accumulates across invocations (summary.csv is per-invocation)
    create_experiment_summary_csvs(results[:1], tmp_path / "second", global_csv_path=tmp_path / "global.csv")
    global_rows = list(csv.DictReader(open(tmp_path / "global.csv")))
    assert len(global_rows) == 4

    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parents[2] / "scripts" / "experiment_leaderboard.py"),
         str(tmp_path / "summary.csv")],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    lines = [line for line in proc.stdout.splitlines() if line and not line.startswith(("-", "experiment"))]
    assert lines[0].startswith("beats_linear")  # ranked by mean test_accuracy
    assert "eat_mlp" in proc.stdout


def test_read_jsonl_roundtrip(tmp_path):
    from avex_tpu.utils.tracking import append_jsonl

    append_jsonl(tmp_path / "log.jsonl", {"experiment": "e", "metrics": {"x": 1.0}})
    rows = read_jsonl(tmp_path / "log.jsonl")
    assert rows[0]["experiment"] == "e"
    assert "run_id" in rows[0] and "timestamp" in rows[0]


def test_experiment_logger_jsonl_and_fallback(tmp_path):
    """ExperimentLogger: local JSONL sink always works; missing mlflow/wandb
    degrade gracefully to 'none' (≈ experiment_logger.py:33-160)."""
    import json

    from avex_tpu.utils.experiment_logger import ExperimentLogger

    exp_logger = ExperimentLogger(backend="mlflow", output_dir=str(tmp_path))
    assert exp_logger.backend == "none"  # mlflow absent -> fallback, no crash
    exp_logger.log_params({"lr": 1e-3, "model": "beats"})
    exp_logger.log_metrics({"loss": 0.5, "acc": 0.9, "skipme": "str"}, step=1, split="train")
    exp_logger.finalize()

    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["type"] == "params" and lines[0]["params"]["model"] == "beats"
    metric_rec = lines[1]
    assert metric_rec["metrics"] == {"train/loss": 0.5, "train/acc": 0.9}
    assert metric_rec["step"] == 1
