"""Paper-analysis toolkit (scripts/analysis/) over synthetic eval records.

The reference ships this pipeline as scripts/icassp/ (log-scrape -> pivot ->
plots -> LaTeX); ours projects the structured evaluation JSONL instead.
These tests drive every stage end-to-end on a synthetic sweep with a
missing (config, dataset) cell and learned layer weights.
"""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
ANALYSIS = REPO / "scripts" / "analysis"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, ANALYSIS / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _record(model, probe_type, layers, dataset, value, weights=None):
    info = {
        "probe_type": probe_type,
        "layers": layers,
        "probe_trainable": 1234,
        "probe_total": 1234,
        "base_trainable": 0,
        "base_total": 90_000_000,
    }
    if weights:
        info["layer_weights"] = weights
    return {
        "experiment": f"{model}_{probe_type}",
        "evaluation_set": dataset,
        "metrics": {"probe": {"test_map": value, "test_accuracy": value - 0.01}},
        "probe_info": info,
        "config_snapshot": {
            "probe_config": {"probe_type": probe_type, "target_layers": layers},
            "run_config": {"model_spec": {"name": model}},
        },
    }


@pytest.fixture(scope="module")
def sweep_jsonl(tmp_path_factory):
    """2 models x 2 probe configs x 3 datasets, one cell missing."""
    tmp = tmp_path_factory.mktemp("analysis")
    records = []
    values = {"beats": 0.8, "eat": 0.6}
    for model in ("beats", "eat"):
        for j, (ptype, layers) in enumerate(
            [("linear", ["last_layer"]), ("attention", ["all"])]
        ):
            weights = [0.1, 0.2, 0.7] if layers == ["all"] else None
            for k, dataset in enumerate(("dogs", "birds", "bats")):
                if model == "eat" and ptype == "attention" and dataset == "bats":
                    continue  # the missing cell --impute must fill
                records.append(
                    _record(model, ptype, layers, dataset,
                            values[model] + 0.02 * j + 0.01 * k, weights)
                )
    path = tmp / "evaluation_metadata.jsonl"
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return path


def test_extract_projects_records(sweep_jsonl, tmp_path):
    extract = _load("extract_metrics")
    out = tmp_path / "long.csv"
    rows = extract.extract(sweep_jsonl, out, benchmark="beans")
    assert len(rows) == 11  # 12 cells - 1 missing
    row = next(r for r in rows if r["base_model"] == "beats"
               and r["probe_type"] == "attention" and r["dataset_name"] == "dogs")
    assert row["metric_name"] == "map"
    assert row["metric"] == pytest.approx(0.82)
    assert row["benchmark"] == "beans"
    assert row["layers"] == "all"
    assert row["layer_weights"].startswith("0.1")
    assert row["base_total"] == 90_000_000
    assert out.exists()


def test_extract_metric_override(sweep_jsonl, tmp_path):
    extract = _load("extract_metrics")
    rows = extract.extract(sweep_jsonl, tmp_path / "acc.csv", metric="accuracy")
    assert all(r["metric_name"] == "accuracy" for r in rows)
    assert rows[0]["metric"] == pytest.approx(0.79)


def test_pivot_wide_and_impute(sweep_jsonl, tmp_path):
    import pandas as pd

    extract = _load("extract_metrics")
    pivot = _load("pivot_wide")
    rows = extract.extract(sweep_jsonl, tmp_path / "long.csv")
    df = pd.DataFrame(rows)

    plain = pivot.pivot_wide(df, impute=False)
    assert set(["base_model", "probe_type", "layers", "mean"]) <= set(plain.columns)
    assert len(plain) == 4  # 2 models x 2 configs
    missing_row = plain[(plain.base_model == "eat") & (plain.probe_type == "attention")]
    assert missing_row["bats"].isna().all()

    filled = pivot.pivot_wide(df, impute=True)
    cell = filled[(filled.base_model == "eat") & (filled.probe_type == "attention")]
    value = float(cell["bats"].iloc[0])
    assert 0.0 <= value <= 1.0 and not pd.isna(value)
    assert bool(cell["bats_imputed"].iloc[0])
    # observed cells keep their values and are unflagged
    kept = filled[(filled.base_model == "beats") & (filled.probe_type == "linear")]
    assert float(kept["dogs"].iloc[0]) == pytest.approx(0.80)
    assert not bool(kept["dogs_imputed"].iloc[0])

    best = pivot.best_configs(filled)
    assert list(best["base_model"]) == ["beats", "eat"]
    assert (best["probe_type"] == "attention").all()  # +0.02 per config step


def test_latex_table_bolds_best(sweep_jsonl, tmp_path):
    import pandas as pd

    extract = _load("extract_metrics")
    pivot = _load("pivot_wide")
    latex = _load("latex_table")
    rows = extract.extract(sweep_jsonl, tmp_path / "long.csv")
    wide = pivot.pivot_wide(pd.DataFrame(rows), impute=True)
    tex = latex.to_latex(wide, caption="Test", label="tab:test")
    assert r"\toprule" in tex and r"\bottomrule" in tex
    assert tex.count(r"\textbf") >= 4  # one best per dataset col + mean
    assert r"$^\dagger$" in tex  # imputed marker
    assert r"last\_layer" in tex  # underscore escape


def test_plots_render(sweep_jsonl, tmp_path):
    import pandas as pd

    extract = _load("extract_metrics")
    plots = _load("plots")
    rows = extract.extract(sweep_jsonl, tmp_path / "long.csv")
    df = pd.DataFrame(rows)
    bar = plots.plot_model_comparison(df, tmp_path / "cmp.png")
    assert bar.stat().st_size > 1000
    weights = plots.plot_layer_weights(df, tmp_path / "lw.png")
    assert weights is not None and weights.stat().st_size > 1000
    # no layer weights at all -> graceful None
    none = plots.plot_layer_weights(
        df[df.layer_weights == ""], tmp_path / "none.png"
    )
    assert none is None


def test_cli_end_to_end(sweep_jsonl, tmp_path):
    out = tmp_path / "cli.csv"
    proc = subprocess.run(
        [sys.executable, str(ANALYSIS / "extract_metrics.py"),
         str(sweep_jsonl), "-o", str(out), "--benchmark", "beans", "-v"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "wrote 11 rows" in proc.stdout
    assert out.exists()
