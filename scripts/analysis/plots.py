#!/usr/bin/env python3
"""Paper plots over the extracted probe-results CSV.

Counterparts of ``/root/reference/scripts/icassp/plot_birdset_regression.py``
(grouped bar chart of mean metric per model × probe configuration + best-config
summary) and ``plot_layer_weights.py`` (learned layer-weight curves per base
model with an across-dataset error band). matplotlib only (no seaborn in this
environment); both figures are written as PNG.

Usage:
    python scripts/analysis/plots.py extracted_metrics.csv --out-dir plots/
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd


def plot_model_comparison(df: pd.DataFrame, out: Path,
                          metric_label: str = "metric") -> Path:
    """Grouped bars: mean metric across datasets per (base_model, config)."""
    df = df.dropna(subset=["metric"]).copy()
    df["config"] = df["probe_type"].astype(str) + "/" + df["layers"].astype(str)
    summary = (
        df.groupby(["base_model", "config"])["metric"]
        .agg(["mean", "std", "count"])
        .reset_index()
    )
    models = sorted(summary["base_model"].unique())
    configs = sorted(summary["config"].unique())
    width = 0.8 / max(len(configs), 1)
    fig, ax = plt.subplots(figsize=(max(6, 1.8 * len(models)), 4.5))
    x = np.arange(len(models))
    for j, config in enumerate(configs):
        sub = summary[summary["config"] == config].set_index("base_model")
        means = [sub["mean"].get(m, np.nan) for m in models]
        errs = [sub["std"].get(m, 0.0) or 0.0 for m in models]
        ax.bar(x + j * width, means, width=width, yerr=errs, capsize=2,
               label=config)
    ax.set_xticks(x + width * (len(configs) - 1) / 2)
    ax.set_xticklabels(models, rotation=20, ha="right")
    ax.set_ylabel(f"mean {metric_label} across datasets")
    ax.set_title("Probe transfer performance by model and probe configuration")
    ax.legend(fontsize=8)
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_layer_weights(df: pd.DataFrame, out: Path) -> Optional[Path]:
    """Learned layer-weight curves per base model, mean ± std across
    datasets (reference plot_layer_weights.py). Returns None when no row
    carries layer weights (single-layer probes learn none)."""
    rows = df[df.get("layer_weights", pd.Series(dtype=str)).astype(str).str.len() > 0]
    if rows.empty:
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    plotted = False
    for model, group in rows.groupby("base_model"):
        curves = [
            np.array([float(w) for w in str(s).split(",") if w])
            for s in group["layer_weights"]
        ]
        depth = max(len(c) for c in curves)
        curves = [c for c in curves if len(c) == depth]  # mixed layer sets
        if not curves:
            continue
        stack = np.stack(curves)
        mean, std = stack.mean(axis=0), stack.std(axis=0)
        xs = np.arange(depth)
        ax.plot(xs, mean, marker="o", label=f"{model} (n={len(curves)})")
        ax.fill_between(xs, mean - std, mean + std, alpha=0.2)
        plotted = True
    if not plotted:
        plt.close(fig)
        return None
    ax.set_xlabel("layer index")
    ax.set_ylabel("normalized learned weight")
    ax.set_title("Learned layer weights across datasets")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("csv", type=Path)
    parser.add_argument("--out-dir", type=Path, default=Path("plots"))
    args = parser.parse_args()
    df = pd.read_csv(args.csv)
    metric_label = (
        df["metric_name"].dropna().iloc[0]
        if "metric_name" in df.columns and df["metric_name"].notna().any()
        else "metric"
    )
    bar = plot_model_comparison(df, args.out_dir / "model_comparison.png",
                                metric_label)
    print(f"wrote {bar}")
    weights = plot_layer_weights(df, args.out_dir / "layer_weights.png")
    print(f"wrote {weights}" if weights else
          "no layer weights in input (single-layer probes) — skipped")


if __name__ == "__main__":
    main()
