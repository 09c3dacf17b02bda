#!/usr/bin/env python3
"""Pivot long-form probe results to a wide model × dataset table.

Counterpart of ``/root/reference/scripts/icassp/pivot_metrics_to_wide.py``:
rows are (base_model, probe_type, layers) configurations, columns are
datasets, the last column is the across-dataset mean. Like the reference,
missing cells can optionally be imputed with a Ridge regression fitted on
the observed (config, dataset) grid (``--impute``; the reference offers
Ridge / RandomForest — we keep the linear one, which is what its default
paper tables used) so partially-run sweeps still produce comparable means.
Imputed cells are marked in a parallel ``*_imputed`` boolean table.

Usage:
    python scripts/analysis/pivot_wide.py extracted_metrics.csv \
        [-o extracted_metrics_wide.csv] [--impute]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

META_COLS = ["base_model", "probe_type", "layers"]


def pivot_wide(df: pd.DataFrame, impute: bool = False) -> pd.DataFrame:
    """Long rows → wide table; optionally Ridge-impute missing cells."""
    required = set(META_COLS + ["dataset_name", "metric"])
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"input CSV is missing columns: {sorted(missing)}")
    df = df.dropna(subset=["metric"])
    wide = df.pivot_table(
        index=META_COLS, columns="dataset_name", values="metric", aggfunc="mean"
    )
    dataset_cols = list(wide.columns)

    if impute and wide.isna().any().any():
        # One-hot (config row, dataset col) design; Ridge on observed cells.
        from sklearn.linear_model import Ridge

        obs = wide.stack(future_stack=True).rename("metric").reset_index()
        observed = obs.dropna(subset=["metric"])
        design = pd.get_dummies(
            obs[META_COLS + ["dataset_name"]].astype(str), dtype=float
        )
        model = Ridge(alpha=1.0)
        model.fit(design.loc[observed.index], observed["metric"])
        predicted = model.predict(design)
        filled = obs["metric"].to_numpy(dtype=float, copy=True)
        was_missing = np.isnan(filled)
        filled[was_missing] = np.clip(predicted[was_missing], 0.0, 1.0)
        obs["metric"] = filled
        obs["imputed"] = was_missing
        wide = obs.pivot_table(
            index=META_COLS, columns="dataset_name", values="metric"
        )[dataset_cols]
        flags = obs.pivot_table(
            index=META_COLS, columns="dataset_name", values="imputed"
        )[dataset_cols].astype(bool)
        for col in dataset_cols:
            wide[f"{col}_imputed"] = flags[col]

    wide["mean"] = wide[dataset_cols].mean(axis=1)
    return wide.reset_index()


def best_configs(wide: pd.DataFrame) -> pd.DataFrame:
    """Best (probe_type, layers) per base model by across-dataset mean —
    the reference's "concise summary of the best configuration"
    (plot_birdset_regression.py docstring)."""
    idx = wide.groupby("base_model")["mean"].idxmax()
    return wide.loc[idx, META_COLS + ["mean"]].sort_values(
        "mean", ascending=False
    )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("csv", type=Path)
    parser.add_argument("-o", "--output", type=Path, default=None)
    parser.add_argument("--impute", action="store_true",
                        help="Ridge-impute missing (config, dataset) cells")
    args = parser.parse_args()
    wide = pivot_wide(pd.read_csv(args.csv), impute=args.impute)
    output = args.output or args.csv.with_name(args.csv.stem + "_wide.csv")
    wide.to_csv(output, index=False)
    print(f"wrote {len(wide)} configs x {len(wide.columns)} cols -> {output}")
    print("\nBest configuration per base model (by across-dataset mean):")
    print(best_configs(wide).to_string(index=False))


if __name__ == "__main__":
    main()
