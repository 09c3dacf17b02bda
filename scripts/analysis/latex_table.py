#!/usr/bin/env python3
"""Emit a booktabs LaTeX results table from the wide results CSV.

Counterpart of ``/root/reference/scripts/icassp/populate_latex_table.py``:
one row per (base_model, probe_type, layers) configuration, one column per
dataset plus the across-dataset mean; the best value per column is bolded.
Values are rendered at 3 decimals (the reference's paper format).

Usage:
    python scripts/analysis/latex_table.py extracted_metrics_wide.csv \
        [-o results_table.tex] [--caption "..."] [--label tab:results]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List

import pandas as pd

META_COLS = ["base_model", "probe_type", "layers"]


def _escape(text: str) -> str:
    return str(text).replace("_", r"\_")


def to_latex(wide: pd.DataFrame, caption: str = "Probe transfer results.",
             label: str = "tab:results") -> str:
    """Render the wide table as a booktabs tabular with per-column best bold."""
    dataset_cols: List[str] = [
        c for c in wide.columns
        if c not in META_COLS and not c.endswith("_imputed")
    ]
    best = {col: wide[col].max() for col in dataset_cols}
    lines = [
        r"\begin{table}[t]",
        r"\centering",
        rf"\caption{{{caption}}}",
        rf"\label{{{label}}}",
        r"\begin{tabular}{lll" + "c" * len(dataset_cols) + "}",
        r"\toprule",
        "Model & Probe & Layers & "
        + " & ".join(_escape(c) for c in dataset_cols)
        + r" \\",
        r"\midrule",
    ]
    for _, row in wide.iterrows():
        cells = []
        for col in dataset_cols:
            value = row[col]
            if pd.isna(value):
                cells.append("--")
                continue
            text = f"{value:.3f}"
            if value == best[col]:
                text = rf"\textbf{{{text}}}"
            if bool(row.get(f"{col}_imputed", False)):
                text += r"$^\dagger$"  # imputed cell marker
            cells.append(text)
        lines.append(
            " & ".join(
                [_escape(row[c]) for c in META_COLS] + cells
            )
            + r" \\"
        )
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}", ""]
    return "\n".join(lines)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("csv", type=Path, help="wide CSV from pivot_wide.py")
    parser.add_argument("-o", "--output", type=Path,
                        default=Path("results_table.tex"))
    parser.add_argument("--caption", default="Probe transfer results.")
    parser.add_argument("--label", default="tab:results")
    args = parser.parse_args()
    tex = to_latex(pd.read_csv(args.csv), args.caption, args.label)
    args.output.write_text(tex)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
