#!/usr/bin/env python3
"""Extract per-dataset probe results into a long-form analysis CSV.

Counterpart of the reference's paper-analysis extractor
(``/root/reference/scripts/icassp/extract_metrics_from_logs.py`` +
``README_extract_metrics.md``), with one structural difference: the
reference regex-scrapes free-text run logs for probe type, layer set,
parameter counts, learned layer weights, and metric values; avex-tpu
persists all of those as first-class fields of the evaluation JSONL
(``evaluation_metadata.jsonl`` — ``avex_tpu/run_evaluate.py`` writes a
``probe_info`` block plus a full ``config_snapshot`` per record), so this
script is a projection, not a parser.

Output columns follow the reference's CSV contract
(README_extract_metrics.md "Output CSV Format"):

    dataset_name, probe_type, layers, base_model, benchmark,
    probe_trainable, probe_total, base_trainable, base_total,
    layer_weights, metric

plus ``metric_name`` and ``experiment`` (ours; lossless provenance).

Usage:
    python scripts/analysis/extract_metrics.py SAVE_DIR_OR_JSONL \
        [-o extracted_metrics.csv] [--benchmark beans] [--metric mAP]
"""

from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

#: metric preference when --metric is not given (reference extracts
#: "either mAP or accuracy"; map/mAP first, then accuracy).
METRIC_PREFERENCE = ("map", "mAP", "accuracy", "balanced_accuracy", "roc_auc", "f1")


def _pick_metric(probe_metrics: Dict[str, Any], requested: Optional[str]) -> tuple:
    """Return (metric_name, value) from a ``metrics['probe']`` dict."""
    if requested:
        key = f"test_{requested}" if not requested.startswith("test_") else requested
        if key in probe_metrics:
            return requested.removeprefix("test_"), probe_metrics[key]
        return requested, None
    for name in METRIC_PREFERENCE:
        if f"test_{name}" in probe_metrics:
            return name, probe_metrics[f"test_{name}"]
    for key, value in probe_metrics.items():
        if key.startswith("test_") and isinstance(value, (int, float)):
            return key.removeprefix("test_"), value
    return "", None


def records_to_rows(
    records: List[Dict[str, Any]],
    benchmark: str = "",
    metric: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """Project evaluation JSONL records onto the analysis-CSV schema."""
    rows = []
    for rec in records:
        probe_metrics = (rec.get("metrics") or {}).get("probe") or {}
        if not probe_metrics:
            continue  # retrieval/clustering-only records carry no probe row
        info = rec.get("probe_info") or {}
        snapshot = rec.get("config_snapshot") or {}
        probe_cfg = snapshot.get("probe_config") or {}
        model_spec = (snapshot.get("run_config") or {}).get("model_spec") or {}
        metric_name, value = _pick_metric(probe_metrics, metric)
        layers = info.get("layers") or probe_cfg.get("target_layers") or []
        weights = info.get("layer_weights")
        rows.append(
            {
                "dataset_name": rec.get("evaluation_set"),
                "probe_type": info.get("probe_type") or probe_cfg.get("probe_type"),
                "layers": ",".join(str(layer) for layer in layers),
                "base_model": model_spec.get("name") or rec.get("experiment"),
                "benchmark": benchmark or rec.get("benchmark", ""),
                "probe_trainable": info.get("probe_trainable"),
                "probe_total": info.get("probe_total"),
                "base_trainable": info.get("base_trainable"),
                "base_total": info.get("base_total"),
                "layer_weights": ",".join(f"{w:.6f}" for w in weights) if weights else "",
                "metric": value,
                "metric_name": metric_name,
                "experiment": rec.get("experiment"),
            }
        )
    return rows


def extract(
    source: Path,
    output: Path,
    benchmark: str = "",
    metric: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """Read ``evaluation_metadata.jsonl`` (or a save dir holding one) and
    write the long-form CSV. Returns the rows written."""
    path = source / "evaluation_metadata.jsonl" if source.is_dir() else source
    records = []
    with open(path) as f:
        for line in f:
            if line.strip():
                records.append(json.loads(line))
    rows = records_to_rows(records, benchmark=benchmark, metric=metric)
    output.parent.mkdir(parents=True, exist_ok=True)
    fields = list(rows[0].keys()) if rows else ["dataset_name", "metric"]
    with open(output, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        writer.writerows(rows)
    return rows


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("source", type=Path,
                        help="evaluation save dir or evaluation_metadata.jsonl")
    parser.add_argument("-o", "--output", type=Path,
                        default=Path("extracted_metrics.csv"))
    parser.add_argument("--benchmark", default="",
                        help="benchmark tag for the CSV (e.g. beans, birdset)")
    parser.add_argument("--metric", default=None,
                        help="metric to extract (default: mAP, then accuracy)")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args()
    rows = extract(args.source, args.output, args.benchmark, args.metric)
    print(f"wrote {len(rows)} rows -> {args.output}")
    if args.verbose:
        for row in rows:
            print(f"  {row['dataset_name']}: {row['base_model']} "
                  f"{row['probe_type']}/{row['layers']} "
                  f"{row['metric_name']}={row['metric']}")


if __name__ == "__main__":
    main()
