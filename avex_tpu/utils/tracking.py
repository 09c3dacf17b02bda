"""Experiment metadata persistence: JSONL records + summary CSVs.

Counterpart of ``avex/utils/experiment_tracking.py:27-730``: every
(experiment × evaluation-set) result is appended to a JSONL log with a run
id, and flattened metric rows aggregate into leaderboard-ready CSVs
(``create_experiment_summary_csvs`` analogue).
"""

from __future__ import annotations

import csv
import json
import time
import uuid
from pathlib import Path
from typing import Any, Dict, List, Sequence, Union


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item"):
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def append_jsonl(path: Union[str, Path], record: Dict[str, Any]) -> None:
    """Append one run record with id + timestamp."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    record = dict(record)
    record.setdefault("run_id", uuid.uuid4().hex[:12])
    record.setdefault("timestamp", time.strftime("%Y-%m-%dT%H:%M:%S"))
    with open(path, "a") as f:
        f.write(json.dumps(_jsonable(record)) + "\n")


def _flatten(prefix: str, value: Any, row: Dict[str, Any]) -> None:
    if isinstance(value, dict):
        for k, v in value.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), v, row)
    elif isinstance(value, (int, float)):
        row[prefix] = value


def write_summary_csv(path: Union[str, Path], results: Sequence[Dict[str, Any]]) -> None:
    """Flatten result records into one CSV (experiment × set rows)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rows: List[Dict[str, Any]] = []
    for result in results:
        row: Dict[str, Any] = {
            "experiment": result.get("experiment"),
            "evaluation_set": result.get("evaluation_set"),
        }
        _flatten("", result.get("metrics", {}), row)
        rows.append(row)
    if not rows:
        return
    fields: List[str] = []
    for row in rows:
        for key in row:
            if key not in fields:
                fields.append(key)
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        writer.writerows(rows)


def read_jsonl(path: Union[str, Path]) -> List[Dict[str, Any]]:
    """Read all records of a JSONL file (empty list when absent)."""
    path = Path(path)
    if not path.exists():
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
