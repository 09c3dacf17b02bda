"""Experiment logging: MLflow / W&B / no-op backends.

Counterpart of ``avex/utils/experiment_logger.py:33-207``: one interface
(`log_params` / `log_metrics` / `finalize`), backend chosen by name, silent
no-op when the backend package is unavailable.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class ExperimentLogger:
    """Backend-agnostic metrics/params logger."""

    def __init__(
        self,
        backend: str = "none",
        run_name: Optional[str] = None,
        logging_uri: Optional[str] = None,
        project: str = "audio-experiments",
        output_dir: Optional[str] = None,
    ) -> None:
        self.backend = backend
        self.run_name = run_name or f"run_{int(time.time())}"
        self._mlflow = None
        self._wandb = None
        self._jsonl_path: Optional[Path] = None
        if output_dir:
            self._jsonl_path = Path(output_dir) / "metrics.jsonl"
            self._jsonl_path.parent.mkdir(parents=True, exist_ok=True)

        if backend == "mlflow":
            try:
                import mlflow

                if logging_uri:
                    mlflow.set_tracking_uri(logging_uri)
                mlflow.start_run(run_name=self.run_name)
                self._mlflow = mlflow
            except ImportError:
                logger.warning("mlflow not installed; falling back to local jsonl logging")
                self.backend = "none"
        elif backend == "wandb":
            try:
                import wandb

                wandb.init(project=project, name=self.run_name)
                self._wandb = wandb
            except ImportError:
                logger.warning("wandb not installed; falling back to local jsonl logging")
                self.backend = "none"

    def log_params(self, params: Dict[str, Any]) -> None:
        """Record run hyper-parameters once."""
        if self._mlflow:
            self._mlflow.log_params({k: str(v)[:250] for k, v in params.items()})
        elif self._wandb:
            self._wandb.config.update(params, allow_val_change=True)
        if self._jsonl_path:
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps({"type": "params", "params": _jsonable(params)}) + "\n")

    def log_metrics(self, metrics: Dict[str, float], step: int = 0, split: str = "") -> None:
        """Record step/epoch metrics to the backend and local jsonl."""
        named = {f"{split}/{k}" if split else k: float(v) for k, v in metrics.items() if _is_num(v)}
        if self._mlflow:
            self._mlflow.log_metrics(named, step=step)
        elif self._wandb:
            self._wandb.log(named, step=step)
        if self._jsonl_path:
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps({"type": "metrics", "step": step, "metrics": named}) + "\n")

    def finalize(self) -> None:
        """Close the backend run."""
        if self._mlflow:
            self._mlflow.end_run()
        if self._wandb:
            self._wandb.finish()


def _is_num(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def _jsonable(obj: Any) -> Any:
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        return str(obj)
