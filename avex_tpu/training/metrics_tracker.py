"""Per-epoch metric accumulation.

Counterpart of ``avex/training/metrics_tracker.py:24-250``: accumulates loss
and mode-specific statistics across steps, then reports an epoch summary.
Device arrays are pulled host-side lazily (jax transfers are async; the pull
only synchronizes the small logits/count tensors, not the whole step).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from avex_tpu.metrics import get_metric_class

logger = logging.getLogger(__name__)


class MetricsTracker:
    """Accumulate step metrics for one of supervised / clip / ssl modes."""

    def __init__(
        self,
        mode: str = "supervised",
        metric_names: Optional[List[str]] = None,
        num_classes: Optional[int] = None,
    ) -> None:
        self.mode = mode
        self.metric_names = metric_names or ["accuracy"]
        self.num_classes = num_classes
        self.reset()

    def reset(self) -> None:
        """Clear all accumulated state for a new epoch."""
        self.loss_sum = 0.0
        self.sample_count = 0
        self.correct = 0
        self.a2t_correct = 0
        self.t2a_correct = 0
        self.ssl_losses: Dict[str, float] = {}
        self._calculators = {
            name: get_metric_class(name, self.num_classes) for name in self.metric_names
        }

    def update(self, loss, step_metrics: Dict, labels=None) -> None:
        """Accumulate one step's loss and mode-specific statistics.

        Also hosts the NaN/Inf debug guards (≈ reference
        training_strategies.py:74-106): non-finite loss or model outputs log a
        warning with output stats so blowups are diagnosable from the logs.
        """
        count = int(np.asarray(step_metrics.get("count", 0)))
        loss_value = float(np.asarray(loss))
        if not np.isfinite(loss_value):
            logger.warning("Non-finite loss detected: %s", loss_value)
        self.loss_sum += loss_value * max(count, 1)
        self.sample_count += count
        nonfinite = step_metrics.get("nonfinite_logits")
        if nonfinite is not None and int(np.asarray(nonfinite)) > 0:
            msg = f"{int(np.asarray(nonfinite))} non-finite values in model outputs!"
            if "logits" in step_metrics:
                logits = np.asarray(step_metrics["logits"])
                finite = logits[np.isfinite(logits)]
                if finite.size:
                    msg += (
                        f" finite stats: min={finite.min():.6f}"
                        f" max={finite.max():.6f} mean={finite.mean():.6f}"
                    )
            logger.warning(msg)
        if self.mode == "supervised":
            self.correct += int(np.asarray(step_metrics.get("correct", 0)))
            if labels is not None and "logits" in step_metrics:
                logits = np.asarray(step_metrics["logits"])
                for calc in self._calculators.values():
                    calc.update(logits, np.asarray(labels))
        elif self.mode == "clip":
            self.a2t_correct += int(np.asarray(step_metrics.get("a2t_correct", 0)))
            self.t2a_correct += int(np.asarray(step_metrics.get("t2a_correct", 0)))
        else:  # ssl
            for key, value in step_metrics.items():
                if key.startswith("loss_"):
                    self.ssl_losses[key] = self.ssl_losses.get(key, 0.0) + float(
                        np.asarray(value)
                    )

    @property
    def avg_loss(self) -> float:
        """Mean loss over the epoch so far."""
        return self.loss_sum / max(self.sample_count, 1)

    def epoch_metrics(self) -> Dict[str, float]:
        """Epoch summary: loss plus mode-specific metric values."""
        out = {"loss": self.avg_loss, "samples": float(self.sample_count)}
        if self.mode == "supervised":
            out["accuracy_running"] = self.correct / max(self.sample_count, 1)
            for name, calc in self._calculators.items():
                try:
                    out[name] = calc.get_primary_metric()
                except Exception:
                    out[name] = 0.0
        elif self.mode == "clip":
            out["a2t_accuracy"] = self.a2t_correct / max(self.sample_count, 1)
            out["t2a_accuracy"] = self.t2a_correct / max(self.sample_count, 1)
        else:
            for key, value in self.ssl_losses.items():
                out[key] = value / max(self.sample_count, 1)
        return out

    def primary_metric(self) -> float:
        """First configured metric, used for best-checkpoint selection
        (≈ metrics_tracker.py primary = metrics[0])."""
        metrics = self.epoch_metrics()
        if self.mode == "supervised" and self.metric_names:
            return metrics.get(self.metric_names[0], 0.0)
        if self.mode == "clip":
            return 0.5 * (metrics["a2t_accuracy"] + metrics["t2a_accuracy"])
        return -metrics["loss"]
