"""Streaming evaluation metrics.

Counterparts of ``avex/metrics/{sklearn_metrics,metric_factory,beans_metrics}.py``:
each metric accumulates ``(logits, targets)`` batches host-side via ``update``
and reports through ``get_primary_metric`` / ``compute``. One-hot / multi-hot
targets are accepted everywhere and collapsed to indices where appropriate, as
in the reference. BEANS-compatible mAP follows the per-class
average-precision-over-present-classes convention of
``avex/metrics/beans_metrics.py:126-324``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

__all__ = [
    "Accuracy",
    "BalancedAccuracy",
    "BinaryF1Score",
    "MulticlassBinaryF1Score",
    "AveragePrecision",
    "MeanAveragePrecision",
    "ROCAUC",
    "get_metric_class",
]


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x)


def _labels_to_indices(y: np.ndarray) -> np.ndarray:
    """Collapse one-hot (N, C) targets to class indices (N,)."""
    y = _to_numpy(y)
    if y.ndim == 2:
        return y.argmax(axis=1)
    return y.astype(np.int64)


class _StreamingMetric:
    """Shared accumulation of predictions/targets across batches."""

    def __init__(self) -> None:
        self._logits: List[np.ndarray] = []
        self._targets: List[np.ndarray] = []

    def reset(self) -> None:
        """Clear accumulated predictions/targets."""
        self._logits.clear()
        self._targets.clear()

    def update(self, logits, y) -> None:
        """Accumulate one batch of (logits, targets)."""
        self._logits.append(_to_numpy(logits))
        self._targets.append(_to_numpy(y))

    def _stacked(self):
        return np.concatenate(self._logits, axis=0), np.concatenate(self._targets, axis=0)


class Accuracy(_StreamingMetric):
    """Top-1 accuracy (sklearn_metrics.py:24-69)."""

    def get_primary_metric(self) -> float:
        """Primary scalar score over everything accumulated so far."""
        from sklearn.metrics import accuracy_score

        logits, y = self._stacked()
        preds = logits.argmax(axis=1) if logits.ndim == 2 else (logits > 0).astype(int)
        return float(accuracy_score(_labels_to_indices(y), preds))

    #: alias used by some callers
    compute = get_primary_metric


class BalancedAccuracy(_StreamingMetric):
    """Class-imbalance-adjusted accuracy (sklearn_metrics.py:286-333)."""

    def get_primary_metric(self) -> float:
        """Primary scalar score over everything accumulated so far."""
        from sklearn.metrics import balanced_accuracy_score

        logits, y = self._stacked()
        preds = logits.argmax(axis=1) if logits.ndim == 2 else (logits > 0).astype(int)
        return float(balanced_accuracy_score(_labels_to_indices(y), preds))

    #: alias used by some callers
    compute = get_primary_metric


class BinaryF1Score(_StreamingMetric):
    """F1 of the positive class for binary problems (sklearn_metrics.py:71-125)."""

    def get_primary_metric(self) -> float:
        """Primary scalar score over everything accumulated so far."""
        from sklearn.metrics import f1_score

        logits, y = self._stacked()
        if logits.ndim == 2 and logits.shape[1] == 2:
            preds = logits.argmax(axis=1)
        elif logits.ndim == 2 and logits.shape[1] == 1:
            preds = (logits[:, 0] > 0).astype(int)
        else:
            preds = (logits > 0).astype(int)
        return float(f1_score(_labels_to_indices(y), preds, zero_division=0))

    #: alias used by some callers
    compute = get_primary_metric


class MulticlassBinaryF1Score(_StreamingMetric):
    """Macro-averaged F1 (sklearn_metrics.py:127-181)."""

    def __init__(self, num_classes: Optional[int] = None) -> None:
        super().__init__()
        self.num_classes = num_classes

    def get_primary_metric(self) -> float:
        """Primary scalar score over everything accumulated so far."""
        from sklearn.metrics import f1_score

        logits, y = self._stacked()
        preds = logits.argmax(axis=1)
        return float(f1_score(_labels_to_indices(y), preds, average="macro", zero_division=0))

    #: alias used by some callers
    compute = get_primary_metric


class AveragePrecision(_StreamingMetric):
    """Per-class AP for multilabel problems (beans_metrics.py:126)."""

    def compute_per_class(self) -> np.ndarray:
        """Per-class average precision (NaN for classes with no positives)."""
        from sklearn.metrics import average_precision_score

        logits, y = self._stacked()
        if y.ndim == 1:
            y = np.eye(logits.shape[1], dtype=np.int64)[y.astype(np.int64)]
        scores = 1.0 / (1.0 + np.exp(-logits))
        aps = np.full(y.shape[1], np.nan)
        for c in range(y.shape[1]):
            if y[:, c].sum() > 0:
                aps[c] = average_precision_score(y[:, c], scores[:, c])
        return aps

    def get_primary_metric(self) -> float:
        """Mean AP over classes with positive examples."""
        aps = self.compute_per_class()
        present = aps[~np.isnan(aps)]
        return float(present.mean()) if present.size else 0.0

    #: alias used by some callers
    compute = get_primary_metric


class MeanAveragePrecision(AveragePrecision):
    """mAP over classes with positives (sklearn_metrics.py:244-284,
    beans_metrics.py:261)."""


class ROCAUC(_StreamingMetric):
    """Macro one-vs-rest ROC-AUC (sklearn_metrics.py:335-392)."""

    def get_primary_metric(self) -> float:
        """Primary scalar score over everything accumulated so far."""
        from sklearn.metrics import roc_auc_score

        logits, y = self._stacked()
        try:
            if logits.ndim == 2 and logits.shape[1] > 2:
                yy = y if y.ndim == 2 else np.eye(logits.shape[1])[_labels_to_indices(y)]
                # softmax for a proper probability simplex
                e = np.exp(logits - logits.max(axis=1, keepdims=True))
                probs = e / e.sum(axis=1, keepdims=True)
                value = float(roc_auc_score(yy, probs, average="macro", multi_class="ovr"))
            else:
                scores = logits[:, 1] if logits.ndim == 2 else logits
                value = float(roc_auc_score(_labels_to_indices(y), scores))
        except ValueError:
            return 0.0  # single class present (older sklearn raises)
        # Newer sklearn returns NaN (with a warning) instead of raising for
        # degenerate batches; NaN must not poison best-checkpoint compares.
        return value if np.isfinite(value) else 0.0

    #: alias used by some callers
    compute = get_primary_metric


def get_metric_class(metric_name: str, num_classes: Optional[int] = None):
    """name → metric instance (metric_factory.py:19-48)."""
    metric_map = {
        "accuracy": Accuracy,
        "balanced_accuracy": BalancedAccuracy,
        "binary_f1": BinaryF1Score,
        "multiclass_f1": lambda: MulticlassBinaryF1Score(num_classes),
        "map": MeanAveragePrecision,
        "mAP": MeanAveragePrecision,
        "average_precision": AveragePrecision,
        "roc_auc": ROCAUC,
    }
    if metric_name not in metric_map:
        raise ValueError(f"Unknown metric: {metric_name}")
    cls = metric_map[metric_name]
    return cls() if not isinstance(cls, type) else cls()
