"""Cross-check our streaming metric implementations against scikit-learn.

Counterpart of the reference's ``test_metrics_consistency.py`` (which
cross-checks its two metric implementations): every metric here is validated
against the corresponding sklearn function on random logits/labels, including
the NaN-per-class handling of mAP.
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as skm  # noqa: E402

from avex_tpu.metrics import get_metric_class  # noqa: E402


@pytest.fixture
def multiclass(rng):
    n, c = 200, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, n)
    return logits, labels, c


def test_accuracy_matches_sklearn(multiclass):
    logits, labels, c = multiclass
    metric = get_metric_class("accuracy", c)
    metric.update(logits[:100], labels[:100])  # streaming in two chunks
    metric.update(logits[100:], labels[100:])
    expected = skm.accuracy_score(labels, logits.argmax(axis=1))
    assert metric.get_primary_metric() == pytest.approx(expected, abs=1e-9)


def test_balanced_accuracy_matches_sklearn(multiclass):
    logits, labels, c = multiclass
    metric = get_metric_class("balanced_accuracy", c)
    metric.update(logits, labels)
    expected = skm.balanced_accuracy_score(labels, logits.argmax(axis=1))
    assert metric.get_primary_metric() == pytest.approx(expected, abs=1e-9)


def test_binary_f1_matches_sklearn(rng):
    logits = rng.standard_normal((150, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 150)
    metric = get_metric_class("binary_f1", 2)
    metric.update(logits, labels)
    expected = skm.f1_score(labels, logits.argmax(axis=1))
    assert metric.get_primary_metric() == pytest.approx(expected, abs=1e-9)


def test_macro_f1_matches_sklearn(multiclass):
    logits, labels, c = multiclass
    metric = get_metric_class("multiclass_f1", c)
    metric.update(logits, labels)
    expected = skm.f1_score(labels, logits.argmax(axis=1), average="macro")
    assert metric.get_primary_metric() == pytest.approx(expected, abs=1e-9)


def test_map_matches_sklearn_multilabel(rng):
    n, c = 120, 6
    scores = rng.standard_normal((n, c)).astype(np.float32)
    targets = (rng.random((n, c)) < 0.3).astype(np.float32)
    targets[:, -1] = 0.0  # one class with no positives -> excluded from mean
    metric = get_metric_class("map", c)
    metric.update(scores, targets)
    per_class = [
        skm.average_precision_score(targets[:, j], scores[:, j])
        for j in range(c - 1)
    ]
    assert metric.get_primary_metric() == pytest.approx(np.mean(per_class), abs=1e-6)


def test_roc_auc_matches_sklearn(rng):
    scores = rng.standard_normal((180, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 180)
    metric = get_metric_class("roc_auc", 2)
    metric.update(scores, labels)
    import scipy.special

    probs = scipy.special.softmax(scores, axis=1)[:, 1]
    expected = skm.roc_auc_score(labels, probs)
    # our implementation may use raw scores; AUC is rank-based so softmax of
    # the positive-class logit and the logit itself give the same ordering
    # only when using the same column — allow either convention within 1e-6
    got = metric.get_primary_metric()
    alt = skm.roc_auc_score(labels, scores[:, 1])
    assert got == pytest.approx(expected, abs=1e-6) or got == pytest.approx(alt, abs=1e-6)


def test_map_boundary_values(rng):
    """Perfect ranking -> mAP 1.0; classes with no positives are excluded
    (NaN-skipped), matching BEANS semantics."""
    from avex_tpu.metrics import get_metric_class

    targets = np.zeros((6, 3), np.float32)
    targets[:3, 0] = 1.0
    targets[3:, 1] = 1.0  # class 2 never positive
    perfect = targets * 10.0 - 5.0

    metric = get_metric_class("mAP", num_classes=3)
    metric.update(perfect, targets)
    assert metric.get_primary_metric() == pytest.approx(1.0)


def test_roc_auc_single_class_returns_zero(rng):
    """Degenerate batches (one class only) return 0.0 instead of raising —
    streaming evaluation must survive skewed eval splits."""
    from avex_tpu.metrics import get_metric_class

    metric = get_metric_class("roc_auc", num_classes=2)
    logits = rng.standard_normal((4, 2)).astype(np.float32)
    metric.update(logits, np.zeros(4, np.int64))
    assert metric.get_primary_metric() == 0.0


def test_streaming_updates_equal_single_batch(multiclass):
    """Metric state accumulates across update() calls: two half-batches give
    the same value as one full batch (the reference's .update contract)."""
    from avex_tpu.metrics import get_metric_class

    logits, targets, c = multiclass
    whole = get_metric_class("accuracy", num_classes=c)
    whole.update(logits, targets)
    halves = get_metric_class("accuracy", num_classes=c)
    mid = len(targets) // 2
    halves.update(logits[:mid], targets[:mid])
    halves.update(logits[mid:], targets[mid:])
    assert whole.get_primary_metric() == pytest.approx(halves.get_primary_metric())


def test_unknown_metric_raises():
    from avex_tpu.metrics import get_metric_class

    with pytest.raises((KeyError, ValueError)):
        get_metric_class("no_such_metric", num_classes=2)
