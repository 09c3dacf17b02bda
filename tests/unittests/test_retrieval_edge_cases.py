"""Retrieval/clustering edge-case coverage.

Mirrors the reference's dedicated retrieval suites
(reference tests/unittests/test_retrieval_eval.py,
tests/integration/test_eval_retrieval.py,
tests/unittests/test_clustering_eval.py) on constructed geometries where the
right answer is known in closed form.
"""

import numpy as np
import pytest

from avex_tpu.evaluation import (
    eval_clustering,
    eval_clustering_multi_k,
    eval_retrieval,
    eval_retrieval_cross_set,
)
from avex_tpu.evaluation.retrieval import labels_to_indices


def test_labels_to_indices_one_hot_and_int():
    onehot = np.eye(4)[[2, 0, 3]]
    assert labels_to_indices(onehot).tolist() == [2, 0, 3]
    assert labels_to_indices(np.asarray([1, 1, 0])).tolist() == [1, 1, 0]


def test_self_exclusion_changes_the_answer():
    # Three points: a and b nearly identical but different labels; c far away
    # with a's label. With self-pairs allowed every query would trivially
    # retrieve itself; with exclusion, a retrieves b (wrong label).
    embs = np.asarray(
        [[1.0, 0.0], [0.999, 0.045], [0.0, 1.0]],
        np.float32,
    )
    labels = np.asarray([0, 1, 0])
    same = eval_retrieval(embs, labels)
    # a→b (wrong), b→a (wrong), c→? c·a = 0, c·b ≈ 0.045 → b (wrong)
    assert same["precision_at_1"] == pytest.approx(0.0)

    # The identical geometry as a cross-set task (query set == db set, but no
    # self-exclusion) is solved perfectly: every query retrieves itself.
    cross = eval_retrieval_cross_set(embs, labels, embs, labels)
    assert cross["precision_at_1"] == pytest.approx(1.0)


def test_degenerate_single_label_auc_is_zero():
    # All pairs positive → ROC-AUC undefined; the contract (matching the
    # reference's guard) is 0.0, with precision@1 still meaningful.
    embs = np.asarray([[1.0, 0.0], [0.9, 0.1], [0.8, 0.2]], np.float32)
    labels = np.zeros(3, np.int64)
    out = eval_retrieval(embs, labels)
    assert out["roc_auc"] == 0.0
    assert out["precision_at_1"] == pytest.approx(1.0)
    assert out["num_queries"] == 3.0


def test_cross_set_asymmetric_sizes():
    rng = np.random.default_rng(0)
    # db: two tight clusters on orthogonal axes; queries near each cluster.
    db = np.concatenate(
        [
            rng.normal([10, 0], 0.1, size=(8, 2)),
            rng.normal([0, 10], 0.1, size=(8, 2)),
        ]
    ).astype(np.float32)
    db_labels = np.asarray([0] * 8 + [1] * 8)
    queries = np.asarray([[9.0, 0.5], [0.5, 9.0], [11.0, -0.2]], np.float32)
    q_labels = np.asarray([0, 1, 0])
    out = eval_retrieval_cross_set(queries, q_labels, db, db_labels)
    assert out["precision_at_1"] == pytest.approx(1.0)
    assert out["roc_auc"] > 0.99
    assert out["num_queries"] == 3.0


def test_retrieval_scale_invariance():
    # Cosine similarity must ignore embedding norms: scaling rows arbitrarily
    # leaves every metric unchanged.
    rng = np.random.default_rng(1)
    embs = rng.standard_normal((20, 6)).astype(np.float32)
    labels = rng.integers(0, 3, size=20)
    scales = rng.uniform(0.01, 100, size=(20, 1)).astype(np.float32)
    base = eval_retrieval(embs, labels)
    scaled = eval_retrieval(embs * scales, labels)
    assert base["roc_auc"] == pytest.approx(scaled["roc_auc"], abs=1e-6)
    assert base["precision_at_1"] == pytest.approx(scaled["precision_at_1"])


def test_clustering_accepts_one_hot_and_flattens_higher_dims():
    rng = np.random.default_rng(2)
    embs = np.concatenate(
        [
            rng.normal(-5, 0.2, size=(10, 3, 4)),
            rng.normal(5, 0.2, size=(10, 3, 4)),
        ]
    ).astype(np.float32)
    onehot = np.eye(2)[[0] * 10 + [1] * 10]
    out = eval_clustering(embs, onehot)
    assert out["ari"] == pytest.approx(1.0)
    assert out["nmi"] == pytest.approx(1.0)
    assert out["n_clusters"] == 2.0


def test_clustering_multi_k_sweep():
    rng = np.random.default_rng(3)
    embs = np.concatenate(
        [rng.normal(c * 8, 0.3, size=(12, 5)) for c in range(3)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 12)
    sweep = eval_clustering_multi_k(embs, labels, k_values=[2, 3, 6])
    assert set(sweep) == {2, 3, 6}
    for k, metrics in sweep.items():
        assert metrics["n_clusters"] == float(k)
    # ground-truth K scores best on ARI
    assert sweep[3]["ari"] >= sweep[2]["ari"]
    assert sweep[3]["ari"] >= sweep[6]["ari"]
    assert sweep[3]["ari"] == pytest.approx(1.0)


def test_clustering_is_seed_deterministic():
    rng = np.random.default_rng(4)
    embs = rng.standard_normal((30, 4)).astype(np.float32)
    labels = rng.integers(0, 3, size=30)
    a = eval_clustering(embs, labels, seed=7)
    b = eval_clustering(embs, labels, seed=7)
    assert a == b
