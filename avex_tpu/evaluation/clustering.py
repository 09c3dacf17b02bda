"""Clustering evaluation: KMeans at ground-truth K → ARI / NMI / V-measure.

Counterpart of ``avex/evaluation/clustering.py:20-192``. KMeans stays
host-side sklearn, exactly like the reference — the embeddings come off the
TPU once and clustering cost is negligible next to extraction.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["eval_clustering", "eval_clustering_multi_k"]


def eval_clustering(
    embeddings: np.ndarray,
    labels: np.ndarray,
    n_clusters: Optional[int] = None,
    seed: int = 42,
) -> Dict[str, float]:
    """KMeans at K = #classes (default), scored against ground truth
    (≈ clustering.py:20-114)."""
    from sklearn.cluster import KMeans
    from sklearn.metrics import (
        adjusted_rand_score,
        normalized_mutual_info_score,
        v_measure_score,
    )

    labels = np.asarray(labels)
    if labels.ndim == 2:
        labels = labels.argmax(axis=1)
    k = n_clusters or len(np.unique(labels))
    embeddings = np.asarray(embeddings, dtype=np.float32).reshape(len(labels), -1)
    preds = KMeans(n_clusters=k, random_state=seed, n_init=10).fit_predict(embeddings)
    return {
        "ari": float(adjusted_rand_score(labels, preds)),
        "nmi": float(normalized_mutual_info_score(labels, preds)),
        "v_measure": float(v_measure_score(labels, preds)),
        "n_clusters": float(k),
    }


def eval_clustering_multi_k(
    embeddings: np.ndarray,
    labels: np.ndarray,
    k_values: Sequence[int],
    seed: int = 42,
) -> Dict[int, Dict[str, float]]:
    """Sweep KMeans over multiple K values (≈ clustering.py:114-192)."""
    return {int(k): eval_clustering(embeddings, labels, n_clusters=int(k), seed=seed) for k in k_values}
