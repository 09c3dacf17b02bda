"""Retrieval evaluation: cosine-similarity ROC-AUC and precision@1.

Counterpart of ``avex/evaluation/retrieval.py`` (:18-45 same-set, :48-89
cross-set). The reference carefully memory-batches the O(N²) similarity on
GPU (:205-588); on TPU the whole thing is one (optionally tiled) matmul on
the MXU — embeddings of 10k×768 are a 0.1 GFLOP blip — with the
AUC/statistics computed host-side via sklearn like the reference.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["eval_retrieval", "eval_retrieval_cross_set", "labels_to_indices"]


def labels_to_indices(labels: np.ndarray) -> np.ndarray:
    """One-hot → index conversion (≈ retrieval.py:97)."""
    labels = np.asarray(labels)
    if labels.ndim == 2:
        return labels.argmax(axis=1)
    return labels.astype(np.int64)


def _cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    # copy: np views of jax arrays are read-only, and callers mutate the
    # diagonal for self-exclusion.
    return np.array(a @ b.T)


def _retrieval_metrics(
    sim: np.ndarray,
    query_labels: np.ndarray,
    db_labels: np.ndarray,
    exclude_self: bool,
) -> Dict[str, float]:
    from sklearn.metrics import roc_auc_score

    n_query = sim.shape[0]
    if exclude_self:
        np.fill_diagonal(sim, -np.inf)

    # precision@1: nearest neighbour shares the query label.
    nearest = sim.argmax(axis=1)
    p_at_1 = float(np.mean(db_labels[nearest] == query_labels))

    # ROC-AUC: same-label pairs as positives, similarity as the score
    # (flattened over all query-db pairs, self-pairs excluded).
    positives = (query_labels[:, None] == db_labels[None, :]).astype(np.int64)
    mask = np.ones_like(sim, dtype=bool)
    if exclude_self:
        np.fill_diagonal(mask, False)
    flat_scores = sim[mask]
    flat_pos = positives[mask]
    if flat_pos.min() == flat_pos.max():
        auc = 0.0
    else:
        auc = float(roc_auc_score(flat_pos, flat_scores))
    return {"roc_auc": auc, "precision_at_1": p_at_1, "num_queries": float(n_query)}


def eval_retrieval(embeddings: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Same-set retrieval: each sample queries every other sample
    (≈ retrieval.py:18-45)."""
    labels = labels_to_indices(labels)
    sim = _cosine_similarity(embeddings, embeddings)
    return _retrieval_metrics(sim, labels, labels, exclude_self=True)


def eval_retrieval_cross_set(
    query_embeddings: np.ndarray,
    query_labels: np.ndarray,
    db_embeddings: np.ndarray,
    db_labels: np.ndarray,
) -> Dict[str, float]:
    """Cross-set retrieval: e.g. train queries against the test database
    (≈ retrieval.py:48-89)."""
    q_labels = labels_to_indices(query_labels)
    d_labels = labels_to_indices(db_labels)
    sim = _cosine_similarity(query_embeddings, db_embeddings)
    return _retrieval_metrics(sim, q_labels, d_labels, exclude_self=False)
