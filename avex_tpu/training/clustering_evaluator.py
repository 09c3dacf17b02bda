"""During-training clustering evaluation.

Counterpart of ``avex/training/clustering_evaluator.py:23``: every N epochs,
extract embeddings for (a subset of) the validation set and score KMeans
clustering at ground-truth K (ARI/NMI/V-measure) — a label-free view of
representation quality while supervised training runs.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, List

import numpy as np

from avex_tpu.configs import ClusteringEvalConfig
from avex_tpu.evaluation.clustering import eval_clustering

logger = logging.getLogger(__name__)


class ClusteringEvaluator:
    """Periodic clustering probe over model embeddings."""

    def __init__(
        self,
        model,
        config: ClusteringEvalConfig,
        loader: Iterable,
        num_classes: int,
        seed: int = 42,
    ) -> None:
        self.model = model
        self.config = config
        self.loader = loader
        self.num_classes = num_classes
        self.seed = seed
        self.model.register_hooks_for_layers([config.layers])

    def should_run(self, epoch: int) -> bool:
        """Whether the clustering probe fires for this epoch (-1 = pre-training)."""
        if not self.config.enabled:
            return False
        if epoch < 0:
            return self.config.run_before_training
        return (epoch + 1) % self.config.frequency == 0

    def evaluate(self) -> Dict[str, float]:
        """Extract embeddings and score KMeans clustering."""
        embeddings: List[np.ndarray] = []
        labels: List[np.ndarray] = []
        seen = 0
        for batch in self.loader:
            emb = self.model.extract_embeddings(
                batch["raw_wav"],
                padding_mask=batch.get("padding_mask"),
                aggregation="mean",
            )
            embeddings.append(np.asarray(emb))
            labels.append(np.asarray(batch["label"]))
            seen += embeddings[-1].shape[0]
            if self.config.max_samples and seen >= self.config.max_samples:
                break
        embs = np.concatenate(embeddings)[: self.config.max_samples or None]
        labs = np.concatenate(labels)[: self.config.max_samples or None]
        metrics = eval_clustering(embs, labs, n_clusters=self.num_classes, seed=self.seed)
        logger.info("clustering eval: %s", metrics)
        return metrics
