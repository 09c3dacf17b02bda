"""Evaluation harness: embedding cache, probes, retrieval, clustering."""

from avex_tpu.evaluation.clustering import eval_clustering, eval_clustering_multi_k
from avex_tpu.evaluation.embedding_cache import (
    HDF5EmbeddingDataset,
    cache_path,
    embedding_cache_matches,
    estimated_cache_bytes,
    extract_embeddings_to_cache,
    load_cached_embeddings,
)
from avex_tpu.evaluation.finetune import (
    FineTuneTrainer,
    train_and_eval_offline,
    train_and_eval_online,
)
from avex_tpu.evaluation.retrieval import eval_retrieval, eval_retrieval_cross_set
