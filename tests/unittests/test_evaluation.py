"""Evaluation components: embedding cache, retrieval, clustering metrics."""

import numpy as np
import pytest

from avex_tpu.evaluation import (
    HDF5EmbeddingDataset,
    embedding_cache_matches,
    estimated_cache_bytes,
    eval_clustering,
    eval_retrieval,
    eval_retrieval_cross_set,
    extract_embeddings_to_cache,
    load_cached_embeddings,
)


class _FakeModel:
    """Minimal ModelBase-alike yielding deterministic embeddings."""

    def __init__(self, layers=("layer_a",)):
        self._hook_layers = list(layers)

    def register_hooks_for_layers(self, layers):
        self._hook_layers = list(layers)
        return self._hook_layers

    def extract_embeddings(self, wav, padding_mask=None, aggregation="none"):
        outs = []
        for i, _name in enumerate(self._hook_layers):
            outs.append(np.asarray(wav)[:, :8].astype(np.float32) + i)
        return outs if len(outs) > 1 else outs[0]


def _loader(n_batches=3, batch=4):
    rng = np.random.default_rng(0)
    for b in range(n_batches):
        yield {
            "raw_wav": rng.standard_normal((batch, 16)).astype(np.float32),
            "label": np.arange(batch) + b * batch,
        }


def test_cache_roundtrip_and_validation(tmp_path):
    model = _FakeModel()
    path = tmp_path / "emb.h5"
    extract_embeddings_to_cache(model, _loader(), path, aggregation="mean", layers=["layer_a"])
    assert embedding_cache_matches(path, "mean", ["layer_a"])
    assert not embedding_cache_matches(path, "none", ["layer_a"])
    assert not embedding_cache_matches(path, "mean", ["other"])

    embs, labels, meta = load_cached_embeddings(path)
    assert len(embs) == 1 and embs[0].shape == (12, 8)
    assert labels.shape == (12,)
    np.testing.assert_array_equal(labels, np.arange(12))
    assert meta["aggregation"] == "mean"
    assert estimated_cache_bytes(path) > 0

    ds = HDF5EmbeddingDataset(path)
    assert len(ds) == 12
    item = ds[3]
    np.testing.assert_allclose(item["embeddings_0"], embs[0][3])

    import pickle

    ds2 = pickle.loads(pickle.dumps(ds))  # worker-safe
    np.testing.assert_allclose(ds2[5]["embeddings_0"], embs[0][5])


def test_multi_layer_cache(tmp_path):
    model = _FakeModel(layers=("a", "b"))
    path = tmp_path / "emb2.h5"
    extract_embeddings_to_cache(model, _loader(), path, aggregation="none", layers=["a", "b"])
    embs, _labels, meta = load_cached_embeddings(path)
    assert len(embs) == 2
    assert bool(meta["multi_layer"]) is True
    np.testing.assert_allclose(embs[1], embs[0] + 1)


def test_retrieval_perfectly_separable():
    rng = np.random.default_rng(0)
    centers = np.eye(4) * 10
    labels = np.repeat(np.arange(4), 8)
    embs = centers[labels] + rng.standard_normal((32, 4)) * 0.05
    metrics = eval_retrieval(embs, labels)
    assert metrics["precision_at_1"] == 1.0
    assert metrics["roc_auc"] > 0.99


def test_retrieval_one_hot_labels_and_cross_set():
    rng = np.random.default_rng(0)
    labels = np.repeat(np.arange(3), 6)
    one_hot = np.eye(3)[labels]
    embs = np.eye(3)[labels] * 5 + rng.standard_normal((18, 3)) * 0.1
    same = eval_retrieval(embs, one_hot)
    cross = eval_retrieval_cross_set(embs, one_hot, embs, labels)
    assert same["precision_at_1"] == 1.0
    assert cross["precision_at_1"] == 1.0  # self included in cross-set


def test_clustering_separable():
    rng = np.random.default_rng(0)
    labels = np.repeat(np.arange(3), 10)
    embs = np.eye(3)[labels] * 10 + rng.standard_normal((30, 3)) * 0.1
    metrics = eval_clustering(embs, labels)
    assert metrics["ari"] > 0.95
    assert metrics["nmi"] > 0.95
    assert metrics["n_clusters"] == 3


@pytest.mark.slow  # two full-cache extractions (~45 s)
def test_mesh_sharded_extraction_matches_single_device(tmp_path):
    """Data-parallel extraction over the 8-device CPU mesh writes the same
    cache as single-device extraction, including a remainder batch that
    cannot shard evenly (it replicates instead)."""
    import jax

    from avex_tpu.models.beats import BEATsConfig, BEATsModel
    from avex_tpu.models.beats import Model as BEATsWrapper
    from avex_tpu.parallel import make_mesh

    model = BEATsWrapper(
        pretrained=False,
        init_config=dict(
            encoder_layers=1,
            encoder_embed_dim=64,
            encoder_ffn_embed_dim=128,
            encoder_attention_heads=4,
            embed_dim=32,
        ),
        return_features_only=True,
    )
    model.register_hooks_for_layers(["last_layer"])

    rng = np.random.default_rng(5)
    batches = [
        {"raw_wav": rng.standard_normal((8, 16000)).astype(np.float32) * 0.1,
         "label": np.arange(8)},
        {"raw_wav": rng.standard_normal((3, 16000)).astype(np.float32) * 0.1,
         "label": np.arange(3)},  # remainder: not divisible by 8 devices
    ]

    single = tmp_path / "single.h5"
    extract_embeddings_to_cache(model, iter(batches), single, aggregation="mean")

    assert jax.device_count() == 8  # conftest pins the virtual CPU mesh
    sharded = tmp_path / "sharded.h5"
    extract_embeddings_to_cache(
        model, iter(batches), sharded, aggregation="mean", mesh=make_mesh()
    )

    embs_a, labels_a, _ = load_cached_embeddings(single)
    embs_b, labels_b, _ = load_cached_embeddings(sharded)
    np.testing.assert_array_equal(labels_a, labels_b)
    assert embs_a[0].shape == embs_b[0].shape == (11, 64)
    np.testing.assert_allclose(embs_a[0], embs_b[0], rtol=1e-5, atol=1e-6)
