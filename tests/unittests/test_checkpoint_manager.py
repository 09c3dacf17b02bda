"""CheckpointManager lifecycle: named variants, metadata, rolling swap, load.

Direct unit coverage of avex_tpu/training/checkpoint.py, mirroring the
reference's CheckpointManager suite semantics
(reference avex/training/checkpoint_manager.py:37-263: best/periodic/final
names, epoch/step/best_val_acc metadata, overwrite-in-place).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.training.checkpoint import CheckpointManager
from avex_tpu.training.clustering_evaluator import ClusteringEvaluator
from avex_tpu.configs import ClusteringEvalConfig


def _params(value=1.0):
    return {"dense": {"kernel": jnp.full((4, 3), value), "bias": jnp.zeros(3)}}


def test_save_load_roundtrip_with_metadata(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best_model", _params(2.5), step=17, epoch=3, best_val_acc=0.91)
    payload = mgr.load("best_model")
    np.testing.assert_allclose(payload["params"]["dense"]["kernel"], 2.5)
    assert payload["step"] == 17
    assert payload["epoch"] == 3
    assert payload["best_val_acc"] == pytest.approx(0.91)


def test_named_variants_and_epoch_resume_convention(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_best(params=_params())
    mgr.save_final(params=_params())
    mgr.save_epoch(4, params=_params())
    assert mgr.exists("best_model")
    assert mgr.exists("final_model")
    assert mgr.exists("checkpoint_epoch_4")
    # epoch N complete → meta records N+1 as the next epoch to run
    meta = json.loads((tmp_path / "checkpoint_epoch_4.meta.json").read_text())
    assert meta["epoch"] == 5


def test_overwrite_replaces_previous_payload(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best_model", _params(1.0), best_val_acc=0.5)
    mgr.save("best_model", _params(9.0), best_val_acc=0.8)
    payload = mgr.load("best_model")
    np.testing.assert_allclose(payload["params"]["dense"]["kernel"], 9.0)
    assert payload["best_val_acc"] == pytest.approx(0.8)


def test_rolling_save_swaps_and_leaves_no_next(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_rolling("latest", params=_params(1.0), step=10)
    mgr.save_rolling("latest", params=_params(2.0), step=20)
    assert mgr.exists("latest")
    assert not mgr.exists("latest_next")
    payload = mgr.load("latest")
    np.testing.assert_allclose(payload["params"]["dense"]["kernel"], 2.0)
    assert payload["step"] == 20


def test_load_with_template_preserves_dtypes(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    params = {"w": jnp.ones((2, 2), jnp.bfloat16)}
    mgr.save("bf16", params)
    restored = mgr.load("bf16", template={"params": {"w": np.zeros((2, 2), jnp.bfloat16)}})
    assert restored["params"]["w"].dtype == jnp.bfloat16


def test_extra_meta_merges_into_sidecar(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("step_ckpt", _params(), step=5, extra_meta={"step_in_epoch": 3})
    payload = mgr.load("step_ckpt")
    assert payload["step_in_epoch"] == 3


# ---------------------------------------------------------------------------
# ClusteringEvaluator cadence + evaluation over a fake model
# ---------------------------------------------------------------------------


class _EmbedModel:
    def register_hooks_for_layers(self, layers):
        self.layers = layers

    def extract_embeddings(self, wav, padding_mask=None, aggregation="mean"):
        # deterministic, label-separable embeddings: one hot corner per label
        return np.asarray(wav)[:, :4]


def _loader(n_batches=3, batch=50):
    rng = np.random.default_rng(0)
    for _ in range(n_batches):
        labels = rng.integers(0, 2, size=batch)
        wav = np.zeros((batch, 8), np.float32)
        wav[np.arange(batch), labels] = 10.0
        yield {"raw_wav": wav, "label": labels}


def test_clustering_evaluator_cadence():
    cfg = ClusteringEvalConfig(enabled=True, frequency=3, run_before_training=True)
    ev = ClusteringEvaluator(_EmbedModel(), cfg, loader=[], num_classes=2)
    assert ev.should_run(-1)  # pre-training probe enabled
    assert [ev.should_run(e) for e in range(6)] == [False, False, True, False, False, True]

    disabled = ClusteringEvalConfig(enabled=False)
    assert not ClusteringEvaluator(_EmbedModel(), disabled, [], 2).should_run(2)


def test_clustering_evaluator_max_samples_and_metrics():
    cfg = ClusteringEvalConfig(enabled=True, frequency=1, max_samples=100)
    ev = ClusteringEvaluator(_EmbedModel(), cfg, loader=_loader(), num_classes=2)
    metrics = ev.evaluate()
    # perfectly separable embeddings cluster perfectly
    assert metrics["ari"] == pytest.approx(1.0)
    assert metrics["n_clusters"] == 2.0
