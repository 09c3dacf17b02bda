"""End-to-end multilabel probe training: BCE loss + BEANS-style mAP.

The BEANS north-star axis is multilabel mAP; this drives the full offline
probe path (FineTuneTrainer with multilabel=True) on separable synthetic
embeddings and asserts the probe actually learns (mAP near 1.0, far above
the ~0.5 chance level of balanced multi-hot labels).
"""

import numpy as np

from avex_tpu.configs import ProbeConfig, TrainingParams
from avex_tpu.evaluation.finetune import train_and_eval_offline


def _multilabel_batches(rng, n=96, dim=16, n_classes=4, batch=16):
    """Embeddings where class c is active iff feature c is large: linearly
    separable multilabel data."""
    labels = (rng.random((n, n_classes)) > 0.5).astype(np.float32)
    embs = rng.standard_normal((n, dim)).astype(np.float32) * 0.1
    embs[:, :n_classes] += labels * 2.0
    batches = []
    for s in range(0, n, batch):
        batches.append(
            {"embeddings_0": embs[s : s + batch], "label": labels[s : s + batch]}
        )
    return batches


def test_offline_multilabel_probe_learns_map(rng):
    train = _multilabel_batches(rng)
    test = _multilabel_batches(np.random.default_rng(123))
    metrics, _trainer = train_and_eval_offline(
        ProbeConfig(probe_type="linear"),
        TrainingParams(train_epochs=20, lr=0.05, batch_size=16),
        train,
        test,
        input_dims=[(16,)],
        num_classes=4,
        metrics=("map",),
        multilabel=True,
        seed=0,
    )
    assert "map" in metrics
    assert metrics["map"] > 0.95, metrics
