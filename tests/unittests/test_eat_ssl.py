"""EAT-SSL: masked prediction losses, EMA teacher, end-to-end SSL training."""

import numpy as np
import pytest

import jax

from avex_tpu.configs import (
    DatasetCollectionConfig,
    DatasetConfig,
    ModelSpec,
    RunConfig,
    TrainingParams,
)
from avex_tpu.data import build_dataloaders
from avex_tpu.models.eat_ssl import Model as EATSSLModel, ema_update
from avex_tpu.training import Trainer


def _tiny_ssl_model():
    return EATSSLModel(
        eat_cfg={
            "dim": 32,
            "depth": 2,
            "heads": 4,
            "decoder_dim": 32,
            "decoder_depth": 1,
            "mask_ratio": 0.75,
            "target_layers": 2,
            "target_length": 128,
        },
        seed=0,
    )


@pytest.mark.slow
def test_ssl_forward_reports_losses(rng):
    model = _tiny_ssl_model()
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    out, _aux = model.module.apply(
        model.variables,
        wav,
        deterministic=False,
        rngs={"mask": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    )
    assert "regression" in out["losses"]
    assert np.isfinite(float(out["losses"]["regression"]))
    assert out["sample_size"] > 0


def test_ema_update_moves_teacher_toward_student():
    model = _tiny_ssl_model()
    params = jax.device_get(model.variables["params"])
    # Perturb the student; teacher starts equal.
    params["student"] = jax.tree_util.tree_map(lambda x: x + 1.0, params["student"])
    updated = ema_update(params, decay=0.9)
    s_leaf = jax.tree_util.tree_leaves(params["student"])[0]
    t_leaf = jax.tree_util.tree_leaves(updated["teacher"])[0]
    orig_t = jax.tree_util.tree_leaves(params["teacher"])[0]
    np.testing.assert_allclose(
        np.asarray(t_leaf), 0.9 * np.asarray(orig_t) + 0.1 * np.asarray(s_leaf), atol=1e-5
    )


@pytest.mark.slow
def test_ssl_training_loop(tmp_path):
    """self_supervised label type trains; teacher stays off the optimizer."""
    config = RunConfig(
        model_spec=ModelSpec(name="beats", pretrained=False),  # placeholder spec
        training_params=TrainingParams(train_epochs=2, lr=1e-3, batch_size=4,
                                       weight_decay=0.01),
        dataset_config=DatasetCollectionConfig(
            train_datasets=[DatasetConfig(name="s", kind="synthetic", num_samples=16,
                                          num_classes=2)]
        ),
        output_dir=str(tmp_path / "ssl"),
        label_type="self_supervised",
        metrics=["accuracy"],
        seed=0,
        num_workers=0,
    )
    train_loader, _v, _t, _lm, _nc = build_dataloaders(config)
    model = _tiny_ssl_model()
    trainer = Trainer(model, config, train_loader)

    teacher_before = jax.device_get(trainer.state.params["teacher"])
    student_before = jax.device_get(trainer.state.params["student"])
    result = trainer.train()
    assert len(result["history"]) == 2
    losses = [h["train"]["loss"] for h in result["history"]]
    assert all(np.isfinite(l) for l in losses)

    student_after = jax.device_get(trainer.state.params["student"])
    teacher_after = jax.device_get(trainer.state.params["teacher"])
    # Student trained; teacher moved via EMA (not frozen, not optimized).
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(student_before),
                        jax.tree_util.tree_leaves(student_after))
    )
    assert any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(teacher_before),
                        jax.tree_util.tree_leaves(teacher_after))
    )
