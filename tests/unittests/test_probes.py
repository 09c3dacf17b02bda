"""Probe system: shape planning, projectors, layer weights, all five heads."""

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import PROBE_CONFIGS, ModelSpec, ProbeConfig
from avex_tpu.probes import Probe, build_probe_from_config, make_probe_plan


def _tiny_backbone(num_classes=None):
    spec = ModelSpec(
        name="beats",
        pretrained=False,
        init_config={
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 96,
            "encoder_attention_heads": 4,
            "embed_dim": 32,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "encoder_layerdrop": 0.0,
        },
        audio_config={"representation": "raw", "normalize": False, "target_length_seconds": 1},
    )
    return avex_tpu.build_model_from_spec(spec, num_classes=num_classes)


def test_plan_2d_majority_and_max():
    plan = make_probe_plan(2, [(64,), (64,), (32,)])
    assert plan.target_feat == 64
    assert plan.needs_projector == (False, False, True)
    plan = make_probe_plan(2, [(64,), (32,)])  # no majority -> max
    assert plan.target_feat == 64


def test_plan_3d_seq_alignment():
    plan = make_probe_plan(3, [(10, 64), (20, 64)])
    assert plan.target_feat == 64
    assert plan.target_seq == 10


@pytest.mark.parametrize("probe_type", ["linear", "mlp", "lstm", "attention", "transformer"])
def test_offline_probe_each_head(probe_type, rng):
    cfg = PROBE_CONFIGS[probe_type].model_copy()
    probe = build_probe_from_config(cfg, num_classes=5, input_dim=(12, 32))
    embs = rng.standard_normal((3, 12, 32)).astype(np.float32)
    logits = probe(embs)
    assert logits.shape == (3, 5)


def test_offline_probe_int_input_dim(rng):
    probe = build_probe_from_config(ProbeConfig(probe_type="linear"), num_classes=4, input_dim=257)
    embs = rng.standard_normal((2, 257)).astype(np.float32)
    assert probe(embs).shape == (2, 4)


def test_online_probe_single_layer(rng):
    backbone = _tiny_backbone()
    cfg = ProbeConfig(probe_type="linear", target_layers=["last_layer"], aggregation="mean")
    probe = build_probe_from_config(cfg, num_classes=3, base_model=backbone)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    logits = probe(wav)
    assert logits.shape == (2, 3)


def test_online_probe_multi_layer_concat(rng):
    """aggregation='mean' + multi-layer → pooled layers concatenate into one
    feature vector (base_model.py:449-453), no projectors/layer weights."""
    backbone = _tiny_backbone()
    cfg = ProbeConfig(probe_type="linear", target_layers=["all"], aggregation="mean")
    probe = build_probe_from_config(cfg, num_classes=3, base_model=backbone)
    assert "layer_weights" not in probe.variables["params"]
    assert probe.plan.input_shapes == ((64 * 3,),)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    assert probe(wav).shape == (2, 3)


def test_online_probe_multi_layer_weights(rng):
    """aggregation='none' + multi-layer → per-layer list with learned softmax
    layer weights (base_probes.py:150, :197-206)."""
    backbone = _tiny_backbone()
    cfg = ProbeConfig(probe_type="attention", target_layers=["all"], aggregation="none",
                      num_heads=4, num_layers=1, input_processing="sequence")
    probe = build_probe_from_config(cfg, num_classes=3, base_model=backbone)
    assert "layer_weights" in probe.variables["params"]
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    assert probe(wav).shape == (2, 3)
    table = probe.get_learned_weights_table()
    assert "Learned Layer Weights" in table
    assert "Number of layers: 3" in table


def test_online_probe_sequence_head(rng):
    backbone = _tiny_backbone()
    cfg = ProbeConfig(
        probe_type="attention",
        target_layers=["all"],
        aggregation="none",
        num_heads=4,
        num_layers=1,
        input_processing="sequence",
    )
    probe = build_probe_from_config(cfg, num_classes=3, base_model=backbone)
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    assert probe(wav).shape == (2, 3)


def test_probe_online_xor_offline():
    with pytest.raises(ValueError, match="exactly one"):
        build_probe_from_config(ProbeConfig(), num_classes=2)
    with pytest.raises(ValueError, match="exactly one"):
        build_probe_from_config(
            ProbeConfig(), num_classes=2, base_model=object(), input_dim=3
        )


def test_probe_gradients_flow_only_through_head(rng):
    """stop_gradient on frozen backbone: grads w.r.t. probe params exist."""
    import jax
    import jax.numpy as jnp

    probe = build_probe_from_config(
        ProbeConfig(probe_type="mlp", hidden_dims=[16]), num_classes=2, input_dim=(8, 16)
    )
    embs = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
    labels = jnp.array([0, 1, 0, 1])

    def loss_fn(variables):
        logits = probe.apply(variables, embs)
        onehot = jax.nn.one_hot(labels, 2)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    grads = jax.grad(loss_fn)(probe.variables)
    leaf_norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in leaf_norms)


def test_list_probe_classes():
    from avex_tpu.probes import list_probe_classes

    assert set(list_probe_classes()) >= {"linear", "mlp", "lstm", "attention", "transformer"}


def test_learned_weights_table(rng):
    """get_learned_weights_table renders the softmax mixture
    (≈ base_probes.py:208-241); single-layer probes report the no-weights
    message."""
    multi = build_probe_from_config(
        ProbeConfig(probe_type="linear"), num_classes=3, input_dim=[(8,), (8,)]
    )
    table = multi.get_learned_weights_table()
    assert "Learned Layer Weights" in table and "Layer_0" in table and "Layer_1" in table
    assert "Number of layers: 2" in table

    single = build_probe_from_config(
        ProbeConfig(probe_type="linear"), num_classes=3, input_dim=8
    )
    assert "does not use weighted sum" in single.get_learned_weights_table()


@pytest.mark.slow
def test_frozen_backbone_gets_zero_gradients(rng):
    """Gradient-flow contract: with freeze_backbone=True the backbone sits
    behind stop_gradient (finetune.py:124-125) — its grads are exactly zero
    even if its params are (wrongly) handed to the optimizer — and the
    FineTuneTrainer excludes it from the trainable tree structurally."""
    import jax
    import jax.numpy as jnp

    from avex_tpu.configs import TrainingParams
    from avex_tpu.evaluation.finetune import FineTuneTrainer

    backbone = _tiny_backbone()
    cfg = ProbeConfig(
        probe_type="linear", target_layers=["last_layer"], aggregation="mean",
        freeze_backbone=True,
    )
    probe = build_probe_from_config(cfg, num_classes=3, base_model=backbone)
    trainer = FineTuneTrainer(
        probe, TrainingParams(train_epochs=1, lr=1e-3, batch_size=2), mode="online"
    )
    assert set(trainer._trainable) == {"probe"}  # backbone structurally excluded

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    labels = np.array([0, 2])
    batch = {"raw_wav": wav, "label": labels}

    def loss_fn(trainable):
        logits = trainer._forward(trainable, batch, False, None)
        onehot = jax.nn.one_hot(batch["label"], logits.shape[-1])
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    # Even when backbone params ARE in the tree, stop_gradient zeroes them.
    trainable = {
        "probe": probe.variables["params"],
        "backbone": backbone.variables["params"],
    }
    grads = jax.grad(loss_fn)(trainable)
    backbone_norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads["backbone"])]
    probe_norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads["probe"])]
    assert max(backbone_norms) == 0.0, "frozen backbone received gradients"
    assert max(probe_norms) > 0.0, "probe head received no gradients"


@pytest.mark.slow
def test_unfrozen_backbone_gets_gradients(rng):
    """freeze_backbone=False joint fine-tuning: backbone grads flow."""
    import jax
    import jax.numpy as jnp

    from avex_tpu.configs import TrainingParams
    from avex_tpu.evaluation.finetune import FineTuneTrainer

    backbone = _tiny_backbone()
    cfg = ProbeConfig(
        probe_type="linear", target_layers=["last_layer"], aggregation="mean",
        freeze_backbone=False,
    )
    probe = build_probe_from_config(cfg, num_classes=3, base_model=backbone)
    trainer = FineTuneTrainer(
        probe, TrainingParams(train_epochs=1, lr=1e-3, batch_size=2), mode="online"
    )
    assert set(trainer._trainable) == {"probe", "backbone"}

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    batch = {"raw_wav": wav, "label": np.array([0, 2])}

    def loss_fn(trainable):
        logits = trainer._forward(trainable, batch, False, None)
        onehot = jax.nn.one_hot(batch["label"], logits.shape[-1])
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, axis=-1))

    grads = jax.grad(loss_fn)(trainer._trainable)
    backbone_max = max(
        float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads["backbone"])
    )
    assert backbone_max > 0.0, "unfrozen backbone received no gradients"
