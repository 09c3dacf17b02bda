"""Sequence parallelism (parallel/sequence.py): Megatron-SP activation
sharding through the scanned encoder, and the Trainer-level
``mesh.sequence_parallel`` knob. GSPMD sharding never changes values, so the
oracle is bit-equality with the plain path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.parallel import make_mesh
from avex_tpu.parallel.sequence import make_sequence_parallel_runner

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def test_sequence_parallel_beats_forward_is_bit_exact(rng):
    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    cfg = BEATsConfig(
        encoder_layers=4,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        embed_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
        scan_layers=True,
    )
    model = BEATsBackbone(cfg=cfg, dtype=jnp.float32)
    wav = jnp.asarray(rng.standard_normal((8, 16000)).astype(np.float32) * 0.1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wav[:2])
    ref, _ = jax.jit(lambda v, w: model.apply(v, w))(variables, wav)

    mesh = make_mesh(data=2, model=4)
    sp = BEATsBackbone(
        cfg=cfg, dtype=jnp.float32, layer_runner=make_sequence_parallel_runner(mesh)
    )
    out, _ = jax.jit(lambda v, w: sp.apply(v, w))(variables, wav)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow  # two Trainer builds (~24 s; round-5 re-tier)
def test_trainer_sequence_parallel_step_matches_single_device(monkeypatch):
    monkeypatch.setenv("AVEX_TPU_DONATE", "0")
    from tests.unittests.test_pipeline import _pipeline_run_config

    from avex_tpu.configs import MeshConfig
    from avex_tpu.data import build_dataloaders
    from avex_tpu.models.factory import build_model_from_spec
    from avex_tpu.parallel import shard_batch
    from avex_tpu.training import Trainer

    config = _pipeline_run_config(data=2, model_axis=4, micro=0)
    config = config.model_copy(
        update={"mesh": MeshConfig(data=2, model=4, sequence_parallel=True)}
    )
    mesh = make_mesh(data=2, model=4)
    loader, _v, _t, _lm, num_classes = build_dataloaders(config)
    model = build_model_from_spec(config.model_spec, num_classes=num_classes)
    trainer = Trainer(model, config, loader, mesh=mesh)
    batch = next(iter(loader))
    state, loss, _ = trainer._train_step(trainer.state, shard_batch(batch, mesh))
    jax.block_until_ready(state.params)

    solo_config = _pipeline_run_config(data=1, model_axis=1, micro=0)
    solo_mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    solo_model = build_model_from_spec(solo_config.model_spec, num_classes=num_classes)
    solo = Trainer(solo_model, solo_config, loader, mesh=solo_mesh)
    _s, solo_loss, _m = solo._train_step(solo.state, shard_batch(batch, solo_mesh))
    np.testing.assert_allclose(float(loss), float(solo_loss), rtol=1e-4, atol=1e-5)


def test_trainer_rejects_pipeline_plus_sequence_parallel():
    from tests.unittests.test_pipeline import _pipeline_run_config

    from avex_tpu.configs import MeshConfig
    from avex_tpu.data import build_dataloaders
    from avex_tpu.models.factory import build_model_from_spec
    from avex_tpu.training import Trainer

    config = _pipeline_run_config(data=2, model_axis=4, micro=2)
    config = config.model_copy(
        update={
            "mesh": MeshConfig(
                data=2, model=4, pipeline_microbatches=2, sequence_parallel=True
            )
        }
    )
    loader, _v, _t, _lm, num_classes = build_dataloaders(config)
    model = build_model_from_spec(config.model_spec, num_classes=num_classes)
    with pytest.raises(ValueError, match="enable one"):
        Trainer(model, config, loader, mesh=make_mesh(data=2, model=4))
