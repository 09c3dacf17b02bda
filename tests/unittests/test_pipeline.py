"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a mesh axis.

The reference has no pipeline parallelism (NCCL DDP only,
/root/reference/avex/training/distributed.py) — these tests pin the TPU-native
capability: exact forward parity vs the sequential layer loop, gradient
parity through the shard_map/ppermute schedule, the BEATs scanned-encoder
integration, and the Trainer-level ``mesh.pipeline_microbatches`` path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.parallel import make_mesh
from avex_tpu.parallel.pipeline import (
    _sequential,
    make_pipeline_runner,
    pipeline_apply,
    shard_pipeline_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def _toy_stack(rng, n_layers=8, embed=16):
    return {
        "w": jnp.asarray(rng.standard_normal((n_layers, embed, embed)), jnp.float32) * 0.1,
        "b": jnp.asarray(rng.standard_normal((n_layers, embed)), jnp.float32) * 0.1,
    }


def _toy_layer(p, h, mask, bias):
    h = jnp.where(mask[:, :, None], 0.0, h)
    return jnp.tanh(h @ p["w"] + p["b"] + bias)


@pytest.fixture
def toy(rng):
    params = _toy_stack(rng)
    x = jnp.asarray(rng.standard_normal((8, 6, 16)), jnp.float32)
    mask = jnp.asarray(rng.random((8, 6)) > 0.5)
    bias = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32) * 0.01
    return params, x, mask, bias


@pytest.mark.parametrize("micro", [1, 2, 4])
def test_pipeline_forward_matches_sequential(toy, micro):
    params, x, mask, bias = toy
    mesh = make_mesh(data=2, model=4)
    ref = _sequential(_toy_layer, params, x, (mask,), (bias,))
    out = jax.jit(
        lambda p, h: pipeline_apply(
            _toy_layer, p, h, (mask,), (bias,), mesh=mesh, num_microbatches=micro
        )
    )(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_grad_parity(toy):
    params, x, mask, bias = toy
    mesh = make_mesh(data=2, model=4)

    def loss_pipe(p, h):
        return pipeline_apply(
            _toy_layer, p, h, (mask,), (bias,), mesh=mesh, num_microbatches=2
        ).sum()

    def loss_ref(p, h):
        return _sequential(_toy_layer, p, h, (mask,), (bias,)).sum()

    g_pipe = jax.jit(jax.grad(loss_pipe))(params, x)
    g_ref = jax.jit(jax.grad(loss_ref))(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_pipe,
        g_ref,
    )


def _mesh_3d():
    """2×2×2 dp×pp×tp mesh: pipe axis manual, tp axis GSPMD-auto."""
    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    return jax.sharding.Mesh(devices, ("data", "model", "tp"))


def _place_3d(params, x, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    placed = {
        # layer (stage) axis manual over 'model'; the contraction output dim
        # tensor-parallel over the auto 'tp' axis.
        "w": jax.device_put(params["w"], NamedSharding(mesh, P("model", None, "tp"))),
        "b": jax.device_put(params["b"], NamedSharding(mesh, P("model", "tp"))),
    }
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    return placed, x


def test_pipeline_composes_with_auto_tp_axis(toy):
    """dp×pp×tp: the stage axis runs the manual GPipe schedule while a third
    mesh axis tensor-parallels the per-stage kernels under GSPMD — forward
    parity vs the sequential loop (float tolerance: TP splits contractions)."""
    params, x, mask, bias = toy
    mesh = _mesh_3d()
    placed, x_s = _place_3d(params, x, mesh)
    ref = _sequential(_toy_layer, params, x, (mask,), (bias,))
    out = jax.jit(
        lambda p, h: pipeline_apply(
            _toy_layer, p, h, (mask,), (bias,), mesh=mesh, num_microbatches=2
        )
    )(placed, x_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pipeline_tp_composition_grad_parity(toy):
    params, x, mask, bias = toy
    mesh = _mesh_3d()
    placed, x_s = _place_3d(params, x, mesh)

    def loss_pipe(p, h):
        return pipeline_apply(
            _toy_layer, p, h, (mask,), (bias,), mesh=mesh, num_microbatches=2
        ).sum()

    def loss_ref(p, h):
        return _sequential(_toy_layer, p, h, (mask,), (bias,)).sum()

    g_pipe = jax.jit(jax.grad(loss_pipe))(placed, x_s)
    g_ref = jax.jit(jax.grad(loss_ref))(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_pipe,
        g_ref,
    )


def test_pipeline_single_stage_degenerates_to_sequential(toy):
    params, x, mask, bias = toy
    mesh = make_mesh(data=8, model=1)
    ref = _sequential(_toy_layer, params, x, (mask,), (bias,))
    out = jax.jit(
        lambda p, h: pipeline_apply(_toy_layer, p, h, (mask,), (bias,), mesh=mesh)
    )(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pipeline_validates_divisibility(toy):
    params, x, mask, bias = toy
    mesh = make_mesh(data=2, model=4)
    bad_params = jax.tree_util.tree_map(lambda a: a[:6], params)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="not divisible into 4 stages"):
        pipeline_apply(_toy_layer, bad_params, x, (mask,), (bias,), mesh=mesh)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(
            _toy_layer, params, x, (mask,), (bias,), mesh=mesh, num_microbatches=3
        )


def test_shard_pipeline_params_places_stack_on_model_axis(toy):
    params, *_ = toy
    mesh = make_mesh(data=2, model=4)
    placed = shard_pipeline_params({"layers": params, "head": jnp.ones((4, 4))}, mesh)
    stack_spec = placed["layers"]["w"].sharding.spec
    assert stack_spec[0] == "model"
    assert placed["head"].sharding.is_fully_replicated


def _tiny_beats_cfg(**overrides):
    from avex_tpu.models.beats import BEATsConfig

    base = dict(
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
    base.update(overrides)
    return BEATsConfig(**base)


@pytest.mark.slow  # two BEATs builds + 4 jits (~34 s; round-5 re-tier)
def test_pipelined_beats_forward_is_bit_exact(rng):
    from avex_tpu.models.beats import BEATsBackbone

    cfg = _tiny_beats_cfg()
    model = BEATsBackbone(cfg=cfg, dtype=jnp.float32)
    wav = jnp.asarray(rng.standard_normal((8, 16000)).astype(np.float32) * 0.1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wav[:2])
    ref, _ = jax.jit(lambda v, w: model.apply(v, w))(variables, wav)

    mesh = make_mesh(data=2, model=4)
    pipe = BEATsBackbone(
        cfg=cfg,
        dtype=jnp.float32,
        layer_runner=make_pipeline_runner(mesh, num_microbatches=2),
    )
    out, _ = jax.jit(lambda v, w: pipe.apply(v, w))(variables, wav)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # Padding-mask path: the mask rides through the pipeline with its microbatch.
    mask = np.zeros((8, 16000), bool)
    mask[:, 12000:] = True
    mask = jnp.asarray(mask)
    ref_m, _ = jax.jit(lambda v, w, m: model.apply(v, w, m))(variables, wav, mask)
    out_m, _ = jax.jit(lambda v, w, m: pipe.apply(v, w, m))(variables, wav, mask)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))


def test_pipelined_encoder_rejects_training_dropout(rng):
    from avex_tpu.models.beats import BEATsBackbone

    cfg = _tiny_beats_cfg(dropout=0.1)
    mesh = make_mesh(data=2, model=4)
    model = BEATsBackbone(cfg=cfg, dtype=jnp.float32)
    wav = jnp.asarray(rng.standard_normal((8, 16000)).astype(np.float32) * 0.1)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wav[:2])
    pipe = BEATsBackbone(
        cfg=cfg, dtype=jnp.float32, layer_runner=make_pipeline_runner(mesh)
    )
    with pytest.raises(ValueError, match="deterministic-only"):
        pipe.apply(
            variables,
            wav,
            None,
            False,  # deterministic=False with dropout > 0
            rngs={"dropout": jax.random.PRNGKey(1)},
        )


def _pipeline_run_config(data, model_axis, micro, batch=4):
    from avex_tpu.configs import (
        DatasetCollectionConfig,
        DatasetConfig,
        MeshConfig,
        ModelSpec,
        RunConfig,
        SchedulerConfig,
        TrainingParams,
    )

    return RunConfig(
        model_spec=ModelSpec(
            name="beats",
            pretrained=False,
            init_config={
                "encoder_layers": 4,
                "encoder_embed_dim": 64,
                "encoder_ffn_embed_dim": 128,
                "encoder_attention_heads": 4,
                "embed_dim": 32,
                "dropout": 0.0,
                "attention_dropout": 0.0,
                "encoder_layerdrop": 0.0,
                "dropout_input": 0.0,
                "scan_layers": True,
            },
            audio_config={
                "representation": "raw",
                "normalize": False,
                "target_length_seconds": 1,
                "window_selection": "random",
            },
        ),
        training_params=TrainingParams(
            train_epochs=1, lr=1e-3, batch_size=batch, weight_decay=0.01
        ),
        dataset_config=DatasetCollectionConfig(
            train_datasets=[
                DatasetConfig(
                    name="pipe",
                    kind="synthetic",
                    num_samples=2 * batch,
                    num_classes=4,
                    clip_seconds=1.0,
                )
            ]
        ),
        output_dir="/tmp/avex_tpu_test_pipeline",
        mesh=MeshConfig(data=data, model=model_axis, pipeline_microbatches=micro),
        scheduler=SchedulerConfig(name="cosine", warmup_steps=1),
        seed=0,
        num_workers=0,
    )


@pytest.mark.slow  # two Trainer builds (~27 s; round-5 re-tier)
def test_trainer_pipeline_step_matches_single_device(monkeypatch):
    """mesh.pipeline_microbatches > 0 trains through the GPipe schedule with
    loss parity against a plain 1-device step, and the stacked layer params
    are placed one stage per device."""
    monkeypatch.setenv("AVEX_TPU_DONATE", "0")
    from avex_tpu.data import build_dataloaders
    from avex_tpu.models.factory import build_model_from_spec
    from avex_tpu.parallel import shard_batch
    from avex_tpu.training import Trainer

    config = _pipeline_run_config(data=2, model_axis=4, micro=2)
    mesh = make_mesh(data=2, model=4)
    loader, _v, _t, _lm, num_classes = build_dataloaders(config)
    model = build_model_from_spec(config.model_spec, num_classes=num_classes)
    trainer = Trainer(model, config, loader, mesh=mesh)
    batch = next(iter(loader))
    state, loss, _ = trainer._train_step(trainer.state, shard_batch(batch, mesh))
    jax.block_until_ready(state.params)

    def _axes(leaf):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None) or ()
        return [a for part in spec for a in (part if isinstance(part, tuple) else (part,))]

    n_staged = sum(
        "model" in _axes(leaf) for leaf in jax.tree_util.tree_leaves(state.params)
    )
    assert n_staged > 0, "no parameter sharded over the pipeline (model) axis"

    solo_config = _pipeline_run_config(data=1, model_axis=1, micro=2)
    solo_mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    solo_model = build_model_from_spec(solo_config.model_spec, num_classes=num_classes)
    solo = Trainer(solo_model, solo_config, loader, mesh=solo_mesh)
    _s, solo_loss, _m = solo._train_step(solo.state, shard_batch(batch, solo_mesh))
    np.testing.assert_allclose(float(loss), float(solo_loss), rtol=1e-4, atol=1e-5)


def test_trainer_pipeline_rejects_fsdp_composition():
    from avex_tpu.configs import MeshConfig
    from avex_tpu.data import build_dataloaders
    from avex_tpu.models.factory import build_model_from_spec
    from avex_tpu.training import Trainer

    config = _pipeline_run_config(data=2, model_axis=4, micro=2)
    config = config.model_copy(
        update={
            "mesh": MeshConfig(
                data=2, model=4, pipeline_microbatches=2, param_sharding="fsdp"
            )
        }
    )
    loader, _v, _t, _lm, num_classes = build_dataloaders(config)
    model = build_model_from_spec(config.model_spec, num_classes=num_classes)
    with pytest.raises(ValueError, match="do not compose"):
        Trainer(model, config, loader, mesh=make_mesh(data=2, model=4))
