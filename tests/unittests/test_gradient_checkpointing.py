"""Gradient checkpointing (nn.remat) correctness.

Rematerialization must change memory behavior only: gradients through the
remat'd BEATs encoder are bit-compatible with the plain backward (the
reference relies on ``torch.utils.checkpoint`` + ``_set_static_graph``;
train.py:613-615, efficientnet.py:144-161).
"""

import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.beats import BEATsConfig, BEATsModel


def _loss_fn(module):
    def loss(params, wav, labels):
        logits, _ = module.apply(params, wav)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.sum(labels * logp, axis=-1))

    return loss


import pytest


@pytest.mark.parametrize("remat_policy", [None, "dots"])
def test_remat_gradients_match_plain_backward(rng, remat_policy):
    base = dict(
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        embed_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
    )
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)
    labels = jax.nn.one_hot(jnp.asarray([1, 3]), 4)

    plain = BEATsModel(cfg=BEATsConfig(**base), num_classes=4)
    variables = plain.init(jax.random.PRNGKey(0), wav)
    remat = BEATsModel(
        cfg=BEATsConfig(**base, remat=True, remat_policy=remat_policy), num_classes=4
    )

    g_plain = jax.jit(jax.grad(_loss_fn(plain)))(variables, wav, labels)
    g_remat = jax.jit(jax.grad(_loss_fn(remat)))(variables, wav, labels)

    flat_plain = jax.tree_util.tree_leaves(g_plain)
    flat_remat = jax.tree_util.tree_leaves(g_remat)
    assert len(flat_plain) == len(flat_remat)
    # Full recompute reproduces the identical fused graph (bit-compatible);
    # the "dots" policy regroups saved-vs-recomputed elementwise chains, so
    # fp32 reassociation noise up to ~2e-3 on small bias grads is expected.
    rtol, atol = (1e-5, 1e-6) if remat_policy is None else (1e-2, 1e-5)
    for a, b in zip(flat_plain, flat_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


def test_unknown_remat_policy_raises(rng):
    wav = jnp.zeros((1, 16000), jnp.float32)
    model = BEATsModel(
        cfg=BEATsConfig(
            encoder_layers=1, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
            encoder_attention_heads=4, embed_dim=32,
            remat=True, remat_policy="bogus",
        ),
        num_classes=2,
    )
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.PRNGKey(0), wav)


def test_wrapper_enable_gradient_checkpointing_rebuilds():
    from avex_tpu.models.beats import Model

    model = Model(
        pretrained=False,
        num_classes=3,
        init_config=dict(
            encoder_layers=1,
            encoder_embed_dim=64,
            encoder_ffn_embed_dim=128,
            encoder_attention_heads=4,
            embed_dim=32,
        ),
    )
    model.enable_gradient_checkpointing()
    assert getattr(model.cfg, "remat", False) is True
    wav = np.zeros((1, 16000), np.float32)
    out = model.forward(jnp.asarray(wav))
    assert np.asarray(out).shape == (1, 3)
