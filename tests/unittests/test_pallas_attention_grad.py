"""Gradients through the Pallas gated-bias attention (custom_vjp).

The kernel forward is paired with a recompute-based backward through the
mathematically identical jnp formulation, so ``use_pallas`` composes with
training. These tests pin that the custom backward matches jax.grad of the
reference math for every differentiable input, with and without gate/mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.ops.pallas_attention import _attention_reference, gated_bias_attention


def _inputs(rng, b=2, h=2, seq=16, d=32, gate=True, mask=True):
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((h, seq, seq)).astype(np.float32))
    g = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, seq)).astype(np.float32)) if gate else None
    pad = None
    if mask:
        pad_np = np.zeros((b, seq), bool)
        pad_np[-1, seq - 4 :] = True
        pad = jnp.asarray(pad_np)
    return q, k, v, bias, g, pad


@pytest.mark.parametrize("gate,mask", [(True, True), (True, False), (False, False)])
def test_grads_match_reference_math(rng, gate, mask):
    q, k, v, bias, g, pad = _inputs(rng, gate=gate, mask=mask)

    def loss_pallas(q, k, v, bias, g):
        out = gated_bias_attention(q, k, v, bias, g, key_padding_mask=pad, interpret=True)
        return jnp.sum(out**2)

    def loss_ref(q, k, v, bias, g):
        out = _attention_reference(q, k, v, bias, g, pad, 1.0 / np.sqrt(q.shape[-1]))
        return jnp.sum(out**2)

    argnums = (0, 1, 2, 3) + ((4,) if gate else ())
    grads_p = jax.grad(loss_pallas, argnums=argnums)(q, k, v, bias, g)
    grads_r = jax.grad(loss_ref, argnums=argnums)(q, k, v, bias, g)
    for gp, gr in zip(grads_p, grads_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-4, rtol=1e-4)


def test_grad_through_bool_mask_does_not_crash(rng):
    """bool key_padding_mask rides as a non-differentiable (float0) input."""
    q, k, v, bias, g, pad = _inputs(rng)

    def loss(q):
        out = gated_bias_attention(q, k, v, bias, g, key_padding_mask=pad, interpret=True)
        return jnp.sum(out)

    grad = jax.grad(loss)(q)
    assert np.all(np.isfinite(np.asarray(grad)))
