"""Ring attention (ops/ring_attention.py): sequence-parallel exact SDPA.

Parity oracle is ``ops/attention.dot_product_attention`` — the ring result
must match the monolithic softmax to fp32 roundoff, forward and backward,
with and without an additive bias (incl. ``-inf`` key padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.ops.attention import dot_product_attention
from avex_tpu.ops.ring_attention import ring_attention
from avex_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)

B, H, T, D = 8, 4, 32, 8


@pytest.fixture
def qkv(rng):
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32) for _ in range(3)
    )


def _gated_bias_with_padding(rng):
    bias = np.asarray(rng.standard_normal((1, H, T, T)), np.float32)
    pad = np.zeros((B, 1, 1, T), np.float32)
    pad[1, ..., -5:] = -np.inf  # padded keys on one batch item
    return jnp.asarray(bias + pad)


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_attention_matches_dot_product_attention(qkv, rng, ring):
    q, k, v = qkv
    bias = _gated_bias_with_padding(rng)
    mesh = make_mesh(data=8 // ring, model=ring)
    ref = dot_product_attention(q, k, v, bias=bias)
    out = jax.jit(
        lambda a, b, c, d: ring_attention(a, b, c, d, mesh=mesh)
    )(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_ring_attention_without_bias(qkv):
    q, k, v = qkv
    mesh = make_mesh(data=2, model=4)
    ref = dot_product_attention(q, k, v)
    out = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh=mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_ring_attention_grad_parity(qkv, rng):
    q, k, v = qkv
    bias = _gated_bias_with_padding(rng)
    mesh = make_mesh(data=2, model=4)

    def ring_loss(a, b, c):
        return ring_attention(a, b, c, bias, mesh=mesh).sum()

    def ref_loss(a, b, c):
        return dot_product_attention(a, b, c, bias=bias).sum()

    g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ring_size_one_degenerates(qkv, rng):
    q, k, v = qkv
    bias = _gated_bias_with_padding(rng)
    mesh = make_mesh(data=8, model=1)
    ref = dot_product_attention(q, k, v, bias=bias)
    out = ring_attention(q, k, v, bias, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ring_attention_validates_divisibility(qkv):
    q, k, v = qkv
    mesh = make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="not divisible by ring size"):
        ring_attention(q[:, :, :30], k[:, :, :30], v[:, :, :30], mesh=mesh)
    with pytest.raises(ValueError, match="trailing dims"):
        ring_attention(q, k, v, jnp.zeros((1, H, 1, T)), mesh=mesh)
