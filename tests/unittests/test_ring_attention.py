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


# ---------------------------------------------------------------------------
# Productized ring attention (round-4 verdict task #4): gate/mask operands,
# per-device memory envelope, and the model-level long-window mode.
# ---------------------------------------------------------------------------


def test_ring_gate_and_padding_mask_parity(qkv, rng):
    """The gate ([B,H,T,1], BEATs' GRU gate) and key padding mask ([B,T])
    apply inside the ring — parity vs materializing gate*bias + pad whole."""
    q, k, v = qkv
    bias = jnp.asarray(rng.standard_normal((1, H, T, T)), jnp.float32)
    gate = jnp.asarray(rng.random((B, H, T, 1)) + 0.5, jnp.float32)
    mask = np.zeros((B, T), bool)
    mask[1, -5:] = True
    mask = jnp.asarray(mask)
    mesh = make_mesh(data=2, model=4)

    pad = jnp.where(mask[:, None, None, :], -jnp.inf, 0.0)
    ref = dot_product_attention(q, k, v, bias=gate * bias + pad)
    out = jax.jit(
        lambda a, b, c: ring_attention(
            a, b, c, bias, gate=gate, key_padding_mask=mask, mesh=mesh
        )
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def _max_intermediate_elems(fn, *args) -> int:
    """Largest intermediate array (in elements) anywhere in fn's jaxpr —
    inside shard_map bodies the avals are PER-DEVICE shapes, so this measures
    the per-device activation envelope."""
    import numpy as _np

    biggest = 0

    def walk(jaxpr):
        nonlocal biggest
        for eqn in jaxpr.eqns:
            for var in eqn.outvars:
                shape = getattr(var.aval, "shape", None)
                if shape is not None:
                    biggest = max(biggest, int(_np.prod(shape, dtype=_np.int64)))
            for val in eqn.params.values():
                for sub in _subjaxprs(val):
                    walk(sub)

    def _subjaxprs(val):
        from jax.extend import core

        ClosedJaxpr = core.ClosedJaxpr
        Jaxpr = core.Jaxpr
        if isinstance(val, ClosedJaxpr):
            yield val.jaxpr
        elif isinstance(val, Jaxpr):
            yield val
        elif isinstance(val, (list, tuple)):
            for item in val:
                yield from _subjaxprs(item)

    walk(jax.make_jaxpr(fn)(*args).jaxpr)
    return biggest


def test_ring_attention_never_materializes_full_scores(rng):
    """Per-device activation memory: the largest intermediate under an
    8-way ring is the per-step [B, H, T/S, T/S] logits chunk — 1/64th of the
    monolithic [B, H, T, T] score matrix (the assertion the long-window mode
    rests on)."""
    b, h, t, d = 2, 4, 512, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32) for _ in range(3)
    )
    mesh = make_mesh(data=1, model=8)
    ring_max = _max_intermediate_elems(
        lambda a, bb, c: ring_attention(a, bb, c, mesh=mesh), q, k, v
    )
    full_scores = b * h * t * t
    # logits chunk is full/S^2; allow the K/V ring buffers etc. some slack.
    assert ring_max <= full_scores // 8, (ring_max, full_scores)
    mono_max = _max_intermediate_elems(
        lambda a, bb, c: dot_product_attention(a, bb, c), q, k, v
    )
    assert mono_max >= full_scores  # the monolithic path does materialize it


@pytest.mark.slow
def test_beats_ring_attention_model_parity(rng):
    """enable-ring on the BEATs encoder (gated rel-pos bias + padding mask,
    T=48 divides the ring) matches the in-device model bit-for-tolerance."""
    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    cfg = BEATsConfig(
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=96,
        encoder_attention_heads=4,
        embed_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
    )
    wav = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)
    mask = np.zeros((4, 16000), bool)
    mask[:, 12000:] = True
    mask = jnp.asarray(mask)
    base = BEATsBackbone(cfg=cfg, dtype=jnp.float32)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), wav[:2])
    ref, _ = jax.jit(lambda v, w, m: base.apply(v, w, m))(variables, wav, mask)

    mesh = make_mesh(data=1, model=8)
    ringed = BEATsBackbone(cfg=cfg, dtype=jnp.float32, ring_mesh=mesh)
    out, _ = jax.jit(lambda v, w, m: ringed.apply(v, w, m))(variables, wav, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_eat_ring_attention_model_parity(rng):
    """enable-ring on the EAT ViT stack: T = grid + CLS is NOT a ring
    multiple, exercising the pad + masked-keys path."""
    from avex_tpu.models.eat import EATModel

    kw = dict(num_classes=None, depth=2, dim=32, heads=4, dtype=jnp.float32)
    spec = jnp.asarray(rng.standard_normal((4, 32, 32)).astype(np.float32))
    base = EATModel(**kw)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), spec[:2])
    ref, _ = jax.jit(lambda v, x: base.apply(v, x))(variables, spec)
    assert ref.shape[1] % 8 != 0  # 2x2 grid + CLS = 5 tokens: pad path

    mesh = make_mesh(data=1, model=8)
    ringed = EATModel(**kw, ring_mesh=mesh)
    out, _ = jax.jit(lambda v, x: ringed.apply(v, x))(variables, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
