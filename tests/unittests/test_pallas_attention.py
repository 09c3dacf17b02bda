"""Pallas gated-bias attention vs the XLA reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avex_tpu.ops.attention import dot_product_attention
from avex_tpu.ops.pallas_attention import gated_bias_attention


def _reference(q, k, v, pos_bias, gate, pad_mask, scale):
    bias = gate[..., None] * pos_bias[None] if gate is not None else pos_bias[None]
    bias = jnp.asarray(bias, jnp.float32)
    if pad_mask is not None:
        bias = bias + jnp.where(pad_mask[:, None, None, :], -jnp.inf, 0.0)
    return dot_product_attention(q, k, v, bias=bias, scale=scale)


@pytest.mark.parametrize("seq", [24, 48])  # includes non-multiple-of-8 seq
def test_matches_reference(rng, seq):
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((h, seq, seq)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, seq)).astype(np.float32))

    out = gated_bias_attention(q, k, v, pos_bias, gate, interpret=True)
    expected = _reference(q, k, v, pos_bias, gate, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_with_padding_mask(rng):
    b, h, seq, d = 2, 2, 16, 32
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((h, seq, seq)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, seq)).astype(np.float32))
    pad = np.zeros((b, seq), bool)
    pad[1, 10:] = True
    pad = jnp.asarray(pad)

    out = gated_bias_attention(q, k, v, pos_bias, gate, key_padding_mask=pad, interpret=True)
    expected = _reference(q, k, v, pos_bias, gate, pad, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_no_gate(rng):
    b, h, seq, d = 1, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((h, seq, seq)).astype(np.float32))
    out = gated_bias_attention(q, k, v, pos_bias, None, interpret=True)
    expected = _reference(q, k, v, pos_bias, None, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_matches_reference_12_heads_batch_packed(rng):
    """Full BEATs head count with multi-batch grid cells (block_b > 1)."""
    b, h, seq, d = 8, 12, 24, 64
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((h, seq, seq)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, h, seq)).astype(np.float32))
    pad = np.zeros((b, seq), bool)
    pad[:, -5:] = True

    out = gated_bias_attention(
        q, k, v, pos_bias, gate, key_padding_mask=jnp.asarray(pad),
        interpret=True, block_b=8,
    )
    expected = _reference(q, k, v, pos_bias, gate, jnp.asarray(pad), None)
    # compare valid query positions: [B, H, T, D] -> [B, T, H, D][~pad]
    got_valid = np.asarray(out).transpose(0, 2, 1, 3)[~pad]
    exp_valid = np.asarray(expected).transpose(0, 2, 1, 3)[~pad]
    np.testing.assert_allclose(got_valid, exp_valid, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("seq", [24, 513])  # 513 = the EAT/Bird-MAE token count
def test_bias_free_matches_reference(rng, seq):
    """pos_bias=None routes to the simplified ViT cell (no bias load, no gate)."""
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))

    out = gated_bias_attention(q, k, v, pos_bias=None, interpret=True)
    expected = dot_product_attention(q, k, v, scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_bias_free_padding_mask(rng):
    b, h, seq, d = 2, 2, 16, 32
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    pad = np.zeros((b, seq), bool)
    pad[1, 10:] = True
    pad = jnp.asarray(pad)

    out = gated_bias_attention(q, k, v, None, key_padding_mask=pad, interpret=True)
    bias = jnp.where(pad[:, None, None, :], -jnp.inf, 0.0)
    expected = dot_product_attention(q, k, v, bias=bias, scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_bias_free_gradients_match_xla(rng):
    """The custom backward composes with grad when both optionals are None."""
    b, h, seq, d = 1, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)).astype(np.float32))

    def loss_pallas(q, k, v):
        return gated_bias_attention(q, k, v, pos_bias=None, interpret=True).sum()

    def loss_xla(q, k, v):
        return dot_product_attention(q, k, v, scale=d**-0.5).sum()

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4)


def test_eat_block_use_pallas_auto_policy(rng, monkeypatch):
    """EAT/Bird-MAE blocks auto-enable the fused-QKV kernel on TPU at T>=248
    (round 5: the Pallas path consumes the raw [B, T, 3E] gemm output — the
    split/transpose lives inside the kernel boundary; the 248 threshold is
    the measured in-model crossover, scripts/bench_fused_qkv_ab.py)."""
    import avex_tpu.ops.pallas_attention as pa
    from avex_tpu.models.eat import _Block

    calls = []
    real = pa.fused_qkv_attention

    def recorder(qkv, *args, **kw):
        calls.append(qkv.shape)
        kw["interpret"] = True
        return real(qkv, *args, **kw)

    monkeypatch.setattr(pa, "fused_qkv_attention", recorder)

    # dh=32 tiles to 128 lanes (fused_qkv_compatible) so the fused cell routes.
    b, t, e = 1, 392, 128
    x = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32) * 0.1)
    block = _Block(dim=e, heads=4)
    variables = block.init(jax.random.PRNGKey(0), x)

    # CPU backend: XLA path at any T.
    block.apply(variables, x)
    assert calls == []

    # Fake TPU backend: fused-QKV kernel at T>=248, fed the RAW 3E tensor...
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out_pallas, _ = block.apply(variables, x)
    assert calls == [(b, t, 3 * e)]

    # ... and the routed output matches the XLA path.
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    out_xla, _ = block.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=2e-5, rtol=1e-4
    )

    # Below the crossover the fake TPU keeps XLA too.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    short = x[:, :192]
    block.apply(block.init(jax.random.PRNGKey(0), short), short)
    assert len(calls) == 1

    # Training traces route the kernel too (round 5b): the VMEM backward
    # kernel measured a full EAT AdamW step at +44% vs XLA autodiff
    # (scripts/bench_fused_qkv_ab.py eat-train).
    block.apply(variables, x, False)
    assert len(calls) == 2


@pytest.mark.slow
def test_beats_use_pallas_end_to_end(rng):
    """use_pallas=True BEATs forward ≡ the XLA path at 12 heads (interpret
    mode auto-selected off-TPU)."""
    import avex_tpu
    from avex_tpu.configs import ModelSpec

    def build(use_pallas):
        return avex_tpu.build_model_from_spec(
            ModelSpec(name="beats", pretrained=False, init_config={
                "encoder_layers": 2, "encoder_embed_dim": 96,
                "encoder_ffn_embed_dim": 128, "encoder_attention_heads": 12,
                "embed_dim": 32, "dropout": 0.0, "attention_dropout": 0.0,
                "encoder_layerdrop": 0.0, "use_pallas": use_pallas}),
            num_classes=None, return_features_only=True, seed=3,
        )

    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    ref_model = build(False)
    pallas_model = build(True)
    expected = np.asarray(ref_model(wav))
    got = np.asarray(pallas_model(wav))
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-4)


def test_use_pallas_auto_policy(rng, monkeypatch):
    """use_pallas=None resolves to XLA at EVERY length for the gated BEATs
    attention (round 5: in-model, XLA beat both kernel variants at T=248 and
    T=496 — the isolated crossover did not survive the model context).
    Explicit True still routes the kernel."""
    import avex_tpu.ops.pallas_attention as pa
    from avex_tpu.models.beats import _GatedRelPosAttention

    calls = []
    real = pa.gated_bias_attention

    def recorder(*args, **kw):
        calls.append(kw.get("gate") is not None)
        kw["interpret"] = True  # stay off Mosaic under the fake-TPU backend
        return real(*args, **kw)

    monkeypatch.setattr(pa, "gated_bias_attention", recorder)

    b, h, t, e = 1, 4, 392, 32
    x = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((1, h, t, t)).astype(np.float32) * 0.1)
    attn = _GatedRelPosAttention(embed_dim=e, num_heads=h, use_pallas=None)
    variables = attn.init(jax.random.PRNGKey(0), x, bias, None)

    # CPU backend: auto stays on XLA.
    attn.apply(variables, x, bias, None)
    assert calls == []

    # TPU backend (faked): auto stays on XLA too, even past T=384 — the old
    # round-4 auto-enable was a measured 22% regression for windowed BEATs.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    attn.apply(variables, x, bias, None)
    assert calls == []

    # Explicit True forces the kernel.
    forced = _GatedRelPosAttention(embed_dim=e, num_heads=h, use_pallas=True)
    forced.apply(variables, x, bias, None)
    assert len(calls) == 1


# ---------------------------------------------------------------------------
# Fused-QKV cell (round-4 verdict task #3): the split/transpose + head-merge
# live inside the kernel boundary as BlockSpec views of one [B, T, 3E] tensor.
# ---------------------------------------------------------------------------


def _fused_ref(qkv, heads, pad=None, scale=None):
    b, t, three_e = qkv.shape
    dim = three_e // 3
    dh = dim // heads
    parts = qkv.reshape(b, t, 3, heads, dh)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    bias = None
    if pad is not None:
        bias = jnp.where(pad[:, None, None, :], -jnp.inf, 0.0)
    out = dot_product_attention(q, k, v, bias=bias, scale=scale or dh**-0.5)
    return out.transpose(0, 2, 1, 3).reshape(b, t, dim)


@pytest.mark.parametrize("seq", [17, 48])  # 17 = CLS-odd length
def test_fused_qkv_matches_split_path(rng, seq):
    from avex_tpu.ops.pallas_attention import fused_qkv_attention

    b, heads, dh = 2, 4, 16
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    out = fused_qkv_attention(qkv, heads=heads, interpret=True)
    expected = _fused_ref(qkv, heads)
    assert out.shape == (b, seq, heads * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_qkv_padding_mask(rng):
    from avex_tpu.ops.pallas_attention import fused_qkv_attention

    b, seq, heads, dh = 2, 16, 2, 16
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pad = np.zeros((b, seq), bool)
    pad[1, 10:] = True
    pad = jnp.asarray(pad)
    out = fused_qkv_attention(qkv, heads=heads, key_padding_mask=pad, interpret=True)
    expected = _fused_ref(qkv, heads, pad=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_qkv_gradients_match_xla(rng):
    from avex_tpu.ops.pallas_attention import fused_qkv_attention

    b, seq, heads, dh = 2, 8, 2, 8
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))

    g_kernel = jax.grad(lambda x: fused_qkv_attention(x, heads=heads, interpret=True).sum())(qkv)
    g_ref = jax.grad(lambda x: _fused_ref(x, heads).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref), atol=2e-5, rtol=1e-4)


def _fused_gated_ref(qkv, heads, pos_bias, gate=None, pad=None, scale=None):
    b, t, three_e = qkv.shape
    dim = three_e // 3
    dh = dim // heads
    parts = qkv.reshape(b, t, 3, heads, dh)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    bias = gate[..., None] * pos_bias[None] if gate is not None else pos_bias[None]
    bias = jnp.asarray(bias, jnp.float32)
    if pad is not None:
        bias = bias + jnp.where(pad[:, None, None, :], -jnp.inf, 0.0)
    out = dot_product_attention(q, k, v, bias=bias, scale=scale or dh**-0.5)
    return out.transpose(0, 2, 1, 3).reshape(b, t, dim)


@pytest.mark.parametrize("seq", [17, 48])  # 17 = odd length (Mosaic edge masking)
def test_fused_qkv_gated_matches_reference(rng, seq):
    from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

    b, heads, dh = 2, 4, 16
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((heads, seq, seq)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, heads, seq)).astype(np.float32))
    out = fused_qkv_gated_attention(qkv, heads=heads, pos_bias=pos_bias, gate=gate, interpret=True)
    expected = _fused_gated_ref(qkv, heads, pos_bias, gate)
    assert out.shape == (b, seq, heads * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_qkv_gated_padding_mask_no_gate(rng):
    from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

    b, seq, heads, dh = 2, 16, 2, 16
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((heads, seq, seq)).astype(np.float32))
    pad = np.zeros((b, seq), bool)
    pad[1, 10:] = True
    pad = jnp.asarray(pad)
    out = fused_qkv_gated_attention(
        qkv, heads=heads, pos_bias=pos_bias, key_padding_mask=pad, interpret=True
    )
    expected = _fused_gated_ref(qkv, heads, pos_bias, pad=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5, rtol=1e-4)


def test_fused_qkv_gated_gradients_match_xla(rng):
    from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

    b, seq, heads, dh = 2, 8, 2, 8
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((heads, seq, seq)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, heads, seq)).astype(np.float32))

    def loss_k(qkv, pos_bias, gate):
        from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

        return fused_qkv_gated_attention(
            qkv, heads=heads, pos_bias=pos_bias, gate=gate, interpret=True
        ).sum()

    def loss_r(qkv, pos_bias, gate):
        return _fused_gated_ref(qkv, heads, pos_bias, gate).sum()

    got = jax.grad(loss_k, argnums=(0, 1, 2))(qkv, pos_bias, gate)
    want = jax.grad(loss_r, argnums=(0, 1, 2))(qkv, pos_bias, gate)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4)


def test_fused_qkv_gated_backward_kernel_accumulation(rng):
    """VMEM gated backward: dbias sums over batch grid steps (block_b=1 ->
    4 sequential revisits of the accumulator block), with a padding mask,
    weighted cotangent, and multi-head groups."""
    from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

    b, seq, heads, dh = 4, 12, 4, 8
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((heads, seq, seq)).astype(np.float32))
    gate = jnp.asarray(rng.uniform(1.0, 3.0, (b, heads, seq)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((b, seq, heads * dh)).astype(np.float32))
    pad = np.zeros((b, seq), bool)
    pad[2, 9:] = True
    pad = jnp.asarray(pad)

    def loss_k(qkv, pos_bias, gate):
        out = fused_qkv_gated_attention(
            qkv, heads=heads, pos_bias=pos_bias, gate=gate,
            key_padding_mask=pad, interpret=True, block_b=1,
        )
        return (out * w).sum()

    def loss_r(qkv, pos_bias, gate):
        return (_fused_gated_ref(qkv, heads, pos_bias, gate, pad=pad) * w).sum()

    got = jax.grad(loss_k, argnums=(0, 1, 2))(qkv, pos_bias, gate)
    want = jax.grad(loss_r, argnums=(0, 1, 2))(qkv, pos_bias, gate)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4)


def test_fused_qkv_gated_backward_kernel_no_gate(rng):
    """gate=None: dbias is the plain summed cotangent and dgate is absent."""
    from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

    b, seq, heads, dh = 2, 8, 2, 8
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pos_bias = jnp.asarray(rng.standard_normal((heads, seq, seq)).astype(np.float32))

    def loss_k(qkv, pos_bias):
        return fused_qkv_gated_attention(
            qkv, heads=heads, pos_bias=pos_bias, interpret=True, block_b=1
        ).sum()

    def loss_r(qkv, pos_bias):
        return _fused_gated_ref(qkv, heads, pos_bias).sum()

    got = jax.grad(loss_k, argnums=(0, 1))(qkv, pos_bias)
    want = jax.grad(loss_r, argnums=(0, 1))(qkv, pos_bias)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4)


def test_beats_attention_fused_kernel_routing(rng, monkeypatch):
    """fused_qkv=True + use_pallas=True routes the RAW [B, T, 3E] gemm output
    to the fused gated kernel and matches the split XLA path (same params)."""
    import avex_tpu.ops.pallas_attention as pa
    from avex_tpu.models.beats import _GatedRelPosAttention

    calls = []
    real = pa.fused_qkv_gated_attention

    def recorder(qkv, *args, **kw):
        calls.append(qkv.shape)
        return real(qkv, *args, **kw)

    monkeypatch.setattr(pa, "fused_qkv_gated_attention", recorder)

    b, h, t, e = 2, 4, 24, 128  # dh=32: head groups tile to 128 lanes
    x = jnp.asarray(rng.standard_normal((b, t, e)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((1, h, t, t)).astype(np.float32) * 0.1)
    pad = np.zeros((b, t), bool)
    pad[1, 20:] = True
    pad = jnp.asarray(pad)

    fused = _GatedRelPosAttention(embed_dim=e, num_heads=h, fused_qkv=True, use_pallas=True)
    variables = fused.init(jax.random.PRNGKey(0), x, bias, pad)
    calls.clear()  # init traces the forward once too
    out_kernel = fused.apply(variables, x, bias, pad)
    assert calls == [(b, t, 3 * e)]

    split = _GatedRelPosAttention(embed_dim=e, num_heads=h, fused_qkv=True, use_pallas=False)
    out_xla = split.apply(variables, x, bias, pad)
    got = np.asarray(out_kernel)[~np.asarray(pad)]
    want = np.asarray(out_xla)[~np.asarray(pad)]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_eat_block_pallas_path_uses_fused_qkv(rng, monkeypatch):
    """The _Block Pallas path consumes the raw QKV gemm output (no HLO
    split/transpose) and still matches the XLA block bit-for-tolerance."""
    from avex_tpu.models.eat import _Block

    # interpret-mode Pallas on CPU: force the flag on.
    spec = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    xla_block = _Block(dim=32, heads=4, use_pallas=False)
    variables = xla_block.init(jax.random.PRNGKey(0), spec)
    ref, ref_proj = xla_block.apply(variables, spec)
    pallas_block = _Block(dim=32, heads=4, use_pallas=True)
    out, out_proj = pallas_block.apply(variables, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_proj), np.asarray(ref_proj), atol=2e-5, rtol=1e-4)


def test_atst_block_pallas_path_uses_fused_qkv(rng):
    """ATST's ViT block routes the raw QKV gemm output through the fused
    kernel when forced (round 5; auto fires on TPU at T>=248 — measured +17%
    at the 10 s T=250, 0.92x at the 5 s T=125)."""
    from avex_tpu.models.atst import _Block

    tokens = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    xla_block = _Block(dim=32, heads=4, use_pallas=False)
    variables = xla_block.init(jax.random.PRNGKey(0), tokens)
    ref = xla_block.apply(variables, tokens)
    out = _Block(dim=32, heads=4, use_pallas=True).apply(variables, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_aves_layer_pallas_path_uses_fused_qkv(rng):
    """AVES' post-norm layer concatenates q/k/v into ONE [E, 3E] gemm on the
    Pallas path (round 5, measured +7% in-model at T=249) and matches the
    split path — including the key-padding mask plumbed into the kernel."""
    from avex_tpu.models.aves import AVESConfig, _EncoderLayer

    cfg = AVESConfig(
        dict(
            encoder_embed_dim=32,
            encoder_num_heads=4,
            encoder_ff_interm_features=64,
            encoder_dropout=0.0,
            encoder_attention_dropout=0.0,
            encoder_ff_interm_dropout=0.0,
        )
    )
    x = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    mask = jnp.zeros((2, 9), bool).at[1, 6:].set(True)
    xla_layer = _EncoderLayer(cfg=cfg, use_pallas=False)
    variables = xla_layer.init(jax.random.PRNGKey(0), x, mask)
    ref, ref_ff = xla_layer.apply(variables, x, mask)
    out, out_ff = _EncoderLayer(cfg=cfg, use_pallas=True).apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_ff), np.asarray(ref_ff), atol=2e-5, rtol=1e-4)


def test_fused_qkv_backward_kernel_mask_and_groups(rng):
    """The round-5b VMEM backward kernel (dq/dk/dv in one grid, P recomputed
    in-register) matches XLA autodiff with a padding mask, multiple head
    groups, and a non-uniform cotangent."""
    from avex_tpu.ops.pallas_attention import fused_qkv_attention

    b, seq, heads, dh = 4, 24, 4, 16
    qkv = jnp.asarray(rng.standard_normal((b, seq, 3 * heads * dh)).astype(np.float32))
    pad = jnp.zeros((b, seq), bool).at[2:, 18:].set(True)
    w = jnp.asarray(rng.standard_normal((b, seq, heads * dh)).astype(np.float32))

    def loss_kernel(x):
        out = fused_qkv_attention(x, heads=heads, key_padding_mask=pad, interpret=True)
        return (out * w).sum()

    def loss_ref(x):
        return (_fused_ref(x, heads, pad=pad) * w).sum()

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    # padded-query rows produce garbage in both paths (softmax over -inf);
    # compare the valid rows.
    valid = ~np.asarray(pad)
    np.testing.assert_allclose(
        np.asarray(g_kernel)[valid], np.asarray(g_ref)[valid], atol=2e-5, rtol=1e-4
    )
