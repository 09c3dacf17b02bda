"""Int8 quantization subsystem (avex_tpu.quant).

W8A8 dynamic int8 is an avex-tpu serving extension (no reference
equivalent); these tests pin its numerics: exactness of the quantized
arithmetic vs a numpy simulation, dequantization error bounds, pytree
conversion on both unrolled and nn.scan-stacked layouts, and end-to-end
quality of a quantized BEATs encoder against its float twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.quant import (
    Int8Dense,
    dynamic_int8_matmul,
    quantize_kernel,
    quantize_params,
)


def test_quantize_kernel_dequant_error_bound(rng):
    w = rng.standard_normal((96, 48)).astype(np.float32)
    q, scale = quantize_kernel(jnp.asarray(w))
    q, scale = np.asarray(q), np.asarray(scale)
    assert q.dtype == np.int8 and scale.shape == (48,)
    # Symmetric rounding: per-channel reconstruction error <= scale/2.
    err = np.abs(w - q.astype(np.float32) * scale[None, :])
    assert np.all(err <= scale[None, :] / 2 + 1e-7)
    # Channels use their full range: every column's absmax maps to +/-127.
    assert np.all(np.max(np.abs(q), axis=0) == 127)


def test_quantize_kernel_stacked_layer_axis(rng):
    """nn.scan layouts stack a leading layer axis; scales must be per-layer."""
    w = rng.standard_normal((3, 16, 8)).astype(np.float32)
    w[1] *= 100.0  # wildly different ranges per layer
    q, scale = quantize_kernel(jnp.asarray(w))
    assert q.shape == (3, 16, 8) and scale.shape == (3, 8)
    per_layer = [quantize_kernel(jnp.asarray(w[i])) for i in range(3)]
    for i, (qi, si) in enumerate(per_layer):
        np.testing.assert_array_equal(np.asarray(q[i]), np.asarray(qi))
        np.testing.assert_allclose(np.asarray(scale[i]), np.asarray(si))


def test_dynamic_int8_matmul_matches_numpy_simulation(rng):
    x = rng.standard_normal((4, 32)).astype(np.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    wq, ws = quantize_kernel(jnp.asarray(w))

    out = np.asarray(dynamic_int8_matmul(jnp.asarray(x), wq, ws, jnp.asarray(b)))

    # numpy re-derivation of the exact same arithmetic
    row_scale = np.maximum(np.max(np.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(x / row_scale), -127, 127).astype(np.int8)
    acc = xq.astype(np.int32) @ np.asarray(wq).astype(np.int32)
    expected = acc.astype(np.float32) * (row_scale * np.asarray(ws)[None, :]) + b
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_dynamic_int8_matmul_accuracy_vs_float(rng):
    x = rng.standard_normal((64, 256)).astype(np.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32) / 16.0
    wq, ws = quantize_kernel(jnp.asarray(w))
    q_out = np.asarray(dynamic_int8_matmul(jnp.asarray(x), wq, ws))
    f_out = x @ w
    rel = np.linalg.norm(q_out - f_out) / np.linalg.norm(f_out)
    assert rel < 0.02, rel  # W8A8 on well-conditioned gaussians: <2% L2


def test_dynamic_int8_matmul_zero_rows_and_dtype(rng):
    x = jnp.zeros((3, 16), jnp.bfloat16)
    w = rng.standard_normal((16, 4)).astype(np.float32)
    wq, ws = quantize_kernel(jnp.asarray(w))
    out = dynamic_int8_matmul(x, wq, ws)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out, np.float32), 0.0)


def test_int8_dense_consumes_quantized_dense_params(rng):
    """quantize_params(nn.Dense tree) is exactly Int8Dense's param contract."""
    import flax.linen as nn

    dense = nn.Dense(12)
    x = jnp.asarray(rng.standard_normal((5, 24)).astype(np.float32))
    variables = dense.init(jax.random.PRNGKey(0), x)
    f_out = dense.apply(variables, x)

    qparams = quantize_params(variables["params"], include=lambda path: True)
    q_out = Int8Dense(12).apply({"params": qparams}, x)
    rel = np.linalg.norm(np.asarray(q_out) - np.asarray(f_out)) / np.linalg.norm(
        np.asarray(f_out)
    )
    assert rel < 0.02, rel


def test_quantize_params_is_selective(rng):
    tree = {
        "enc": {"fc1": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}},
        "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)},
    }
    out = quantize_params(tree, include=lambda path: path and path[-1] == "fc1")
    assert "kernel_q" in out["enc"]["fc1"] and "kernel" not in out["enc"]["fc1"]
    assert "kernel" in out["head"] and "kernel_q" not in out["head"]


_TINY = dict(
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


def _tiny_wrapper(**extra):
    from avex_tpu.models.beats import Model

    return Model(pretrained=False, num_classes=None, init_config={**_TINY, **extra})


def test_beats_quantize_end_to_end(rng):
    wav = np.asarray(rng.standard_normal((2, 16000)) * 0.1, np.float32)
    model = _tiny_wrapper()
    f_feats = np.asarray(model.forward(wav))

    model.quantize("int8")
    q_feats = np.asarray(model.forward(wav))
    assert q_feats.shape == f_feats.shape
    rel = np.linalg.norm(q_feats - f_feats) / np.linalg.norm(f_feats)
    assert rel < 0.05, rel

    # int8 kernels actually present (both attention and ffn denses)
    layer0 = model.variables["params"]["backbone"]["encoder"]["layers_0"]
    assert layer0["self_attn"]["q_proj"]["kernel_q"].dtype == jnp.int8
    assert layer0["fc1"]["kernel_q"].dtype == jnp.int8
    # float-sensitive parts stay float
    assert "kernel" in layer0["self_attn"]["grep_linear"]
    assert "kernel" in model.variables["params"]["backbone"]["patch_embedding"]

    # idempotent
    model.quantize("int8")
    np.testing.assert_array_equal(np.asarray(model.forward(wav)), q_feats)


def test_beats_quantize_extract_embeddings(rng):
    wav = np.asarray(rng.standard_normal((2, 16000)) * 0.1, np.float32)
    model = _tiny_wrapper()
    model.register_hooks_for_layers(["last_layer"])
    f_emb = np.asarray(model.extract_embeddings(wav, aggregation="mean"))
    model.quantize("int8")
    q_emb = np.asarray(model.extract_embeddings(wav, aggregation="mean"))
    assert q_emb.shape == f_emb.shape
    rel = np.linalg.norm(q_emb - f_emb) / np.linalg.norm(f_emb)
    assert rel < 0.05, rel


def test_beats_quantize_scan_layout(rng):
    wav = np.asarray(rng.standard_normal((1, 16000)) * 0.1, np.float32)
    plain = _tiny_wrapper()
    scanned = _tiny_wrapper(scan_layers=True)
    # Same weights in the scanned layout: stack the unrolled layer trees.
    from avex_tpu.models.beats import quantize_beats_params

    f_feats = np.asarray(scanned.forward(wav))
    scanned.variables = dict(scanned.variables)
    scanned.variables["params"] = quantize_beats_params(scanned.variables["params"])
    scanned.cfg = scanned.cfg.model_copy(update={"quantize_encoder": True})
    from avex_tpu.models.beats import BEATsModel

    scanned.module = BEATsModel(cfg=scanned.cfg, num_classes=None, dtype=jnp.float32)
    scanned._jit_cache.clear()
    q_feats = np.asarray(scanned.forward(wav))
    rel = np.linalg.norm(q_feats - f_feats) / np.linalg.norm(f_feats)
    assert rel < 0.05, rel
    stacked = scanned.variables["params"]["backbone"]["encoder"]["layers"]
    assert stacked["fc1"]["kernel_q"].shape[0] == _TINY["encoder_layers"]
    assert stacked["fc1"]["kernel_scale"].ndim == 2  # per-layer channel scales
    del plain


def test_quantize_rejects_unknown_mode_and_fused_qkv():
    model = _tiny_wrapper()
    with pytest.raises(ValueError, match="quantization mode"):
        model.quantize("int4")
    fused = _tiny_wrapper(fused_qkv=True)
    with pytest.raises(ValueError, match="fused_qkv"):
        fused.quantize("int8")


def test_base_model_quantize_default_raises():
    from avex_tpu.models.resnet import Model as ResNetModel

    model = ResNetModel(pretrained=False, num_classes=2, variant="resnet18")
    with pytest.raises(NotImplementedError):
        model.quantize("int8")
