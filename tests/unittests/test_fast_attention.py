"""fast_attention (reduced-precision softmax) numerics and plumbing.

bfloat16 compute auto-enables the bf16 logits/softmax chain — the dominant
HBM stream of the encoder (measured +33% end-to-end on v5e). These tests pin
the contract: fp32 stays the exact parity path, the bf16-fast path tracks it
within bf16 tolerance, and the flag can be forced either way.
"""

import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.beats import BEATsBackbone, BEATsConfig
from avex_tpu.ops.attention import dot_product_attention


def _tiny_cfg(**kw):
    return BEATsConfig(
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        embed_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_layerdrop=0.0,
        dropout_input=0.0,
        **kw,
    )


def test_logits_dtype_flag_changes_only_precision(rng):
    q = jnp.asarray(rng.standard_normal((2, 4, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 4, 16, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 16, 8)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((2, 4, 16, 16)) * 0.1, jnp.float32)
    exact = dot_product_attention(q, k, v, bias=bias)
    fast = dot_product_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        bias=bias, logits_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(exact), rtol=0.1, atol=0.05
    )


def test_bf16_auto_fast_attention_tracks_fp32(rng):
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.1, jnp.float32)

    ref_model = BEATsBackbone(cfg=_tiny_cfg(), dtype=jnp.float32)
    variables = ref_model.init(jax.random.PRNGKey(0), wav)
    ref, _ = ref_model.apply(variables, wav)

    # bf16 compute: fast_attention auto-on (None); outputs stay within bf16
    # tolerance of the fp32 parity path.
    fast_model = BEATsBackbone(cfg=_tiny_cfg(), dtype=jnp.bfloat16)
    fast, _ = fast_model.apply(variables, wav)
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(ref), rtol=0.15, atol=0.08
    )

    # forcing fast_attention=False under bf16 must also run (fp32 softmax).
    safe_model = BEATsBackbone(cfg=_tiny_cfg(fast_attention=False), dtype=jnp.bfloat16)
    safe, _ = safe_model.apply(variables, wav)
    np.testing.assert_allclose(
        np.asarray(safe, np.float32), np.asarray(ref), rtol=0.15, atol=0.08
    )


def test_fp32_ignores_auto_fast_attention(rng):
    """fp32 compute keeps the exact softmax — auto must not change fp32."""
    wav = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    cfg_auto = _tiny_cfg()
    cfg_off = _tiny_cfg(fast_attention=False)
    model_auto = BEATsBackbone(cfg=cfg_auto, dtype=jnp.float32)
    variables = model_auto.init(jax.random.PRNGKey(0), wav)
    out_auto, _ = model_auto.apply(variables, wav)
    out_off, _ = BEATsBackbone(cfg=cfg_off, dtype=jnp.float32).apply(variables, wav)
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_off))


def test_relative_position_bucket_jnp_matches_numpy():
    """The in-graph bucket computation must be an exact twin of the numpy
    version at every length (it feeds the shared T5 bias table; a flipped
    bucket is a silent numerics change)."""
    from avex_tpu.ops.attention import (
        relative_position_bucket,
        relative_position_bucket_jnp,
    )

    for t in (4, 97, 248, 496, 1024):
        expected = relative_position_bucket(t, t)
        got = np.asarray(jax.jit(lambda t=t: relative_position_bucket_jnp(t, t))())
        np.testing.assert_array_equal(got, expected)


def test_fused_qkv_identical_outputs(rng):
    """fused_qkv (single 3E-wide gemm) is numerically identical to the three
    separate projections once the kernels are concatenated in q|k|v order —
    the layout convert_beats_state_dict(fused_qkv) emits."""
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)

    base = BEATsBackbone(cfg=_tiny_cfg(), dtype=jnp.float32)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), wav)
    out_base, _ = jax.jit(base.apply)(variables, wav)

    # Build the fused param tree from the unfused one.
    fused_vars = jax.tree_util.tree_map(lambda x: x, variables)  # deep copy
    encoder = fused_vars["params"]["encoder"]
    for name, layer in list(encoder.items()):
        attn = layer.get("self_attn") if isinstance(layer, dict) else None
        if not attn or "q_proj" not in attn:
            continue
        attn["qkv_proj"] = {
            "kernel": jnp.concatenate(
                [attn["q_proj"]["kernel"], attn["k_proj"]["kernel"], attn["v_proj"]["kernel"]],
                axis=1,
            ),
            "bias": jnp.concatenate(
                [attn["q_proj"]["bias"], attn["k_proj"]["bias"], attn["v_proj"]["bias"]]
            ),
        }
        for old in ("q_proj", "k_proj", "v_proj"):
            del attn[old]

    fused = BEATsBackbone(cfg=_tiny_cfg(fused_qkv=True), dtype=jnp.float32)
    out_fused, _ = jax.jit(fused.apply)(fused_vars, wav)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_base), atol=1e-5, rtol=1e-5
    )


def test_fused_qkv_converter(rng):
    """convert_beats_state_dict(fused_qkv=True cfg) emits qkv_proj that the
    fused module initializes/accepts shape-identically."""
    from avex_tpu.models.beats import convert_beats_state_dict

    cfg = _tiny_cfg(fused_qkv=True)
    dim, heads = cfg.encoder_embed_dim, cfg.encoder_attention_heads
    state = {}
    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}.self_attn"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{base}.{p}.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
            state[f"{base}.{p}.bias"] = rng.standard_normal(dim).astype(np.float32)
    converted = convert_beats_state_dict(state, cfg)
    attn = converted["params"]["backbone"]["encoder"]["layers_0"]["self_attn"]
    assert "qkv_proj" in attn and "q_proj" not in attn
    assert attn["qkv_proj"]["kernel"].shape == (dim, 3 * dim)
    np.testing.assert_array_equal(
        np.asarray(attn["qkv_proj"]["kernel"][:, :dim]),
        state["encoder.layers.0.self_attn.q_proj.weight"].T,
    )
