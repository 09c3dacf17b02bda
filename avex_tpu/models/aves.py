"""AVES / BirdAVES (HuBERT-base wav2vec2) in Flax.

TPU-native counterpart of ``avex/models/aves_model.py`` (which wraps
``torchaudio.models.wav2vec2_model`` with a hardcoded HuBERT-base config,
aves_model.py:19-57). Architecture follows the fairseq/torchaudio wav2vec2
layout the published ``*.torchaudio.pt`` checkpoints use:

- 7-layer strided conv1d feature extractor (group_norm mode: GroupNorm after
  conv 0 only), 320-sample hop → 50 Hz frames;
- LayerNorm + Linear feature projection (512 → 768);
- conv positional embedding (k=128, 16 groups, weight norm folded at load);
- 12 post-norm transformer layers (768 dim, 12 heads, 3072 FFN).

``forward`` returns the last layer's features (aves_model.py:150-151); the
embedding taps are the reference's allow-list
(``model.encoder.transformer.layers.{i}.feed_forward.output_dense``,
aves_model.py:100-118).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.utils.tree import merge_converted_params

__all__ = ["AVESConfig", "AVESModel", "Model", "convert_aves_state_dict"]

#: (out_channels, kernel, stride) — HuBERT-base conv feature extractor.
CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


class AVESConfig:
    """HuBERT-base hyper-parameters (≈ aves_model.py:19-57)."""

    def __init__(self, cfg: Optional[dict] = None) -> None:
        self.extractor_conv_layer_config = [list(c) for c in CONV_LAYERS]
        self.extractor_conv_bias = False
        self.encoder_embed_dim = 768
        self.encoder_projection_dropout = 0.1
        self.encoder_pos_conv_kernel = 128
        self.encoder_pos_conv_groups = 16
        self.encoder_num_layers = 12
        self.encoder_num_heads = 12
        self.encoder_attention_dropout = 0.1
        self.encoder_ff_interm_features = 3072
        self.encoder_ff_interm_dropout = 0.0
        self.encoder_dropout = 0.1
        self.encoder_layer_norm_first = False
        self.encoder_layer_drop = 0.05
        if cfg:
            self.__dict__.update(cfg)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class _FeatureExtractor(nn.Module):
    """Strided conv1d stack (group_norm mode: GroupNorm after conv 0 only)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x[:, :, None]  # (B, T, 1)
        for i, (ch, k, s) in enumerate(CONV_LAYERS):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, dtype=self.dtype, name="group_norm")(x)
            x = _gelu(x)
        return x  # (B, frames, 512)


class _EncoderLayer(nn.Module):
    """Post-norm wav2vec2 transformer layer."""

    cfg: AVESConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        cfg = self.cfg
        dim = cfg.encoder_embed_dim
        heads = cfg.encoder_num_heads
        head_dim = dim // heads
        bsz, seq, _ = x.shape

        residual = x
        q = nn.Dense(dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(dim, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(bsz, seq, heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, seq, heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, seq, heads, head_dim).transpose(0, 2, 1, 3)
        bias = None
        if padding_mask is not None:
            bias = jnp.where(padding_mask[:, None, None, :], -jnp.inf, 0.0)
        from avex_tpu.ops.attention import dot_product_attention

        # bf16 compute runs the softmax chain in bf16 too (see ops.attention).
        attn = dot_product_attention(
            q, k, v, bias=bias, scale=head_dim**-0.5,
            logits_dtype=jnp.float32 if self.dtype == jnp.float32 else self.dtype,
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)
        attn = nn.Dense(dim, dtype=self.dtype, name="out_proj")(attn)
        attn = nn.Dropout(cfg.encoder_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(residual + attn)

        residual = x
        h = nn.Dense(cfg.encoder_ff_interm_features, dtype=self.dtype, name="intermediate_dense")(x)
        h = _gelu(h)
        h = nn.Dropout(cfg.encoder_ff_interm_dropout)(h, deterministic=deterministic)
        ff_out = nn.Dense(dim, dtype=self.dtype, name="output_dense")(h)
        h = nn.Dropout(cfg.encoder_dropout)(ff_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(residual + h)
        return x, ff_out


class AVESModel(nn.Module):
    """Full AVES backbone returning ``(last_layer_features, aux)``."""

    cfg: AVESConfig
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        disable_layerdrop: bool = True,
    ):
        cfg = self.cfg
        feats = _FeatureExtractor(dtype=self.dtype, name="feature_extractor")(
            x.astype(jnp.float32)
        )

        frame_mask = None
        if padding_mask is not None:
            # conv framing: 320-sample hop after the full stack; a frame is
            # valid when it overlaps any valid sample.
            from avex_tpu.models.beats import downsample_padding_mask

            frame_mask = downsample_padding_mask(padding_mask, feats.shape[1])

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="fp_layer_norm")(feats)
        h = nn.Dense(cfg.encoder_embed_dim, dtype=self.dtype, name="fp_projection")(h)
        h = nn.Dropout(cfg.encoder_projection_dropout)(h, deterministic=deterministic)

        if frame_mask is not None:
            h = jnp.where(frame_mask[:, :, None], 0.0, h)

        pos = nn.Conv(
            cfg.encoder_embed_dim,
            (cfg.encoder_pos_conv_kernel,),
            feature_group_count=cfg.encoder_pos_conv_groups,
            padding=[(cfg.encoder_pos_conv_kernel // 2, cfg.encoder_pos_conv_kernel // 2)],
            dtype=self.dtype,
            name="pos_conv",
        )(h)
        if cfg.encoder_pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1, :]
        h = h + _gelu(pos)
        if not cfg.encoder_layer_norm_first:
            # fairseq post-norm places the encoder LayerNorm right after the
            # positional conv, before the layer stack.
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_layer_norm")(h)
        h = nn.Dropout(cfg.encoder_dropout)(h, deterministic=deterministic)

        intermediates: Dict[str, jnp.ndarray] = {}
        for i in range(cfg.encoder_num_layers):
            layer = _EncoderLayer(cfg=cfg, dtype=self.dtype, name=f"layers_{i}")
            new_h, ff_out = layer(h, frame_mask, deterministic)
            if not disable_layerdrop and cfg.encoder_layer_drop > 0 and not deterministic:
                keep = (
                    jax.random.uniform(self.make_rng("layerdrop"), ()) > cfg.encoder_layer_drop
                )
                new_h = jnp.where(keep, new_h, h)
                ff_out = jnp.where(keep, ff_out, jnp.zeros_like(ff_out))
            h = new_h
            intermediates[
                f"model.encoder.transformer.layers.{i}.feed_forward.output_dense"
            ] = ff_out

        aux = {"intermediates": intermediates, "padding_mask": frame_mask, "features": h}
        if self.num_classes is not None:
            if frame_mask is not None:
                masked = jnp.where(frame_mask[:, :, None], 0.0, h)
                denom = jnp.maximum(jnp.sum(~frame_mask, axis=1, keepdims=True), 1)
                pooled = masked.sum(axis=1) / denom
            else:
                pooled = h.mean(axis=1)
            aux["pooled"] = pooled
            logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)
            return logits, aux
        return h, aux


def convert_aves_state_dict(
    state: Dict[str, np.ndarray], num_classes: Optional[int] = None
) -> Dict[str, Any]:
    """torchaudio wav2vec2 state dict → flax variables.

    Handles the published AVES/BirdAVES ``*.torchaudio.pt`` naming (optionally
    behind the wrapper's ``model.`` prefix, already stripped upstream) and
    folds the weight-normed positional conv.
    """
    from avex_tpu.models.beats import _fold_weight_norm

    state = dict(state)
    # Fold pos_conv weight norm (parametrized or g/v naming).
    for prefix in list(
        {
            k.split(".parametrizations.weight")[0]
            for k in state
            if "pos_conv" in k and "parametrizations.weight" in k
        }
    ):
        g = state.pop(f"{prefix}.parametrizations.weight.original0")
        v = state.pop(f"{prefix}.parametrizations.weight.original1")
        state[f"{prefix}.weight"] = _fold_weight_norm(g, v)
    for prefix in list({k[: -len(".weight_g")] for k in state if k.endswith("weight_g") and "pos_conv" in k}):
        g = state.pop(f"{prefix}.weight_g")
        v = state.pop(f"{prefix}.weight_v")
        state[f"{prefix}.weight"] = _fold_weight_norm(g, v)

    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, np.float32))

    def dense(torch_prefix, path):
        put(path + ("kernel",), state[f"{torch_prefix}.weight"].T)
        if f"{torch_prefix}.bias" in state:
            put(path + ("bias",), state[f"{torch_prefix}.bias"])

    def ln(torch_prefix, path):
        put(path + ("scale",), state[f"{torch_prefix}.weight"])
        put(path + ("bias",), state[f"{torch_prefix}.bias"])

    for i in range(len(CONV_LAYERS)):
        key = f"feature_extractor.conv_layers.{i}.conv.weight"
        put(("feature_extractor", f"conv_{i}", "kernel"), np.transpose(state[key], (2, 1, 0)))
    gn = "feature_extractor.conv_layers.0.layer_norm"
    if f"{gn}.weight" in state:
        put(("feature_extractor", "group_norm", "scale"), state[f"{gn}.weight"])
        put(("feature_extractor", "group_norm", "bias"), state[f"{gn}.bias"])

    ln("encoder.feature_projection.layer_norm", ("fp_layer_norm",))
    dense("encoder.feature_projection.projection", ("fp_projection",))

    pos_key = "encoder.transformer.pos_conv_embed.conv"
    put(("pos_conv", "kernel"), np.transpose(state[f"{pos_key}.weight"], (2, 1, 0)))
    put(("pos_conv", "bias"), state[f"{pos_key}.bias"])
    ln("encoder.transformer.layer_norm", ("encoder_layer_norm",))

    i = 0
    while f"encoder.transformer.layers.{i}.attention.q_proj.weight" in state:
        base = f"encoder.transformer.layers.{i}"
        flax_base = (f"layers_{i}",)
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(f"{base}.attention.{name}", flax_base + (name,))
        ln(f"{base}.layer_norm", flax_base + ("layer_norm",))
        dense(f"{base}.feed_forward.intermediate_dense", flax_base + ("intermediate_dense",))
        dense(f"{base}.feed_forward.output_dense", flax_base + ("output_dense",))
        ln(f"{base}.final_layer_norm", flax_base + ("final_layer_norm",))
        i += 1

    if num_classes is not None and "classifier.weight" in state:
        dense("classifier", ("classifier",))
    return {"params": params}


class Model(ModelBase):
    """AVES wrapper registered as ``aves_bio`` (≈ avex/models/aves_model.py)."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.config = AVESConfig()
        self.num_classes = None if return_features_only else num_classes
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.module = AVESModel(cfg=self.config, num_classes=self.num_classes, dtype=dtype)
        dummy = jnp.zeros((1, 16000), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"deterministic": True, "disable_layerdrop": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = [
                f"model.encoder.transformer.layers.{i}.feed_forward.output_dense"
                for i in range(self.config.encoder_num_layers)
            ]

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a torchaudio-style AVES/HuBERT state dict (prefix-tolerant)."""
        converted = convert_aves_state_dict(state, num_classes=self.num_classes)
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
