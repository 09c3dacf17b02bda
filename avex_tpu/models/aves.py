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

from typing import Any, Callable, Dict, Optional, Tuple

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


class _DenseParams(nn.Module):
    """Param holder with ``nn.Dense``'s exact tree (``{kernel, bias}``) so the
    fused- and split-QKV attention paths share one checkpoint layout — the
    fused path needs the raw kernels (to concatenate into one ``[E, 3E]``
    gemm) rather than three applied gemms."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _EncoderLayer(nn.Module):
    """Post-norm wav2vec2 transformer layer."""

    cfg: AVESConfig
    dtype: Any = jnp.float32
    #: fused-QKV Pallas attention (ops/pallas_attention.py): the three
    #: projections concatenate into ONE [E, 3E] gemm (weight concat is ~3.5 MB
    #: of HBM traffic per layer — free) and the split/transpose + head-merge
    #: become BlockSpec views inside the kernel. None = auto: on for real-TPU
    #: traces at T >= 248 — measured +7% in-model at AVES' native 5 s T=249
    #: (1,156 vs 1,080 clips/s, B=128 bf16 v5e); the same cell loses at
    #: T=125 (ATST, 0.92x). Training routes the VMEM backward kernel:
    #: measured neutral at T=249 (406 vs 407 clips/s AdamW B=64) and +44%
    #: at T=513 (EAT) — scripts/bench_fused_qkv_ab.py.
    use_pallas: Optional[bool] = None
    #: ring attention over this mesh's model axis (ops/ring_attention.py) —
    #: long-window inference: the [B,H,T,T] score matrix never materializes.
    ring_mesh: Any = None

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        cfg = self.cfg
        dim = cfg.encoder_embed_dim
        heads = cfg.encoder_num_heads
        head_dim = dim // heads
        bsz, seq, _ = x.shape

        residual = x
        qk, qb = _DenseParams(dim, dim, name="q_proj")()
        kk, kb = _DenseParams(dim, dim, name="k_proj")()
        vk, vb = _DenseParams(dim, dim, name="v_proj")()
        ring = self.ring_mesh
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = seq >= 248 and jax.default_backend() == "tpu"
        from avex_tpu.ops.pallas_attention import fused_qkv_compatible

        dt = self.dtype
        if ring is not None:
            from avex_tpu.ops.ring_attention import ring_attention

            q = (x.astype(dt) @ qk.astype(dt) + qb.astype(dt))
            k = (x.astype(dt) @ kk.astype(dt) + kb.astype(dt))
            v = (x.astype(dt) @ vk.astype(dt) + vb.astype(dt))
            q = q.reshape(bsz, seq, heads, head_dim).transpose(0, 2, 1, 3)
            k = k.reshape(bsz, seq, heads, head_dim).transpose(0, 2, 1, 3)
            v = v.reshape(bsz, seq, heads, head_dim).transpose(0, 2, 1, 3)
            # Pad T to a ring multiple with -inf-masked keys (exact; see
            # models/eat.py _Block) and merge the caller's frame mask in.
            pad_len = (-seq) % int(ring.shape["model"])
            mask = padding_mask
            if pad_len:
                grow = ((0, 0), (0, 0), (0, pad_len), (0, 0))
                q, k, v = (jnp.pad(t, grow) for t in (q, k, v))
                base = (
                    padding_mask
                    if padding_mask is not None
                    else jnp.zeros((bsz, seq), bool)
                )
                mask = jnp.pad(base, ((0, 0), (0, pad_len)), constant_values=True)
            attn = ring_attention(
                q, k, v, scale=head_dim**-0.5, mesh=ring, key_padding_mask=mask
            )[:, :, :seq]
            attn = attn.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)
        elif use_pallas and fused_qkv_compatible(dim, heads):
            from avex_tpu.ops.pallas_attention import fused_qkv_attention

            w = jnp.concatenate([qk, kk, vk], axis=1).astype(dt)
            b = jnp.concatenate([qb, kb, vb]).astype(dt)
            qkv_raw = x.astype(dt) @ w + b  # [B, T, 3E], q|k|v heads-major
            attn = fused_qkv_attention(
                qkv_raw, heads=heads, key_padding_mask=padding_mask,
                scale=head_dim**-0.5,
            )
        else:
            q = (x.astype(dt) @ qk.astype(dt) + qb.astype(dt))
            k = (x.astype(dt) @ kk.astype(dt) + kb.astype(dt))
            v = (x.astype(dt) @ vk.astype(dt) + vb.astype(dt))
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
    use_pallas: Optional[bool] = None  # threaded to every _EncoderLayer
    #: nn.scan-stacked layer params (leading layer axis) — the layout
    #: pipeline/sequence parallelism shard (same contract as models/beats.py).
    scan_layers: bool = False
    #: optional layer-stack runner (parallel/pipeline.py, parallel/sequence.py).
    layer_runner: Optional[Callable] = None
    #: ring-attention mesh for long windows (see _EncoderLayer.ring_mesh).
    ring_mesh: Any = None

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

        use_layerdrop = (
            not disable_layerdrop and cfg.encoder_layer_drop > 0 and not deterministic
        )
        intermediates: Dict[str, jnp.ndarray] = {}
        if self.layer_runner is not None and self.scan_layers and not self.is_initializing():
            # Runner-driven layer stack: pipeline (GPipe over the stacked
            # layer axis, parallel/pipeline.py) or Megatron-SP
            # (parallel/sequence.py). Deterministic-only — per-layer dropout
            # rngs do not thread through the runner contract (same caveat as
            # models/beats.py); intermediates are not captured (only final
            # activations cross stage boundaries).
            if use_layerdrop:
                raise ValueError("runner-driven encoder does not support layerdrop")
            if not deterministic and max(
                cfg.encoder_dropout,
                cfg.encoder_attention_dropout,
                cfg.encoder_ff_interm_dropout,
                cfg.encoder_projection_dropout,
            ) > 0:
                raise ValueError(
                    "runner-driven encoder (pipeline/sequence-parallel) is "
                    "deterministic-only; set the encoder dropout rates to 0 "
                    "to train with it"
                )
            stacked = self.get_variable("params", "layers")
            has_mask = frame_mask is not None
            # parent=None: free-standing functional twin of the scanned layer.
            layer_module = _EncoderLayer(
                cfg=cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                ring_mesh=self.ring_mesh, parent=None,
            )

            def layer_fn(p, x, *extras):
                mask = extras[0] if has_mask else None
                new_x, _ff = layer_module.apply({"params": p}, x, mask, True)
                return new_x

            batched = (frame_mask,) if has_mask else ()
            h = self.layer_runner(layer_fn, stacked, h, batched, ())
        elif self.scan_layers:
            # One traced layer body scanned L times (params stacked on a
            # leading layer axis) — the layout pipeline/SP shard; weight
            # conversion stacks per-layer tensors
            # (convert_aves_state_dict(scan_layers=True)).
            def body(layer_module, carry, _xs):
                x = carry
                new_x, ff_out = layer_module(x, frame_mask, deterministic)
                if use_layerdrop:
                    keep = (
                        jax.random.uniform(layer_module.make_rng("layerdrop"), ())
                        > cfg.encoder_layer_drop
                    )
                    new_x = jnp.where(keep, new_x, x)
                    ff_out = jnp.where(keep, ff_out, jnp.zeros_like(ff_out))
                return new_x, ff_out

            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "layerdrop": True},
                length=cfg.encoder_num_layers,
            )
            h, ff_stack = scanned(
                _EncoderLayer(
                    cfg=cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                    ring_mesh=self.ring_mesh, name="layers",
                ),
                h,
                None,
            )
            for i in range(cfg.encoder_num_layers):
                intermediates[
                    f"model.encoder.transformer.layers.{i}.feed_forward.output_dense"
                ] = ff_stack[i]
        else:
            for i in range(cfg.encoder_num_layers):
                layer = _EncoderLayer(
                    cfg=cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                    ring_mesh=self.ring_mesh, name=f"layers_{i}",
                )
                new_h, ff_out = layer(h, frame_mask, deterministic)
                if use_layerdrop:
                    keep = (
                        jax.random.uniform(self.make_rng("layerdrop"), ())
                        > cfg.encoder_layer_drop
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
    state: Dict[str, np.ndarray],
    num_classes: Optional[int] = None,
    scan_layers: bool = False,
) -> Dict[str, Any]:
    """torchaudio wav2vec2 state dict → flax variables.

    Handles the published AVES/BirdAVES ``*.torchaudio.pt`` naming (optionally
    behind the wrapper's ``model.`` prefix, already stripped upstream) and
    folds the weight-normed positional conv. With ``scan_layers``, per-layer
    tensors stack on a leading layer axis (the ``nn.scan`` layout).
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
    if scan_layers:
        from avex_tpu.models.eat import stack_block_params

        params = stack_block_params(params, marker="layers")
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
        use_pallas: Optional[bool] = None,
        scan_layers: bool = False,
        aves_cfg: Optional[Dict[str, Any]] = None,
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.config = AVESConfig(aves_cfg)
        self.num_classes = None if return_features_only else num_classes
        self.scan_layers = bool(scan_layers)
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self._module_kwargs = dict(
            cfg=self.config,
            num_classes=self.num_classes,
            dtype=dtype,
            use_pallas=use_pallas,
            scan_layers=self.scan_layers,
        )
        self.module = AVESModel(**self._module_kwargs)
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

    def _require_scan_layout(self, what: str) -> None:
        if not self.scan_layers:
            raise ValueError(
                f"{what} needs the stacked (scan_layers=True) parameter "
                "layout; construct the model with scan_layers=True"
            )

    def enable_pipeline(self, mesh, num_microbatches: Optional[int] = None) -> None:
        """Rebuild the module to run the layer stack pipeline-parallel over
        ``mesh``'s model axis (GPipe — parallel/pipeline.py). Requires the
        nn.scan layout; same contract as ``models/beats.py``."""
        from avex_tpu.parallel.pipeline import make_pipeline_runner

        self._require_scan_layout("pipeline parallelism")
        self.module = AVESModel(
            **{**self._module_kwargs,
               "layer_runner": make_pipeline_runner(mesh, num_microbatches=num_microbatches)}
        )
        self._jit_cache.clear()

    def enable_sequence_parallel(self, mesh) -> None:
        """Rebuild the module with Megatron-SP sequence parallelism
        (parallel/sequence.py): layer activations re-shard ``[B, T(model), E]``
        at every layer boundary. Requires ``scan_layers=True``."""
        from avex_tpu.parallel.sequence import make_sequence_parallel_runner

        self._require_scan_layout("sequence parallelism")
        self.module = AVESModel(
            **{**self._module_kwargs, "layer_runner": make_sequence_parallel_runner(mesh)}
        )
        self._jit_cache.clear()

    def enable_ring_attention(self, mesh, axis: str = "model") -> None:
        """Rebuild the module with ring attention over ``mesh``'s model axis
        (ops/ring_attention.py) — long-window inference mode; see
        ``models/beats.py`` ``enable_ring_attention``."""
        self.module = AVESModel(**{**self._module_kwargs, "ring_mesh": mesh})
        self._jit_cache.clear()

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a torchaudio-style AVES/HuBERT state dict (prefix-tolerant)."""
        converted = convert_aves_state_dict(
            state, num_classes=self.num_classes, scan_layers=self.scan_layers
        )
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
