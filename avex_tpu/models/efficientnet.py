"""EfficientNet-B0/B1 in Flax with torchvision weight compatibility.

TPU-native counterpart of ``avex/models/efficientnet.py`` (which wraps
torchvision). The architecture reproduces torchvision's EfficientNet exactly
(MBConv with squeeze-excitation, BatchNorm, SiLU, stochastic depth) so
IMAGENET1K_V1 / fine-tuned ESP checkpoints convert mechanically; NHWC layout
internally (the TPU-native conv layout), with intermediates exposed in the
reference's NCHW orientation under torchvision's module names
(``model.features.0.0``, ``model.features.{i}.{j}.block.3.0``,
``model.features.8.0`` — the wrapper's embedding allow-list,
efficientnet.py:82-114).

Notes vs the reference wrapper:
- the fp16-NaN guard (efficientnet.py:191-208) is unnecessary on TPU (bf16
  has fp32's exponent range);
- gradient checkpointing maps to ``nn.remat`` over stages.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.utils.tree import merge_converted_params

__all__ = ["EfficientNetModel", "Model", "convert_efficientnet_state_dict", "VARIANTS"]

# (expand_ratio, channels, layers, stride, kernel) per stage — B0 base.
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

#: variant → (width_mult, depth_mult, dropout)
VARIANTS = {"b0": (1.0, 1.0, 0.2), "b1": (1.0, 1.1, 0.2)}


def _round_channels(channels: float, width_mult: float, divisor: int = 8) -> int:
    """torchvision ``_make_divisible`` channel rounding."""
    channels *= width_mult
    new = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new < 0.9 * channels:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(repeats * depth_mult))


def stage_config(variant: str) -> List[Tuple[int, int, int, int, int]]:
    """Width/depth-scaled stage table for an EfficientNet variant."""
    width, depth, _do = VARIANTS[variant]
    return [
        (t, _round_channels(c, width), _round_repeats(n, depth), s, k)
        for (t, c, n, s, k) in _B0_STAGES
    ]


class _ConvBN(nn.Module):
    """Conv + BatchNorm (+ SiLU), torchvision Conv2dNormActivation layout."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5
    tf_same_padding: bool = False

    def _padding(self, x) -> List[Tuple[int, int]]:
        if not self.tf_same_padding:
            pad = (self.kernel - 1) // 2
            return [(pad, pad), (pad, pad)]

        # TF/Keras 'SAME' semantics (keras `imagenet_utils.correct_pad`):
        # total pad = max(k - (size mod s or s), 0), extra row/col at the
        # END — asymmetric when a stride-2 conv meets an even input. Shapes
        # are static under jit, so this is resolved at trace time.
        def same(size: int) -> Tuple[int, int]:
            rem = size % self.stride
            total = max(self.kernel - (rem if rem else self.stride), 0)
            return total // 2, total - total // 2

        return [same(int(x.shape[1])), same(int(x.shape[2]))]

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_out = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self._padding(x),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(conv_out)
        if self.act:
            x = nn.silu(x)
        return x, conv_out


class _MBConv(nn.Module):
    """Mobile inverted bottleneck with SE, matching torchvision MBConv."""

    in_channels: int
    out_channels: int
    expand_ratio: int
    stride: int
    kernel: int
    stochastic_depth_prob: float = 0.0
    dtype: Any = jnp.float32
    bn_eps: float = 1e-5
    tf_same_padding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        residual = x
        expanded = self.in_channels * self.expand_ratio
        common = dict(dtype=self.dtype, bn_eps=self.bn_eps, tf_same_padding=self.tf_same_padding)
        if self.expand_ratio != 1:
            x, _ = _ConvBN(expanded, 1, name="expand", **common)(x, train)
        x, _ = _ConvBN(
            expanded, self.kernel, self.stride, groups=expanded, name="dw", **common
        )(x, train)

        # Squeeze-excitation: squeeze width from the *block input* channels.
        squeeze = max(1, self.in_channels // 4)
        scale = jnp.mean(x, axis=(1, 2), keepdims=True)
        scale = nn.Conv(squeeze, (1, 1), dtype=self.dtype, name="se_fc1")(scale)
        scale = nn.silu(scale)
        scale = nn.Conv(expanded, (1, 1), dtype=self.dtype, name="se_fc2")(scale)
        x = x * jax.nn.sigmoid(scale)

        x, proj_conv_out = _ConvBN(self.out_channels, 1, act=False, name="project", **common)(
            x, train
        )

        if self.stride == 1 and self.in_channels == self.out_channels:
            if not deterministic and self.stochastic_depth_prob > 0:
                keep = 1.0 - self.stochastic_depth_prob
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1)
                )
                x = x * mask / keep
            x = x + residual
        return x, proj_conv_out


class EfficientNetModel(nn.Module):
    """Full EfficientNet: stem → 7 stages → head conv → pool → classifier.

    ``__call__`` returns ``(output, aux)``; aux["intermediates"] carries the
    reference wrapper's embedding layers (raw conv outputs, NCHW).
    """

    variant: str = "b0"
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32
    #: BatchNorm epsilon: 1e-5 matches torchvision checkpoints; TF/Keras
    #: checkpoints (Perch) were trained with 1e-3.
    bn_eps: float = 1e-5
    #: TF 'SAME' conv padding (asymmetric at stride 2 on even inputs) for
    #: TF-provenance weights; False = torchvision's symmetric (k-1)//2.
    tf_same_padding: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        deterministic: bool = True,
    ):
        # Input arrives as (B, 3, F, T) (torch layout from process_audio) or
        # (B, F, T): normalize to NHWC.
        if x.ndim == 3:
            x = jnp.repeat(x[:, None, :, :], 3, axis=1)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NCHW -> NHWC

        intermediates: Dict[str, jnp.ndarray] = {}

        def record(name: str, conv_out: jnp.ndarray) -> None:
            intermediates[name] = jnp.transpose(conv_out, (0, 3, 1, 2))  # NHWC->NCHW

        stages = stage_config(self.variant)
        common = dict(dtype=self.dtype, bn_eps=self.bn_eps, tf_same_padding=self.tf_same_padding)
        stem_width = _round_channels(32, VARIANTS[self.variant][0])
        x, conv_out = _ConvBN(stem_width, 3, 2, name="features_0", **common)(x, train)
        record("model.features.0.0", conv_out)

        total_blocks = sum(n for (_t, _c, n, _s, _k) in stages)
        block_idx = 0
        in_ch = stem_width
        for stage_i, (t, c, n, s, k) in enumerate(stages, start=1):
            for j in range(n):
                sd_prob = 0.2 * block_idx / max(total_blocks, 1)
                block = _MBConv(
                    in_channels=in_ch,
                    out_channels=c,
                    expand_ratio=t,
                    stride=s if j == 0 else 1,
                    kernel=k,
                    stochastic_depth_prob=sd_prob,
                    name=f"features_{stage_i}_{j}",
                    **common,
                )
                x, proj_out = block(x, train, deterministic)
                # torchvision path of the projection conv: block.3.0 when the
                # block has an expansion stage, block.2.0 otherwise; the
                # reference allow-list only tracks .block.3.0.
                if t != 1:
                    record(f"model.features.{stage_i}.{j}.block.3.0", proj_out)
                in_ch = c
                block_idx += 1

        head_width = _round_channels(1280, VARIANTS[self.variant][0])
        x, conv_out = _ConvBN(head_width, 1, name="features_8", **common)(x, train)
        record("model.features.8.0", conv_out)

        features_nchw = jnp.transpose(x, (0, 3, 1, 2))
        aux = {"intermediates": intermediates, "features": features_nchw}

        pooled = jnp.mean(x, axis=(1, 2))
        aux["pooled"] = pooled
        if self.num_classes is None:
            return features_nchw, aux
        dropout = VARIANTS[self.variant][2]
        h = nn.Dropout(dropout)(pooled, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(h)
        return logits, aux


# ---------------------------------------------------------------------------
# Weight conversion (torchvision state dict → flax)
# ---------------------------------------------------------------------------


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (O, I/g, kH, kW) → flax (kH, kW, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_efficientnet_state_dict(
    state: Dict[str, np.ndarray],
    variant: str = "b0",
    num_classes: Optional[int] = None,
) -> Dict[str, Any]:
    """Convert a torchvision-style EfficientNet state dict to flax variables.

    Handles both bare torchvision checkpoints (keys ``features...``) and the
    reference wrapper exports (keys ``model.features...``).
    """
    state = {
        (k[len("model.") :] if k.startswith("model.") else k): v for k, v in state.items()
    }
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path: Tuple[str, ...], value: np.ndarray) -> None:
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, np.float32))

    def convert_convbn(torch_prefix: str, flax_path: Tuple[str, ...]) -> None:
        if f"{torch_prefix}.0.weight" not in state:
            return
        put(params, flax_path + ("conv", "kernel"), _conv_kernel(state[f"{torch_prefix}.0.weight"]))
        put(params, flax_path + ("bn", "scale"), state[f"{torch_prefix}.1.weight"])
        put(params, flax_path + ("bn", "bias"), state[f"{torch_prefix}.1.bias"])
        put(batch_stats, flax_path + ("bn", "mean"), state[f"{torch_prefix}.1.running_mean"])
        put(batch_stats, flax_path + ("bn", "var"), state[f"{torch_prefix}.1.running_var"])

    convert_convbn("features.0", ("features_0",))

    stages = stage_config(variant)
    for stage_i, (t, _c, n, _s, _k) in enumerate(stages, start=1):
        for j in range(n):
            torch_base = f"features.{stage_i}.{j}.block"
            flax_base = (f"features_{stage_i}_{j}",)
            if t != 1:
                convert_convbn(f"{torch_base}.0", flax_base + ("expand",))
                dw_idx, se_idx, proj_idx = 1, 2, 3
            else:
                dw_idx, se_idx, proj_idx = 0, 1, 2
            convert_convbn(f"{torch_base}.{dw_idx}", flax_base + ("dw",))
            for torch_name, flax_name in (("fc1", "se_fc1"), ("fc2", "se_fc2")):
                w_key = f"{torch_base}.{se_idx}.{torch_name}.weight"
                if w_key in state:
                    put(params, flax_base + (flax_name, "kernel"), _conv_kernel(state[w_key]))
                    put(
                        params,
                        flax_base + (flax_name, "bias"),
                        state[f"{torch_base}.{se_idx}.{torch_name}.bias"],
                    )
            convert_convbn(f"{torch_base}.{proj_idx}", flax_base + ("project",))

    convert_convbn("features.8", ("features_8",))

    if num_classes is not None and "classifier.1.weight" in state:
        put(params, ("classifier", "kernel"), state["classifier.1.weight"].T)
        put(params, ("classifier", "bias"), state["classifier.1.bias"])

    return {"params": params, "batch_stats": batch_stats}


class Model(ModelBase):
    """EfficientNet wrapper registered as ``efficientnet``
    (≈ avex/models/efficientnet.py)."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = True,
        audio_config: Optional[Dict[str, Any]] = None,
        efficientnet_variant: str = "b0",
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        if num_classes is None and not return_features_only:
            return_features_only = True
        self.variant = efficientnet_variant
        self.num_classes = None if return_features_only else num_classes
        self._return_features_only = return_features_only
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        if dtype == jnp.bfloat16 and self.audio_processor is not None:
            # bf16 trunk -> bf16-operand rDFT/mel matmuls (fp32 accumulate).
            # Measured on v5e at B=128: full model 14.3 -> 11.25 ms/batch
            # (8,956 -> 11,379 clips/s) with last-layer feature drift 2.1e-2
            # vs the HIGHEST frontend; probe metrics survive it (end-task
            # drift test in tests/integration/test_quant_end_task.py).
            # fp32 trunks keep the torch-parity HIGHEST default.
            self.audio_processor.precision = jax.lax.Precision.DEFAULT
        self.module = EfficientNetModel(
            variant=efficientnet_variant, num_classes=self.num_classes, dtype=dtype
        )
        # Params are resolution-independent; init on a small dummy spectrogram.
        dummy = jnp.zeros((1, 3, 128, 64), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"train": False, "deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            names = ["model.features.0.0"]
            for stage_i, (t, _c, n, _s, _k) in enumerate(stage_config(self.variant), start=1):
                if t == 1:
                    continue
                for j in range(n):
                    names.append(f"model.features.{stage_i}.{j}.block.3.0")
            names.append("model.features.8.0")
            self._layer_names = names

    def process_audio(self, x: jnp.ndarray) -> jnp.ndarray:
        """Spectrogram + 3-channel repeat (efficientnet.py:137-141)."""
        x = super().process_audio(jnp.asarray(x, jnp.float32))
        if x.ndim == 3:  # (B, F, T) -> (B, 3, F, T)
            x = jnp.repeat(x[:, None, :, :], 3, axis=1)
        return x

    def forward(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None):
        # The audio frontend runs outside the conv net, like the reference
        # wrapper's process_audio-then-forward split.
        """Waveform/spectrogram -> logits (or features when classifier-less)."""
        x = self.process_audio(x)
        return super().forward(x, None)

    def extract_fn(self, layers, aggregation):
        # The audio frontend (STFT→mel→norm→3-channel) runs inside the same
        # jitted program as the conv net, so XLA fuses the whole path.
        """Extraction fn with the audio frontend fused into the jitted program."""
        inner = super().extract_fn(layers, aggregation)

        def extract(variables, x, padding_mask):
            if x.ndim == 2:  # raw waveform
                x = self.process_audio(x)
            return inner(variables, x, None)

        return extract

    @staticmethod
    def _aggregate(emb: jnp.ndarray, aggregation: str) -> jnp.ndarray:
        """EfficientNet-specific pooled aggregation for 4D conv maps.

        Mirrors the reference wrapper's override (efficientnet.py:296-314):
        (B, C, H, W) pools over the trailing time axis (mean/max) then
        flattens to (B, C*H); cls_token takes channel 0 then flattens.
        2D/3D inputs keep the base semantics.
        """
        if emb.ndim != 4:
            return ModelBase._aggregate(emb, aggregation)
        if aggregation == "mean":
            pooled = emb.mean(axis=-1)
        elif aggregation == "max":
            pooled = emb.max(axis=-1)
        elif aggregation == "cls_token":
            pooled = emb[:, 0, :]
        else:
            raise ValueError(f"Unsupported aggregation method: {aggregation}")
        return pooled.reshape(pooled.shape[0], -1)

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a torchvision-style EfficientNet state dict."""
        converted = convert_efficientnet_state_dict(
            state, variant=self.variant, num_classes=self.num_classes
        )
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()

    def enable_gradient_checkpointing(self) -> None:
        """Handled by the trainer's remat policy."""
