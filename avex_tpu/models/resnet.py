"""ResNet-18/50/152 in Flax with torchvision weight compatibility.

TPU-native counterpart of ``avex/models/resnet.py:22-157`` (a torchvision
wrapper): mel-spectrogram → 3-channel [0,1]-normalized image → ResNet. NHWC
internally; features returned NCHW like the reference. The reference's
discoverable layers degenerate to just the classifier (ModelBase default
discovers nn.Linear only); here the four stage outputs are additionally
exposed (``backbone.layer{1..4}``) since they are the useful embedding taps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.utils.tree import merge_converted_params

__all__ = ["ResNetModel", "Model", "convert_resnet_state_dict", "RESNET_VARIANTS"]

#: variant → (block type, stage depths)
RESNET_VARIANTS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.relu(_ConvBN(self.features, 3, self.stride, self.dtype, name="cb1")(x, train))
        out = _ConvBN(self.features, 3, 1, self.dtype, name="cb2")(out, train)
        if self.downsample:
            residual = _ConvBN(self.features, 1, self.stride, self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.relu(_ConvBN(self.features, 1, 1, self.dtype, name="cb1")(x, train))
        out = nn.relu(_ConvBN(self.features, 3, self.stride, self.dtype, name="cb2")(out, train))
        out = _ConvBN(self.features * 4, 1, 1, self.dtype, name="cb3")(out, train)
        if self.downsample:
            residual = _ConvBN(self.features * 4, 1, self.stride, self.dtype, name="down")(x, train)
        return nn.relu(out + residual)


class ResNetModel(nn.Module):
    """torchvision-layout ResNet returning ``(output, aux)`` with stage taps."""

    variant: str = "resnet18"
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        deterministic: bool = True,
    ):
        block_type, depths = RESNET_VARIANTS[self.variant]
        block_cls = _BasicBlock if block_type == "basic" else _Bottleneck

        if x.ndim == 3:
            x = jnp.repeat(x[:, None, :, :], 3, axis=1)
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)  # NCHW -> NHWC

        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        intermediates: Dict[str, jnp.ndarray] = {}
        expansion = 1 if block_type == "basic" else 4
        width = 64
        in_ch = 64
        for stage_i, depth in enumerate(depths, start=1):
            stride = 1 if stage_i == 1 else 2
            for j in range(depth):
                s = stride if j == 0 else 1
                downsample = j == 0 and (s != 1 or in_ch != width * expansion)
                x = block_cls(
                    features=width,
                    stride=s,
                    downsample=downsample,
                    dtype=self.dtype,
                    name=f"layer{stage_i}_{j}",
                )(x, train)
                in_ch = width * expansion
            intermediates[f"backbone.layer{stage_i}"] = jnp.transpose(x, (0, 3, 1, 2))
            width *= 2

        features_nchw = jnp.transpose(x, (0, 3, 1, 2))
        pooled = jnp.mean(x, axis=(1, 2))
        aux = {"intermediates": intermediates, "features": features_nchw, "pooled": pooled}
        if self.num_classes is None:
            return features_nchw, aux
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(pooled)
        return logits, aux


def convert_resnet_state_dict(
    state: Dict[str, np.ndarray],
    variant: str = "resnet18",
    num_classes: Optional[int] = None,
) -> Dict[str, Any]:
    """torchvision / reference-wrapper ResNet state dict → flax variables.

    Accepts bare torchvision keys or the wrapper's ``backbone.`` prefix; the
    wrapper's separate ``classifier`` Linear maps onto the flax classifier.
    """
    state = {
        (k[len("backbone.") :] if k.startswith("backbone.") else k): v
        for k, v in state.items()
    }
    block_type, depths = RESNET_VARIANTS[variant]
    n_convs = 2 if block_type == "basic" else 3
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(np.asarray(value, np.float32))

    def convbn(conv_key: str, bn_key: str, path: Tuple[str, ...]):
        put(params, path + ("conv", "kernel"), np.transpose(state[conv_key], (2, 3, 1, 0)))
        put(params, path + ("bn", "scale"), state[f"{bn_key}.weight"])
        put(params, path + ("bn", "bias"), state[f"{bn_key}.bias"])
        put(batch_stats, path + ("bn", "mean"), state[f"{bn_key}.running_mean"])
        put(batch_stats, path + ("bn", "var"), state[f"{bn_key}.running_var"])

    put(params, ("conv1", "kernel"), np.transpose(state["conv1.weight"], (2, 3, 1, 0)))
    put(params, ("bn1", "scale"), state["bn1.weight"])
    put(params, ("bn1", "bias"), state["bn1.bias"])
    put(batch_stats, ("bn1", "mean"), state["bn1.running_mean"])
    put(batch_stats, ("bn1", "var"), state["bn1.running_var"])

    for stage_i, depth in enumerate(depths, start=1):
        for j in range(depth):
            torch_base = f"layer{stage_i}.{j}"
            flax_base = (f"layer{stage_i}_{j}",)
            for c in range(1, n_convs + 1):
                convbn(
                    f"{torch_base}.conv{c}.weight", f"{torch_base}.bn{c}", flax_base + (f"cb{c}",)
                )
            if f"{torch_base}.downsample.0.weight" in state:
                convbn(
                    f"{torch_base}.downsample.0.weight",
                    f"{torch_base}.downsample.1",
                    flax_base + ("down",),
                )

    for fc_key in ("classifier", "fc"):
        if num_classes is not None and f"{fc_key}.weight" in state:
            put(params, ("classifier", "kernel"), state[f"{fc_key}.weight"].T)
            put(params, ("classifier", "bias"), state[f"{fc_key}.bias"])
            break
    return {"params": params, "batch_stats": batch_stats}


class Model(ModelBase):
    """ResNet wrapper registered as ``resnet18``/``resnet50``/``resnet152``."""

    def __init__(
        self,
        variant: str = "resnet18",
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = True,
        audio_config: Optional[Dict[str, Any]] = None,
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        seed: int = 0,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        if num_classes is None:
            return_features_only = True
        variant = variant.lower()
        if variant not in RESNET_VARIANTS:
            raise ValueError(
                f"Unsupported ResNet variant {variant!r}; supported: {list(RESNET_VARIANTS)}"
            )
        self.variant = variant
        self.num_classes = None if return_features_only else num_classes
        self._return_features_only = return_features_only
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        if dtype == jnp.bfloat16 and self.audio_processor is not None:
            # bf16 trunk -> bf16-operand rDFT/mel matmuls (fp32 accumulate);
            # same policy + end-task drift guard as EfficientNet
            # (ops/frontend.py, test_quant_end_task.py).
            self.audio_processor.precision = jax.lax.Precision.DEFAULT
        self.module = ResNetModel(variant=variant, num_classes=self.num_classes, dtype=dtype)
        dummy = jnp.zeros((1, 3, 64, 64), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"train": False, "deterministic": True}

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = [f"backbone.layer{i}" for i in range(1, 5)]

    def process_audio(self, x: jnp.ndarray) -> jnp.ndarray:
        """Spectrogram → 3-channel [0,1]-normalized image (resnet.py:96-121)."""
        x = super().process_audio(jnp.asarray(x, jnp.float32))
        if x.ndim == 3:
            x = jnp.repeat(x[:, None, :, :], 3, axis=1)
        return x / (jnp.max(x, axis=(2, 3), keepdims=True) + 1e-6)

    def forward(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None):
        """Waveform/spectrogram -> logits (or pooled features)."""
        return super().forward(self.process_audio(x), None)

    def extract_fn(self, layers, aggregation):
        """Extraction fn with the audio frontend fused into the jitted program."""
        inner = super().extract_fn(layers, aggregation)

        def extract(variables, x, padding_mask):
            if x.ndim == 2:
                x = self.process_audio(x)
            return inner(variables, x, None)

        return extract

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load a torchvision ResNet state dict."""
        converted = convert_resnet_state_dict(state, self.variant, self.num_classes)
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()
