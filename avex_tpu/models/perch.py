"""Perch / SurfPerch bird-vocalization classifiers in Flax.

TPU-native counterpart of ``avex/models/perch.py`` and ``surfperch.py``
(TF-Hub wrappers around Google's bird-vocalization-classifier v4). Perch is
an EfficientNet-B1 over a log-mel front end; here the wrapper *interface* is
reproduced exactly — 32 kHz input, 5 s center-crop/pad (perch.py:153-185),
1280-d embeddings plus 10932-class logits, no-op embedding hooks
(perch.py:117-152) — on top of our Flax EfficientNet-B1.

Weights: the published checkpoints live in TF-Hub SavedModel format. The
shipped package does not depend on TensorFlow: conversion happens offline
(TF → numpy state dict via ``scripts/convert_perch_tf.py``) and loads
through ``load_state_dict``. The Keras→Flax mapping is validated
elementwise against a real TF EfficientNet-B1 in
``tests/unittests/test_perch_tf_oracle.py`` (runs wherever TF is
installed); without a converted checkpoint the model runs with random
weights (useful for interface/throughput work only).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.models.base import ModelBase
from avex_tpu.models.efficientnet import EfficientNetModel, convert_efficientnet_state_dict
from avex_tpu.ops.frontend import htk_mel_banks, stft_power
from avex_tpu.utils.tree import merge_converted_params

__all__ = [
    "Model",
    "SurfPerchModel",
    "PERCH_NUM_CLASSES",
    "convert_keras_efficientnet_state",
]

PERCH_NUM_CLASSES = 10932
PERCH_SAMPLE_RATE = 32000
PERCH_WINDOW_SECONDS = 5.0


def perch_frontend(wav: jnp.ndarray, precision=None) -> jnp.ndarray:
    """32 kHz waveform → log-mel ``(B, 160 mels, frames)`` (chirp-style).

    ``precision=None`` (parity default) keeps the fp32 HIGHEST rDFT;
    bf16-trunk wrappers pass ``jax.lax.Precision.DEFAULT`` for the
    bf16-operand matmul lowering (see ops/frontend.stft_power).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    power = stft_power(wav, n_fft=2048, hop_length=320, win_length=640, precision=precision)
    mel_fb = jnp.asarray(
        htk_mel_banks(1025, 160, PERCH_SAMPLE_RATE, f_min=60.0, f_max=10000.0).astype(np.float32)
    )
    mel = jnp.einsum("bkf,km->bmf", power, mel_fb, precision=precision)
    return jnp.log(jnp.maximum(mel, 1e-6))


def convert_keras_efficientnet_state(
    state: Dict[str, np.ndarray], variant: str = "b1"
) -> Dict[str, np.ndarray]:
    """Keras-applications EfficientNet variable names → torchvision-style keys.

    The TF-Hub Perch SavedModel's backbone follows Keras EfficientNet naming
    (``stem_conv``, ``block{stage}{repeat}_expand_conv``, ``top_conv``,
    ``predictions`` …). This remaps a raw variable dump (as produced by
    ``scripts/convert_perch_tf.py``, TF ``:0`` suffixes and path prefixes
    tolerated) into the torchvision-style keys that
    ``convert_efficientnet_state_dict`` consumes — including the layout
    transposes (Keras HWIO conv → torch OIHW, depthwise HWCM → torch C1HW,
    dense (in,out) → torch (out,in)).
    """
    from avex_tpu.models.efficientnet import stage_config

    # Normalize: strip ":0" and any path prefix before the layer name.
    normalized: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        k = key.split(":")[0]
        k = k.split("/")[-2] + "/" + k.split("/")[-1] if "/" in k else k
        normalized[k] = np.asarray(value)

    out: Dict[str, np.ndarray] = {}

    def conv(src: str, dest: str, depthwise: bool = False) -> None:
        kernel = normalized.get(f"{src}/kernel", normalized.get(f"{src}/depthwise_kernel"))
        if kernel is None:
            return
        if depthwise:  # (H, W, C, mult=1) → (C, 1, H, W)
            out[f"{dest}.weight"] = np.transpose(kernel, (2, 3, 0, 1))
        else:  # HWIO → OIHW
            out[f"{dest}.weight"] = np.transpose(kernel, (3, 2, 0, 1))
        if f"{src}/bias" in normalized:
            out[f"{dest}.bias"] = normalized[f"{src}/bias"]

    def bn(src: str, dest: str) -> None:
        mapping = {
            "gamma": "weight", "beta": "bias",
            "moving_mean": "running_mean", "moving_variance": "running_var",
        }
        for keras_name, torch_name in mapping.items():
            if f"{src}/{keras_name}" in normalized:
                out[f"{dest}.{torch_name}"] = normalized[f"{src}/{keras_name}"]

    conv("stem_conv", "features.0.0")
    bn("stem_bn", "features.0.1")
    letters = "abcdefghijklmnop"
    for stage_i, (t, _c, n, _s, _k) in enumerate(stage_config(variant), start=1):
        for j in range(n):
            keras_base = f"block{stage_i}{letters[j]}"
            torch_base = f"features.{stage_i}.{j}.block"
            if t != 1:
                conv(f"{keras_base}_expand_conv", f"{torch_base}.0.0")
                bn(f"{keras_base}_expand_bn", f"{torch_base}.0.1")
                dw, se, proj = 1, 2, 3
            else:
                dw, se, proj = 0, 1, 2
            conv(f"{keras_base}_dwconv", f"{torch_base}.{dw}.0", depthwise=True)
            bn(f"{keras_base}_bn", f"{torch_base}.{dw}.1")
            conv(f"{keras_base}_se_reduce", f"{torch_base}.{se}.fc1")
            conv(f"{keras_base}_se_expand", f"{torch_base}.{se}.fc2")
            conv(f"{keras_base}_project_conv", f"{torch_base}.{proj}.0")
            bn(f"{keras_base}_project_bn", f"{torch_base}.{proj}.1")
    conv("top_conv", "features.8.0")
    bn("top_bn", "features.8.1")
    if "predictions/kernel" in normalized:
        out["classifier.1.weight"] = normalized["predictions/kernel"].T
        out["classifier.1.bias"] = normalized["predictions/bias"]
    return out


class Model(ModelBase):
    """Perch wrapper registered as ``perch`` (and ``surfperch``)."""

    model_family = "perch"

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        audio_config: Optional[Dict[str, Any]] = None,
        return_features_only: bool = False,
        compute_dtype: str = "float32",
        seed: int = 0,
        **_ignored: Any,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.num_classes = PERCH_NUM_CLASSES
        self.window_samples = int(PERCH_WINDOW_SECONDS * PERCH_SAMPLE_RATE)
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        # bf16 trunk -> bf16-operand frontend matmuls (fp32 accumulate);
        # fp32 keeps the TF-parity HIGHEST rDFT (test_perch_tf_oracle.py).
        self._frontend_precision = (
            jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        # TF-provenance semantics: the published checkpoints were trained with
        # TF 'SAME' conv padding and BatchNorm eps 1e-3, which differ from the
        # torchvision defaults (asymmetric stride-2 padding on even inputs;
        # verified elementwise vs Keras EfficientNet-B1 in
        # tests/unittests/test_perch_tf_oracle.py).
        self.module = EfficientNetModel(
            variant="b1",
            num_classes=PERCH_NUM_CLASSES,
            dtype=dtype,
            bn_eps=1e-3,
            tf_same_padding=True,
        )
        dummy = jnp.zeros((1, 3, 160, 64), jnp.float32)
        self.variables = self._init_variables(dummy, seed=seed)
        self._return_features_only = return_features_only

    def _apply_kwargs(self) -> Dict[str, Any]:
        return {"train": False, "deterministic": True}

    def _discover_embedding_layers(self) -> None:
        # The reference's TF graph is opaque: hooks are documented no-ops
        # (perch.py:117-152). One logical tap (the pooled embedding) exists.
        if not self._layer_names:
            self._layer_names = ["embedding"]

    def _prepare(self, x: jnp.ndarray) -> jnp.ndarray:
        """5 s center-crop/pad at 32 kHz (perch.py:153-185), then frontend."""
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[None]
        length = x.shape[-1]
        target = self.window_samples
        if length > target:
            start = (length - target) // 2
            x = x[..., start : start + target]
        elif length < target:
            x = jnp.pad(x, ((0, 0), (0, target - length)))
        spec = perch_frontend(x, precision=self._frontend_precision)
        return jnp.repeat(spec[:, None, :, :], 3, axis=1)

    def forward(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None):
        """Returns 10932-class logits; ``infer`` exposes the full dict."""
        return self.infer(x)["logits"]

    __call__ = forward

    def infer(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Full inference dict: 10932-class logits + 1280-d embedding."""
        spec = self._prepare(x)

        def fwd(variables, spec):
            logits, aux = self.module.apply(variables, spec, None, **self._apply_kwargs())
            return logits, aux["pooled"]

        logits, pooled = self._jit(("perch_infer",), fwd)(self.variables, spec)
        return {"logits": logits, "embedding": pooled}

    def extract_fn(self, layers, aggregation):
        """Pure ``(variables, wav, mask) → 1280-d pooled embedding``.

        Perch has exactly one logical tap (the pooled embedding — the
        reference's TF graph exposes nothing else, perch.py:117-152), so
        ``layers``/``aggregation`` are accepted for interface parity and
        ignored. The frontend (``_prepare``) is pure JAX, so this composes
        under jit (online probes, serving, export, benches)."""

        def extract(variables, x, padding_mask):
            spec = self._prepare(x)
            _logits, aux = self.module.apply(
                variables, spec, None, **self._apply_kwargs()
            )
            return aux["pooled"]

        return extract

    def extract_embeddings(self, x, padding_mask=None, aggregation="none", **_kw):
        """1280-d pooled embedding (the reference's only tap, perch.py:117-152)."""
        if isinstance(x, dict):
            x = x["raw_wav"]
        return self.infer(x)["embedding"]

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False) -> None:
        """Load converted TF-Hub weights (raw Keras dumps auto-remapped)."""
        if any("/" in k or k.startswith(("stem_", "block", "top_")) for k in state):
            # Raw TF/Keras variable dump (scripts/convert_perch_tf.py output).
            state = convert_keras_efficientnet_state(state, "b1")
        converted = convert_efficientnet_state_dict(state, "b1", num_classes=PERCH_NUM_CLASSES)
        self.variables = merge_converted_params(self.variables, converted, strict=strict)
        self._jit_cache.clear()


class SurfPerchModel(Model):
    """SurfPerch (marine variant) — identical interface, different weights
    (≈ avex/models/surfperch.py)."""

    model_family = "surfperch"
