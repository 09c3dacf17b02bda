"""Deployment export: JAX models → TF SavedModel / TFLite via ``jax2tf``.

An avex-tpu addition with no reference equivalent — but a deliberate one: the
bioacoustics deployment world the reference serves runs on exactly these two
formats (BirdNet ships as a TFLite flatbuffer, reference birdnet.py:273-359;
Perch/SurfPerch as TF-Hub SavedModels, reference perch.py:26-47). This module
closes the loop: any model trained or converted in avex-tpu can be exported
back out to those formats for edge devices (AudioMoth-class recorders phone
apps, Raspberry Pi) and TF-Serving fleets, with the full frontend (fbank /
spectrogram) baked into the graph so the artifact consumes raw waveforms.

Design notes (TPU/XLA-first, which is what makes this nearly free):

- Every model's forward is already a *pure* ``(variables, waveform) → output``
  function (``ModelBase.extract_fn`` / ``module.apply``) with static shapes —
  precisely the contract ``jax2tf.convert`` needs. No tracing shims, no
  hook surgery: the same function the TPU jits is the function exported.
- jax2tf native serialization embeds StableHLO; TF ≥ 2.21's TFLite converter
  legalizes it to TFLite ops directly (verified in tests: converted BEATs
  flatbuffers run under ``tf.lite.Interpreter`` and match JAX outputs).
- SavedModel exports keep the batch dimension polymorphic by default
  (``polymorphic_shapes``); TFLite exports pin it (edge interpreters want
  static tensors) and can optionally quantize weights to float16.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["export_savedmodel", "export_tflite"]


def _pure_forward(model: Any, mode: str, layers: Sequence[Any], aggregation: str):
    """The exported computation: ``(variables, waveform) → row batch``.

    Mirrors ``serving.InferenceService._forward`` — ``embed`` is the pooled
    intermediate-capture path (reference base_model.py:342-457), ``logits``
    the frontend + classifier forward (reference base_model.py:316-340).
    """
    if mode == "embed":
        resolved = model.register_hooks_for_layers(list(layers))
        extract = model.extract_fn(tuple(resolved), aggregation)

        def embed_fn(variables, wav):
            return extract(variables, wav, None)

        return embed_fn
    if mode != "logits":
        raise ValueError(f"mode must be 'embed' or 'logits', got {mode!r}")

    def logits_fn(variables, wav):
        x = model.process_audio(wav)
        out, _ = model.module.apply(variables, x, None, **model._apply_kwargs())
        return out

    return logits_fn


def _build_tf_module(
    model: Any,
    mode: str,
    layers: Sequence[Any],
    aggregation: str,
    clip_seconds: float,
    batch_size: Optional[int],
):
    """Wrap the pure JAX function + its weights as a ``tf.Module`` whose
    ``serve(waveform)`` tf.function owns the weights as ``tf.Variable``s."""
    import jax.tree_util as jtu
    import tensorflow as tf
    from jax.experimental import jax2tf

    if model.variables is None:
        raise ValueError("model has no variables; load or initialize it first")
    sample_rate = int(getattr(model.audio_config, "sample_rate", None) or 16000)
    n_samples = int(clip_seconds * sample_rate)
    fn = _pure_forward(model, mode, layers, aggregation)

    poly = None if batch_size is not None else [None, f"(b, {n_samples})"]
    tf_fn = jax2tf.convert(fn, polymorphic_shapes=poly)

    leaves, treedef = jtu.tree_flatten(model.variables)
    module = tf.Module(name="avex_tpu_export")
    module.model_variables = [
        tf.Variable(np.asarray(leaf), trainable=False, name=f"var_{i}")
        for i, leaf in enumerate(leaves)
    ]

    @tf.function(
        autograph=False,
        input_signature=[
            tf.TensorSpec([batch_size, n_samples], tf.float32, name="waveform")
        ],
    )
    def serve(waveform):
        variables = jtu.tree_unflatten(treedef, list(module.model_variables))
        return {"output": tf_fn(variables, waveform)}

    module.serve = serve
    meta = {
        "mode": mode,
        "sample_rate": sample_rate,
        "clip_seconds": clip_seconds,
        "n_samples": n_samples,
        "layers": [str(x) for x in layers],
        "aggregation": aggregation,
    }
    return module, meta


def export_savedmodel(
    model: Any,
    out_dir: Union[str, Path],
    *,
    mode: str = "embed",
    layers: Sequence[Any] = ("last_layer",),
    aggregation: str = "mean",
    clip_seconds: float = 5.0,
    batch_size: Optional[int] = None,
) -> Path:
    """Export a loaded model as a TF SavedModel consuming raw waveforms.

    ``batch_size=None`` (default) keeps the batch axis polymorphic — one
    artifact serves any batch. The signature input is
    ``waveform: float32[batch, clip_seconds * sample_rate]``; the output dict
    has a single ``"output"`` key (pooled embeddings or logits).
    """
    import tensorflow as tf

    module, meta = _build_tf_module(
        model, mode, layers, aggregation, clip_seconds, batch_size
    )
    out_dir = Path(out_dir)
    tf.saved_model.save(
        module,
        str(out_dir),
        signatures={"serving_default": module.serve.get_concrete_function()},
    )
    # Sidecar metadata so downstream tooling knows the audio contract.
    import json

    (out_dir / "avex_tpu_export.json").write_text(json.dumps(meta, indent=2))
    logger.info("SavedModel exported to %s (%s)", out_dir, meta)
    return out_dir


def export_tflite(
    model: Any,
    out_path: Optional[Union[str, Path]] = None,
    *,
    mode: str = "embed",
    layers: Sequence[Any] = ("last_layer",),
    aggregation: str = "mean",
    clip_seconds: float = 5.0,
    batch_size: int = 1,
    quantize_float16: bool = False,
) -> bytes:
    """Export a loaded model as a TFLite flatbuffer (static shapes).

    ``quantize_float16=True`` applies the converter's float16 weight
    quantization — roughly halves the artifact for edge targets at bf16-level
    numeric drift. Returns the flatbuffer bytes (and writes them to
    ``out_path`` when given).
    """
    import tensorflow as tf

    module, _meta = _build_tf_module(
        model, mode, layers, aggregation, clip_seconds, batch_size
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [module.serve.get_concrete_function()], module
    )
    if quantize_float16:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    blob = converter.convert()
    if out_path is not None:
        Path(out_path).write_bytes(blob)
        logger.info("TFLite model written to %s (%d bytes)", out_path, len(blob))
    return blob
