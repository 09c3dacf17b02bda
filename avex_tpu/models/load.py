"""Public model loading: ``load_model`` / ``load_label_mapping``.

Counterpart of ``avex/models/utils/load.py``. Resolution order and behaviors
mirror the reference:

- the first argument may be a registry key, a path to a spec YAML (with
  ``model_spec`` / ``checkpoint_path`` / ``class_mapping_path`` keys), or a
  :class:`ModelSpec` instance (load.py:94-149);
- checkpoint priority: explicit argument > registry/YAML default, and
  ``pretrained`` flips off once a checkpoint is supplied (load.py:199-212);
- ``num_classes`` is auto-extracted from the checkpoint's classifier weights,
  falling back to the label mapping's size (load.py:314-420);
- the label mapping is attached to the returned model (load.py:290-297);
- state-dict loading is prefix-adaptive and non-strict (load.py:521-571).
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, Optional, Union

import yaml

from avex_tpu.configs import ModelSpec
from avex_tpu.io import cached_download, is_remote, read_text
from avex_tpu.models.factory import build_model_from_spec
from avex_tpu.models.registry import (
    get_checkpoint_path,
    get_class_mapping_path,
    get_model_spec,
    _MODEL_REGISTRY,
)
from avex_tpu.utils.loaders import extract_num_classes, process_state_dict, universal_load

logger = logging.getLogger(__name__)


def _resolve_spec(
    source: Union[str, ModelSpec],
) -> tuple[ModelSpec, Optional[str], Optional[str]]:
    """Return ``(spec, default_checkpoint, label_map_path)`` for any source."""
    if isinstance(source, ModelSpec):
        return source, None, None
    if source in _MODEL_REGISTRY:
        return (
            get_model_spec(source),
            get_checkpoint_path(source),
            get_class_mapping_path(source),
        )
    if str(source).endswith((".yml", ".yaml")):
        doc = yaml.safe_load(read_text(str(source)))
        spec_dict = doc.get("model_spec", doc)
        return (
            ModelSpec(**spec_dict),
            doc.get("checkpoint_path"),
            doc.get("class_mapping_path"),
        )
    raise ValueError(
        f"Cannot resolve model source {source!r}: not a registry key, spec YAML "
        f"path, or ModelSpec. Registered: {sorted(_MODEL_REGISTRY)}"
    )


def load_label_mapping(source: str) -> Optional[Dict[str, Any]]:
    """Load a label mapping from a registry key, spec YAML, or JSON path
    (≈ load.py:423-519)."""
    path: Optional[str]
    if str(source).endswith(".json"):
        path = str(source)
    else:
        _, _, path = _resolve_spec(source)
    if path is None:
        return None
    raw = json.loads(read_text(cached_download(path)))
    return raw


def _label_map_num_classes(mapping: Optional[Dict[str, Any]]) -> Optional[int]:
    if not mapping:
        return None
    # Mappings are either {label: idx} or {idx: label}.
    return len(mapping)


def load_model(
    source: Union[str, ModelSpec],
    device: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    return_features_only: bool = False,
    num_classes: Optional[int] = None,
    random_weights: bool = False,
    quantization: Optional[str] = None,
    **overrides: Any,
):
    """Load a ready-to-run model with weights and label mapping attached.

    Args:
        source: registry key (e.g. ``"esp_aves2_sl_beats_all"``), spec YAML
            path, or :class:`ModelSpec`.
        device: advisory; placement follows the active jax mesh.
        checkpoint_path: overrides the registry/YAML default checkpoint.
        return_features_only: build without a classifier head; ``forward``
            returns frame-level features.
        num_classes: explicit head size (otherwise inferred).
        random_weights: skip checkpoint loading entirely (useful offline).
        quantization: ``"int8"`` converts the loaded weights to the W8A8
            dynamic-int8 serving mode (``avex_tpu.quant``) after checkpoint
            load — inference-only; no reference equivalent.
    """
    spec, default_ckpt, label_map_path = _resolve_spec(source)
    resolved_ckpt = checkpoint_path or default_ckpt
    if checkpoint_path is not None:
        # Explicit checkpoint implies we should not fetch framework-pretrained
        # weights underneath it (load.py:199-212).
        spec = spec.model_copy(update={"pretrained": False})

    state = None
    if resolved_ckpt and not random_weights:
        state = process_state_dict(universal_load(resolved_ckpt))

    label_mapping = None
    if label_map_path and random_weights and is_remote(label_map_path):
        # random_weights is the explicit offline mode: don't hit the network
        # for a label map that belongs to weights we are not loading.
        label_map_path = None
    if label_map_path:
        try:
            label_mapping = json.loads(read_text(cached_download(label_map_path)))
        except Exception as err:  # pragma: no cover - network-dependent
            logger.warning("Could not load label mapping %s: %s", label_map_path, err)

    if num_classes is None and not return_features_only:
        if state is not None:
            num_classes = extract_num_classes(state)
        if num_classes is None:
            num_classes = _label_map_num_classes(label_mapping)

    model = build_model_from_spec(
        spec,
        device=device,
        num_classes=num_classes,
        return_features_only=return_features_only,
        **overrides,
    )
    model.label_mapping = label_mapping
    if state is not None:
        model.load_state_dict(state)
        model.loaded_checkpoint = resolved_ckpt
    if quantization is not None:
        model.quantize(quantization)
    return model
