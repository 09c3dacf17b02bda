"""Probe factory + registry.

Counterpart of ``avex/models/probes/utils/{factory,registry}.py``:
``build_probe_from_config`` validates the online (base_model) XOR offline
(input_dim) contract (factory.py:105-112), registers capture layers on the
backbone (factory.py:144-150), and forwards only the kwargs each probe type
understands (factory.py:172-175).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple, Type, Union

import yaml

from avex_tpu.configs import ProbeConfig
from avex_tpu.probes.base import HEAD_CLASSES, Probe

logger = logging.getLogger(__name__)

_PROBE_REGISTRY: Dict[str, Type[Probe]] = {}

#: which head kwargs each probe type consumes.
_HEAD_KWARG_FIELDS: Dict[str, Tuple[str, ...]] = {
    "linear": (),
    "mlp": ("hidden_dims", "dropout_rate", "activation"),
    "lstm": (
        "lstm_hidden_size",
        "num_layers",
        "bidirectional",
        "dropout_rate",
        "max_sequence_length",
    ),
    "attention": (
        "num_heads",
        "num_layers",
        "dropout_rate",
        "max_sequence_length",
        "use_positional_encoding",
    ),
    "transformer": (
        "num_heads",
        "num_layers",
        "attention_dim",
        "dropout_rate",
        "max_sequence_length",
        "use_positional_encoding",
    ),
    "moe": (
        "num_experts",
        "moe_hidden_dim",
        "moe_k",
        "capacity_factor",
        "dropout_rate",
    ),
}


def register_probe_class(name: str, cls: Type[Probe]) -> None:
    """Register a custom probe class under a name."""
    _PROBE_REGISTRY[name] = cls


def get_probe_class(name: str) -> Type[Probe]:
    """Resolve a probe class by type name."""
    if name in _PROBE_REGISTRY:
        return _PROBE_REGISTRY[name]
    if name in HEAD_CLASSES:
        return Probe
    raise KeyError(f"Unknown probe type {name!r}; known: {sorted(set(HEAD_CLASSES) | set(_PROBE_REGISTRY))}")


def list_probe_classes() -> List[str]:
    """All known probe type names."""
    return sorted(set(HEAD_CLASSES) | set(_PROBE_REGISTRY))


def load_probe_config(path: str) -> ProbeConfig:
    """Load a ProbeConfig from YAML (≈ registry.py ``load_probe_config``)."""
    from avex_tpu.io import read_text

    return ProbeConfig(**(yaml.safe_load(read_text(path)) or {}))


def build_probe_from_config(
    probe_config: Union[ProbeConfig, Dict[str, Any]],
    num_classes: int,
    base_model=None,
    input_dim: Optional[Union[int, Tuple[int, ...], List[Tuple[int, ...]]]] = None,
    device: str = "tpu",
    seed: int = 0,
) -> Probe:
    """Build an online or offline probe from a :class:`ProbeConfig`.

    Exactly one of ``base_model`` (online: raw audio through the backbone) or
    ``input_dim`` (offline: cached embeddings) must be provided
    (≈ factory.py:105-112).
    """
    if isinstance(probe_config, dict):
        probe_config = ProbeConfig(**probe_config)
    if (base_model is None) == (input_dim is None):
        raise ValueError(
            "Provide exactly one of base_model (online probing) or input_dim "
            "(offline probing on cached embeddings)."
        )

    head_kwargs: Dict[str, Any] = {}
    for field in _HEAD_KWARG_FIELDS[probe_config.probe_type]:
        value = getattr(probe_config, field, None)
        if value is not None:
            if field == "hidden_dims":
                value = tuple(value)
            head_kwargs[field] = value

    cls = get_probe_class(probe_config.probe_type)
    return cls(
        probe_type=probe_config.probe_type,
        num_classes=num_classes,
        base_model=base_model,
        layers=list(probe_config.target_layers),
        feature_mode=base_model is None,
        input_dim=input_dim,
        aggregation=probe_config.aggregation,
        target_length=probe_config.target_length,
        freeze_backbone=probe_config.freeze_backbone,
        seed=seed,
        **head_kwargs,
    )
