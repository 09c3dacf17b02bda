"""Model registry: named specs + architecture classes.

TPU-native counterpart of ``avex/models/utils/registry.py``. Two tables:

- ``_MODEL_REGISTRY``: registry key → :class:`ModelSpec` (+ checkpoint /
  label-map URIs), auto-populated from the official ESP entries
  (:mod:`avex_tpu.api.official_models`) at import, like the reference's
  packaged-YAML auto-registration (registry.py:69-96, 720-721);
- ``_MODEL_CLASSES``: architecture name → wrapper class. Instead of the
  reference's filesystem scan of ``avex/models/*.py`` (registry.py:99-205),
  architectures self-register lazily through ``_ARCH_MODULES`` so importing
  the registry stays cheap.
"""

from __future__ import annotations

import importlib
import logging
from typing import Any, Dict, List, Optional, Type

from avex_tpu.api.official_models import OFFICIAL_MODELS
from avex_tpu.configs import ModelSpec

logger = logging.getLogger(__name__)

_MODEL_REGISTRY: Dict[str, ModelSpec] = {}
_CHECKPOINT_PATHS: Dict[str, Optional[str]] = {}
_LABEL_MAP_PATHS: Dict[str, Optional[str]] = {}
_MODEL_CLASSES: Dict[str, Type] = {}

#: architecture name → module that defines its ``Model`` class (lazy import).
_ARCH_MODULES: Dict[str, str] = {
    "beats": "avex_tpu.models.beats",
    "efficientnet": "avex_tpu.models.efficientnet",
    "resnet18": "avex_tpu.models.resnet",
    "resnet50": "avex_tpu.models.resnet",
    "resnet152": "avex_tpu.models.resnet",
    "aves_bio": "avex_tpu.models.aves",
    "eat_hf": "avex_tpu.models.eat",
    "clip": "avex_tpu.models.clip",
    "birdmae": "avex_tpu.models.birdmae",
    "atst": "avex_tpu.models.atst",
    "perch": "avex_tpu.models.perch",
    "surfperch": "avex_tpu.models.perch",
    "birdnet": "avex_tpu.models.birdnet",
}


#: architecture name → class attribute when it isn't the default ``Model``.
_ARCH_CLASS_ATTR: Dict[str, str] = {"surfperch": "SurfPerchModel"}


def register_model(
    name: str,
    spec: ModelSpec | Dict[str, Any],
    checkpoint_path: Optional[str] = None,
    class_mapping_path: Optional[str] = None,
    overwrite: bool = False,
) -> None:
    """Register a named model spec (≈ registry.py ``register_model``)."""
    if name in _MODEL_REGISTRY and not overwrite:
        raise ValueError(f"Model '{name}' is already registered")
    if isinstance(spec, dict):
        spec = ModelSpec(**spec)
    _MODEL_REGISTRY[name] = spec
    _CHECKPOINT_PATHS[name] = checkpoint_path
    _LABEL_MAP_PATHS[name] = class_mapping_path


def get_model_spec(name: str) -> ModelSpec:
    """Look up a registered spec; raises with available names on miss."""
    if name not in _MODEL_REGISTRY:
        raise KeyError(
            f"Model '{name}' not found in registry. Available: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name].model_copy(deep=True)


def get_checkpoint_path(name: str) -> Optional[str]:
    """Default checkpoint URI for a registered model (≈ registry.py:429-462)."""
    if name not in _MODEL_REGISTRY:
        raise KeyError(f"Model '{name}' not found in registry")
    return _CHECKPOINT_PATHS.get(name)


def get_class_mapping_path(name: str) -> Optional[str]:
    """Label-map URI registered for a model, if any."""
    if name not in _MODEL_REGISTRY:
        raise KeyError(f"Model '{name}' not found in registry")
    return _LABEL_MAP_PATHS.get(name)


def register_model_class(name: str, cls: Type) -> None:
    """Register an architecture class under ``spec.name`` (plugin API)."""
    _MODEL_CLASSES[name] = cls


def get_model_class(name: str) -> Type:
    """Resolve an architecture class, importing its module on first use."""
    if name not in _MODEL_CLASSES:
        module_path = _ARCH_MODULES.get(name)
        if module_path is None:
            raise KeyError(
                f"No model class registered for architecture '{name}'. "
                f"Known: {sorted(set(_MODEL_CLASSES) | set(_ARCH_MODULES))}"
            )
        module = importlib.import_module(module_path)
        attr = _ARCH_CLASS_ATTR.get(name, "Model")
        cls = getattr(module, attr, None)
        if cls is None:
            raise ImportError(f"{module_path} does not define a {attr} class")
        # resnet-style modules serve several names; let them self-describe.
        _MODEL_CLASSES.setdefault(name, cls)
    return _MODEL_CLASSES[name]


def list_model_classes() -> List[str]:
    """All architecture names resolvable to a Model class."""
    return sorted(set(_MODEL_CLASSES) | set(_ARCH_MODULES))


def list_models(verbose: bool = True) -> Dict[str, Dict[str, Any]]:
    """Tabulate registered models (≈ registry.py:326-426).

    Returns ``{name: {architecture, pretrained, checkpoint, label_map}}`` and
    optionally prints a table.
    """
    info: Dict[str, Dict[str, Any]] = {}
    for name in sorted(_MODEL_REGISTRY):
        spec = _MODEL_REGISTRY[name]
        info[name] = {
            "architecture": spec.name,
            "pretrained": spec.pretrained,
            "checkpoint": _CHECKPOINT_PATHS.get(name),
            "label_map": _LABEL_MAP_PATHS.get(name),
        }
    if verbose:
        width = max((len(n) for n in info), default=10) + 2
        print(f"{'model':<{width}}{'architecture':<16}{'checkpoint'}")
        print("-" * (width + 50))
        for name, row in info.items():
            print(f"{name:<{width}}{row['architecture']:<16}{row['checkpoint'] or '-'}")
    return info


def describe_model(name: str) -> Dict[str, Any]:
    """Full registry record for one model (≈ registry.py:465)."""
    spec = get_model_spec(name)
    return {
        "name": name,
        "model_spec": spec.model_dump(),
        "checkpoint_path": _CHECKPOINT_PATHS.get(name),
        "class_mapping_path": _LABEL_MAP_PATHS.get(name),
    }


def list_model_layers(name: str, **build_kwargs: Any) -> List[str]:
    """Build the model (random weights) and report its embedding layer names
    (≈ registry.py:648-717)."""
    from avex_tpu.models.factory import build_model

    model = build_model(name, pretrained=False, **build_kwargs)
    return model.get_model_layers()


def _auto_register_official_models() -> None:
    for name, entry in OFFICIAL_MODELS.items():
        if name in _MODEL_REGISTRY:
            continue
        register_model(
            name,
            ModelSpec(**entry["model_spec"]),
            checkpoint_path=entry.get("checkpoint_path"),
            class_mapping_path=entry.get("class_mapping_path"),
        )


_auto_register_official_models()
