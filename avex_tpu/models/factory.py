"""Model factory: spec → wrapper instance.

Counterpart of ``avex/models/utils/factory.py:19-167``: looks up the
architecture class by ``spec.name``, forwards the model-specific ModelSpec
fields, and filters kwargs against the class ``__init__`` signature so each
architecture only receives what it understands.
"""

from __future__ import annotations

import inspect
import logging
from typing import Any, Dict, Optional

from avex_tpu.configs import ModelSpec
from avex_tpu.models.registry import get_model_class, get_model_spec

logger = logging.getLogger(__name__)

#: ModelSpec fields forwarded to model constructors
#: (≈ factory.py `_add_model_spec_params`, :30-46).
_SPEC_FORWARD_FIELDS = (
    "text_model_name",
    "projection_dim",
    "temperature",
    "eat_cfg",
    "pretraining_mode",
    "handle_padding",
    "fairseq_weights_path",
    "eat_norm_mean",
    "eat_norm_std",
    "efficientnet_variant",
    "use_naturelm",
    "fine_tuned",
    "init_config",
    "language",
    "model_id",
    "extra_config",
    "compute_dtype",
)


def build_model_from_spec(
    spec: ModelSpec,
    device: Optional[str] = None,
    num_classes: Optional[int] = None,
    **overrides: Any,
):
    """Instantiate the wrapper class selected by ``spec.name``."""
    cls = get_model_class(spec.name)

    kwargs: Dict[str, Any] = {
        "device": device or spec.device,
        "num_classes": num_classes,
        "pretrained": spec.pretrained,
        "audio_config": spec.audio_config.model_dump() if spec.audio_config else None,
    }
    for field in _SPEC_FORWARD_FIELDS:
        value = getattr(spec, field, None)
        if value is not None:
            kwargs[field] = value
    # Variant-style architectures (resnet18/50/152) share one Model class that
    # takes the concrete variant name (≈ registry name-mapping special cases).
    kwargs.setdefault("variant", spec.name)
    kwargs.update(overrides)

    signature = inspect.signature(cls.__init__)
    # Models without an ``init_config`` parameter take their architecture
    # knobs as direct constructor kwargs (projection_dim, temperature, ... —
    # the reference reads these off free-form config attributes,
    # get_model.py:77-85); expand the dict for them.
    if "init_config" not in signature.parameters and isinstance(
        kwargs.get("init_config"), dict
    ):
        for key, value in kwargs.pop("init_config").items():
            kwargs.setdefault(key, value)
    accepts_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in signature.parameters.values()
    )
    if not accepts_var_kw:
        dropped = [k for k in kwargs if k not in signature.parameters]
        for key in dropped:
            kwargs.pop(key)
        if dropped:
            logger.debug("Dropped unsupported kwargs for %s: %s", spec.name, dropped)

    model = cls(**kwargs)
    model.spec = spec
    return model


def build_model(
    name: str,
    device: Optional[str] = None,
    num_classes: Optional[int] = None,
    **overrides: Any,
):
    """Registry-key convenience wrapper over :func:`build_model_from_spec`."""
    spec = get_model_spec(name)
    if "pretrained" in overrides:
        spec = spec.model_copy(update={"pretrained": overrides.pop("pretrained")})
    return build_model_from_spec(spec, device=device, num_classes=num_classes, **overrides)
