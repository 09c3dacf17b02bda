"""Deprecated static model factory (≈ avex/models/get_model.py:27-183).

Kept for API parity with the reference's ``run_train`` path; new code should
use :func:`avex_tpu.models.factory.build_model_from_spec`.
"""

from __future__ import annotations

import warnings
from typing import Optional

from avex_tpu.configs import ModelSpec
from avex_tpu.models.factory import build_model_from_spec


def get_model(spec: ModelSpec, num_classes: Optional[int] = None):
    """Build a model from a spec (deprecated alias of the registry factory)."""
    warnings.warn(
        "get_model is deprecated; use build_model_from_spec", DeprecationWarning, stacklevel=2
    )
    return build_model_from_spec(spec, num_classes=num_classes)
