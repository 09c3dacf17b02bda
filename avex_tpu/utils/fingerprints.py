"""Output fingerprinting for reproducibility regression tests.

Counterpart of the reference's fingerprint machinery
(tests/integration/test_official_models_output_regression.py:22-71 and
scripts/regenerate_official_model_output_fingerprints.py): a fingerprint is
the SHA-256 of ``np.round(output, 4).tobytes()`` on a deterministic input,
keyed by a "numerics profile" derived from the jax version (the analogue of
the reference's torch-version profiles).
"""

from __future__ import annotations

import hashlib
from typing import Union

import numpy as np


def numerics_profile() -> str:
    """Profile key for the installed jax version (≈ torch_numerics_profiles)."""
    import jax

    major, minor = jax.__version__.split(".")[:2]
    return f"jax_{major}_{minor}"


def fingerprint(output: Union[np.ndarray, "object"], decimals: int = 4) -> str:
    """SHA-256 of the 4-decimal-rounded output bytes."""
    arr = np.asarray(output, dtype=np.float64)
    return hashlib.sha256(np.round(arr, decimals).astype(np.float32).tobytes()).hexdigest()
