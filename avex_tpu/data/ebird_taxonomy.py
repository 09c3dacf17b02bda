"""eBird taxonomy lookup (≈ avex/data/ebird_taxonomy.py).

The v2021 and v2025 eBird code → {common_name, sci_name} mappings are
packaged under ``avex_tpu/data/assets/`` (the same factual eBird taxonomy
data the reference ships — v2021 for BirdSet XCL-era checkpoints, v2025 for
newer ones), so ``load_ebird_taxonomy()`` works with no configuration. A
user-supplied path or the ``AVEX_TPU_EBIRD_TAXONOMY`` env var overrides the
packaged assets (e.g. for a future taxonomy release).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
SUPPORTED_VERSIONS = ("v2021", "v2025")


@functools.lru_cache(maxsize=4)
def load_ebird_taxonomy(
    path: Optional[str] = None, version: str = "v2021"
) -> Dict[str, Dict[str, str]]:
    """Load ``{ebird_code: {"common_name": ..., "sci_name": ...}}``.

    Args:
        path: JSON file or directory path; falls back to
            ``$AVEX_TPU_EBIRD_TAXONOMY``, then the packaged assets.
        version: taxonomy release tag (picks among multiple files in a
            directory / the packaged assets).
    """
    path = path or os.environ.get("AVEX_TPU_EBIRD_TAXONOMY")
    if path is None:
        if version not in SUPPORTED_VERSIONS:
            raise ValueError(
                f"Unsupported eBird taxonomy version {version!r}. "
                f"Supported: {', '.join(SUPPORTED_VERSIONS)}."
            )
        path = _ASSET_DIR
    if os.path.isdir(path):
        path = os.path.join(path, f"ebird_taxonomy_{version}.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def load(version: str = "v2021") -> Dict[str, Dict[str, str]]:
    """Reference-parity alias (avex/data/ebird_taxonomy.py ``load``)."""
    return load_ebird_taxonomy(version=version)


def ebird_code_to_name(code: str, kind: str = "common", path: Optional[str] = None) -> str:
    """Resolve one eBird code to its common or scientific name."""
    entry = load_ebird_taxonomy(path).get(code)
    if entry is None:
        raise KeyError(f"Unknown eBird code: {code}")
    if kind == "common":
        return entry.get("common_name") or entry.get("common") or code
    return entry.get("sci_name") or entry.get("scientific") or code
