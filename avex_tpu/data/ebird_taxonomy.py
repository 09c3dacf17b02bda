"""eBird taxonomy lookup (≈ avex/data/ebird_taxonomy.py:31).

The reference packages eBird code → {common, scientific} name JSONs
(v2021/v2025). This build loads the same JSON format from a user-supplied
path or the ``AVEX_TPU_EBIRD_TAXONOMY`` env var (the mapping files are
distribution data, not shipped with the library).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional


@functools.lru_cache(maxsize=4)
def load_ebird_taxonomy(path: Optional[str] = None, version: str = "v2021") -> Dict[str, Dict[str, str]]:
    """Load ``{ebird_code: {"common": ..., "scientific": ...}}``.

    Args:
        path: JSON file path; falls back to ``$AVEX_TPU_EBIRD_TAXONOMY``.
        version: taxonomy version tag (used to pick among multiple files in a
            directory).
    """
    path = path or os.environ.get("AVEX_TPU_EBIRD_TAXONOMY")
    if path is None:
        raise FileNotFoundError(
            "No eBird taxonomy configured: pass a path or set AVEX_TPU_EBIRD_TAXONOMY"
        )
    if os.path.isdir(path):
        path = os.path.join(path, f"ebird_taxonomy_{version}.json")
    with open(path) as f:
        return json.load(f)


def ebird_code_to_name(code: str, kind: str = "common", path: Optional[str] = None) -> str:
    """Resolve one eBird code to its common or scientific name."""
    entry = load_ebird_taxonomy(path).get(code)
    if entry is None:
        raise KeyError(f"Unknown eBird code: {code}")
    key = "common" if kind == "common" else "scientific"
    return entry.get(key) or entry.get("common_name") or entry.get("sci_name", code)
