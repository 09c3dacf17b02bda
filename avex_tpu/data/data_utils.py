"""Dataset helper utilities (≈ avex/data/data_utils.py:14-96)."""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def balance_by_attribute(
    items: Sequence[Dict[str, Any]],
    attribute: str = "label",
    max_per_value: Optional[int] = None,
    seed: int = 0,
) -> List[int]:
    """Return indices giving at most ``max_per_value`` items per attribute value
    (down-sampling the majority classes), deterministic under ``seed``."""
    groups: Dict[Any, List[int]] = defaultdict(list)
    for i, item in enumerate(items):
        groups[item.get(attribute)].append(i)
    if max_per_value is None:
        max_per_value = min(len(v) for v in groups.values())
    rng = np.random.default_rng(seed)
    keep: List[int] = []
    for value in sorted(groups, key=str):
        idx = groups[value]
        if len(idx) > max_per_value:
            idx = list(rng.permutation(idx)[:max_per_value])
        keep.extend(idx)
    return sorted(keep)


def combine_text_labels(
    items: Sequence[Dict[str, Any]],
    columns: Sequence[str],
    separator: str = ", ",
    target: str = "text_label",
) -> None:
    """Join several text columns into one text label, in place."""
    for item in items:
        parts = [str(item[c]) for c in columns if item.get(c)]
        item[target] = separator.join(parts)
