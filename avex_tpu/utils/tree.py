"""Pytree helpers for merging converted checkpoint weights into init params."""

from __future__ import annotations

import logging
from typing import Any, Dict, List

import jax.numpy as jnp

logger = logging.getLogger(__name__)


def merge_converted_params(
    init_variables: Dict[str, Any],
    converted: Dict[str, Any],
    strict: bool = False,
) -> Dict[str, Any]:
    """Overlay converted checkpoint leaves onto initialized variables.

    JAX analogue of ``load_state_dict(strict=False)`` with the reference's
    prefix-adaptive semantics (avex/models/utils/load.py:521-571): leaves
    present in ``converted`` replace the initialized values when shapes match;
    shape mismatches and unknown paths are skipped with a warning (or raised
    when ``strict``); missing leaves keep their initialization.
    """
    init_variables = flax_unfreeze(init_variables)
    skipped: List[str] = []
    loaded = [0]

    def overlay(dst: Dict[str, Any], src: Dict[str, Any], path: str) -> None:
        for key, value in src.items():
            full = f"{path}/{key}" if path else key
            if isinstance(value, dict):
                if key not in dst or not isinstance(dst[key], dict):
                    skipped.append(full)
                    continue
                overlay(dst[key], value, full)
            else:
                if key not in dst:
                    skipped.append(full)
                    continue
                if tuple(dst[key].shape) != tuple(value.shape):
                    skipped.append(f"{full} (shape {value.shape} vs {dst[key].shape})")
                    continue
                dst[key] = jnp.asarray(value, dtype=dst[key].dtype)
                loaded[0] += 1

    overlay(init_variables, converted, "")
    if skipped:
        message = f"Skipped {len(skipped)} checkpoint entries: {skipped[:8]}..."
        if strict:
            raise ValueError(message)
        logger.warning(message)
    logger.info("Loaded %d parameter tensors from checkpoint", loaded[0])
    return init_variables


def flax_unfreeze(tree: Any) -> Any:
    """Deep-copy a (possibly frozen) variables tree into plain nested dicts."""
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: flax_unfreeze(v) for k, v in tree.items()}
    return tree


def count_params(tree: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
