"""Persistent XLA compilation cache.

First compiles of the full BEATs program take 40–230 s through a remote-TPU
transport (and ~20–40 s locally); XLA's persistent cache keys serialized
executables by HLO hash so every later process with the same program loads
in milliseconds. The reference has no equivalent (torch eager recompiles
nothing, but also caches nothing); for a TPU framework this is the
difference between interactive and painful cold starts on every entry point.

Enabled by default in the long-running entry points (train / evaluate /
serve). Opt out with ``AVEX_COMPILE_CACHE=0``; redirect with
``AVEX_COMPILE_CACHE_DIR``. Backends whose PJRT plugin cannot serialize
executables simply skip cache writes (JAX degrades gracefully), so enabling
it is always safe.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join("~", ".cache", "avex_tpu", "xla_cache")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's on-disk compilation cache; returns the directory used.

    Idempotent; returns ``None`` (and changes nothing) when disabled via
    ``AVEX_COMPILE_CACHE=0`` or when the running JAX build rejects the
    config knobs.
    """
    if os.environ.get("AVEX_COMPILE_CACHE", "1").lower() in ("0", "false", "off"):
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("AVEX_COMPILE_CACHE_DIR")
        or os.path.expanduser(_DEFAULT_DIR)
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: the default thresholds skip sub-second compiles,
        # but a BEATs-sized program family is worth keeping wholesale.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as err:  # pragma: no cover — old jax / exotic backend
        logger.info("compilation cache unavailable: %s", err)
        return None
    return cache_dir
