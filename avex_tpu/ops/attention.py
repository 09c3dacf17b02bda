"""Attention and transformer support ops.

- ``dot_product_attention``: SDPA with an additive bias, matching
  ``F.scaled_dot_product_attention`` semantics used by the reference BEATs
  attention (avex/models/beats/backbone.py:561-568). Softmax runs in fp32
  regardless of compute dtype; XLA fuses the whole block on TPU and keeps the
  two matmuls on the MXU.
- ``relative_position_bucket``: T5-style bidirectional bucketing
  (backbone.py:438-473). Sequence length is static under jit, so the bucket
  matrix is computed with numpy at trace time and baked in as a constant —
  zero runtime cost, versus the reference's per-forward torch computation.
- ``grad_multiply``: identity forward / scaled backward
  (beats/modules.py GradMultiply), used for layer-wise gradient decay.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dot_product_attention", "relative_position_bucket", "relative_position_bucket_jnp", "grad_multiply"]


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    logits_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Scaled dot-product attention with additive bias.

    Args:
        q, k, v: ``[B, H, T, D]``.
        bias: additive mask/bias broadcastable to ``[B, H, T, T]``
            (e.g. gated relative-position bias plus ``-inf`` padding).
        scale: logit scale; default ``1/sqrt(D)``.
        logits_dtype: dtype of the logits/softmax chain. fp32 (default) is
            the parity mode matching torch SDPA; bfloat16 halves the HBM
            traffic of the ``[B, H, T, T]`` tensor — the dominant memory
            stream of short-sequence transformers — at ~1e-2 output
            tolerance (max-subtracted softmax is scale-robust in bf16).

    Returns:
        ``[B, H, T, D]`` in the dtype of ``v``.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=logits_dtype)
    logits = logits * jnp.asarray(scale, logits_dtype)
    if bias is not None:
        logits = logits + bias.astype(logits_dtype)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@functools.lru_cache(maxsize=32)
def relative_position_bucket(
    query_length: int,
    key_length: int,
    num_buckets: int = 320,
    max_distance: int = 800,
    bidirectional: bool = True,
) -> np.ndarray:
    """T5 relative-position bucket matrix ``[query_length, key_length]`` (int32).

    Matches ``_MultiheadAttention._relative_positions_bucket``
    (backbone.py:438-473): half the buckets for each direction, exact buckets
    for small distances, log-spaced buckets saturating at ``max_distance``.
    """
    context = np.arange(query_length, dtype=np.int64)[:, None]
    memory = np.arange(key_length, dtype=np.int64)[None, :]
    rel = memory - context

    buckets = np.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        buckets += (rel > 0).astype(np.int64) * num_buckets
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)

    max_exact = num_buckets // 2
    is_small = rel < max_exact
    # float32 log to match the torch computation's dtype, trunc toward zero.
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


def relative_position_bucket_jnp(
    query_length: int,
    key_length: int,
    num_buckets: int = 320,
    max_distance: int = 800,
    bidirectional: bool = True,
) -> jnp.ndarray:
    """In-graph twin of :func:`relative_position_bucket` (same math, jnp ops).

    The dense ``[T, T]`` int32 matrix is ~250 KB at BEATs shapes; computing
    it from iota inside the program keeps it out of the serialized compile
    payload (degraded remote-compile transports reject large bodies).
    Exact-match with the numpy version is pinned by a test across lengths —
    the log-bucket boundaries land identically because both compute the
    ratio in float32.
    """
    context = jax.lax.iota(jnp.int32, query_length)[:, None]
    memory = jax.lax.iota(jnp.int32, key_length)[None, :]
    rel = memory - context

    buckets = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        buckets += (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)

    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    buckets += jnp.where(is_small, rel, large)
    return buckets.astype(jnp.int32)


@jax.custom_vjp
def grad_multiply(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity in the forward pass; gradients scaled by ``scale`` backward."""
    return x


def _grad_multiply_fwd(x, scale):
    return x, scale


def _grad_multiply_bwd(scale, g):
    return (g * scale, None)


grad_multiply.defvjp(_grad_multiply_fwd, _grad_multiply_bwd)
