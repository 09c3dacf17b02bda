"""Training losses: cross-entropy, BCE, focal, CLIP contrastive.

Counterpart of ``avex/training/losses.py``. The reference's distributed CLIP
loss manually all-gathers features across ranks with grad-preserving NCCL
collectives (losses.py:70-102); under jit with a data-sharded batch the
similarity matmul below *is* the global computation — XLA inserts the
all-gather over ICI and the backward pass is exact without any hand-written
collective or local/global logit bookkeeping.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "cross_entropy_loss",
    "bce_loss",
    "focal_loss",
    "clip_loss",
    "build_criterion",
    "MAX_LOGIT_SCALE",
]

#: ln(100) clamp on the CLIP temperature, as in the reference (clip.py:137-139).
MAX_LOGIT_SCALE = math.log(100.0)


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy. ``targets`` may be indices or one-hot."""
    if targets.ndim == 1:
        targets = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logprobs, axis=-1))


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean sigmoid binary cross-entropy over all label positions."""
    if targets.ndim == 1 and logits.ndim == 2:
        targets = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per_elem = (
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(per_elem)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Sigmoid focal loss (≈ losses.py:292-341)."""
    if targets.ndim == 1 and logits.ndim == 2:
        targets = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = (
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return jnp.mean(alpha_t * ((1.0 - p_t) ** gamma) * ce)


def clip_loss(
    audio_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Symmetric InfoNCE over the (global) batch (≈ losses.py:107-284).

    Features are L2-normalized here; ``logit_scale`` is the *log* temperature,
    clamped at ln(100). Under a data-sharded jit, ``audio @ text.T`` runs over
    the full global batch (XLA all-gathers along ICI), which corresponds to
    the reference's `gather_features` + global-logits path with
    ``local_loss=False``.

    Returns ``(loss, aux)`` where aux carries a2t/t2a top-1 accuracies.
    """
    audio = audio_features / jnp.linalg.norm(audio_features, axis=-1, keepdims=True)
    text = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    scale = jnp.exp(jnp.clip(logit_scale, max=MAX_LOGIT_SCALE))
    logits_a2t = scale * (audio @ text.T).astype(jnp.float32)
    logits_t2a = logits_a2t.T
    n = logits_a2t.shape[0]
    labels = jnp.arange(n)
    loss = 0.5 * (
        cross_entropy_loss(logits_a2t, labels) + cross_entropy_loss(logits_t2a, labels)
    )
    aux = {
        "a2t_correct": jnp.sum(jnp.argmax(logits_a2t, axis=1) == labels),
        "t2a_correct": jnp.sum(jnp.argmax(logits_t2a, axis=1) == labels),
    }
    return loss, aux


def build_criterion(loss_function: str):
    """name → loss callable (≈ losses.py:344-358)."""
    table = {
        "cross_entropy": cross_entropy_loss,
        "bce": bce_loss,
        "focal": focal_loss,
    }
    if loss_function == "clip":
        return clip_loss
    if loss_function not in table:
        raise ValueError(f"Unknown loss function: {loss_function}")
    return table[loss_function]
