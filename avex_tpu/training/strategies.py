"""Training strategies: how a batch becomes (loss, metrics).

Counterpart of ``avex/training/training_strategies.py:277-301``. A strategy
is a pure function of (params, batch, rng) suitable for use inside the jitted
train step; selection by ``label_type`` mirrors the reference factory
(trainer_factory.py:161-180):

- ``supervised`` → :class:`SupervisedStrategy` (CE/BCE/focal on logits)
- ``text``       → :class:`CLIPStrategy` (symmetric contrastive)
- ``self_supervised`` → :class:`EATSSLStrategy` (model-reported losses)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from avex_tpu.training.losses import build_criterion, clip_loss

Batch = Dict[str, jnp.ndarray]


class SupervisedStrategy:
    """Logits vs (one-hot/int) labels under the configured criterion
    (≈ training_strategies.py:52-127)."""

    def __init__(self, loss_function: str = "cross_entropy", multilabel: bool = False):
        self.criterion = build_criterion(loss_function)
        self.multilabel = multilabel

    def forward_loss(
        self,
        apply_fn: Callable,
        params: Any,
        extra_variables: Dict[str, Any],
        batch: Batch,
        rng: Optional[jax.Array],
        train: bool,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Model forward + criterion; returns (loss, step metrics)."""
        variables = {"params": params, **extra_variables}
        kwargs: Dict[str, Any] = {"deterministic": not train}
        rngs = None
        if train and rng is not None:
            r1, r2 = jax.random.split(rng)
            rngs = {"dropout": r1, "layerdrop": r2}
            kwargs["disable_layerdrop"] = False
        updated_variables = None
        if train and "batch_stats" in extra_variables:
            # BatchNorm models update running stats during training; thread
            # the mutated collection back through the step.
            kwargs["train"] = True
            kwargs.pop("disable_layerdrop", None)
            out, mutated = apply_fn(
                variables,
                batch["raw_wav"],
                batch.get("padding_mask"),
                rngs=rngs,
                mutable=["batch_stats"],
                **kwargs,
            )
            updated_variables = {**extra_variables, **mutated}
        else:
            out = apply_fn(
                variables, batch["raw_wav"], batch.get("padding_mask"), rngs=rngs, **kwargs
            )
        logits = out[0] if isinstance(out, tuple) else out
        labels = batch["label"]
        loss = self.criterion(logits, labels)
        label_idx = labels.argmax(-1) if labels.ndim == 2 else labels
        metrics = {
            "logits": logits,
            "correct": jnp.sum(jnp.argmax(logits, axis=-1) == label_idx),
            "count": jnp.asarray(logits.shape[0]),
            # NaN/Inf debug guard (≈ training_strategies.py:74-106): the count
            # is computed in-graph (free) and surfaced host-side by
            # MetricsTracker, which warns when it is non-zero.
            "nonfinite_logits": jnp.sum(~jnp.isfinite(logits)),
        }
        if updated_variables is not None:
            metrics["_updated_variables"] = updated_variables
        return loss, metrics


class CLIPStrategy:
    """Audio-text contrastive training (≈ training_strategies.py:130-210).

    The model's apply must return a dict with ``audio_features``,
    ``text_features`` and ``logit_scale``. Accuracy metrics are global-batch
    a2t/t2a top-1, the jit-global equivalent of the reference's
    diagonal-block local accuracy.
    """

    def forward_loss(self, apply_fn, params, extra_variables, batch, rng, train):
        """Contrastive loss over model-reported audio/text features."""
        variables = {"params": params, **extra_variables}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        updated_variables = None
        if train and "batch_stats" in extra_variables:
            out, mutated = apply_fn(
                variables,
                batch["raw_wav"],
                batch.get("text_tokens"),
                batch.get("padding_mask"),
                deterministic=not train,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            updated_variables = {**extra_variables, **mutated}
        else:
            out = apply_fn(
                variables,
                batch["raw_wav"],
                batch.get("text_tokens"),
                batch.get("padding_mask"),
                deterministic=not train,
                rngs=rngs,
            )
        features = out[0] if isinstance(out, tuple) else out
        loss, aux = clip_loss(
            features["audio_features"], features["text_features"], features["logit_scale"]
        )
        metrics = {
            "a2t_correct": aux["a2t_correct"],
            "t2a_correct": aux["t2a_correct"],
            "count": jnp.asarray(features["audio_features"].shape[0]),
        }
        if updated_variables is not None:
            metrics["_updated_variables"] = updated_variables
        return loss, metrics


class EATSSLStrategy:
    """Self-supervised (data2vec-style) training: the model reports its own
    loss components (≈ training_strategies.py:213-274). The model's apply
    returns ``{"losses": {...}, "sample_size": n}``."""

    def forward_loss(self, apply_fn, params, extra_variables, batch, rng, train):
        """Total of the model-reported SSL loss components."""
        variables = {"params": params, **extra_variables}
        rngs = {"dropout": rng, "mask": rng} if (train and rng is not None) else None
        out = apply_fn(
            variables,
            batch["raw_wav"],
            batch.get("padding_mask"),
            deterministic=not train,
            rngs=rngs,
        )
        result = out[0] if isinstance(out, tuple) else out
        losses = result["losses"]
        sample_size = result.get("sample_size", 1)
        total = sum(jnp.sum(v) for v in losses.values()) / jnp.maximum(sample_size, 1)
        metrics = {f"loss_{k}": jnp.sum(v) for k, v in losses.items()}
        metrics["count"] = jnp.asarray(sample_size)
        return total, metrics


def make_strategy(label_type: str, loss_function: str = "cross_entropy", multilabel: bool = False):
    """label_type → strategy (≈ trainer_factory.py:161-180)."""
    if label_type == "supervised":
        return SupervisedStrategy(loss_function, multilabel)
    if label_type == "text":
        return CLIPStrategy()
    if label_type == "self_supervised":
        return EATSSLStrategy()
    raise ValueError(f"Unknown label_type: {label_type}")
