"""Optimizer and LR-schedule factories (optax).

Counterparts of ``avex/training/optimisers.py:20-105`` and the scheduler
factory at ``avex/training/training_utils.py:14-60``. The reference's
``PagedAdamW8bit`` (a CUDA/bitsandbytes memory optimization) has no TPU
meaning; ``adamw8bit`` maps to an 8-bit-state AdamW via optax quantized
accumulators when requested.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import optax

__all__ = ["get_optimizer", "build_scheduler", "make_optimizer"]


def _weight_decay_mask(params) -> Any:
    """Apply decay to matrices only — biases / LayerNorm scales are excluded,
    mirroring common practice and the reference's param-group overrides."""
    import jax

    def decide(path, leaf) -> bool:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        last = str(names[-1]) if names else ""
        if last in ("bias", "scale", "embedding", "grep_a", "layer_weights", "logit_scale"):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def build_scheduler(
    name: str = "none",
    base_lr: float = 1e-3,
    warmup_steps: int = 0,
    total_steps: int = 10_000,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """LR schedule: none / cosine / linear (+ warmup)
    (≈ training_utils.py:14-60)."""
    if name in ("none", None):
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.constant_schedule(base_lr)
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else base_lr,
            peak_value=base_lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=min_lr,
        )
    if name in ("linear", "step"):
        warm = optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1))
        decay = optax.linear_schedule(
            base_lr, min_lr, max(total_steps - warmup_steps, 1)
        )
        return optax.join_schedules([warm, decay], [max(warmup_steps, 1)])
    raise ValueError(f"Unknown scheduler: {name}")


def get_optimizer(
    name: str,
    learning_rate,
    weight_decay: float = 0.0,
    adam_betas: Optional[Tuple[float, float]] = None,
    gradient_clip_val: Optional[float] = None,
    params=None,
) -> optax.GradientTransformation:
    """Build the optimizer chain (≈ optimisers.py:20-105).

    ``learning_rate`` may be a float or an optax schedule. Global-norm clipping
    composes in front when configured (train.py gradient_clip_val).
    """
    b1, b2 = adam_betas or (0.9, 0.999)
    if name == "adam":
        tx = optax.adam(learning_rate, b1=b1, b2=b2)
    elif name == "adamw":
        kwargs = {}
        if weight_decay and params is not None:
            kwargs["mask"] = _weight_decay_mask(params)
        tx = optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, **kwargs)
    elif name == "adamw8bit":
        # TPU analogue of PagedAdamW8bit (a CUDA paged-memory optimization):
        # AdamW with the first moment stored in bfloat16 — the memory saving
        # without bitsandbytes' int8 block quantization.
        tx = optax.adamw(
            learning_rate,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            mu_dtype=jnp.bfloat16,
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    if gradient_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    return tx


def make_optimizer(
    training_params,
    scheduler_config=None,
    total_steps: int = 10_000,
    params=None,
    lr_override: Optional[float] = None,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Wire TrainingParams + SchedulerConfig into (optimizer, schedule)."""
    base_lr = lr_override if lr_override is not None else training_params.lr
    sched_name = "none"
    warmup = 0
    min_lr = 0.0
    if scheduler_config is not None:
        sched_name = scheduler_config.name
        warmup = scheduler_config.warmup_steps
        min_lr = scheduler_config.min_lr
    elif training_params.scheduler_type != "none":
        sched_name = training_params.scheduler_type
    schedule = build_scheduler(sched_name, base_lr, warmup, total_steps, min_lr)
    tx = get_optimizer(
        training_params.optimizer,
        schedule,
        weight_decay=training_params.weight_decay,
        adam_betas=training_params.adam_betas,
        gradient_clip_val=training_params.gradient_clip_val,
        params=params,
    )
    return tx, schedule
