"""TrainerFactory: wire strategy + checkpoints + metrics into a Trainer.

Counterpart of ``avex/training/trainer_factory.py:38-180``. The Trainer here
self-wires most components from the RunConfig; the factory remains as the
one-call construction point the reference exposes (and the place where the
label_type → strategy mapping lives, :161-180 — see
``avex_tpu.training.strategies.make_strategy``).
"""

from __future__ import annotations

from typing import Iterable, Optional

from avex_tpu.configs import RunConfig
from avex_tpu.training.train import Trainer


class TrainerFactory:
    """Build fully-wired Trainers from RunConfigs."""

    @staticmethod
    def create_trainer(
        model,
        config: RunConfig,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        mesh=None,
        exp_logger=None,
    ) -> Trainer:
        # Gradient checkpointing is a model-construction concern in jax:
        # models that support it rebuild their module with nn.remat.
        """Wire criterion + strategy + checkpointing + metrics into a Trainer (≈ trainer_factory.py:38-180)."""
        if config.training_params.gradient_checkpointing:
            try:
                model.enable_gradient_checkpointing()
            except NotImplementedError:
                pass
        return Trainer(
            model,
            config,
            train_loader,
            val_loader,
            mesh=mesh,
            exp_logger=exp_logger,
        )
