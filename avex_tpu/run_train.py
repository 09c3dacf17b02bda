"""Training entry point: RunConfig → data → model → Trainer.

Counterpart of ``avex/run_train.py:45-120``: builds dataloaders, the model
(with num_classes from the label map), optimizer/scheduler via the Trainer,
and runs the full loop. Multi-host initialization replaces the reference's
``init_distributed`` NCCL bring-up.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

from avex_tpu.configs import RunConfig
from avex_tpu.data import build_dataloaders
from avex_tpu.models.factory import build_model_from_spec
from avex_tpu.parallel import init_multihost, is_main_process
from avex_tpu.training import Trainer
from avex_tpu.utils.experiment_logger import ExperimentLogger

logger = logging.getLogger(__name__)


def main(config: RunConfig) -> Dict[str, Any]:
    """Run one training job and return the Trainer's result summary."""
    from avex_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if config.distributed:
        init_multihost()

    train_loader, val_loader, _test_loader, label_map, num_classes = build_dataloaders(config)
    logger.info("Datasets ready: %d classes", num_classes)

    model = build_model_from_spec(config.model_spec, num_classes=num_classes)
    model.label_mapping = label_map

    exp_logger = None
    if is_main_process():
        exp_logger = ExperimentLogger(
            backend=config.logging,
            run_name=config.run_name,
            logging_uri=config.logging_uri,
            project=config.wandb_project,
            output_dir=config.output_dir,
        )
        exp_logger.log_params(
            {
                "model": config.model_spec.name,
                "lr": config.training_params.lr,
                "batch_size": config.training_params.batch_size,
                "epochs": config.training_params.train_epochs,
                "loss": config.loss_function,
            }
        )

    trainer = Trainer(
        model,
        config,
        train_loader,
        val_loader,
        exp_logger=exp_logger,
        checkpoint_every_epochs=config.checkpoint_freq,
    )
    result = trainer.train()
    if exp_logger is not None:
        exp_logger.finalize()
    return result
