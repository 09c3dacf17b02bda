"""Training runtime: pjit-sharded Trainer, strategies, losses, checkpoints."""

from avex_tpu.training.checkpoint import CheckpointManager
from avex_tpu.training.losses import build_criterion, clip_loss
from avex_tpu.training.metrics_tracker import MetricsTracker
from avex_tpu.training.optimizers import build_scheduler, get_optimizer, make_optimizer
from avex_tpu.training.strategies import make_strategy
from avex_tpu.training.train import Trainer, TrainState
