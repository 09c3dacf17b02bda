"""Probe training for evaluation: offline (cached embeddings) and online.

Counterpart of ``avex/evaluation/finetune.py``:

- :class:`FineTuneTrainer` (≈ :36-455): warmup + cosine/linear/step schedule,
  CE/BCE target handling, gradient clipping, per-epoch metric calculators,
  in-memory best-checkpoint restore;
- :func:`train_and_eval_offline` (≈ :461-636): probe over cached embeddings;
- :func:`train_and_eval_online` (≈ :637-817): probe attached to the backbone
  on raw audio, frozen (stop_gradient) or jointly fine-tuned.

Everything trains through one jitted step over the active mesh; in online
mode the backbone forward lives inside the same compiled program as the
probe, so frozen probing never leaves the device.

Documented deviation: unfrozen online fine-tuning keeps BatchNorm running
statistics frozen at their pretrained values (inference-mode BN). The torch
reference's ``model.train()`` lets BN stats drift during probe fine-tuning;
frozen BN is the standard small-data fine-tuning choice and keeps the
backbone extraction path a pure function. (Full training with BN updates is
the Trainer's job — training/train.py threads mutable batch_stats.)
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avex_tpu.configs import ProbeConfig, TrainingParams
from avex_tpu.metrics import get_metric_class
from avex_tpu.parallel import make_mesh, replicate, shard_batch
from avex_tpu.probes import Probe, build_probe_from_config
from avex_tpu.training.losses import bce_loss, cross_entropy_loss
from avex_tpu.training.optimizers import build_scheduler

logger = logging.getLogger(__name__)


def _batch_embeddings(batch: Dict[str, Any]) -> List[jnp.ndarray]:
    """Pull ordered per-layer embeddings out of a cached-embedding batch."""
    embs = []
    i = 0
    while f"embeddings_{i}" in batch:
        embs.append(batch[f"embeddings_{i}"])
        i += 1
    if not embs and "raw_wav" in batch:
        embs = [batch["raw_wav"]]
    return embs


class FineTuneTrainer:
    """Train a probe (optionally jointly with its backbone) and evaluate."""

    def __init__(
        self,
        probe: Probe,
        training_params: TrainingParams,
        metrics: Sequence[str] = ("accuracy",),
        multilabel: bool = False,
        mesh=None,
        mode: str = "offline",
        seed: int = 0,
    ) -> None:
        self.probe = probe
        self.params_cfg = training_params
        self.metric_names = list(metrics)
        self.multilabel = multilabel
        self.mesh = mesh or make_mesh()
        self.mode = mode
        self.seed = seed
        self.criterion = bce_loss if multilabel else cross_entropy_loss
        self._best_params = None
        self.best_val_metric = -np.inf

        self._forward = self._build_forward()
        self._trainable = self._initial_trainable()

    # ------------------------------------------------------------------

    def _initial_trainable(self) -> Dict[str, Any]:
        trainable = {"probe": self.probe.variables["params"]}
        if self.mode == "online" and not self.probe.freeze_backbone:
            trainable["backbone"] = self.probe.base_model.variables["params"]
        return trainable

    def _build_forward(self) -> Callable:
        probe_module = self.probe.module
        if self.mode == "offline":

            def forward(trainable, batch, train, rng):
                embs = _batch_embeddings(batch)
                rngs = {"dropout": rng} if (train and rng is not None) else None
                return probe_module.apply(
                    {"params": trainable["probe"]},
                    embs,
                    batch.get("padding_mask"),
                    deterministic=not train,
                    rngs=rngs,
                )

            return forward

        base_model = self.probe.base_model
        layers = tuple(base_model._hook_layers)
        extract = base_model.extract_fn(layers, self.probe.aggregation)
        backbone_extra = {
            k: v for k, v in base_model.variables.items() if k != "params"
        }
        frozen = self.probe.freeze_backbone
        backbone_params = base_model.variables["params"]

        def forward(trainable, batch, train, rng):
            bb_params = trainable.get("backbone", backbone_params)
            embs = extract(
                {"params": bb_params, **backbone_extra},
                batch["raw_wav"],
                batch.get("padding_mask"),
            )
            if frozen:
                embs = jax.lax.stop_gradient(embs)
            if not isinstance(embs, (list, tuple)):
                embs = [embs]
            rngs = {"dropout": rng} if (train and rng is not None) else None
            return probe_module.apply(
                {"params": trainable["probe"]},
                list(embs),
                batch.get("padding_mask"),
                deterministic=not train,
                rngs=rngs,
            )

        return forward

    # ------------------------------------------------------------------

    def _make_steps(self, steps_per_epoch: int):
        cfg = self.params_cfg
        total = max(steps_per_epoch * cfg.train_epochs, 1)
        warmup = cfg.warmup_epochs * steps_per_epoch
        schedule = build_scheduler(
            cfg.scheduler_type if cfg.scheduler_type != "none" else "none",
            cfg.lr,
            warmup_steps=warmup,
            total_steps=total,
        )
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        if cfg.gradient_clip_val:
            tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip_val), tx)
        forward = self._forward
        criterion = self.criterion

        def train_step(trainable, opt_state, batch, rng):
            def loss_fn(params):
                logits = forward(params, batch, True, rng)
                return criterion(logits, batch["label"]), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, logits

        def eval_step(trainable, batch):
            logits = forward(trainable, batch, False, None)
            return criterion(logits, batch["label"]), logits

        import os

        donate = (0, 1) if os.environ.get("AVEX_TPU_DONATE", "1") == "1" else ()
        return tx, jax.jit(train_step, donate_argnums=donate), jax.jit(eval_step)

    def _place_trainable(self, trainable):
        """Mesh placement for the trainable tree. MoE probe heads go
        expert-parallel: expert tensors shard one slice per device over the
        model axis (ops/moe.shard_moe_params); everything else replicates."""
        if (
            self.probe.probe_type == "moe"
            and int(dict(self.mesh.shape).get("model", 1)) > 1
        ):
            from avex_tpu.ops.moe import shard_moe_params

            return shard_moe_params(trainable, self.mesh, axis="model")
        return replicate(trainable, self.mesh)

    def _run_eval(self, eval_step, trainable, loader) -> Dict[str, float]:
        calcs = {
            name: get_metric_class(name, self.probe.num_classes)
            for name in self.metric_names
        }
        loss_sum, n = 0.0, 0
        for batch in loader:
            labels = batch["label"]
            device_batch = shard_batch(batch, self.mesh)
            loss, logits = eval_step(trainable, device_batch)
            logits = np.asarray(logits)
            for calc in calcs.values():
                calc.update(logits, np.asarray(labels))
            loss_sum += float(loss) * logits.shape[0]
            n += logits.shape[0]
        out = {name: calc.get_primary_metric() for name, calc in calcs.items()}
        out["loss"] = loss_sum / max(n, 1)
        return out

    def train(
        self, train_loader: Iterable, val_loader: Optional[Iterable] = None
    ) -> Dict[str, Any]:
        """Full probe-training loop; restores the best-val params at the end
        (≈ finetune.py:396-455)."""
        try:
            steps_per_epoch = len(train_loader)
        except TypeError:
            steps_per_epoch = 100
        tx, train_step, eval_step = self._make_steps(steps_per_epoch)
        trainable = self._place_trainable(self._trainable)
        opt_state = replicate(tx.init(self._trainable), self.mesh)
        rng = jax.random.PRNGKey(self.seed)

        history = []
        for epoch in range(self.params_cfg.train_epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            loss_sum, n = 0.0, 0
            for batch in train_loader:
                rng, step_rng = jax.random.split(rng)
                device_batch = shard_batch(batch, self.mesh)
                trainable, opt_state, loss, logits = train_step(
                    trainable, opt_state, device_batch, step_rng
                )
                bsz = int(np.asarray(batch["label"]).shape[0])
                loss_sum += float(loss) * bsz
                n += bsz
            record = {"epoch": epoch, "train_loss": loss_sum / max(n, 1)}
            if val_loader is not None and not self.params_cfg.skip_validation:
                val = self._run_eval(eval_step, trainable, val_loader)
                record["val"] = val
                primary = val.get(self.metric_names[0], -val["loss"])
                if primary > self.best_val_metric:
                    self.best_val_metric = primary
                    self._best_params = jax.device_get(trainable)
            history.append(record)
            logger.debug("probe epoch %d: %s", epoch, record)

        final = jax.device_get(trainable)
        if self._best_params is not None:
            final = self._best_params
        self._trainable = final
        self.probe.variables = {"params": final["probe"]}
        if "backbone" in final and self.probe.base_model is not None:
            self.probe.base_model.variables = {
                **self.probe.base_model.variables,
                "params": final["backbone"],
            }
            self.probe.base_model._jit_cache.clear()
        self._eval_step = eval_step
        return {"history": history, "best_val_metric": self.best_val_metric}

    def evaluate(self, loader: Iterable) -> Dict[str, float]:
        """Test-set metrics with the (best) trained parameters."""
        if not hasattr(self, "_eval_step"):
            _tx, _train, self._eval_step = self._make_steps(1)
        trainable = self._place_trainable(self._trainable)
        return self._run_eval(self._eval_step, trainable, loader)


def train_and_eval_offline(
    probe_config: ProbeConfig,
    training_params: TrainingParams,
    train_loader: Iterable,
    test_loader: Iterable,
    input_dims: Sequence[Tuple[int, ...]],
    num_classes: int,
    val_loader: Optional[Iterable] = None,
    metrics: Sequence[str] = ("accuracy",),
    multilabel: bool = False,
    seed: int = 0,
) -> Tuple[Dict[str, float], FineTuneTrainer]:
    """Offline probing over cached embeddings (≈ finetune.py:461-636)."""
    input_dim = list(input_dims) if len(input_dims) > 1 else tuple(input_dims[0])
    probe = build_probe_from_config(
        probe_config, num_classes=num_classes, input_dim=input_dim, seed=seed
    )
    trainer = FineTuneTrainer(
        probe, training_params, metrics=metrics, multilabel=multilabel, mode="offline", seed=seed
    )
    trainer.train(train_loader, val_loader)
    return trainer.evaluate(test_loader), trainer


def train_and_eval_online(
    probe_config: ProbeConfig,
    training_params: TrainingParams,
    base_model,
    train_loader: Iterable,
    test_loader: Iterable,
    num_classes: int,
    val_loader: Optional[Iterable] = None,
    metrics: Sequence[str] = ("accuracy",),
    multilabel: bool = False,
    seed: int = 0,
) -> Tuple[Dict[str, float], FineTuneTrainer]:
    """Online probing on raw audio through the backbone (≈ finetune.py:637-817)."""
    probe = build_probe_from_config(
        probe_config, num_classes=num_classes, base_model=base_model, seed=seed
    )
    trainer = FineTuneTrainer(
        probe, training_params, metrics=metrics, multilabel=multilabel, mode="online", seed=seed
    )
    trainer.train(train_loader, val_loader)
    return trainer.evaluate(test_loader), trainer
