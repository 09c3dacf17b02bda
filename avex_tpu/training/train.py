"""Trainer: the pjit-sharded training loop.

Counterpart of ``avex/training/train.py:55-751``, re-designed for TPU:

- DDP + AMP + GradScaler become a single jitted train step over a
  ``jax.sharding.Mesh``: params replicated, batch sharded on the ``data``
  axis; the gradient all-reduce is inserted by XLA (no NCCL plumbing, no
  scaler — bf16 on TPU needs no loss scaling).
- The step donates its input state (``donate_argnums``) so parameter and
  optimizer memory is reused in place.
- Two-stage fine-tuning (train.py:131-135, :704-751): stage one multiplies
  backbone updates by zero via ``optax.multi_transform``; stage two rebuilds
  the optimizer at ``second_stage_lr`` (default ``0.1 * lr``).
- Gradient checkpointing maps to per-layer ``nn.remat`` configured on the
  model module (``training_params.gradient_checkpointing``).
- Checkpoint/resume via :class:`CheckpointManager` (orbax); epoch metrics via
  :class:`MetricsTracker`; observability via :class:`ExperimentLogger`.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from avex_tpu.configs import RunConfig
from avex_tpu.parallel import make_mesh, replicate, shard_batch
from avex_tpu.training.checkpoint import CheckpointManager
from avex_tpu.training.metrics_tracker import MetricsTracker
from avex_tpu.training.optimizers import make_optimizer
from avex_tpu.training.strategies import make_strategy

logger = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    """Replicated training state, donated through the jitted step."""

    step: jnp.ndarray
    params: Any
    extra_variables: Any
    opt_state: Any
    rng: jax.Array


def _partition_params(params, frozen_top_keys) -> Any:
    """Label parameter subtrees as trainable vs frozen by top-level key.

    Used for two-stage fine-tuning (freeze ``backbone``) and for models that
    own non-optimized state such as an EMA teacher (``frozen_param_keys``)."""
    frozen = {str(k) for k in frozen_top_keys}

    def label(path, _leaf):
        top = str(getattr(path[0], "key", getattr(path[0], "name", "")))
        return "frozen" if top in frozen else "train"

    return jax.tree_util.tree_map_with_path(label, params)


class Trainer:
    """Epoch-loop trainer over any iterable of host batches.

    Batches are dicts with ``raw_wav`` (B, T), optional ``padding_mask``,
    ``label`` (ints or one/multi-hot), optional ``text_tokens``. Loaders
    supply numpy; sharding happens here.
    """

    def __init__(
        self,
        model,
        config: RunConfig,
        train_loader: Iterable,
        val_loader: Optional[Iterable] = None,
        mesh=None,
        exp_logger=None,
        steps_per_epoch: Optional[int] = None,
        checkpoint_every_epochs: int = 0,
    ) -> None:
        self.model = model
        self.config = config
        self.params_cfg = config.training_params
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.exp_logger = exp_logger
        self.mesh = mesh or make_mesh(
            data=config.mesh.data, model=config.mesh.model, axis_names=config.mesh.axis_names
        )
        self._pipeline = int(getattr(config.mesh, "pipeline_microbatches", 0) or 0)
        self._seq_parallel = bool(getattr(config.mesh, "sequence_parallel", False))
        if self._pipeline and self._seq_parallel:
            raise ValueError(
                "pipeline_microbatches and sequence_parallel both claim the "
                "encoder layer runner; enable one"
            )
        if self._seq_parallel:
            # Megatron-SP (parallel/sequence.py): activations re-shard on the
            # time axis at layer boundaries; params keep their configured
            # layout (composes with the TP kernel sharding on the same axis).
            if not hasattr(model, "enable_sequence_parallel"):
                raise ValueError(
                    f"model {type(model).__name__} does not support sequence "
                    "parallelism (no enable_sequence_parallel)"
                )
            model.enable_sequence_parallel(self.mesh)
        if self._pipeline:
            # Pipeline parallelism over the model axis (GPipe schedule,
            # parallel/pipeline.py): the model rebuilds its module so the
            # scanned layer stack runs stage-sharded; stacked params are
            # placed one stage per device in _place_params.
            if getattr(config.mesh, "param_sharding", "replicated") == "fsdp":
                raise ValueError(
                    "pipeline_microbatches and param_sharding='fsdp' do not "
                    "compose (the layer stack shards over the model axis)"
                )
            if not hasattr(model, "enable_pipeline"):
                raise ValueError(
                    f"model {type(model).__name__} does not support pipeline "
                    "parallelism (no enable_pipeline; needs a scanned layer stack)"
                )
            model.enable_pipeline(self.mesh, self._pipeline)
        self.strategy = make_strategy(
            config.label_type, config.loss_function, config.multilabel
        )
        self.mode = {
            "supervised": "supervised",
            "text": "clip",
            "self_supervised": "ssl",
        }[config.label_type]
        self.checkpoints = CheckpointManager(config.output_dir)
        self.checkpoint_every_epochs = checkpoint_every_epochs
        # Step-level (mid-epoch) checkpointing — preemption recovery beyond
        # the reference's epoch granularity. Exact resume needs per-process
        # iterator state, so it is single-controller only for now.
        self.checkpoint_every_steps = int(
            getattr(config, "checkpoint_every_steps", 0) or 0
        )
        if self.checkpoint_every_steps and jax.process_count() > 1:
            logger.warning(
                "checkpoint_every_steps is single-controller only; falling "
                "back to epoch-level checkpoints on this %d-process run",
                jax.process_count(),
            )
            self.checkpoint_every_steps = 0
        self._preempted = False
        self._resume_step_in_epoch = 0
        self._resume_loader_state = None

        # During-training clustering evaluation (≈ train.py:666-702).
        self.clustering_evaluator = None
        if (
            config.clustering_eval is not None
            and config.clustering_eval.enabled
            and val_loader is not None
        ):
            from avex_tpu.training.clustering_evaluator import ClusteringEvaluator

            try:
                self.clustering_evaluator = ClusteringEvaluator(
                    model,
                    config.clustering_eval,
                    val_loader,
                    num_classes=model.num_classes or 2,
                    seed=config.seed,
                )
            except (ValueError, NotImplementedError) as err:
                logger.warning("clustering eval disabled: %s", err)

        if steps_per_epoch is None:
            try:
                steps_per_epoch = len(train_loader)
            except TypeError:
                steps_per_epoch = 100
        self.steps_per_epoch = steps_per_epoch
        self.total_steps = steps_per_epoch * self.params_cfg.train_epochs

        variables = dict(model.variables)
        params = variables.pop("params")
        self._init_params = params
        self._extra_variables = variables

        self._apply_fn = self._make_apply_fn()
        self._stage = 1 if self.params_cfg.freeze_backbone_epochs > 0 else 2
        self._build_step(stage=self._stage)

        rng = jax.random.PRNGKey(config.seed)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self._place_params(params),
            extra_variables=replicate(self._extra_variables, self.mesh),
            opt_state=self._init_opt_state(params),
            rng=rng,
        )
        self.best_val_acc = -np.inf
        self.start_epoch = 0
        if config.resume_from_checkpoint:
            self._resume(config.resume_from_checkpoint)

    # ------------------------------------------------------------------

    def _make_apply_fn(self) -> Callable:
        import inspect

        module = self.model.module
        # Strategies pass the superset of per-model knobs (deterministic,
        # disable_layerdrop, train); filter against the module's signature so
        # every architecture trains through the same step — the factory's
        # signature-filtering idiom (models/factory.py). 'mutable' is an
        # apply()-level kwarg, always forwarded.
        accepted = set(inspect.signature(type(module).__call__).parameters)

        def _filter(kwargs):
            return {k: v for k, v in kwargs.items() if k in accepted or k == "mutable"}

        if self.mode == "clip":
            process_audio = self.model.process_audio

            def apply_fn(variables, wav, text_tokens, padding_mask=None, rngs=None, **kwargs):
                # Frontend (STFT→mel→3-channel) traces into the same jitted
                # step as both towers.
                spec = process_audio(wav)
                return module.apply(
                    variables, spec, text_tokens, padding_mask, rngs=rngs, **_filter(kwargs)
                )

            return apply_fn

        # Supervised/SSL: the frontend (identity for raw-waveform models,
        # STFT→mel image for spectrogram models like ResNet/EfficientNet)
        # traces into the jitted step alongside the module.
        process_audio = self.model.process_audio

        def apply_fn(variables, wav, *args, rngs=None, **kwargs):
            return module.apply(variables, process_audio(wav), *args, rngs=rngs, **_filter(kwargs))

        return apply_fn

    def _build_step(self, stage: int) -> None:
        """(Re)build optimizer + jitted train/eval steps for the given stage."""
        lr_override = None
        if stage == 2 and self.params_cfg.freeze_backbone_epochs > 0:
            lr_override = self.params_cfg.second_stage_lr or 0.1 * self.params_cfg.lr
        tx, self._schedule = make_optimizer(
            self.params_cfg,
            self.config.scheduler,
            total_steps=self.total_steps,
            params=self._init_params,
            lr_override=lr_override,
        )
        frozen_keys = set(getattr(self.model, "frozen_param_keys", ()) or ())
        if stage == 1:
            frozen_keys.add("backbone")
        if frozen_keys:
            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()},
                _partition_params(self._init_params, frozen_keys),
            )
        self._tx = tx
        strategy = self.strategy
        apply_fn = self._apply_fn
        post_update = getattr(self.model, "post_optimizer_step", None)

        def train_step(state: TrainState, batch):
            rng, step_rng = jax.random.split(state.rng)

            def loss_fn(params):
                return strategy.forward_loss(
                    apply_fn, params, state.extra_variables, batch, step_rng, train=True
                )

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self._tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if post_update is not None:
                # Model-owned state refresh inside the compiled step
                # (e.g. EMA teacher update for SSL pretraining).
                params = post_update(params)
            # BatchNorm-style mutated collections flow back into state.
            extra_variables = metrics.pop("_updated_variables", state.extra_variables)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                extra_variables=extra_variables,
                opt_state=opt_state,
                rng=rng,
            )
            return new_state, loss, metrics

        def eval_step(state: TrainState, batch):
            loss, metrics = strategy.forward_loss(
                apply_fn, state.params, state.extra_variables, batch, None, train=False
            )
            return loss, metrics

        # Buffer donation reuses state memory in place — correct on real
        # TPU; disable via AVEX_TPU_DONATE=0 on transports where donation
        # forces host round-trips (e.g. remote-TPU tunnels).
        import os

        donate = (0,) if os.environ.get("AVEX_TPU_DONATE", "1") == "1" else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)

    @property
    def _fsdp(self) -> bool:
        return getattr(self.config.mesh, "param_sharding", "replicated") == "fsdp"

    def _place_params(self, params: Any) -> Any:
        """Put host params onto the mesh in the configured layout (replicated
        or ZeRO-3). Used at init, resume, and the stage-2 rebuild — the
        layout must survive all three."""
        if self._fsdp:
            from avex_tpu.parallel import shard_params_fsdp

            return shard_params_fsdp(
                params, self.mesh, min_size=self.config.mesh.fsdp_min_size
            )
        if self._pipeline:
            from avex_tpu.parallel.pipeline import shard_pipeline_params

            return shard_pipeline_params(params, self.mesh)
        return replicate(params, self.mesh)

    def _init_opt_state(self, params: Any) -> Any:
        """Fresh optimizer state in the configured layout. Under fsdp the
        zero-initialized moments have no data dependence for sharding
        propagation, so placement is forced via explicit out_shardings (the
        policy is shape-deterministic, matching the params)."""
        if self._fsdp:
            from avex_tpu.parallel import fsdp_tree_shardings, shard_params_fsdp

            min_size = self.config.mesh.fsdp_min_size
            sharded = shard_params_fsdp(params, self.mesh, min_size=min_size)
            opt_abstract = jax.eval_shape(self._tx.init, sharded)
            return jax.jit(
                self._tx.init,
                out_shardings=fsdp_tree_shardings(opt_abstract, self.mesh, min_size),
            )(sharded)
        return replicate(self._tx.init(params), self.mesh)

    def _resume(self, path: str) -> None:
        from pathlib import Path as _Path

        # Interrupted rolling swap: the stable name may be mid-rename while
        # the complete _next directory survives — fall back to it.
        candidate = _Path(str(path))
        if not candidate.exists() and _Path(str(path) + "_next").exists():
            logger.warning(
                "checkpoint %s missing; resuming from %s_next (interrupted "
                "rolling swap)",
                path,
                path,
            )
            path = str(path) + "_next"
        template = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        extra = jax.device_get(self.state.extra_variables)
        if extra:
            template["extra_variables"] = extra
        try:
            payload = self.checkpoints.load(path, template=template)
        except Exception:
            if "extra_variables" not in template:
                raise
            # Older checkpoint without mutable collections (pre round-2 save
            # format): restore what it has, keep init-time extra_variables.
            template.pop("extra_variables")
            payload = self.checkpoints.load(path, template=template)
            logger.warning(
                "checkpoint %s has no extra_variables (batch_stats etc.); "
                "keeping init-time values",
                path,
            )
        # Re-place in the configured layout (fsdp resume must stay sharded —
        # replicating here would use data_axis x the intended memory).
        restored_opt = payload["opt_state"]
        if self._fsdp:
            from avex_tpu.parallel import fsdp_tree_shardings

            min_size = self.config.mesh.fsdp_min_size
            restored_opt = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s),
                restored_opt,
                fsdp_tree_shardings(restored_opt, self.mesh, min_size),
            )
        else:
            restored_opt = replicate(restored_opt, self.mesh)
        self.state = self.state.replace(
            params=self._place_params(payload["params"]),
            opt_state=restored_opt,
            step=jnp.asarray(payload.get("step", 0), jnp.int32),
        )
        if "extra_variables" in payload:
            self.state = self.state.replace(
                extra_variables=replicate(payload["extra_variables"], self.mesh)
            )
        self.start_epoch = int(payload.get("epoch", 0))
        self.best_val_acc = float(payload.get("best_val_acc", -np.inf))
        # Mid-epoch (step-level) checkpoints carry the position inside the
        # epoch plus, for stateful loaders, the exact data iterator state.
        self._resume_step_in_epoch = int(payload.get("step_in_epoch", 0) or 0)
        self._resume_loader_state = payload.get("loader_state")
        if payload.get("rng") is not None:
            self.state = self.state.replace(
                rng=jnp.asarray(np.asarray(payload["rng"], dtype=np.uint32))
            )
        if self._resume_step_in_epoch:
            logger.info(
                "Resumed from %s mid-epoch: epoch %d, step %d",
                path,
                self.start_epoch,
                self._resume_step_in_epoch,
            )
        else:
            logger.info("Resumed from %s at epoch %d", path, self.start_epoch)

    def _save_kwargs(self) -> Dict[str, Any]:
        """Host copies of everything a checkpoint must persist.

        Includes mutable collections (batch_stats for BatchNorm towers) —
        the reference's ``model.state_dict()`` checkpoints carry BN buffers
        (checkpoint_manager.py:109); omitting them breaks eval-mode reload.
        """
        kwargs: Dict[str, Any] = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(self.state.step),
        }
        extra = jax.device_get(self.state.extra_variables)
        if extra:
            kwargs["extra_variables"] = extra
        return kwargs

    def _save_metadata(
        self, checkpoint_name: str, metrics: Dict[str, float],
        is_best: bool = False, is_final: bool = False,
    ) -> None:
        """Run-id + config-snapshot row per checkpoint
        (≈ experiment_tracking.py:27-93), process 0 only."""
        from avex_tpu.parallel import is_main_process
        from avex_tpu.utils.tracking import save_experiment_metadata

        if not is_main_process():
            return
        numeric = {
            k: float(v) for k, v in (metrics or {}).items() if isinstance(v, (int, float))
        }
        save_experiment_metadata(
            self.config.output_dir,
            self.config,
            checkpoint_name,
            metrics=numeric,
            is_best=is_best,
            is_final=is_final,
        )

    # ------------------------------------------------------------------

    def _save_step_checkpoint(self, epoch: int, step_in_epoch: int) -> str:
        """Rolling mid-epoch checkpoint incl. the data iterator state."""
        loader_state = None
        if hasattr(self.train_loader, "iterator_state"):
            try:
                loader_state = self.train_loader.iterator_state()
            except Exception as err:  # keep training; skip-resume still works
                logger.warning("could not capture loader state: %s", err)
        return self.checkpoints.save_rolling(
            "step_checkpoint",
            epoch=epoch,
            best_val_acc=self.best_val_acc,
            extra_meta={
                "step_in_epoch": int(step_in_epoch),
                "loader_state": loader_state,
                # The rng chain must survive for exact resume (dropout /
                # layerdrop patterns continue where they left off).
                "rng": np.asarray(jax.device_get(self.state.rng)).tolist(),
            },
            **self._save_kwargs(),
        )

    def _run_epoch(
        self,
        loader: Iterable,
        train: bool,
        epoch: int,
        start_step: int = 0,
        iterator=None,
    ) -> Dict[str, float]:
        """One pass over ``loader``. ``iterator``/``start_step`` support
        mid-epoch resume: a restored (or skip-forwarded) iterator continues
        the epoch with the step counter at its true position."""
        tracker = MetricsTracker(
            mode=self.mode,
            metric_names=self.config.metrics,
            num_classes=self.model.num_classes,
        )
        t0 = time.time()
        stream = iterator if iterator is not None else loader
        for step_idx, batch in enumerate(stream, start=start_step):
            labels = batch.get("label")
            if self.mode == "clip" and "text_label" in batch:
                # Tokenize host-side; the string column itself never crosses
                # to the device (shard_batch drops non-numeric leaves). Audio
                # preprocessing happens inside the jitted step (_make_apply_fn).
                batch = dict(batch)
                batch["text_tokens"] = self.model.tokenize(batch["text_label"])
            device_batch = shard_batch(batch, self.mesh)
            if train:
                self.state, loss, metrics = self._train_step(self.state, device_batch)
            else:
                loss, metrics = self._eval_step(self.state, device_batch)
            if jax.process_count() > 1:
                # Per-example outputs (logits) are globally sharded and not
                # addressable from one host; metric calculators pair this
                # host's slice with its local labels (reference per-rank
                # metrics + all_reduce semantics), then gather_metrics
                # averages the epoch values across hosts below.
                from avex_tpu.parallel import local_array

                metrics = {k: local_array(v) for k, v in metrics.items()}
            tracker.update(loss, metrics, labels=labels)
            if (
                train
                and self.checkpoint_every_steps
                and (step_idx + 1) % self.checkpoint_every_steps == 0
            ):
                self._save_step_checkpoint(epoch, step_idx + 1)
            if train and self._preempted:
                self._save_step_checkpoint(epoch, step_idx + 1)
                logger.warning(
                    "Preemption signal: saved step_checkpoint at epoch %d "
                    "step %d, stopping",
                    epoch,
                    step_idx + 1,
                )
                break
            if train and (step_idx + 1) % self.params_cfg.log_steps == 0:
                logger.info(
                    "epoch %d step %d loss %.4f (%.1f samples/s)",
                    epoch,
                    step_idx + 1,
                    tracker.avg_loss,
                    tracker.sample_count / max(time.time() - t0, 1e-6),
                )
        metrics = tracker.epoch_metrics()
        metrics["epoch_seconds"] = time.time() - t0
        metrics["primary"] = tracker.primary_metric()
        if jax.process_count() > 1:
            # Cross-host metric sync (the reference's all_reduce-SUM/avg,
            # distributed.py:247-328) so every host logs/compares the same
            # numbers — best-checkpoint decisions must not diverge.
            from avex_tpu.parallel import gather_metrics

            metrics = gather_metrics(metrics)
        return metrics

    def train(self) -> Dict[str, Any]:
        """Run the full training loop; returns the final metric summary."""
        import os
        import signal

        cfg = self.params_cfg
        history = []
        profile_dir = os.environ.get("AVEX_PROFILE_DIR")
        # TPU preemptions deliver SIGTERM; save a resumable step checkpoint
        # and exit the loop cleanly instead of dying mid-step.
        prev_handler = None
        if getattr(self.config, "save_on_preemption", False) and jax.process_count() == 1:
            try:
                prev_handler = signal.signal(
                    signal.SIGTERM, lambda *_a: setattr(self, "_preempted", True)
                )
            except ValueError:  # not the main thread
                prev_handler = None
        try:
            return self._train_loop(cfg, history, profile_dir)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _train_loop(self, cfg, history, profile_dir) -> Dict[str, Any]:
        for epoch in range(self.start_epoch, cfg.train_epochs):
            # Two-stage transition (train.py:704-751): unfreeze + lower LR.
            if self._stage == 1 and epoch >= cfg.freeze_backbone_epochs:
                logger.info("Stage 2: unfreezing backbone at reduced LR")
                self._stage = 2
                self._build_step(stage=2)
                params = jax.device_get(self.state.params)
                self.state = self.state.replace(
                    opt_state=self._init_opt_state(params)
                )

            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)

            # Mid-epoch resume: continue the interrupted epoch from its saved
            # position — exactly (restored iterator state, grain) or by
            # deterministic batch skip (native loader; shuffles derive from
            # (seed, epoch), so the skipped batches equal the trained ones).
            start_step, resume_iterator = 0, None
            if epoch == self.start_epoch and self._resume_step_in_epoch:
                start_step = self._resume_step_in_epoch
                if self._resume_loader_state is not None and hasattr(
                    self.train_loader, "restore_iterator"
                ):
                    resume_iterator = self.train_loader.restore_iterator(
                        self._resume_loader_state
                    )
                    logger.info("Restored exact loader state at step %d", start_step)
                else:
                    resume_iterator = iter(self.train_loader)
                    for _ in range(start_step):
                        next(resume_iterator, None)
                    logger.info("Skip-forwarded loader by %d batches", start_step)
                self._resume_step_in_epoch = 0
                self._resume_loader_state = None

            epoch_kwargs = dict(start_step=start_step, iterator=resume_iterator)
            if profile_dir and epoch == self.start_epoch:
                # First-epoch jax.profiler capture (TensorBoard-viewable) when
                # requested — observability the reference lacks (SURVEY §5).
                from avex_tpu.utils.profiling import trace

                with trace(profile_dir):
                    train_metrics = self._run_epoch(
                        self.train_loader, train=True, epoch=epoch, **epoch_kwargs
                    )
                logger.info("profiled epoch %d -> %s", epoch, profile_dir)
            else:
                train_metrics = self._run_epoch(
                    self.train_loader, train=True, epoch=epoch, **epoch_kwargs
                )
            record = {"epoch": epoch, "train": train_metrics}
            if self._preempted:
                history.append(record)
                logger.warning("Training preempted at epoch %d; resumable from step_checkpoint", epoch)
                self.model.variables = {
                    "params": jax.device_get(self.state.params),
                    **jax.device_get(self.state.extra_variables),
                }
                self.model._jit_cache.clear()
                return {
                    "history": history,
                    "best_val_acc": self.best_val_acc,
                    "preempted": True,
                    "final_checkpoint": str(self.checkpoints._path("step_checkpoint")),
                }

            if self.val_loader is not None and not cfg.skip_validation:
                val_metrics = self._run_epoch(self.val_loader, train=False, epoch=epoch)
                record["val"] = val_metrics
                if val_metrics["primary"] > self.best_val_acc:
                    self.best_val_acc = val_metrics["primary"]
                    # meta epoch = next epoch to run (epoch N is complete).
                    self.checkpoints.save_best(
                        epoch=epoch + 1,
                        best_val_acc=self.best_val_acc,
                        **self._save_kwargs(),
                    )
                    self._save_metadata("best_model", val_metrics, is_best=True)

            if self.checkpoint_every_epochs and (epoch + 1) % self.checkpoint_every_epochs == 0:
                self.checkpoints.save_epoch(
                    epoch,
                    best_val_acc=self.best_val_acc,
                    **self._save_kwargs(),
                )

            if self.clustering_evaluator is not None and self.clustering_evaluator.should_run(epoch):
                # Sync trained params into the model handle so extraction
                # sees current weights, then score clustering on val data.
                self.model.variables = {
                    "params": jax.device_get(self.state.params),
                    **jax.device_get(self.state.extra_variables),
                }
                record["clustering"] = self.clustering_evaluator.evaluate()

            if self.exp_logger is not None:
                flat = {f"train/{k}": v for k, v in train_metrics.items()}
                if "val" in record:
                    flat.update({f"val/{k}": v for k, v in record["val"].items()})
                if "clustering" in record:
                    flat.update({f"clustering/{k}": v for k, v in record["clustering"].items()})
                self.exp_logger.log_metrics(flat, step=epoch)
            history.append(record)
            logger.info("epoch %d done: %s", epoch, {k: round(v, 4) if isinstance(v, float) else v for k, v in train_metrics.items()})

        final_path = self.checkpoints.save_final(
            epoch=cfg.train_epochs,
            best_val_acc=self.best_val_acc,
            **self._save_kwargs(),
        )
        self._save_metadata(
            "final_model",
            history[-1]["train"] if history else {},
            is_final=True,
        )
        if self.model.label_mapping is not None:
            from avex_tpu.parallel import is_main_process

            if is_main_process():
                import json

                (self.checkpoints.output_dir / "label_map.json").write_text(
                    json.dumps(self.model.label_mapping)
                )
        # Reflect trained weights back into the model handle.
        self.model.variables = {
            "params": jax.device_get(self.state.params),
            **jax.device_get(self.state.extra_variables),
        }
        self.model._jit_cache.clear()
        return {
            "history": history,
            "best_val_acc": self.best_val_acc,
            "final_checkpoint": final_path,
        }
