"""Checkpoint save/restore (orbax-backed).

Counterpart of ``avex/training/checkpoint_manager.py:37-263``: saves
``{step, epoch, params, opt_state, best_val_acc}`` under the reference's
naming scheme (``best_model`` / ``checkpoint_epoch_N`` / ``final_model``),
process-0 only on multi-host (orbax coordinates the rest). Local or
cloud directories via the io layer for metadata.

**Cross-topology restore.** Orbax warns that restoring with shard info taken
from disk "is unsafe when restoring on a different topology". That mode is
never used here — checkpoints are topology-free by construction:

1. the Trainer saves **host-gathered** arrays (``jax.device_get`` in
   ``Trainer._save_kwargs``), so nothing about the saving mesh is persisted;
2. :meth:`load` restores through an abstract template whose
   ``ShapeDtypeStruct``s carry **no sharding**, so orbax materializes plain
   host/default-device values;
3. ``Trainer._place_params`` / ``_resume`` then re-place for whatever mesh
   the resuming run configured (replicated, FSDP, or pipeline stage-sharded).

A checkpoint written under FSDP on 8 devices therefore restores onto 4
devices, a different stage count, or a single chip unchanged — pinned by
``tests/unittests/test_sharded_checkpoint_lifecycle.py``. The cost is one
full-size host materialization per save/restore (fine at single-controller
scale; multi-host giant models would switch to orbax sharded save).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Training checkpoint lifecycle with best/periodic/final variants.

    ``output_dir`` may be local or a cloud URI (``gs://...`` etc.) — orbax
    persists remote checkpoints through tensorstore; the small meta.json
    sidecars go through the io layer.
    """

    def __init__(self, output_dir: str, save_every: int = 0) -> None:
        from avex_tpu.io import is_remote

        self._remote = is_remote(str(output_dir))
        if self._remote:
            self.output_dir = str(output_dir).rstrip("/")
        else:
            self.output_dir = Path(output_dir).expanduser().resolve()
            self.output_dir.mkdir(parents=True, exist_ok=True)
        self.save_every = save_every
        self._checkpointer = ocp.StandardCheckpointer()

    def _path(self, name: str):
        if self._remote:
            return f"{self.output_dir}/{name}"
        return self.output_dir / name

    def save(
        self,
        name: str,
        params: Any,
        opt_state: Any = None,
        step: int = 0,
        epoch: int = 0,
        best_val_acc: float = 0.0,
        extra_variables: Optional[Dict[str, Any]] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> str:
        """Save a named checkpoint; returns its path.

        ``extra_meta`` merges into the meta.json sidecar — used by step-level
        (mid-epoch) checkpoints to carry ``step_in_epoch`` and the data
        iterator state.
        """
        path = self._path(name)
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if extra_variables:
            payload["extra_variables"] = extra_variables
        # Only process 0 mutates the shared directory; the orbax save call
        # itself stays collective (all processes participate).
        main = jax.process_index() == 0
        if main and self.exists(name):
            if self._remote:
                from avex_tpu.io import rm

                rm(str(path), recursive=True)
            else:
                import shutil

                shutil.rmtree(path)
        self._checkpointer.save(path, payload)
        self._checkpointer.wait_until_finished()
        if main:
            meta_dict = {
                "step": int(step),
                "epoch": int(epoch),
                "best_val_acc": float(best_val_acc),
            }
            if extra_meta:
                meta_dict.update(extra_meta)
            meta = json.dumps(meta_dict)
            if self._remote:
                from avex_tpu.io import write_text

                write_text(f"{self.output_dir}/{name}.meta.json", meta)
            else:
                (self.output_dir / f"{name}.meta.json").write_text(meta)
        logger.info("Saved checkpoint %s (epoch %d, step %d)", path, epoch, step)
        return str(path)

    def save_rolling(self, name: str, **kwargs) -> str:
        """Crash-safe rolling save: write ``<name>_next``, then swap.

        A plain overwrite deletes the only previous checkpoint before the
        new save completes — a crash in that window (exactly what rolling
        preemption checkpoints exist for) would destroy all progress. The
        swap shrinks the vulnerable window to a directory rename, and a
        crash inside it still leaves the complete ``<name>_next`` on disk
        (the trainer's resume falls back to it).
        """
        if self._remote:  # no cheap rename on object stores
            return self.save(name, **kwargs)
        next_name = f"{name}_next"
        self.save(next_name, **kwargs)
        import shutil

        final = self._path(name)
        if final.exists():
            shutil.rmtree(final)
        final_meta = self.output_dir / f"{name}.meta.json"
        final_meta.unlink(missing_ok=True)
        self._path(next_name).rename(final)
        (self.output_dir / f"{next_name}.meta.json").rename(final_meta)
        return str(final)

    def save_best(self, **kwargs) -> str:
        """Save/overwrite the best_model checkpoint."""
        return self.save("best_model", **kwargs)

    def save_final(self, **kwargs) -> str:
        """Save the final_model checkpoint."""
        return self.save("final_model", **kwargs)

    def save_epoch(self, epoch: int, **kwargs) -> str:
        """Save a periodic checkpoint_epoch_N checkpoint.

        The meta ``epoch`` records the NEXT epoch to run (epoch N is
        complete when this saves) — the same convention save_final uses —
        so resume continues at N+1 instead of re-training epoch N.
        """
        return self.save(f"checkpoint_epoch_{epoch}", epoch=epoch + 1, **kwargs)

    def load(
        self, name_or_path: str, template: Optional[Dict[str, Any]] = None
    ) -> Dict[str, Any]:
        """Restore a checkpoint payload plus its metadata.

        ``template`` (matching pytree of ShapeDtypeStructs or arrays) enables
        exact dtype/sharding restoration; without it orbax infers from disk.
        """
        from avex_tpu.io import exists as io_exists, is_remote, read_text

        if is_remote(str(name_or_path)):
            path: Any = str(name_or_path)
        else:
            path = Path(name_or_path)
            if not path.exists():
                path = self._path(name_or_path)
        if template is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), template
            )
            payload = self._checkpointer.restore(path, abstract)
        else:
            payload = self._checkpointer.restore(path)
        meta_path = str(path) + ".meta.json"
        meta = json.loads(read_text(meta_path)) if io_exists(meta_path) else {}
        payload.update(meta)
        return payload

    def exists(self, name: str) -> bool:
        """True when the named checkpoint directory exists."""
        if self._remote:
            from avex_tpu.io import exists as io_exists

            return io_exists(str(self._path(name)))
        return self._path(name).exists()
