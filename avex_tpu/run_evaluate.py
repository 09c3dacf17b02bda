"""Benchmark evaluation driver: experiments × evaluation sets.

Counterpart of ``avex/run_evaluate.py`` (main :1028-1162, run_experiment
:104-1022): for every experiment and evaluation set, compute what the
requested ``eval_modes`` need — probe transfer (offline over cached
embeddings or online through the backbone), retrieval, clustering — reusing
the embedding cache and the frozen backbone across sets, then persist
metrics as JSONL records and summary CSVs.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from avex_tpu.configs import EvaluateConfig, EvaluationSet, ExperimentConfig
from avex_tpu.data import Collater, DataLoader, dataset_from_config
from avex_tpu.evaluation import (
    HDF5EmbeddingDataset,
    cache_path,
    embedding_cache_matches,
    eval_clustering,
    eval_retrieval,
    eval_retrieval_cross_set,
    extract_embeddings_to_cache,
    load_cached_embeddings,
    train_and_eval_offline,
    train_and_eval_online,
)
from avex_tpu.models.factory import build_model_from_spec
from avex_tpu.models.load import load_model
from avex_tpu.utils.tracking import append_jsonl, create_experiment_summary_csvs

logger = logging.getLogger(__name__)


def _embedding_collate(items: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in items[0]:
        out[key] = np.stack([np.asarray(item[key]) for item in items])
    return out


def _raw_loader(
    dataset, cfg: EvaluateConfig, target_len: int, num_classes: int,
    train: bool, window_selection: str, multilabel: bool = False,
) -> DataLoader:
    collater = Collater(
        target_len=target_len,
        num_classes=num_classes,
        window_selection=window_selection,
        one_hot=True,
        train=train,
        # Multi-label rows (lists of label indices, e.g. BirdSet eBird
        # codes) must multi-hot encode — the single-label collater would
        # silently keep only the FIRST label of each list.
        multilabel=multilabel,
    )
    return DataLoader(
        dataset,
        batch_size=cfg.training_params.batch_size,
        collate_fn=collater,
        shuffle=train,
        drop_last=False,
        seed=cfg.seed,
        num_workers=cfg.num_workers,
    )


def _probe_info(probe, probe_cfg, model) -> Dict[str, Any]:
    """Structured probe/run metadata persisted with each evaluation record.

    The reference recovers probe type, layer set, parameter counts, and
    learned layer weights by regex-scraping run logs after the fact
    (scripts/icassp/extract_metrics_from_logs.py, README_extract_metrics.md);
    here they are first-class fields of the JSONL record, so the analysis
    toolkit (scripts/analysis/) never parses logs.
    """
    import jax

    def count(tree) -> int:
        return int(sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(tree)))

    probe_params = count(probe.variables.get("params", {}))
    base_params = count(model.variables["params"]) if getattr(model, "variables", None) else 0
    frozen = bool(getattr(probe, "freeze_backbone", True))
    info: Dict[str, Any] = {
        "probe_type": probe_cfg.probe_type,
        "layers": [str(layer) for layer in probe_cfg.target_layers],
        "probe_trainable": probe_params,
        "probe_total": probe_params,
        "base_trainable": 0 if frozen else base_params,
        "base_total": base_params,
    }
    layer_weights = probe.variables.get("params", {}).get("layer_weights")
    if layer_weights is not None:
        raw = np.asarray(layer_weights, dtype=np.float64)
        norm = np.exp(raw - raw.max())
        info["layer_weights"] = [float(x) for x in norm / norm.sum()]
    return info


def _extraction_mesh():
    """Data-parallel mesh for embedding extraction: all chips on the data
    axis (the BASELINE "batched on v5e-8" workload); None on one device."""
    import jax

    from avex_tpu.parallel import make_mesh

    return make_mesh() if jax.device_count() > 1 else None


def _get_or_compute_embeddings(
    model,
    loader,
    path: Path,
    aggregation: str,
    layers,
    overwrite: bool,
    mesh=None,
) -> HDF5EmbeddingDataset:
    layer_names = model.register_hooks_for_layers(list(layers))
    if overwrite or not embedding_cache_matches(path, aggregation, layer_names):
        extract_embeddings_to_cache(
            model, loader, path, aggregation=aggregation, layers=layers, mesh=mesh
        )
    else:
        logger.info("Reusing embedding cache %s", path)
    return HDF5EmbeddingDataset(path)


def run_experiment(
    experiment: ExperimentConfig,
    eval_set: EvaluationSet,
    config: EvaluateConfig,
    model=None,
) -> Dict[str, Any]:
    """Evaluate one experiment on one evaluation set (≈ run_evaluate.py:104)."""
    t_start = time.time()
    probe_cfg = experiment.probe_config
    run_cfg = experiment.run_config
    spec = run_cfg.model_spec
    online = bool(probe_cfg.online_training) or not probe_cfg.freeze_backbone

    # Datasets -----------------------------------------------------------
    splits = {}
    for split_name in ("train", "val", "test"):
        ds_cfg = getattr(eval_set, split_name)
        splits[split_name] = dataset_from_config(ds_cfg) if ds_cfg else None
    # Per-split sources (manifest/local backends) derive their own label
    # maps; align them so train/test indices refer to the same classes.
    from avex_tpu.data.dataset import align_label_spaces

    aligned = align_label_spaces([splits[k] for k in ("train", "val", "test")])
    splits = dict(zip(("train", "val", "test"), aligned))
    ref_ds = splits["train"] or splits["test"]
    num_classes = ref_ds.num_classes

    audio_cfg = spec.audio_config
    sr = audio_cfg.sample_rate if audio_cfg else 16000
    target_len = (
        audio_cfg.target_length_samples if audio_cfg and audio_cfg.target_length_samples else sr
    )
    window_selection = audio_cfg.window_selection if audio_cfg else "random"

    # Model --------------------------------------------------------------
    if model is None:
        if experiment.checkpoint_path or experiment.pretrained:
            model = load_model(
                spec,
                checkpoint_path=experiment.checkpoint_path,
                return_features_only=True,
            )
        else:
            model = build_model_from_spec(spec, num_classes=None, return_features_only=True)
    # Deterministic eval: layerdrop stays disabled (run_evaluate.py:521-530).
    if hasattr(model, "disable_layerdrop"):
        model.disable_layerdrop = True

    metrics_out: Dict[str, Any] = {}
    probe_info: Dict[str, Any] = {}
    loaders = {
        name: _raw_loader(
            ds, config, target_len, num_classes, name == "train",
            window_selection, eval_set.multilabel,
        )
        if ds is not None
        else None
        for name, ds in splits.items()
    }

    # Probe --------------------------------------------------------------
    if "probe" in config.eval_modes and splits["train"] is not None:
        if online:
            probe_metrics, _trainer = train_and_eval_online(
                probe_cfg,
                config.training_params,
                model,
                loaders["train"],
                loaders["test"],
                num_classes=num_classes,
                val_loader=loaders["val"],
                metrics=eval_set.metrics,
                multilabel=eval_set.multilabel,
                seed=config.seed,
            )
        else:
            save_dir = config.offline_embeddings.save_dir or str(
                Path(config.save_dir) / "embeddings"
            )
            emb_datasets = {}
            for split_name, loader in loaders.items():
                if loader is None:
                    continue
                path = cache_path(
                    save_dir, getattr(eval_set, split_name).name, spec.name, split_name,
                    probe_cfg.target_layers,
                )
                # Eval-context extraction: deterministic center-crop loader.
                det_loader = _raw_loader(
                    splits[split_name], config, target_len, num_classes, False,
                    "center", eval_set.multilabel,
                )
                emb_datasets[split_name] = _get_or_compute_embeddings(
                    model,
                    det_loader,
                    path,
                    probe_cfg.aggregation,
                    probe_cfg.target_layers,
                    config.offline_embeddings.overwrite,
                    mesh=_extraction_mesh(),
                )

            def emb_loader(ds, train: bool):
                return DataLoader(
                    ds,
                    batch_size=config.training_params.batch_size,
                    collate_fn=_embedding_collate,
                    shuffle=train,
                    drop_last=False,
                    seed=config.seed,
                    num_workers=config.probe_num_workers,
                )

            sample = emb_datasets["train"][0]
            input_dims = [
                tuple(sample[f"embeddings_{i}"].shape)
                for i in range(emb_datasets["train"].num_layers)
            ]
            probe_metrics, _trainer = train_and_eval_offline(
                probe_cfg,
                config.training_params,
                emb_loader(emb_datasets["train"], True),
                emb_loader(emb_datasets["test"], False),
                input_dims=input_dims,
                num_classes=num_classes,
                val_loader=emb_loader(emb_datasets["val"], False)
                if emb_datasets.get("val")
                else None,
                metrics=eval_set.metrics,
                multilabel=eval_set.multilabel,
                seed=config.seed,
            )
        metrics_out["probe"] = {f"test_{k}": v for k, v in probe_metrics.items()}
        probe_info = _probe_info(_trainer.probe, probe_cfg, model)

    # Retrieval / clustering over pooled test embeddings -----------------
    if {"retrieval", "clustering"} & set(config.eval_modes) and splits["test"] is not None:
        save_dir = config.offline_embeddings.save_dir or str(
            Path(config.save_dir) / "embeddings"
        )
        pooled_layers = probe_cfg.target_layers

        def pooled(split_name: str) -> Tuple[np.ndarray, np.ndarray]:
            path = cache_path(
                save_dir, getattr(eval_set, split_name).name, spec.name,
                f"{split_name}_pooled", pooled_layers,
            )
            det_loader = _raw_loader(
                splits[split_name], config, target_len, num_classes, False,
                "center", eval_set.multilabel,
            )
            model.register_hooks_for_layers(list(pooled_layers))
            if config.offline_embeddings.overwrite or not embedding_cache_matches(
                path, "mean", model._hook_layers
            ):
                extract_embeddings_to_cache(
                    model, det_loader, path, aggregation="mean", layers=pooled_layers,
                    mesh=_extraction_mesh(),
                )
            embs, labels, _meta = load_cached_embeddings(path)
            return embs[0], labels

        test_embs, test_labels = pooled("test")
        if "retrieval" in config.eval_modes:
            if eval_set.retrieval_mode == "train_vs_test" and splits["train"] is not None:
                train_embs, train_labels = pooled("train")
                metrics_out["retrieval"] = eval_retrieval_cross_set(
                    train_embs, train_labels, test_embs, test_labels
                )
            else:
                metrics_out["retrieval"] = eval_retrieval(test_embs, test_labels)
        if "clustering" in config.eval_modes:
            metrics_out["clustering"] = eval_clustering(
                test_embs, test_labels, n_clusters=num_classes, seed=config.seed
            )

    metrics_out["duration_seconds"] = time.time() - t_start
    return {
        "experiment": experiment.run_name,
        "evaluation_set": eval_set.name,
        "metrics": metrics_out,
        "probe_info": probe_info,
        "model": model,
    }


def main(config: EvaluateConfig) -> List[Dict[str, Any]]:
    """Iterate experiments × evaluation sets, reusing frozen backbones
    (≈ run_evaluate.py:1028-1162)."""
    from avex_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    save_dir = Path(config.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    results: List[Dict[str, Any]] = []
    for experiment in config.experiments:
        cached_model = None
        frozen = experiment.probe_config.freeze_backbone
        for eval_set in config.dataset_config.evaluation_sets:
            logger.info("Running %s on %s", experiment.run_name, eval_set.name)
            result = run_experiment(experiment, eval_set, config, model=cached_model)
            model = result.pop("model")
            if frozen:
                cached_model = model  # reuse across sets (run_evaluate.py:1099-1137)
            results.append(result)
            record = dict(result)
            # Config snapshot per record: any leaderboard row is reproducible
            # from the JSONL alone (≈ experiment_tracking.py:124-258).
            record["config_snapshot"] = experiment.model_dump(mode="json")
            append_jsonl(save_dir / "evaluation_metadata.jsonl", record)
    create_experiment_summary_csvs(
        results, save_dir, global_csv_path=config.results_csv_path
    )
    return results
