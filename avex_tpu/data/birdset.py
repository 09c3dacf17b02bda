"""BirdSet benchmark dataset presets.

Counterpart of ``avex/data/birdset_train_splits.py:1-25`` (which registers
``birdset_train`` esp_data datasets over GCS JSONL splits). Here the BirdSet
tasks map onto the HuggingFace ``DBD-research-group/BirdSet`` configurations
as :class:`DatasetConfig` templates ready for evaluation-set YAMLs.
"""

from __future__ import annotations

from typing import List

from avex_tpu.configs import DatasetConfig, EvaluationSet

#: BirdSet task codes (subset benchmarks from the BirdSet paper).
BIRDSET_TASKS: List[str] = ["HSN", "NBP", "NES", "PER", "POW", "SNE", "SSW", "UHH"]

_HF_REPO = "DBD-research-group/BirdSet"


def birdset_config(task: str, split: str = "train") -> DatasetConfig:
    """DatasetConfig for one BirdSet task/split (HF-hosted)."""
    task = task.upper()
    if task not in BIRDSET_TASKS:
        raise ValueError(f"Unknown BirdSet task {task!r}; known: {BIRDSET_TASKS}")
    return DatasetConfig(
        name=f"birdset_{task.lower()}_{split}",
        kind="hf",
        path=_HF_REPO,
        subset=task,
        split=split,
        label_column="ebird_code",
        audio_column="audio",
        sample_rate=32000,
    )


#: Legacy GCS JSONL split registry (reference birdset_train_splits.py:22-47):
#: the pre-refresh esp-data split paths that ``birdset_train`` configs name
#: (``POW-train`` etc.). Validation splits intentionally point at the TRAIN
#: manifests (the reference derives val via transforms), tests at the test
#: manifests; ``XCM`` is train-only.
_LEGACY_GCS_ROOT = "gs://foundation-model-data"
LEGACY_SPLIT_PATHS = {}
for _task in [*BIRDSET_TASKS, "XCM"]:
    if _task != "XCM":
        LEGACY_SPLIT_PATHS[f"{_task}-train"] = (
            f"{_LEGACY_GCS_ROOT}/data/birdset-train/{_task}/{_task}_taxonomic.jsonl"
        )
        LEGACY_SPLIT_PATHS[f"{_task}-validation"] = LEGACY_SPLIT_PATHS[f"{_task}-train"]
        LEGACY_SPLIT_PATHS[f"{_task}-test"] = (
            f"{_LEGACY_GCS_ROOT}/data/birdset-test/{_task}/{_task}_taxonomic.jsonl"
        )
LEGACY_SPLIT_PATHS["XCM"] = (
    f"{_LEGACY_GCS_ROOT}/data/birdset-train/XCM/XCM_taxonomic.jsonl"
)


def birdset_train_config(
    split: str,
    data_root: str | None = None,
    manifest_path: str | None = None,
) -> DatasetConfig:
    """DatasetConfig for a legacy ``birdset_train`` named split.

    Resolves ``POW-train``-style names against :data:`LEGACY_SPLIT_PATHS`
    (the reference's registered split registry). ``manifest_path`` overrides
    the registry (e.g. a local mirror of the JSONL); ``data_root`` is
    prepended to each row's relative audio path (the reference defaults to
    the GCS bucket root, birdset_train_splits.py:99-102).
    """
    path = manifest_path or LEGACY_SPLIT_PATHS.get(split)
    if path is None:
        raise LookupError(
            f"Invalid birdset_train split: {split!r}. "
            f"Expected one of {sorted(LEGACY_SPLIT_PATHS)}"
        )
    return DatasetConfig(
        name=f"birdset_train_{split.lower().replace('-', '_')}",
        kind="manifest",
        path=path,
        data_root=data_root or f"{_LEGACY_GCS_ROOT}/",
        label_column="ebird_code",
        sample_rate=32000,
    )


def birdset_evaluation_sets(tasks: List[str] | None = None) -> List[EvaluationSet]:
    """EvaluationSet per BirdSet task (train/test pairs, mAP metric)."""
    sets = []
    for task in tasks or BIRDSET_TASKS:
        sets.append(
            EvaluationSet(
                name=f"birdset_{task.lower()}",
                train=birdset_config(task, "train"),
                test=birdset_config(task, "test_5s"),
                metrics=["mAP", "roc_auc"],
                multilabel=True,
            )
        )
    return sets
