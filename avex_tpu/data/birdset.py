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
