"""Dataset transforms: rl_subsample, train_val_split, label-derivation
wrappers (≈ reference test_rl_subsample_transform.py /
test_train_val_split_transform.py)."""

import numpy as np
import pytest

from avex_tpu.configs import DatasetConfig
from avex_tpu.data.dataset import (
    SyntheticAudioDataset,
    apply_transform,
    dataset_from_config,
)
from avex_tpu.data.transforms import FillLabelsFromAnswer, TextLabelFromFeatures


def _ds(n=40):
    return SyntheticAudioDataset(
        DatasetConfig(name="s", kind="synthetic", num_samples=n, num_classes=4, clip_seconds=0.25)
    )


def test_rl_subsample_ratio_and_determinism():
    ds = _ds(40)
    sub = apply_transform(ds, {"kind": "rl_subsample", "ratio": 0.25, "seed": 3})
    assert len(sub) == 10
    again = apply_transform(ds, {"kind": "rl_subsample", "ratio": 0.25, "seed": 3})
    for i in range(len(sub)):
        np.testing.assert_array_equal(sub[i]["raw_wav"], again[i]["raw_wav"])
    different = apply_transform(ds, {"kind": "rl_subsample", "ratio": 0.25, "seed": 4})
    assert any(
        not np.array_equal(sub[i]["raw_wav"], different[i]["raw_wav"])
        for i in range(len(sub))
    )


def test_rl_subsample_max_samples_cap():
    sub = apply_transform(_ds(40), {"kind": "rl_subsample", "ratio": 1.0, "max_samples": 7})
    assert len(sub) == 7


def test_train_val_split_partitions():
    ds = _ds(60)
    train = apply_transform(ds, {"kind": "train_val_split", "split": "train", "val_fraction": 0.2})
    val = apply_transform(ds, {"kind": "train_val_split", "split": "val", "val_fraction": 0.2})
    assert len(train) + len(val) == 60
    assert 0 < len(val) < len(train)
    # disjoint by construction (hash-based): same item never in both
    train_idx = set(train.indices)
    val_idx = set(val.indices)
    assert not train_idx & val_idx


def test_transforms_compose_through_config():
    cfg = DatasetConfig(
        name="s", kind="synthetic", num_samples=40, num_classes=4, clip_seconds=0.25,
        transformations=[
            {"kind": "train_val_split", "split": "train", "val_fraction": 0.2},
            {"kind": "rl_subsample", "ratio": 0.5, "seed": 1},
        ],
    )
    ds = dataset_from_config(cfg)
    assert 0 < len(ds) < 40


def test_unknown_transform_raises():
    with pytest.raises(ValueError, match="Unknown dataset transform"):
        apply_transform(_ds(4), {"kind": "nope"})


class _AnswerDataset(SyntheticAudioDataset):
    def __getitem__(self, idx):
        item = super().__getitem__(idx)
        item["answer"] = f"species_{idx % 3}"
        item["site"] = f"site{idx % 2}"
        return item


def test_fill_labels_from_answer():
    base = _AnswerDataset(
        DatasetConfig(name="a", kind="synthetic", num_samples=9, num_classes=2, clip_seconds=0.25)
    )
    ds = FillLabelsFromAnswer(base)
    labels = {ds[i]["label"] for i in range(9)}
    assert len(labels) == 3  # three answer strings -> three classes
    assert ds.label_names == sorted({f"species_{i}" for i in range(3)})


def test_text_label_from_features():
    base = _AnswerDataset(
        DatasetConfig(name="a", kind="synthetic", num_samples=4, num_classes=2, clip_seconds=0.25)
    )
    ds = TextLabelFromFeatures(base, columns=["answer", "site"])
    assert ds[0]["text_label"] == "species_0, site0"
    assert len(ds) == 4
