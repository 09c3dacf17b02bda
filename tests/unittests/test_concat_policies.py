"""Concat-policy and label-space-alignment semantics.

Counterpart of the reference's ConcatenatedDataset coverage
(reference avex/data/dataset.py:99-150 soft/overlap/hard merge and
tests/integration/test_dataset_label_transformation.py): merged label maps,
index remapping, and the cross-split alignment guard.
"""

import pytest

from avex_tpu.data.dataset import (
    AudioDataset,
    ConcatenatedDataset,
    RelabeledDataset,
    align_label_spaces,
)


class _Tiny(AudioDataset):
    def __init__(self, label_names, labels):
        super().__init__(label_names=list(label_names))
        self._labels = list(labels)

    def __len__(self):
        return len(self._labels)

    def __getitem__(self, idx):
        return {"raw_wav": [0.0], "label": self._labels[idx]}


def test_hard_concat_requires_identical_spaces():
    a = _Tiny(["cat", "dog"], [0, 1])
    b = _Tiny(["cat", "dog"], [1, 0])
    merged = ConcatenatedDataset([a, b], policy="hard")
    assert merged.label_names == ["cat", "dog"]
    assert len(merged) == 4
    assert [merged[i]["label"] for i in range(4)] == [0, 1, 1, 0]

    c = _Tiny(["cat", "wolf"], [0])
    with pytest.raises(ValueError, match="identical label spaces"):
        ConcatenatedDataset([a, c], policy="hard")


def test_soft_concat_unions_and_remaps():
    a = _Tiny(["cat", "dog"], [0, 1])
    b = _Tiny(["dog", "wolf"], [0, 1])
    merged = ConcatenatedDataset([a, b], policy="soft")
    assert merged.label_names == ["cat", "dog", "wolf"]
    assert len(merged) == 4
    # b's local 'dog'(0) maps to shared index 1, 'wolf'(1) to 2
    labels = [merged[i]["label"] for i in range(4)]
    assert labels == [0, 1, 1, 2]


def test_overlap_concat_drops_nonshared_items():
    a = _Tiny(["cat", "dog"], [0, 1, 1])
    b = _Tiny(["dog", "wolf"], [0, 1])
    merged = ConcatenatedDataset([a, b], policy="overlap")
    assert merged.label_names == ["dog"]
    # only dog items survive: two from a, one from b
    assert len(merged) == 3
    assert all(merged[i]["label"] == 0 for i in range(3))


def test_unknown_policy_rejected():
    a = _Tiny(["x"], [0])
    with pytest.raises(ValueError, match="Unknown concat policy"):
        ConcatenatedDataset([a], policy="fuzzy")


def test_relabeled_dataset_multilabel_lists():
    base = _Tiny(["dog", "cat"], [[0, 1], [1]])
    shared = RelabeledDataset(base, ["cat", "dog", "wolf"])
    assert shared[0]["label"] == [1, 0]  # dog→1, cat→0 in the shared space
    assert shared[1]["label"] == [0]
    assert shared.num_classes == 3


def test_align_label_spaces_passthrough_when_identical():
    a = _Tiny(["cat", "dog"], [0])
    b = _Tiny(["cat", "dog"], [1])
    out = align_label_spaces([a, b, None])
    assert out[0] is a and out[1] is b and out[2] is None


def test_align_label_spaces_unions_mismatched_splits():
    train = _Tiny(["cat", "dog"], [0, 1])
    test = _Tiny(["dog", "wolf"], [0, 1])
    aligned_train, aligned_test = align_label_spaces([train, test])
    assert aligned_train.label_names == aligned_test.label_names == [
        "cat",
        "dog",
        "wolf",
    ]
    # 'dog' gets the SAME index in both splits after alignment
    assert aligned_train[1]["label"] == aligned_test[0]["label"] == 1
