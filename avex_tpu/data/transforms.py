"""Registered dataset transforms.

Counterparts of ``avex/data/transforms.py`` (TrainValSplitTransform :34,
RLSubsampleTransform :135, FillLabelsFromAnswer :226) and
``text_label_from_features.py:34``. The split/subsample transforms live in
``avex_tpu.data.dataset.apply_transform``; the item-level label transforms
here wrap a dataset with derived label/text fields.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

from avex_tpu.data.dataset import AudioDataset


class FillLabelsFromAnswer(AudioDataset):
    """Derive the label field from a free-text ``answer`` column
    (≈ transforms.py:226): the answer string becomes the class name."""

    def __init__(self, base: AudioDataset, answer_key: str = "answer") -> None:
        self.base = base
        self.answer_key = answer_key
        names = sorted({str(base[i].get(answer_key, base[i].get("label"))) for i in range(len(base))})
        super().__init__(label_names=names)
        self._map = {n: i for i, n in enumerate(names)}

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        item = dict(self.base[idx])
        item["label"] = self._map[str(item.get(self.answer_key, item.get("label")))]
        return item


class TextLabelFromFeatures(AudioDataset):
    """Compose ``text_label`` from several metadata columns
    (≈ text_label_from_features.py:34)."""

    def __init__(self, base: AudioDataset, columns: Sequence[str], separator: str = ", ") -> None:
        super().__init__(label_names=base.label_names)
        self.base = base
        self.columns = list(columns)
        self.separator = separator

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        item = dict(self.base[idx])
        parts = [str(item[c]) for c in self.columns if item.get(c)]
        if not parts and "label" in item:
            parts = [self.label_names[item["label"]]] if self.label_names else []
        item["text_label"] = self.separator.join(parts)
        return item
