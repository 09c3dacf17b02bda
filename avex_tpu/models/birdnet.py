"""BirdNet adapter.

Counterpart of ``avex/models/birdnet.py`` (a birdnetlib/TFLite wrapper with
clip-level probabilities and penultimate-layer embeddings, :273-359). The
TFLite runtime does not exist in this TPU build; BirdNet remains an
**optional host adapter** with the reference interface:

- if ``birdnetlib``/TFLite is importable, inference delegates to it;
- otherwise construction raises a clear error explaining the optional
  dependency — mirroring the reference's hard dependency on birdnetlib.

The species↔index mapping helpers are self-contained and always available.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from avex_tpu.models.base import ModelBase

__all__ = ["Model", "load_species_list"]


def load_species_list(path: Optional[str] = None) -> List[str]:
    """Load a BirdNet species list (one ``sci_name_common name`` per line)."""
    if path is None:
        return []
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class Model(ModelBase):
    """BirdNet wrapper registered as ``birdnet``; requires birdnetlib."""

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = True,
        audio_config: Optional[Dict[str, Any]] = None,
        language: str = "en_us",
        **_ignored: Any,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.language = language
        try:
            from birdnetlib.analyzer import Analyzer  # type: ignore

            self._analyzer = Analyzer()
        except ImportError as err:
            raise ImportError(
                "BirdNet requires the optional 'birdnetlib' (TFLite) host "
                "dependency, which is not part of the TPU build. Install "
                "birdnetlib to use this adapter, or use the TPU-native "
                "'perch' model for bird classification."
            ) from err
        self.species = [d["scientific_name"] for d in getattr(self._analyzer, "labels", [])] or []
        self.species_to_idx = {name: i for i, name in enumerate(self.species)}
        self.num_classes = len(self.species) or num_classes

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = ["embeddings"]

    def forward(self, x, padding_mask=None):
        """Clip-level class probabilities via the TFLite interpreter
        (≈ birdnet.py:273-359)."""
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None]
        outputs = []
        for clip in x:
            outputs.append(self._analyzer.predict(clip))  # type: ignore[attr-defined]
        return np.stack(outputs)

    __call__ = forward

    # TF manages its own devices; these mirror the reference's fake moves
    # (birdnet.py:525-568).
    def to(self, device: str):
        return self

    def cpu(self):
        """No-op: TFLite manages its own devices (birdnet.py:525-568)."""
        return self

    def cuda(self):
        """No-op: TFLite manages its own devices."""
        return self
