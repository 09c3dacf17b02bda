"""BirdNet host adapter (TFLite).

Counterpart of ``avex/models/birdnet.py`` — a birdnetlib/TFLite wrapper with
clip-level probabilities and penultimate-layer embeddings extracted by
manually driving the TFLite interpreter (reference birdnet.py:273-359,
including the ``experimental_preserve_all_tensors=True`` fix for TF >= 2.17
and the embedding-tensor search heuristics :455-520).

This is host-side inference by design (the reference's TF graph is equally
opaque to torch); the TPU-native alternative for bird classification is
``perch``. Backend resolution:

1. an explicit ``model_path`` pointing at a ``.tflite`` file drives
   ``tf.lite.Interpreter`` directly (no birdnetlib needed);
2. otherwise, if ``birdnetlib`` is importable its bundled Analyzer supplies
   the model + labels (the reference's default);
3. otherwise construction raises a clear error naming the optional deps.

The species↔index mapping helpers are self-contained and always available.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from avex_tpu.models.base import ModelBase

__all__ = ["Model", "TFLiteBackend", "load_species_list"]

#: BirdNet's native input format: 3 s chunks at 48 kHz (reference CHUNK_SEC).
CHUNK_SECONDS = 3.0
INPUT_SR = 48000


def load_species_list(path: Optional[str] = None) -> List[str]:
    """Load a BirdNet species list (one ``sci_name_common name`` per line)."""
    if path is None:
        return []
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class TFLiteBackend:
    """Minimal TFLite driver: clip-level outputs + penultimate embeddings.

    Mirrors the reference's manual interpreter path (birdnet.py:273-359):
    the interpreter is created with ``experimental_preserve_all_tensors=True``
    so intermediate tensors stay readable after ``invoke()`` (the TF >= 2.17
    fix, birdnet.py:274-330), and the embedding tensor is located by, in
    order: a second model output (old BirdNet format), a GLOBAL_AVG_POOL
    tensor, or the last 2D intermediate before the logits (birdnet.py:455+).
    """

    def __init__(self, model_path: str) -> None:
        try:
            from tensorflow import lite as tflite  # type: ignore
        except ImportError as err:  # pragma: no cover - env without TF
            raise ImportError(
                "BirdNet's TFLite backend requires TensorFlow (host-side "
                "optional dependency; the TPU compute path never imports it)."
            ) from err
        self._interp = tflite.Interpreter(
            model_path=model_path, experimental_preserve_all_tensors=True
        )
        self._interp.allocate_tensors()
        self._input = self._interp.get_input_details()[0]
        # With two outputs (old BirdNet format: scores + embeddings), the
        # scores tensor is computed FROM the embedding, so it always has the
        # higher tensor index — robust against TFLite reordering the
        # get_output_details() list.
        self._outputs = sorted(
            self._interp.get_output_details(), key=lambda d: -int(d["index"])
        )

    @property
    def input_samples(self) -> int:
        """Flattened input length the model expects (e.g. 144000 = 3s@48k)."""
        return int(np.prod(self._input["shape"][1:]))

    @property
    def num_classes(self) -> int:
        """Width of the model's score output (species count)."""
        return int(self._outputs[0]["shape"][-1])

    def _invoke(self, clip: np.ndarray) -> None:
        clip = np.asarray(clip, np.float32).reshape((1,) + tuple(self._input["shape"][1:]))
        self._interp.set_tensor(self._input["index"], clip)
        self._interp.invoke()

    def predict(self, clip: np.ndarray) -> np.ndarray:
        """Clip-level output vector (logits/confidences, model-defined)."""
        self._invoke(clip)
        return np.asarray(self._interp.get_tensor(self._outputs[0]["index"])[0])

    def embed(self, clip: np.ndarray) -> np.ndarray:
        """Penultimate-layer embedding for one clip."""
        self._invoke(clip)
        # (a) old BirdNet format: embeddings are a second output.
        if len(self._outputs) > 1:
            return np.asarray(self._interp.get_tensor(self._outputs[1]["index"])[0])
        # (b)/(c) search intermediate tensors; logits tensor excluded.
        logits_idx = self._outputs[0]["index"]
        pool_match, last_2d = None, None
        for detail in self._interp.get_tensor_details():
            idx, shape = detail["index"], list(detail.get("shape", []))
            if idx == logits_idx or len(shape) != 2 or shape[0] != 1:
                continue
            if "GLOBAL_AVG_POOL" in detail.get("name", ""):
                pool_match = idx
            last_2d = idx if (last_2d is None or idx > last_2d) else last_2d
        chosen = pool_match if pool_match is not None else last_2d
        if chosen is None:
            raise ValueError("could not locate an embedding tensor in the TFLite graph")
        return np.asarray(self._interp.get_tensor(chosen)[0])


class Model(ModelBase):
    """BirdNet wrapper registered as ``birdnet``.

    Requires either an explicit TFLite ``model_path`` (driven via
    ``tf.lite.Interpreter``) or the ``birdnetlib`` package.
    """

    def __init__(
        self,
        device: str = "tpu",
        num_classes: Optional[int] = None,
        pretrained: bool = True,
        audio_config: Optional[Dict[str, Any]] = None,
        language: str = "en_us",
        model_path: Optional[str] = None,
        labels_path: Optional[str] = None,
        extra_config: Optional[Dict[str, Any]] = None,
        **_ignored: Any,
    ) -> None:
        super().__init__(device=device, audio_config=audio_config)
        self.language = language
        # model/labels paths may also arrive through the ModelSpec escape
        # hatch (spec.extra_config — the reference's free-form knob channel).
        extra_config = extra_config or {}
        model_path = model_path or extra_config.get("model_path")
        labels_path = labels_path or extra_config.get("labels_path")
        self._analyzer = None
        if model_path is not None:
            self._backend = TFLiteBackend(model_path)
            self.species = load_species_list(labels_path)
        else:
            try:
                from birdnetlib.analyzer import Analyzer  # type: ignore
            except ImportError as err:
                raise ImportError(
                    "BirdNet requires either a TFLite 'model_path' (host "
                    "TensorFlow drives it directly) or the optional "
                    "'birdnetlib' dependency, neither of which is part of "
                    "the TPU build. Use the TPU-native 'perch' model for "
                    "bird classification, or supply model_path."
                ) from err
            self._analyzer = Analyzer()
            self._backend = TFLiteBackend(self._analyzer.model_path)
            self.species = [
                d["scientific_name"] for d in getattr(self._analyzer, "labels", [])
            ] or []
        self.species_to_idx = {name: i for i, name in enumerate(self.species)}
        self.num_classes = len(self.species) or self._backend.num_classes or num_classes

    def _discover_embedding_layers(self) -> None:
        if not self._layer_names:
            self._layer_names = ["embeddings"]

    #: birdnetlib keeps a trailing partial chunk only when it holds at least
    #: 1.5 s of the 3 s window (BirdNET sig_minlen; the reference pads short
    #: clips for exactly this reason, birdnet.py:342/382).
    MINLEN_FRACTION = 0.5

    def _chunk(self, clip: np.ndarray) -> np.ndarray:
        """Pad/window one waveform into the model's fixed input length.

        Short clips are right-padded to CHUNK_SEC (reference
        birdnet.py:343-347). A trailing partial window is zero-padded and
        analyzed when it carries >= minlen (1.5 s) of audio, and dropped
        otherwise — birdnetlib's split semantics (it "requires >= 1.5 s of
        audio" per chunk, reference birdnet.py:382).
        """
        n = self._backend.input_samples
        if len(clip) < n:
            clip = np.pad(clip, (0, n - len(clip)))
        minlen = int(n * self.MINLEN_FRACTION)
        windows = []
        for i in range(0, len(clip), n):
            w = clip[i : i + n]
            if len(w) < n:
                if len(w) < minlen:
                    break  # birdnetlib drops sub-minlen trailing chunks
                w = np.pad(w, (0, n - len(w)))
            windows.append(w)
        return np.stack(windows)

    def forward(self, x, padding_mask=None):
        """Clip-level class scores via the TFLite interpreter; multi-window
        clips are max-pooled over windows (BirdNet's detection semantics)."""
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None]
        outputs = []
        for clip in x:
            scores = np.stack([self._backend.predict(w) for w in self._chunk(clip)])
            outputs.append(scores.max(axis=0))
        return np.stack(outputs)

    __call__ = forward

    def extract_embeddings(self, x, padding_mask=None, aggregation="mean", **_kw):
        """Penultimate-layer embeddings, aggregated over 3 s windows
        (mean/max/none — reference birdnet.py:250-260)."""
        if isinstance(x, dict):
            x = x["raw_wav"]
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None]
        per_clip = []
        for clip in x:
            embs = np.stack([self._backend.embed(w) for w in self._chunk(clip)])
            if aggregation == "max":
                per_clip.append(embs.max(axis=0))
            elif aggregation == "none":
                per_clip.append(embs)
            else:  # mean / cls_token (no CLS token: reference treats as mean)
                per_clip.append(embs.mean(axis=0))
        return np.stack(per_clip)

    # TF manages its own devices; these mirror the reference's fake moves
    # (birdnet.py:525-568).
    def to(self, device: str):
        """No-op: TFLite manages its own devices (birdnet.py:525-568)."""
        return self

    def cpu(self):
        """No-op: TFLite manages its own devices (birdnet.py:525-568)."""
        return self

    def cuda(self):
        """No-op: TFLite manages its own devices."""
        return self
