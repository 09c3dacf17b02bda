"""Energy-based acoustic activity detection.

Fills the reference's reserved ``preprocessing`` slot
(``avex/preprocessing/activity_detector.py`` is an empty stub) with a simple,
fast detector: short-time log-energy vs an adaptive noise floor, plus a
window selector that anchors fixed-length crops on the most active region.
All numpy (host-side, pre-collation), deterministic.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["frame_energy", "ActivityDetector", "select_active_window"]


def frame_energy(wav: np.ndarray, frame: int = 400, hop: int = 160) -> np.ndarray:
    """Short-time log energy per frame (dB-ish scale)."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    if len(wav) < frame:
        wav = np.pad(wav, (0, frame - len(wav)))
    n_frames = 1 + (len(wav) - frame) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    frames = wav[idx]
    energy = np.mean(frames**2, axis=1)
    return 10.0 * np.log10(np.maximum(energy, 1e-10))


class ActivityDetector:
    """Frame-level activity mask from log-energy vs an adaptive noise floor.

    A frame is active when its energy exceeds the estimated noise floor (the
    ``floor_percentile`` of frame energies) by ``threshold_db``.
    """

    def __init__(
        self,
        frame: int = 400,
        hop: int = 160,
        threshold_db: float = 6.0,
        floor_percentile: float = 10.0,
    ) -> None:
        self.frame = frame
        self.hop = hop
        self.threshold_db = threshold_db
        self.floor_percentile = floor_percentile

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """Boolean activity mask per frame (True = active)."""
        energy = frame_energy(wav, self.frame, self.hop)
        floor = np.percentile(energy, self.floor_percentile)
        return energy > floor + self.threshold_db

    def activity_ratio(self, wav: np.ndarray) -> float:
        """Fraction of frames flagged active."""
        mask = self(wav)
        return float(mask.mean()) if mask.size else 0.0


def select_active_window(
    wav: np.ndarray,
    target_len: int,
    detector: ActivityDetector | None = None,
) -> Tuple[np.ndarray, int]:
    """Crop ``target_len`` samples centred on the most active region.

    Falls back to a zero-padded copy when the clip is shorter than the
    target. Returns ``(window, start_sample)``.
    """
    detector = detector or ActivityDetector()
    wav = np.asarray(wav, np.float32).reshape(-1)
    if len(wav) <= target_len:
        out = np.zeros(target_len, np.float32)
        out[: len(wav)] = wav
        return out, 0
    energy = frame_energy(wav, detector.frame, detector.hop)
    win_frames = max(1, (target_len - detector.frame) // detector.hop + 1)
    # Sliding sum of energy over window-sized frame spans.
    cumulative = np.concatenate([[0.0], np.cumsum(energy)])
    spans = cumulative[win_frames:] - cumulative[:-win_frames]
    best = int(np.argmax(spans))
    start = min(best * detector.hop, len(wav) - target_len)
    return wav[start : start + target_len], start
