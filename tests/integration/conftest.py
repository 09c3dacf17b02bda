"""Shared integration fixtures: the real-audio dataset directory.

``real_audio_dir`` builds the pinned 5-class real-audio corpus (real cicada
WAV + two real FLAC recordings from the reference's sample set + naturalistic
chirp/noise synthesis written as real WAV files) with train/val/test splits.
Used by the end-to-end metric baseline (test_real_audio_baseline.py) and the
int8/TFLite end-task drift tests (test_quant_end_task.py) — both must see
the SAME corpus so their metrics are comparable.
"""

import csv
from pathlib import Path

import numpy as np
import pytest

REFERENCE_WAV = Path(
    "/root/reference/tests/samples/insectset_459/"
    "Diceroprocta_eugraphica_IN50366825_110124_cut.wav"
)
REFERENCE_FLACS = {
    "dove": Path(
        "/root/reference/tests/samples/animalspeak2/16khz/Xeno-canto/"
        "XC564654-200602-006_NR5N6_20h14_Sturtur.flac"
    ),
    "inat": Path(
        "/root/reference/tests/samples/animalspeak2/16khz/iNaturalist/246886.flac"
    ),
}
SR = 16000
CLIP = SR  # 1-second clips


def _chirp(rng: np.random.Generator, n: int) -> np.ndarray:
    """FM bird-like chirp train with harmonics + decay envelopes."""
    t = np.arange(n) / SR
    out = np.zeros(n, np.float32)
    for start in np.cumsum(rng.uniform(0.08, 0.25, size=8)):
        if start > t[-1] - 0.1:
            break
        dur = rng.uniform(0.04, 0.12)
        f0 = rng.uniform(2000, 5000)
        sweep = rng.uniform(-1500, 1500)
        seg = (t >= start) & (t < start + dur)
        ts = t[seg] - start
        env = np.sin(np.pi * ts / dur) ** 2
        phase = 2 * np.pi * (f0 * ts + 0.5 * sweep * ts**2 / dur)
        out[seg] += env * (np.sin(phase) + 0.3 * np.sin(2 * phase))
    return (0.3 * out).astype(np.float32)


def _noise(rng: np.random.Generator, n: int) -> np.ndarray:
    """Pink-ish noise bed (1/f-shaped white noise)."""
    spectrum = np.fft.rfft(rng.standard_normal(n))
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    shaped = np.fft.irfft(spectrum / np.sqrt(freqs), n)
    return (0.15 * shaped / np.abs(shaped).max()).astype(np.float32)


@pytest.fixture(scope="session")
def real_audio_dir(tmp_path_factory):
    from scipy.io import wavfile

    from avex_tpu._native import resample

    root = tmp_path_factory.mktemp("real_audio")
    rows = []

    if not REFERENCE_WAV.exists():  # pragma: no cover - reference tree absent
        pytest.skip("reference sample audio unavailable")

    from avex_tpu._native import decode_audio

    def add_windows(source: Path, label: str) -> None:
        wav, sr = decode_audio(str(source))
        wav = resample(wav, sr, SR)
        n_windows = len(wav) // (CLIP // 2) - 1  # 50% overlap windows
        for i in range(min(n_windows, 14)):
            seg = wav[i * CLIP // 2 : i * CLIP // 2 + CLIP]
            name = f"{label}_{i}.wav"
            wavfile.write(root / name, SR, (seg * 32767).astype(np.int16))
            rows.append({"path": name, "label": label})

    add_windows(REFERENCE_WAV, "insect")
    for label, flac in REFERENCE_FLACS.items():
        if flac.exists():
            add_windows(flac, label)

    rng = np.random.default_rng(7)
    for i in range(14):
        wavfile.write(root / f"chirp_{i}.wav", SR, (_chirp(rng, CLIP) * 32767).astype(np.int16))
        rows.append({"path": f"chirp_{i}.wav", "label": "chirp"})
        wavfile.write(root / f"noise_{i}.wav", SR, (_noise(rng, CLIP) * 32767).astype(np.int16))
        rows.append({"path": f"noise_{i}.wav", "label": "noise"})

    # deterministic interleaved split: train/val/test per class
    splits = {"train": [], "val": [], "test": []}
    by_label: dict = {}
    for row in rows:
        by_label.setdefault(row["label"], []).append(row)
    for items in by_label.values():
        for j, row in enumerate(items):
            splits["test" if j % 7 == 5 else "val" if j % 7 == 6 else "train"].append(row)

    for split, split_rows in splits.items():
        sub = root / split
        sub.mkdir(exist_ok=True)
        for row in split_rows:
            (sub / row["path"]).symlink_to(root / row["path"])
        with open(sub / "metadata.csv", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["path", "label"])
            writer.writeheader()
            writer.writerows(split_rows)
    return root
