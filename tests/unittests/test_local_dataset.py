"""LocalAudioDataset: wav/npy decoding + metadata csv/jsonl parsing."""

import csv
import json

import numpy as np
import pytest

from avex_tpu.configs import DatasetConfig
from avex_tpu.data import dataset_from_config


def _write_wav(path, wav, sr=16000):
    from scipy.io import wavfile

    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def _make_dataset_dir(tmp_path, rng, use_jsonl=False):
    root = tmp_path / "ds"
    root.mkdir()
    rows = []
    for i in range(6):
        label = ["dog", "bird"][i % 2]
        name = f"clip_{i}.wav" if i % 3 else f"clip_{i}.npy"
        wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        if name.endswith(".wav"):
            _write_wav(root / name, wav)
        else:
            np.save(root / name, wav)
        rows.append({"path": name, "label": label, "caption": f"a {label} sound"})
    if use_jsonl:
        with open(root / "metadata.jsonl", "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    else:
        with open(root / "metadata.csv", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["path", "label", "caption"])
            writer.writeheader()
            writer.writerows(rows)
    return root


@pytest.mark.parametrize("use_jsonl", [False, True])
def test_local_dataset_roundtrip(tmp_path, rng, use_jsonl):
    root = _make_dataset_dir(tmp_path, rng, use_jsonl)
    ds = dataset_from_config(
        DatasetConfig(name="local_test", kind="local", path=str(root),
                      text_column="caption")
    )
    assert len(ds) == 6
    assert ds.label_names == ["bird", "dog"]
    item = ds[1]  # a wav item
    assert item["raw_wav"].shape == (8000,)
    assert np.abs(item["raw_wav"]).max() < 1.1  # int16 wavs normalized to [-1, 1]
    assert item["label"] in (0, 1)
    assert "sound" in item["text_label"]
    npy_item = ds[0]
    assert npy_item["raw_wav"].dtype == np.float32


def test_local_dataset_max_length(tmp_path, rng):
    root = _make_dataset_dir(tmp_path, rng)
    ds = dataset_from_config(
        DatasetConfig(name="local_test", kind="local", path=str(root),
                      audio_max_length_seconds=0.25)
    )
    assert ds[0]["raw_wav"].shape == (4000,)


def test_missing_metadata_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="metadata"):
        dataset_from_config(
            DatasetConfig(name="x", kind="local", path=str(tmp_path / "empty"))
        )


def test_hf_dataset_native_decode(tmp_path, rng, monkeypatch):
    """HF audio cells decode without soundfile: undecoded bytes (WAV at the
    target rate, WAV needing resample, FLAC) go through the native decoders."""
    import io

    import datasets as hfds
    from scipy.io import wavfile

    from avex_tpu.configs import DatasetConfig
    from avex_tpu.data.dataset import HFAudioDataset

    def wav_bytes(n, sr):
        buf = io.BytesIO()
        wavfile.write(buf, sr, (rng.standard_normal(n) * 0.1 * 32767).astype(np.int16))
        return buf.getvalue()

    rows = {
        "audio": [
            {"bytes": wav_bytes(8000, 16000), "path": None},
            {"bytes": wav_bytes(12000, 32000), "path": None},
        ],
        "label": ["dog", "bird"],
    }
    flac = "/root/reference/tests/samples/animalspeak2/16khz/iNaturalist/246886.flac"
    import os

    if os.path.exists(flac):
        rows["audio"].append({"bytes": open(flac, "rb").read(), "path": None})
        rows["label"].append("insect")

    ds = hfds.Dataset.from_dict(rows).cast_column("audio", hfds.Audio(decode=False))
    ds.save_to_disk(str(tmp_path / "hfds"))
    monkeypatch.setattr(
        hfds, "load_dataset", lambda *a, **k: hfds.load_from_disk(str(tmp_path / "hfds"))
    )

    dataset = HFAudioDataset(
        DatasetConfig(name="hf", kind="hf", path="fake", sample_rate=16000, label_column="label")
    )
    assert dataset[0]["raw_wav"].shape == (8000,)
    assert dataset[1]["raw_wav"].shape == (6000,)  # 32k -> 16k resample
    if len(dataset) == 3:
        assert len(dataset[2]["raw_wav"]) > 16000  # FLAC field recording
    assert all(dataset[i]["raw_wav"].dtype == np.float32 for i in range(len(dataset)))
