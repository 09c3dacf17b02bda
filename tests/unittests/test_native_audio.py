"""Native audio decode/resample kernels (C++ with Python fallback)."""

import numpy as np
import pytest

from avex_tpu._native import decode_wav, native_available, resample


def _write_wav(path, wav, sr=16000, dtype=np.int16):
    from scipy.io import wavfile

    if dtype == np.int16:
        wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    elif dtype == np.float32:
        wavfile.write(path, sr, wav.astype(np.float32))
    else:
        wavfile.write(path, sr, (wav * (2**31 - 1)).astype(np.int32))


def test_native_builds():
    assert native_available()


@pytest.mark.parametrize("dtype", [np.int16, np.float32, np.int32])
def test_decode_formats(tmp_path, rng, dtype):
    wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    path = tmp_path / "x.wav"
    _write_wav(path, wav, dtype=dtype)
    decoded, sr = decode_wav(str(path))
    assert sr == 16000
    assert decoded.shape == (4000,)
    np.testing.assert_allclose(decoded, wav, atol=2e-4)


def test_decode_stereo_mixdown(tmp_path, rng):
    wav = (rng.standard_normal((4000, 2)) * 0.1).astype(np.float32)
    path = tmp_path / "stereo.wav"
    _write_wav(path, wav)
    decoded, _sr = decode_wav(str(path), mono=True)
    np.testing.assert_allclose(decoded, wav.mean(axis=1), atol=2e-4)


@pytest.mark.parametrize("sr_out", [8000, 32000, 22050])
def test_resample_preserves_tone(sr_out):
    sr_in = 16000
    t = np.arange(sr_in) / sr_in
    sine = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(sine, sr_in, sr_out)
    assert out.shape[0] == int(sr_in * sr_out / sr_in * 1.0)
    t2 = np.arange(len(out)) / sr_out
    expected = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    assert np.abs(out[200:-200] - expected[200 : len(out) - 200]).max() < 5e-3


def test_resample_identity():
    wav = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(wav, 16000, 16000), wav)


def test_local_dataset_resamples(tmp_path, rng):
    """LocalAudioDataset resamples 8 kHz files to the configured 16 kHz."""
    import csv

    from avex_tpu.configs import DatasetConfig
    from avex_tpu.data import dataset_from_config

    root = tmp_path / "ds"
    root.mkdir()
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)  # 1s @ 8kHz
    _write_wav(root / "a.wav", wav, sr=8000)
    with open(root / "metadata.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["path", "label"])
        writer.writeheader()
        writer.writerow({"path": "a.wav", "label": "x"})
    ds = dataset_from_config(
        DatasetConfig(name="r", kind="local", path=str(root), sample_rate=16000)
    )
    assert ds[0]["raw_wav"].shape == (16000,)


def test_pcm_to_float_scales_by_dtype():
    """Round-1 advisor finding: the scipy fallback scaled by a magnitude
    heuristic — int32 PCM came out ±65536 and quiet int16 stayed unscaled.
    Scaling must branch on the original dtype."""
    from avex_tpu._native import pcm_to_float

    i16 = np.array([-32768, 0, 16384], np.int16)
    np.testing.assert_allclose(pcm_to_float(i16), [-1.0, 0.0, 0.5])
    # quiet int16 (max |x| < 2) still gets scaled
    quiet = np.array([1, -1, 0], np.int16)
    np.testing.assert_allclose(pcm_to_float(quiet), [1 / 32768, -1 / 32768, 0.0])
    i32 = np.array([-(2**31), 0, 2**30], np.int32)
    np.testing.assert_allclose(pcm_to_float(i32), [-1.0, 0.0, 0.5])
    u8 = np.array([0, 128, 255], np.uint8)
    np.testing.assert_allclose(pcm_to_float(u8), [-1.0, 0.0, 127 / 128])
    f32 = np.array([-0.5, 0.25], np.float32)
    np.testing.assert_array_equal(pcm_to_float(f32), f32)


def test_scipy_fallback_decode_scaling(tmp_path, rng, monkeypatch):
    """With the native lib disabled, int32 WAVs must decode to [-1, 1]."""
    import avex_tpu._native as native

    monkeypatch.setattr(native, "_get_lib", lambda: None)
    wav = (rng.standard_normal(2000) * 0.1).astype(np.float32)
    path = tmp_path / "i32.wav"
    _write_wav(path, wav, dtype=np.int32)
    decoded, sr = native.decode_wav(str(path))
    assert sr == 16000
    np.testing.assert_allclose(decoded, wav, atol=2e-4)


REFERENCE_FLACS = [
    "/root/reference/tests/samples/animalspeak2/16khz/iNaturalist/246886.flac",
    "/root/reference/tests/samples/animalspeak2/16khz/Xeno-canto/"
    "XC564654-200602-006_NR5N6_20h14_Sturtur.flac",
]


@pytest.mark.parametrize("path", REFERENCE_FLACS)
def test_flac_decode_md5_verified(path):
    """The native FLAC decoder must reproduce the MD5 of the unencoded audio
    stored in STREAMINFO — a bit-exact self-oracle (any decode bug breaks it).

    Uses the reference repo's real field recordings at runtime (not copied)."""
    import os

    if not os.path.exists(path):
        pytest.skip("reference flac samples unavailable")
    from avex_tpu._native import decode_flac

    wav, sr = decode_flac(path)  # verify_md5=True raises on mismatch
    assert sr == 16000
    assert wav.dtype == np.float32
    assert np.isfinite(wav).all()
    assert 0.001 < np.abs(wav).max() <= 1.0


def test_decode_audio_dispatches_by_magic(tmp_path, rng):
    from avex_tpu._native import decode_audio

    wav = (rng.standard_normal(2000) * 0.1).astype(np.float32)
    path = tmp_path / "x.wav"
    _write_wav(path, wav)
    decoded, sr = decode_audio(str(path))
    np.testing.assert_allclose(decoded, wav, atol=2e-4)

    import os

    if os.path.exists(REFERENCE_FLACS[0]):
        decoded, sr = decode_audio(REFERENCE_FLACS[0])
        assert sr == 16000 and len(decoded) > 0


def test_local_dataset_reads_flac(tmp_path):
    import os
    import shutil

    if not os.path.exists(REFERENCE_FLACS[0]):
        pytest.skip("reference flac samples unavailable")
    import csv

    from avex_tpu.configs import DatasetConfig
    from avex_tpu.data.dataset import LocalAudioDataset

    shutil.copy(REFERENCE_FLACS[0], tmp_path / "a.flac")
    with open(tmp_path / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "label"])
        w.writeheader()
        w.writerow({"path": "a.flac", "label": "x"})
    ds = LocalAudioDataset(
        DatasetConfig(name="f", kind="local", path=str(tmp_path), num_classes=1)
    )
    item = ds[0]
    assert item["raw_wav"].dtype == np.float32
    assert len(item["raw_wav"]) > 16000
