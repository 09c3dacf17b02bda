"""Noise-SNR and mixup augmenter semantics.

Counterpart of the reference's augmentation coverage
(reference avex/data/augmentations.py:36-541: SNR-targeted noise mixing,
signal masking, Beta-mixup) checked quantitatively: the achieved SNR must
equal the requested one, mixup must stay a convex combination.
"""

import logging

import numpy as np
import pytest

from avex_tpu.configs import MixupAugment, NoiseAugment
from avex_tpu.data.collate import MixupAugmenter, NoiseAugmenter


def _write_noise_dir(tmp_path, seed=0, n=2, length=32000):
    rng = np.random.default_rng(seed)
    d = tmp_path / "noise"
    d.mkdir()
    for i in range(n):
        np.save(d / f"noise_{i}.npy", rng.standard_normal(length).astype(np.float32))
    return str(d)


def test_noise_augment_hits_requested_snr(tmp_path):
    noise_dir = _write_noise_dir(tmp_path)
    cfg = NoiseAugment(
        noise_dirs=[noise_dir], snr_db_range=(6.0, 6.0), augmentation_prob=1.0
    )
    aug = NoiseAugmenter(cfg, seed=1)
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(16000).astype(np.float32)
    out = aug(wav, rng=rng)
    added = out - wav
    achieved_snr_db = 10 * np.log10(np.mean(wav**2) / np.mean(added**2))
    assert achieved_snr_db == pytest.approx(6.0, abs=0.01)


def test_noise_augment_prob_zero_is_identity(tmp_path):
    noise_dir = _write_noise_dir(tmp_path)
    cfg = NoiseAugment(
        noise_dirs=[noise_dir], snr_db_range=(0.0, 10.0), augmentation_prob=0.0
    )
    aug = NoiseAugmenter(cfg, seed=1)
    wav = np.ones(8000, np.float32)
    np.testing.assert_array_equal(aug(wav), wav)


def test_noise_augment_mask_signal_replaces_signal(tmp_path):
    noise_dir = _write_noise_dir(tmp_path)
    cfg = NoiseAugment(
        noise_dirs=[noise_dir],
        snr_db_range=(0.0, 0.0),
        augmentation_prob=1.0,
        mask_signal_prob=1.0,
    )
    aug = NoiseAugmenter(cfg, seed=3)
    rng = np.random.default_rng(4)
    wav = rng.standard_normal(16000).astype(np.float32)
    out = aug(wav, rng=rng)
    # the output is pure scaled noise: uncorrelated with the signal, but at
    # SNR 0 dB it carries the signal's power
    corr = np.corrcoef(wav, out)[0, 1]
    assert abs(corr) < 0.05
    assert np.mean(out**2) == pytest.approx(np.mean(wav**2), rel=0.05)


def test_noise_augment_empty_dir_warns_and_passes_through(tmp_path, caplog):
    empty = tmp_path / "no_noise"
    empty.mkdir()
    cfg = NoiseAugment(
        noise_dirs=[str(empty)], snr_db_range=(0.0, 10.0), augmentation_prob=1.0
    )
    with caplog.at_level(logging.WARNING):
        aug = NoiseAugmenter(cfg)
    assert "no noise files" in caplog.text
    wav = np.ones(100, np.float32)
    np.testing.assert_array_equal(aug(wav), wav)


def test_noise_augment_deterministic_under_shared_rng(tmp_path):
    noise_dir = _write_noise_dir(tmp_path)
    cfg = NoiseAugment(
        noise_dirs=[noise_dir], snr_db_range=(3.0, 12.0), augmentation_prob=1.0
    )
    wav = np.random.default_rng(5).standard_normal(16000).astype(np.float32)
    out_a = NoiseAugmenter(cfg)(wav, rng=np.random.default_rng(99))
    out_b = NoiseAugmenter(cfg)(wav, rng=np.random.default_rng(99))
    np.testing.assert_array_equal(out_a, out_b)


def test_mixup_is_convex_in_audio_and_labels():
    cfg = MixupAugment(alpha=0.4, augmentation_prob=1.0)
    aug = MixupAugmenter(cfg, seed=0)
    rng = np.random.default_rng(1)
    batch = {
        "raw_wav": rng.standard_normal((8, 100)).astype(np.float32),
        "label": np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)],
    }
    out = aug(batch, rng=np.random.default_rng(2))
    # one-hot rows mix to a distribution: rows still sum to 1, stay in [0,1]
    np.testing.assert_allclose(out["label"].sum(axis=1), 1.0, rtol=1e-6)
    assert out["label"].min() >= 0.0 and out["label"].max() <= 1.0
    # audio stays within the originals' range (convexity of
    # lam*x + (1-lam)*x[perm] with lam in [0, 1])
    assert out["raw_wav"].min() >= batch["raw_wav"].min() - 1e-6
    assert out["raw_wav"].max() <= batch["raw_wav"].max() + 1e-6


def test_mixup_prob_zero_and_input_not_mutated():
    cfg = MixupAugment(alpha=0.4, augmentation_prob=0.0)
    aug = MixupAugmenter(cfg, seed=0)
    wav = np.ones((4, 10), np.float32)
    labels = np.eye(4, dtype=np.float32)
    batch = {"raw_wav": wav, "label": labels}
    out = aug(batch)
    assert out is batch  # passthrough, no copy

    hot = MixupAugmenter(MixupAugment(alpha=0.4, augmentation_prob=1.0), seed=0)
    wav_before = wav.copy()
    hot({"raw_wav": wav, "label": labels}, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(wav, wav_before)  # original batch untouched


def test_mixup_multiple_rounds_still_normalized():
    cfg = MixupAugment(alpha=1.0, n_mixup=3, augmentation_prob=1.0)
    aug = MixupAugmenter(cfg, seed=0)
    rng = np.random.default_rng(3)
    batch = {
        "raw_wav": rng.standard_normal((6, 50)).astype(np.float32),
        "label": np.eye(3, dtype=np.float32)[rng.integers(0, 3, 6)],
    }
    out = aug(batch, rng=rng)
    np.testing.assert_allclose(out["label"].sum(axis=1), 1.0, rtol=1e-6)
