"""AudioProcessor representation modes and normalization contract.

Complements the torch-oracle parity tests (test_frontend_parity.py) with
direct semantic checks of the three representations the reference supports
(reference avex/data/audio_utils.py:76-179).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from avex_tpu.configs import AudioConfig
from avex_tpu.ops.frontend import AudioProcessor


def _wave(n=8000, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.2)


def test_raw_mode_passthrough_adds_batch_dim():
    proc = AudioProcessor(AudioConfig(representation="raw"))
    wav = _wave()
    out = proc(wav)
    assert out.shape == (1, wav.shape[0])
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(wav))

    batched = jnp.stack([wav, wav])
    np.testing.assert_array_equal(np.asarray(proc(batched)), np.asarray(batched))


def test_spectrogram_shape_and_mel_reduction():
    cfg = AudioConfig(
        representation="spectrogram", n_fft=512, hop_length=128, normalize=False
    )
    spec = AudioProcessor(cfg)(_wave())
    assert spec.shape[1] == 512 // 2 + 1  # (B, F, T')

    mel_cfg = AudioConfig(
        representation="mel_spectrogram",
        n_fft=512,
        hop_length=128,
        n_mels=64,
        normalize=False,
    )
    mel = AudioProcessor(mel_cfg)(_wave())
    assert mel.shape[1] == 64
    assert mel.shape[2] == spec.shape[2]  # same frame count
    assert float(jnp.min(mel)) >= 0.0  # power through a nonnegative filterbank


def test_normalize_bounds_per_sample():
    cfg = AudioConfig(
        representation="mel_spectrogram", n_fft=512, hop_length=128, n_mels=32,
        normalize=True,
    )
    proc = AudioProcessor(cfg)
    # two samples at wildly different amplitudes normalize independently
    quiet, loud = _wave(seed=1) * 1e-3, _wave(seed=2) * 10.0
    out = proc(jnp.stack([quiet, loud]))
    for i in range(2):
        sample = np.asarray(out[i])
        assert sample.min() == pytest.approx(0.0, abs=1e-6)
        assert sample.max() == pytest.approx(1.0, abs=1e-3)


def test_unknown_representation_rejected_by_config():
    with pytest.raises(Exception):
        AudioConfig(representation="wavelet")


def test_hop_and_win_defaults():
    cfg = AudioConfig(representation="spectrogram", n_fft=1024)
    proc = AudioProcessor(cfg)
    assert proc.hop_length == 256  # n_fft // 4, the torch.stft default
    assert proc.win_length == 1024
