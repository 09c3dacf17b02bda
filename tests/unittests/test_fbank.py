"""Kernel-level parity: fused TPU fbank vs the reference torch implementation.

Mirrors the reference's own signature technique
(tests/unittests/test_batched_fbank.py: `_BatchedFbank` vs per-sample Kaldi
at atol/rtol 1e-4): here the oracle is the reference `_BatchedFbank` itself
run under torch-CPU, plus an independent numpy Kaldi pipeline, and the subject
is `avex_tpu.ops.fbank.KaldiFbank` (single fused conv formulation).
"""

import numpy as np
import pytest

from avex_tpu.ops.fbank import KaldiFbank, beats_fbank, eat_fbank, kaldi_mel_banks, kaldi_window


def numpy_kaldi_fbank(
    wav: np.ndarray,
    num_mel_bins: int = 128,
    sample_rate: float = 16000.0,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    window_type: str = "povey",
    preemph: float = 0.97,
    remove_dc: bool = True,
) -> np.ndarray:
    """Independent step-by-step Kaldi fbank oracle (float64 numpy)."""
    win = int(sample_rate * frame_length_ms / 1000.0)
    hop = int(sample_rate * frame_shift_ms / 1000.0)
    n_fft = 1
    while n_fft < win:
        n_fft *= 2
    n_frames = 1 + (len(wav) - win) // hop
    window = kaldi_window(win, window_type)
    mel_fb = kaldi_mel_banks(n_fft, num_mel_bins, sample_rate)
    out = np.zeros((n_frames, num_mel_bins))
    for f in range(n_frames):
        frame = wav[f * hop : f * hop + win].astype(np.float64)
        if remove_dc:
            frame = frame - frame.mean()
        if preemph:
            shifted = np.concatenate([[frame[0]], frame[:-1]])
            frame = frame - preemph * shifted
        frame = frame * window
        spec = np.fft.rfft(frame, n=n_fft)
        power = np.abs(spec) ** 2
        mel = power @ mel_fb
        out[f] = np.log(np.maximum(mel, np.finfo(np.float32).eps))
    return out


@pytest.mark.parametrize("length", [400, 1600, 16000, 16123])
def test_fbank_matches_numpy_oracle(length, rng):
    wav = rng.standard_normal(length).astype(np.float32) * 0.1
    ours = np.asarray(KaldiFbank()(wav[None] * 32768.0))[0]
    oracle = numpy_kaldi_fbank(wav * 32768.0)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=1e-4, rtol=1e-4)


def test_fbank_hanning_window_matches_oracle(rng):
    wav = rng.standard_normal(8000).astype(np.float32) * 0.05
    ours = np.asarray(KaldiFbank(window_type="hanning")(wav[None]))[0]
    oracle = numpy_kaldi_fbank(wav, window_type="hanning")
    np.testing.assert_allclose(ours, oracle, atol=1e-4, rtol=1e-4)


def test_fbank_matches_reference_torch_implementation(rng):
    torch = pytest.importorskip("torch")
    from tests.utils.reference_oracle import load_reference_beats

    ref = load_reference_beats()
    wav = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1

    ref_fbank = ref.beats._BatchedFbank()
    with torch.no_grad():
        expected = ref_fbank(torch.from_numpy(wav) * 2**15).numpy()

    ours = np.asarray(KaldiFbank()(wav * 32768.0))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=1e-4, rtol=1e-4)


def test_beats_fbank_normalization(rng):
    """BEATs preprocess = fbank(x * 2**15) then (x - mean) / (2 * std)."""
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    raw = np.asarray(KaldiFbank()(wav * 32768.0))
    normed = np.asarray(beats_fbank(wav))
    np.testing.assert_allclose(normed, (raw - 15.41663) / (2 * 6.55582), atol=1e-6)


def test_eat_fbank_shape_and_padding(rng):
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    out = np.asarray(eat_fbank(wav, target_length=1024))
    assert out.shape == (2, 128, 1024)
    # 1s @ 16kHz -> 98 frames; the rest is padding (normalized zeros).
    pad_value = (0.0 - (-4.268)) / (4.569 * 2)
    np.testing.assert_allclose(out[:, :, 200:], pad_value, atol=1e-6)


def test_fbank_jit_and_batch_consistency(rng):
    import jax

    wav = rng.standard_normal((4, 16000)).astype(np.float32) * 0.1
    fb = KaldiFbank()
    batched = np.asarray(jax.jit(fb)(wav * 32768.0))
    single = np.stack([np.asarray(fb(w * 32768.0)) for w in wav])
    np.testing.assert_allclose(batched, single, atol=1e-4, rtol=1e-4)
