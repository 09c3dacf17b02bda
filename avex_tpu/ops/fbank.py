"""Kaldi-compatible log-mel filterbank as one fused TPU op.

Reference behavior: ``_BatchedFbank`` (avex/models/beats/beats.py:39-163) and
``torchaudio.compliance.kaldi.fbank`` — framing with ``snip_edges=True``,
per-frame DC removal, replicate-pad pre-emphasis (0.97), Povey/Hann window,
zero-pad to a power-of-two FFT, power spectrum, triangular Kaldi mel bank,
``log(max(x, eps))``.

TPU-first design: every per-frame step before the power spectrum — DC removal,
pre-emphasis, windowing, zero-padding, real DFT — is *linear* in the frame, so
the whole chain folds into two constant matrices (cos and sin branches). The
entire frontend then becomes

    power = conv1d(wav, K)            # one strided conv → MXU
    fbank = log(max(power @ mel_fb, eps))

i.e. a single implicit-GEMM convolution plus one matmul, which XLA fuses with
the surrounding elementwise work. No unfold/gather, no FFT op, no 8-step
elementwise pipeline — the MXU does all the work in one pass.

Numerics: matrices are built in float64 and applied with
``Precision.HIGHEST`` so outputs match the reference fp32 pipeline well inside
its own 1e-4 parity tolerance (tests/unittests/test_fbank.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["KaldiFbank", "kaldi_mel_banks", "kaldi_window", "num_frames"]

_F32_EPS = float(np.finfo(np.float32).eps)


def kaldi_window(win_length: int, window_type: str = "povey") -> np.ndarray:
    """Kaldi feature window (float64).

    ``povey`` = hann(periodic=False) ** 0.85; ``hanning`` = plain symmetric
    hann — matching kaldi's ``_feature_window_function``.
    """
    n = np.arange(win_length, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))
    if window_type == "povey":
        return hann**0.85
    if window_type == "hanning":
        return hann
    if window_type == "hamming":
        return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (win_length - 1))
    if window_type == "rectangular":
        return np.ones(win_length, dtype=np.float64)
    raise ValueError(f"Unknown Kaldi window type: {window_type!r}")


def kaldi_mel_banks(
    n_fft: int,
    num_mel_bins: int,
    sample_rate: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Triangular Kaldi mel filterbank, shape ``[n_fft//2 + 1, num_mel_bins]``.

    Follows kaldi's ``get_mel_banks`` (mel = 1127 ln(1 + f/700); uniform bins in
    mel space between ``low_freq`` and ``high_freq``; ``high_freq <= 0`` means
    Nyquist + high_freq). The Nyquist FFT bin row is zero, as in kaldi.
    """
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    num_bins = n_fft // 2
    fft_bin_width = sample_rate / n_fft
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_mel_bins + 1)

    bin_idx = np.arange(num_mel_bins, dtype=np.float64)[:, None]
    left = mel_low + bin_idx * mel_delta
    center = left + mel_delta
    right = center + mel_delta

    bin_mels = mel(fft_bin_width * np.arange(num_bins, dtype=np.float64))[None, :]
    up = (bin_mels - left) / (center - left)
    down = (right - bin_mels) / (right - center)
    fb = np.maximum(0.0, np.minimum(up, down))  # [num_mel_bins, num_bins]
    fb = np.concatenate([fb, np.zeros((num_mel_bins, 1))], axis=1)
    return fb.T  # [n_fft//2 + 1, num_mel_bins]


def _fused_frame_matrices(
    win_length: int,
    n_fft: int,
    window_type: str,
    preemphasis: float,
    remove_dc_offset: bool,
) -> np.ndarray:
    """Fold DC-removal → pre-emphasis → window → rDFT into one matrix pair.

    Returns ``[win_length, 2 * (n_fft//2 + 1)]``: the cos branch followed by
    the sin branch, so ``frames @ M`` yields concatenated (Re, Im) spectra.
    """
    eye = np.eye(win_length, dtype=np.float64)
    m = eye
    if remove_dc_offset:
        m = m - np.full((win_length, win_length), 1.0 / win_length)
    if preemphasis != 0.0:
        # y[i] = x[i] - c * x[i-1], with replicate padding (y[0] uses x[0]).
        shift = np.zeros((win_length, win_length), dtype=np.float64)
        shift[np.arange(1, win_length), np.arange(win_length - 1)] = 1.0
        shift[0, 0] = 1.0
        m = (eye - preemphasis * shift) @ m
    m = np.diag(kaldi_window(win_length, window_type)) @ m

    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    n = np.arange(win_length, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * n / n_fft
    dft_cos = np.cos(angle)  # [win, K]
    dft_sin = -np.sin(angle)
    # frames @ (M^T @ dft) == dft^T @ (M @ x) per frame.
    return np.concatenate([m.T @ dft_cos, m.T @ dft_sin], axis=1)


@functools.lru_cache(maxsize=16)
def _fbank_constants(key: Tuple) -> Tuple[np.ndarray, np.ndarray]:
    """Per-config cached (conv kernel, mel bank) constants.

    Cached as numpy (NOT jnp) so the cache is safe across jit traces — a
    jnp array created inside a trace would leak that trace's tracer.
    """
    (n_mels, sr, win, _hop, wtype, preemph, dc, lo, hi) = key
    n_fft = 1
    while n_fft < win:
        n_fft *= 2
    frame_mat = _fused_frame_matrices(win, n_fft, wtype, preemph, dc)
    mel_fb = kaldi_mel_banks(n_fft, n_mels, sr, lo, hi)
    # conv kernel layout: [out_channels = 2K, in_channels = 1, width = win]
    kernel = frame_mat.T[:, None, :].astype(np.float32)
    return kernel, mel_fb.astype(np.float32)


def num_frames(num_samples: int, win_length: int, hop_length: int) -> int:
    """Frame count under ``snip_edges=True`` framing."""
    if num_samples < win_length:
        return 0
    return 1 + (num_samples - win_length) // hop_length


class KaldiFbank:
    """Batched, jit-friendly Kaldi fbank (see module docstring for design).

    Matches ``torchaudio.compliance.kaldi.fbank(htk_compat=..., use_energy=False,
    dither=0.0, snip_edges=True)`` for the supported windows. Instances are
    lightweight and hashable; the heavy constants are cached per-config.

    Example:
        >>> fb = KaldiFbank(num_mel_bins=128)
        >>> feats = fb(wav * 2**15)   # [B, T] -> [B, frames, 128]
    """

    def __init__(
        self,
        num_mel_bins: int = 128,
        sample_frequency: float = 16000.0,
        frame_length_ms: float = 25.0,
        frame_shift_ms: float = 10.0,
        window_type: str = "povey",
        preemphasis_coefficient: float = 0.97,
        remove_dc_offset: bool = True,
        low_freq: float = 20.0,
        high_freq: float = 0.0,
    ) -> None:
        self.num_mel_bins = num_mel_bins
        self.sample_frequency = sample_frequency
        self.win_length = int(sample_frequency * frame_length_ms / 1000.0)
        self.hop_length = int(sample_frequency * frame_shift_ms / 1000.0)
        n_fft = 1
        while n_fft < self.win_length:
            n_fft *= 2
        self.n_fft = n_fft

        self._key = (
            num_mel_bins,
            sample_frequency,
            self.win_length,
            self.hop_length,
            window_type,
            preemphasis_coefficient,
            remove_dc_offset,
            low_freq,
            high_freq,
        )

    def output_frames(self, num_samples: int) -> int:
        """Number of output frames for a given waveform length."""
        return num_frames(num_samples, self.win_length, self.hop_length)

    def constants(self) -> Tuple[np.ndarray, np.ndarray]:
        """(conv kernel, mel bank) numpy constants for this configuration.

        Callers embedding the fbank inside a flax module should store these
        as module *variables* and pass them back via ``__call__``'s
        ``constants`` argument: as runtime inputs they stay OUT of the
        serialized program (~1 MB of dense constants otherwise dominates the
        compile payload — the remote-compile transport rejects large
        bodies), with bit-identical numerics either way.
        """
        return _fbank_constants(self._key)

    def __call__(
        self,
        waveforms: jnp.ndarray,
        precision=jax.lax.Precision.HIGHEST,
        constants: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Compute log-mel features.

        Args:
            waveforms: ``[B, T]`` (or ``[T]``) float waveform. For BEATs
                parity the caller scales by ``2**15`` first (beats.py:322).
            precision: matmul precision; ``HIGHEST`` reproduces the fp32
                reference, ``DEFAULT`` trades ~1e-3 drift for ~3x matmul rate.
            constants: optional (kernel, mel bank) arrays from
                :meth:`constants`, passed as runtime inputs instead of
                embedded program constants (identical values/numerics).

        Returns:
            ``[B, num_frames, num_mel_bins]`` log-mel features (float32).
        """
        if constants is None:
            kernel_np, mel_fb_np = _fbank_constants(self._key)
            kernel, mel_fb = jnp.asarray(kernel_np), jnp.asarray(mel_fb_np)
        else:
            kernel, mel_fb = (jnp.asarray(c, jnp.float32) for c in constants)
        squeeze = waveforms.ndim == 1
        if squeeze:
            waveforms = waveforms[None]
        x = waveforms.astype(jnp.float32)  # [B, T]
        b, t = x.shape
        f = num_frames(t, self.win_length, self.hop_length)
        if f <= 0:
            out = jnp.zeros((b, 0, self.num_mel_bins), jnp.float32)
            return out[0] if squeeze else out
        # Matmul rDFT lowering (same finding as ops/frontend.py stft_power,
        # round 4): the strided conv with 1 input channel and 2K output
        # channels is a degenerate shape XLA tiles badly on the MXU.
        # Frame into [B, F, win] by gcd(win, hop)-block decomposition —
        # reshape + strided slices, pure layout work, no gather — and
        # contract as one [B*F, win] x [win, 2K] matmul.
        # `kernel` keeps the conv layout [2K, 1, win] (it is stored as a
        # checkpoint variable by callers — models/beats.py:479-484); the
        # transpose below is free relayout under XLA.
        kernel2d = kernel[:, 0, :].T  # [win, 2K]
        g = np.gcd(self.win_length, self.hop_length)
        stride = self.hop_length // g
        n_segs = self.win_length // g
        blocks = x[:, : (t // g) * g].reshape(b, t // g, g)
        frames = jnp.concatenate(
            [
                blocks[:, j : j + (f - 1) * stride + 1 : stride]
                for j in range(n_segs)
            ],
            axis=2,
        )  # [B, F, win]
        spec = jnp.einsum(
            "bfn,nk->bfk",
            frames,
            kernel2d,
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # [B, F, 2K]
        k = self.n_fft // 2 + 1
        power = jnp.square(spec[..., :k]) + jnp.square(spec[..., k:])
        mel = jnp.einsum("bfk,km->bfm", power, mel_fb, precision=precision)
        out = jnp.log(jnp.maximum(mel, _F32_EPS))
        return out[0] if squeeze else out


def beats_fbank(
    waveforms: jnp.ndarray,
    fbank_mean: float = 15.41663,
    fbank_std: float = 6.55582,
    fbank: Optional[KaldiFbank] = None,
    precision=jax.lax.Precision.HIGHEST,
    constants: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """BEATs frontend: 2**15 scaling + Kaldi fbank + dataset normalization.

    Mirrors ``BEATs.preprocess`` (beats.py:304-323) including the fp32 pinning:
    this function always computes in float32 regardless of the surrounding
    compute dtype — frontends drift visibly in bf16 (documented ~0.06 in the
    reference), so the bf16 policy starts *after* the frontend.
    """
    if fbank is None:
        fbank = KaldiFbank()
    feats = fbank(
        waveforms.astype(jnp.float32) * 32768.0, precision=precision, constants=constants
    )
    return (feats - fbank_mean) / (2.0 * fbank_std)


def eat_fbank(
    waveforms: jnp.ndarray,
    target_length: int = 1024,
    norm_mean: float = -4.268,
    norm_std: float = 4.569,
    fbank: Optional[KaldiFbank] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """EAT frontend (≈ avex/models/eat/audio_processor.py:19-143), batched.

    The reference loops per sample over CPU-only torchaudio Kaldi compliance;
    here the identical math runs batched on TPU: global DC removal, Hann-window
    Kaldi fbank (htk_compat has no effect without energy), pad/truncate to
    ``target_length`` frames, dataset normalization, output ``[B, M, T]``.
    """
    if fbank is None:
        fbank = KaldiFbank(window_type="hanning")
    squeeze = waveforms.ndim == 1
    if squeeze:
        waveforms = waveforms[None]
    wav = waveforms.astype(jnp.float32)
    wav = wav - jnp.mean(wav, axis=-1, keepdims=True)
    mel = fbank(wav, precision=precision)  # [B, F, M]
    frames = mel.shape[1]
    if frames < target_length:
        mel = jnp.pad(mel, ((0, 0), (0, target_length - frames), (0, 0)))
    else:
        mel = mel[:, :target_length, :]
    mel = (mel - norm_mean) / (norm_std * 2.0)
    out = jnp.transpose(mel, (0, 2, 1))  # [B, M, T]
    return out[0] if squeeze else out
