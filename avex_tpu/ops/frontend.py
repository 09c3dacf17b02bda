"""Generic spectrogram frontend (raw / spectrogram / mel_spectrogram).

TPU-native counterpart of ``AudioProcessor`` (avex/data/audio_utils.py:76-179):
``torch.stft`` → power → optional mel → ``log(x + 1e-6)`` → per-sample min-max
normalization. Like the fbank op, the windowed rDFT is folded into a single
strided convolution (one MXU pass) rather than an FFT + elementwise chain; the
mel projection is one further matmul that XLA fuses into the same program.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from avex_tpu.configs import AudioConfig

__all__ = ["AudioProcessor", "htk_mel_banks", "stft_power"]


def _periodic_window(win_length: int, window: str) -> np.ndarray:
    """torch-compatible periodic analysis windows (float64)."""
    n = np.arange(win_length, dtype=np.float64)
    if window == "hann":
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if window == "hamming":
        return 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)
    raise ValueError(f"Unknown window type: {window!r}")


def htk_mel_banks(
    n_freqs: int,
    n_mels: int,
    sample_rate: float,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """HTK-scale triangular mel bank matching ``torchaudio.transforms.MelScale``.

    Returns ``[n_freqs, n_mels]`` (no area normalization, mel = 2595
    log10(1 + f/700)), the default MelScale configuration the reference's
    AudioProcessor instantiates (audio_utils.py:97-101).
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    f_pts = from_mel(np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2))
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))  # [n_freqs, n_mels]


@functools.lru_cache(maxsize=16)
def _stft_kernel(n_fft: int, win_length: int, window: str) -> np.ndarray:
    """Windowed-rDFT conv kernel ``[2K, 1, n_fft]`` (cos rows then sin rows).

    When ``win_length < n_fft`` the window is centered inside the frame, as
    ``torch.stft`` does. Cached as numpy so the cache never captures a jit
    tracer.
    """
    win = _periodic_window(win_length, window)
    full = np.zeros(n_fft, dtype=np.float64)
    start = (n_fft - win_length) // 2
    full[start : start + win_length] = win

    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * n / n_fft
    mat = np.concatenate(
        [full[:, None] * np.cos(angle), full[:, None] * -np.sin(angle)], axis=1
    )  # [n_fft, 2K]
    return mat.T[:, None, :].astype(np.float32)


def stft_power(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: str = "hann",
    center: bool = True,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Power spectrogram ``[B, n_fft//2+1, frames]`` matching ``torch.stft``.

    ``center=True`` reflect-pads by ``n_fft // 2`` on both sides (torch's
    default padding mode), yielding ``1 + T // hop`` frames.

    Lowering: the windowed rDFT is framed into ``[B, frames, n_fft]`` (block
    decomposition on ``gcd(n_fft, hop)``-sized chunks — reshape + strided
    slices, no gather) and contracted as ONE ``[B*frames, n_fft] x
    [n_fft, 2K]`` matmul. The previous strided-conv lowering left XLA a
    degenerate 1-input-channel conv it tiles badly: measured on v5e at the
    EfficientNet shape (B=128, 5 s, n_fft=800, hop=160), conv 7.74 ms vs
    matmul 7.09 ms at HIGHEST (reassociation drift 7e-6) and 4.36 ms with
    bf16 operands at DEFAULT (scripts/bench_frontend_variants.py, round 4).
    ``precision=DEFAULT`` casts operands to bf16 with fp32 accumulation —
    the right frontend for bf16-trunk models; HIGHEST stays the
    torch-parity default.
    """
    kernel = jnp.asarray(_stft_kernel(n_fft, win_length, window)[:, 0, :].T)  # [n_fft, 2K]
    x = waveform.astype(jnp.float32)
    if x.ndim == 1:
        x = x[None]
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    b, t = x.shape
    n_frames = (t - n_fft) // hop_length + 1
    g = math.gcd(n_fft, hop_length)
    stride = hop_length // g
    n_segs = n_fft // g
    fast = precision in (None, jax.lax.Precision.DEFAULT)
    if fast:
        x = x.astype(jnp.bfloat16)
        kernel = kernel.astype(jnp.bfloat16)
    blocks = x[:, : (t // g) * g].reshape(b, t // g, g)
    # frame i, segment j  =  blocks[:, i*stride + j]; each seg is one strided
    # slice over the frame axis, so framing is pure layout work for XLA.
    frames = jnp.concatenate(
        [
            blocks[:, j : j + (n_frames - 1) * stride + 1 : stride]
            for j in range(n_segs)
        ],
        axis=2,
    )  # [B, n_frames, n_fft]
    spec = jnp.einsum(
        "btn,nk->btk",
        frames,
        kernel,
        preferred_element_type=jnp.float32,
        precision=None if fast else precision,
    )  # [B, F, 2K], fp32
    k = n_fft // 2 + 1
    power = jnp.square(spec[..., :k]) + jnp.square(spec[..., k:])
    return jnp.transpose(power, (0, 2, 1))


class AudioProcessor:
    """Raw-audio → model-input transform configured by :class:`AudioConfig`.

    Output shapes mirror the reference (audio_utils.py:106-155):
      - ``raw`` → ``(B, T)`` unchanged
      - ``spectrogram`` / ``mel_spectrogram`` → ``(B, F, T')``
    with optional ``log`` + per-sample min-max normalization
    (audio_utils.py:167-172).
    """

    def __init__(self, cfg: AudioConfig, precision=jax.lax.Precision.HIGHEST) -> None:
        self.cfg = cfg
        #: MXU precision for the rDFT + mel matmuls. HIGHEST (6-pass fp32
        #: emulation) matches torch.stft to ~1e-5 and is the parity default;
        #: bf16-trunk models drop to DEFAULT (bf16 operands, fp32
        #: accumulate) — measured 6.6 -> 4.1 ms/batch at the EfficientNet
        #: B=128 shape with last-layer feature drift 2.1e-2 (HIGH: 5.3 ms,
        #: 9.6e-3 — the drift is dominated by log/min-max amplification of
        #: near-zero power bins, not by matmul pass count, so the extra
        #: passes don't pay; end-task probe metrics are drift-tested in
        #: tests/integration/test_quant_end_task.py). Measurements:
        #: scripts/bench_effnet_ablation.py, round 4.
        self.precision = precision
        self.sr = cfg.sample_rate
        self.n_fft = cfg.n_fft
        self.hop_length = cfg.hop_length or self.n_fft // 4
        self.win_length = cfg.win_length or self.n_fft
        self.window_type = cfg.window
        self.n_mels = cfg.n_mels
        self.representation = cfg.representation
        self.normalize = cfg.normalize
        self.center = cfg.center
        if self.representation == "mel_spectrogram":
            self._mel_fb = htk_mel_banks(self.n_fft // 2 + 1, self.n_mels, self.sr).astype(
                np.float32
            )

    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        if waveform.ndim == 1:
            waveform = waveform[None]
        if self.representation == "raw":
            return waveform

        power = stft_power(
            waveform,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window_type,
            center=self.center,
            precision=self.precision,
        )
        if self.representation == "mel_spectrogram":
            out = jnp.einsum(
                "bkf,km->bmf",
                power,
                jnp.asarray(self._mel_fb),
                precision=self.precision,
            )
        elif self.representation == "spectrogram":
            out = power
        else:
            raise ValueError(f"Unknown representation: {self.representation!r}")
        return self._normalize(out) if self.normalize else out

    @staticmethod
    def _normalize(x: jnp.ndarray) -> jnp.ndarray:
        """log then per-sample min-max to [0, 1] (audio_utils.py:167-172)."""
        x = jnp.log(x + 1e-6)
        lo = jnp.min(x, axis=(-2, -1), keepdims=True)
        hi = jnp.max(x, axis=(-2, -1), keepdims=True)
        return (x - lo) / (hi - lo + 1e-8)
