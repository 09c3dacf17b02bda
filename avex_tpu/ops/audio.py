"""Waveform cropping/padding and padding-mask propagation helpers.

Counterparts of ``avex/data/audio_utils.py:16-73`` (``pad_or_window``) and the
mask helpers at ``:187-341``. Two variants are provided:

- numpy versions used host-side in the collater (variable-length inputs,
  Python RNG) — this is where dynamic shapes are allowed to exist;
- jnp versions that are shape-static and jit-safe, for use inside compiled
  pipelines where the clip length is already fixed.

Mask convention matches the reference: ``True`` marks **padded** (invalid)
positions.
"""

from __future__ import annotations

from typing import Literal, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "window_start",
    "pad_or_window",
    "pad_or_window_np",
    "waveform_to_frame_mask",
    "sync_crop_or_pad_time",
    "frame_mask_to_patch_mask",
]


def window_start(
    length: int,
    target_len: int,
    window_selection: str,
    rng: Optional[np.random.Generator] = None,
) -> int:
    """Crop-start offset for one window selection mode (shared by
    :func:`pad_or_window_np` and the Collater's zero-copy fast path)."""
    if window_selection == "random":
        rng = rng or np.random.default_rng()
        return int(rng.integers(0, length - target_len + 1))
    if window_selection == "center":
        return (length - target_len) // 2
    if window_selection == "start":
        return 0
    raise ValueError(f"Unknown window selection: {window_selection!r}")


def pad_or_window_np(
    wav: np.ndarray,
    target_len: int,
    window_selection: Literal["random", "center", "start"] = "random",
    rng: Optional[np.random.Generator] = None,
    invert: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop or right-pad a waveform to ``target_len`` (host-side numpy).

    Semantics match ``pad_or_window`` (audio_utils.py:16-73): crop selects a
    window (random / center / start); padding is zeros on the right. Returns
    ``(wav, mask)`` where, with ``invert=True`` (default), ``True`` marks
    padded samples.
    """
    wav_len = wav.shape[-1]
    mask = np.ones(target_len, dtype=bool)
    if wav_len > target_len:
        start = window_start(wav_len, target_len, window_selection, rng=rng)
        wav = wav[..., start : start + target_len]
    elif wav_len < target_len:
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, target_len - wav_len)]
        wav = np.pad(wav, pad)
        mask[wav_len:] = False
    if invert:
        mask = ~mask
    return wav, mask


def pad_or_window(
    wav: jnp.ndarray,
    target_len: int,
    window_selection: Literal["random", "center", "start"] = "center",
    rng_key=None,
    invert: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jit-safe crop/pad to a static ``target_len``.

    The input length is static under jit, so the crop-vs-pad decision is a
    Python branch and the output shape is always ``(..., target_len)``.
    ``random`` selection requires ``rng_key``.
    """
    wav_len = wav.shape[-1]
    mask = jnp.zeros((target_len,), dtype=bool) if invert else jnp.ones((target_len,), dtype=bool)
    if wav_len == target_len:
        return wav, mask
    if wav_len > target_len:
        if window_selection == "random":
            if rng_key is None:
                raise ValueError("random window selection requires rng_key")
            import jax

            start = jax.random.randint(rng_key, (), 0, wav_len - target_len + 1)
            wav = jax.lax.dynamic_slice_in_dim(wav, start, target_len, axis=-1)
        elif window_selection == "center":
            start = (wav_len - target_len) // 2
            wav = jnp.take(wav, jnp.arange(start, start + target_len), axis=-1)
        elif window_selection == "start":
            wav = wav[..., :target_len]
        else:
            raise ValueError(f"Unknown window selection: {window_selection!r}")
        return wav, mask
    pad_len = target_len - wav_len
    pad_width = [(0, 0)] * (wav.ndim - 1) + [(0, pad_len)]
    wav = jnp.pad(wav, pad_width)
    valid = jnp.arange(target_len) < wav_len
    mask = ~valid if invert else valid
    return wav, mask


def waveform_to_frame_mask(padding_mask: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Sample-level → frame-level padding mask (audio_utils.py:187-231).

    A frame is padded only when *all* of its samples are padded (all-pool),
    mirroring BEATs' ``forward_padding_mask``. Input ``(B, T)``; trailing
    samples that don't fill a whole hop are dropped.
    """
    if padding_mask.ndim != 2:
        raise ValueError("Expected padding_mask of shape (B, T)")
    bsz, n = padding_mask.shape
    extra = n % hop_length
    if extra:
        padding_mask = padding_mask[:, :-extra]
    frames = padding_mask.shape[1] // hop_length
    return jnp.all(padding_mask.reshape(bsz, frames, hop_length), axis=-1)


def sync_crop_or_pad_time(
    spec: jnp.ndarray,
    frame_mask: Optional[jnp.ndarray],
    target_len: int,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Center-crop or right-pad ``(B, T, F)`` spec and its mask in lock-step
    (audio_utils.py:234-295). Padded frames are marked ``True`` in the mask."""
    bsz, t, feat = spec.shape
    if t == target_len:
        return spec, frame_mask
    if t > target_len:
        start = (t - target_len) // 2
        spec = spec[:, start : start + target_len, :]
        mask = frame_mask[:, start : start + target_len] if frame_mask is not None else None
        return spec, mask
    pad = target_len - t
    spec = jnp.pad(spec, ((0, 0), (0, pad), (0, 0)))
    if frame_mask is not None:
        frame_mask = jnp.concatenate(
            [frame_mask, jnp.ones((bsz, pad), dtype=frame_mask.dtype)], axis=1
        )
    return spec, frame_mask


def frame_mask_to_patch_mask(
    frame_mask: jnp.ndarray,
    patch_size_time: int,
    n_freq_bins: int,
) -> jnp.ndarray:
    """Frame mask → flattened 2-D patch-token mask (audio_utils.py:303-341).

    Token order is time-patch-major with the mask replicated across frequency
    patches, matching the conv patch-embedding flatten order.
    """
    if frame_mask.ndim != 2:
        raise ValueError("Expected frame_mask of shape (B, T_frames)")
    bsz, t_frames = frame_mask.shape
    if t_frames % patch_size_time:
        raise ValueError("Time dimension must be divisible by patch size")
    t_patches = t_frames // patch_size_time
    time_mask = jnp.all(frame_mask.reshape(bsz, t_patches, patch_size_time), axis=-1)
    freq_patches = n_freq_bins // patch_size_time
    return jnp.repeat(time_mask, freq_patches, axis=1)
