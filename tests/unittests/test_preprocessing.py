"""Activity detection preprocessing."""

import numpy as np

from avex_tpu.preprocessing import ActivityDetector, select_active_window


def _clip_with_event(rng, total=32000, event_start=20000, event_len=6000):
    wav = 0.001 * rng.standard_normal(total).astype(np.float32)
    t = np.arange(event_len) / 16000.0
    wav[event_start : event_start + event_len] += 0.5 * np.sin(
        2 * np.pi * 2000 * t
    ).astype(np.float32)
    return wav


def test_detector_flags_event(rng):
    wav = _clip_with_event(rng)
    detector = ActivityDetector()
    mask = detector(wav)
    frames_per_sample = 160
    event_frames = mask[20000 // frames_per_sample : 26000 // frames_per_sample]
    quiet_frames = mask[: 18000 // frames_per_sample]
    assert event_frames.mean() > 0.9
    assert quiet_frames.mean() < 0.1
    assert 0.0 < detector.activity_ratio(wav) < 0.5


def test_select_active_window_centers_on_event(rng):
    wav = _clip_with_event(rng)
    window, start = select_active_window(wav, target_len=8000)
    assert window.shape == (8000,)
    # The selected window must overlap the event substantially.
    assert 16000 <= start <= 24000
    assert np.abs(window).max() > 0.3


def test_short_clip_pads(rng):
    wav = rng.standard_normal(1000).astype(np.float32)
    window, start = select_active_window(wav, target_len=4000)
    assert window.shape == (4000,) and start == 0
    assert window[1000:].sum() == 0
