"""Generic STFT frontend vs the reference torch AudioProcessor.

stft_power / AudioProcessor feed every spectrogram model (EfficientNet,
ResNet, CLIP, Perch); this pins them elementwise against ``torch.stft`` and
the actual reference AudioProcessor (spectrogram mode — the mel path's
MelScale needs torchaudio, which is absent; the mel *bank* itself is
covered by the fbank oracle suite).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_audio_utils():
    import importlib.util

    path = Path("/root/reference/avex/data/audio_utils.py")
    if not path.exists():
        pytest.skip("reference checkout not available")
    for mod_name, attrs in (
        ("torchaudio", {"transforms": types.SimpleNamespace(MelScale=object)}),
        ("avex", {}),
        ("avex.configs", {"AudioConfig": object}),
    ):
        if mod_name not in sys.modules:
            mod = types.ModuleType(mod_name)
            mod.__spec__ = importlib.util.spec_from_loader(mod_name, loader=None)
            for key, value in attrs.items():
                setattr(mod, key, value)
            sys.modules[mod_name] = mod
    spec = importlib.util.spec_from_file_location("_ref_audio_utils2", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.mark.parametrize("n_fft,hop,window,center", [
    (512, 128, "hann", True),
    (400, 160, "hamming", True),
    (512, 256, "hann", False),
])
def test_stft_power_matches_torch_stft(rng, n_fft, hop, window, center):
    from avex_tpu.ops.frontend import stft_power

    wav = rng.standard_normal((2, 4000)).astype(np.float32) * 0.3
    win = torch.hann_window(n_fft) if window == "hann" else torch.hamming_window(n_fft)
    expected = (
        torch.stft(
            torch.from_numpy(wav), n_fft=n_fft, hop_length=hop, win_length=n_fft,
            window=win, center=center, return_complex=True,
        )
        .abs()
        .pow(2)
        .numpy()
    )
    ours = np.asarray(
        stft_power(wav, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                   window=window, center=center)
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("normalize", [False, True])
def test_audio_processor_spectrogram_matches_reference(ref_audio_utils, rng, normalize):
    from avex_tpu.configs import AudioConfig
    from avex_tpu.ops.frontend import AudioProcessor

    cfg = AudioConfig(
        representation="spectrogram", n_fft=512, hop_length=160, normalize=normalize
    )
    ref_cfg = types.SimpleNamespace(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, window=cfg.window, n_mels=cfg.n_mels,
        representation="spectrogram", normalize=normalize,
        target_length_seconds=None, window_selection="center", center=cfg.center,
    )
    wav = rng.standard_normal((3, 8000)).astype(np.float32) * 0.2
    expected = ref_audio_utils.AudioProcessor(ref_cfg)(torch.from_numpy(wav)).numpy()
    ours = np.asarray(AudioProcessor(cfg)(wav))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)
