"""Mask-propagation helpers vs the reference torch implementations.

waveform_to_frame_mask / sync_crop_or_pad_time / frame_mask_to_patch_mask
carry padding information through the frontend (reference
avex/data/audio_utils.py:187-341); a transposed patch order or an any-vs-all
pooling slip silently corrupts attention masks. These tests run the actual
reference functions (torchaudio/avex.configs stubbed) as the oracle.
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
    spec = importlib.util.spec_from_file_location("_ref_audio_utils", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_waveform_to_frame_mask_matches(ref_audio_utils, rng):
    from avex_tpu.ops.audio import waveform_to_frame_mask

    for n, hop in ((1600, 160), (1601, 160), (999, 100)):
        mask = rng.random((3, n)) > 0.6
        expected = ref_audio_utils.waveform_to_frame_mask(
            torch.from_numpy(mask), hop_length=hop
        ).numpy()
        ours = np.asarray(waveform_to_frame_mask(mask, hop))
        np.testing.assert_array_equal(ours, expected)


def test_sync_crop_or_pad_time_matches(ref_audio_utils, rng):
    from avex_tpu.ops.audio import sync_crop_or_pad_time

    for t, target in ((100, 80), (80, 100), (64, 64)):
        spec = rng.standard_normal((2, t, 8)).astype(np.float32)
        mask = rng.random((2, t)) > 0.5
        exp_spec, exp_mask = ref_audio_utils.sync_crop_or_pad_time(
            torch.from_numpy(spec), torch.from_numpy(mask), target
        )
        got_spec, got_mask = sync_crop_or_pad_time(spec, mask, target)
        np.testing.assert_allclose(np.asarray(got_spec), exp_spec.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_mask), exp_mask.numpy())


def test_frame_mask_to_patch_mask_matches(ref_audio_utils, rng):
    from avex_tpu.ops.audio import frame_mask_to_patch_mask

    for t_frames, patch, n_freq in ((64, 16, 128), (32, 16, 64), (48, 16, 128)):
        mask = rng.random((2, t_frames)) > 0.4
        expected = ref_audio_utils.frame_mask_to_patch_mask(
            torch.from_numpy(mask), patch_size_time=patch, n_freq_bins=n_freq
        ).numpy()
        ours = np.asarray(frame_mask_to_patch_mask(mask, patch, n_freq))
        np.testing.assert_array_equal(ours, expected)


def test_pad_or_window_center_matches(ref_audio_utils, rng):
    """Deterministic (center) crop/pad parity incl. the inverted mask."""
    from avex_tpu.ops.audio import pad_or_window_np

    for n, target in ((1000, 600), (400, 600), (600, 600)):
        wav = rng.standard_normal(n).astype(np.float32)
        exp_wav, exp_mask = ref_audio_utils.pad_or_window(
            torch.from_numpy(wav), target, window_selection="center"
        )
        got_wav, got_mask = pad_or_window_np(wav, target, "center")
        np.testing.assert_allclose(got_wav, exp_wav.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(got_mask, exp_mask.numpy())
