"""Official-checkpoint parity harness — activates on first network access.

The reference pins SHA-256 fingerprints of pooled outputs for all 10 published
models on a deterministic labeled mini-batch
(tests/integration/test_official_models_output_regression.py:29-71) plus
checkpoint checksums (tests/unittests/test_official_models_checksums.py:28-40).
This environment has zero egress (verified: huggingface.co does not resolve),
so the harness is committed network-gated: every piece after the download —
checksum verification, weight conversion, pooled-output comparison against the
reference torch oracle at fingerprint-class tolerances — runs as soon as
``hf://`` is reachable. Run explicitly with:

    pytest tests/integration/test_official_fingerprints_harness.py -m official

The deterministic labeled batch transcribes the reference construction
(_build_labeled_audio_batch: three sine classes 220/440/880 Hz at amplitudes
0.8/0.9 → (6, 16000)).
"""

import hashlib
from pathlib import Path

import numpy as np
import pytest

from avex_tpu.api.official_models import OFFICIAL_MODEL_CHECKSUMS, OFFICIAL_MODELS

pytestmark = pytest.mark.slow

#: reference fingerprint regime: outputs rounded to 4 decimals before hashing,
#: i.e. agreement to ~5e-5 per element. Cross-framework (torch CPU vs XLA) we
#: assert elementwise closeness at the same order instead of hash equality.
POOLED_ATOL = 2e-4
POOLED_RTOL = 1e-4


def _network_available() -> bool:
    import socket

    try:
        socket.getaddrinfo("huggingface.co", 443)
        return True
    except OSError:
        return False


requires_network = pytest.mark.skipif(
    not _network_available(),
    reason="hf:// unreachable (zero-egress environment) — harness activates on first network access",
)


def _labeled_audio_batch() -> np.ndarray:
    """Deterministic labeled mini-batch (reference
    test_official_models_output_regression.py:135-157)."""
    t = np.arange(16000, dtype=np.float32) / 16000.0
    clips = []
    for freq in (220.0, 440.0, 880.0):
        base = np.sin(2.0 * np.pi * freq * t)
        for amplitude in (0.8, 0.9):
            clips.append((amplitude * base).astype(np.float32))
    return np.stack(clips)


def _pooled(output: np.ndarray) -> np.ndarray:
    """Pool model output to (B, D) (reference _pooled_model_output)."""
    out = np.asarray(output, np.float32)
    if out.ndim == 2:
        return out
    if out.ndim == 3:
        return out.mean(axis=1)
    if out.ndim == 4:
        return out.mean(axis=(2, 3))
    raise ValueError(f"unexpected output rank {out.ndim}")


def test_checksum_table_covers_all_official_models():
    """Every official registry entry has a pinned published checksum."""
    assert set(OFFICIAL_MODEL_CHECKSUMS) == set(OFFICIAL_MODELS)


def test_parity_harness_dry_run_exercises_conversion(tmp_path):
    """The one-command harness (scripts/official_parity_harness.py --dry-run)
    exercises everything but the download: synthesized reference-named BEATs
    safetensors → universal_load → converter → forward → fingerprint table,
    checked against the torch oracle at fingerprint tolerance."""
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parents[2] / "scripts"))
    try:
        import official_parity_harness as harness
    finally:
        _sys.path.pop(0)

    rc = harness.main(
        ["--dry-run", "--models", "esp_aves2_sl_beats_all", "--workdir", str(tmp_path)]
    )
    assert rc == 0
    # The synthesized checkpoint actually hit the conversion path.
    assert (tmp_path / "esp_aves2_sl_beats_all.safetensors").exists()


@requires_network
@pytest.mark.parametrize("model_name", sorted(OFFICIAL_MODELS))
def test_official_checkpoint_checksum(model_name):
    """Downloaded safetensors must match the published SHA-256 exactly."""
    from avex_tpu.io import cached_download

    local = cached_download(OFFICIAL_MODELS[model_name]["checkpoint_path"])
    digest = hashlib.sha256(Path(local).read_bytes()).hexdigest()
    assert digest == OFFICIAL_MODEL_CHECKSUMS[model_name]


@requires_network
@pytest.mark.parametrize("model_name", sorted(OFFICIAL_MODELS))
def test_official_model_pooled_outputs_finite_and_stable(model_name):
    """Converted official weights produce finite, deterministic pooled outputs."""
    import avex_tpu

    model = avex_tpu.load_model(model_name, return_features_only=True)
    audio = _labeled_audio_batch()
    pooled = _pooled(model(audio))
    assert np.isfinite(pooled).all()
    pooled2 = _pooled(model(audio))
    np.testing.assert_array_equal(pooled, pooled2)


@requires_network
@pytest.mark.parametrize(
    "model_name",
    ["esp_aves2_sl_beats_all", "esp_aves2_sl_beats_bio", "esp_aves2_naturelm_audio_v1_beats"],
)
def test_official_beats_pooled_parity_vs_torch_oracle(model_name):
    """BEATs: converted jax outputs vs the reference torch model loaded with
    the SAME official weights, at the fingerprint tolerance class.

    (The published fingerprints hash outputs rounded to 4 decimals under
    specific torch versions; elementwise agreement at 2e-4 is the equivalent
    cross-framework gate. The torch-side fingerprint itself is also computed
    and printed so it can be compared with the reference table for the
    installed torch profile.)
    """
    import sys

    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from utils.reference_oracle import load_reference_beats

    import avex_tpu
    from avex_tpu.io import cached_download
    from avex_tpu.utils.loaders import process_state_dict, universal_load

    entry = OFFICIAL_MODELS[model_name]
    local = cached_download(entry["checkpoint_path"])
    state = process_state_dict(universal_load(local))

    # torch oracle with identical weights
    ref = load_reference_beats()
    init = entry["model_spec"]["init_config"]
    cfg = ref.beats.BEATsConfig(
        **{k: v for k, v in init.items() if hasattr(ref.beats.BEATsConfig(), k)}
    )
    oracle = ref.beats.BEATs(cfg).eval()
    torch_state = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    oracle.load_state_dict(torch_state, strict=False)

    audio = _labeled_audio_batch()
    with torch.no_grad():
        ref_out = oracle(torch.from_numpy(audio), disable_layerdrop=True)
        ref_out = ref_out[0] if isinstance(ref_out, tuple) else ref_out
    ref_pooled = _pooled(ref_out.numpy())
    fingerprint = hashlib.sha256(np.round(ref_pooled, 4).tobytes()).hexdigest()
    print(f"{model_name} torch-oracle fingerprint: {fingerprint}")

    model = avex_tpu.load_model(model_name, return_features_only=True)
    ours = _pooled(model(audio))
    np.testing.assert_allclose(ours, ref_pooled, atol=POOLED_ATOL, rtol=POOLED_RTOL)
