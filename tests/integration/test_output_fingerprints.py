"""Output fingerprint regression (≈ reference
tests/integration/test_official_models_output_regression.py:22-71).

Fingerprints pin the SHA-256 of 4-decimal-rounded outputs on a deterministic
batch, keyed by the jax numerics profile. The official-checkpoint variants of
these tests activate once the published safetensors are reachable; until
then deterministic random-init weights pin our own reproducibility across
rounds. Regenerate with scripts/regenerate_fingerprints.py after intended
numerics changes.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.utils.fingerprints import fingerprint, numerics_profile

FIXTURES = json.loads(
    (Path(__file__).parent.parent / "fixtures" / "fingerprints.json").read_text()
)


def _det_batch():
    rng = np.random.default_rng(1234)
    return (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)


def _expected(name: str) -> str:
    profiles = FIXTURES[name]
    profile = numerics_profile()
    if profile not in profiles:
        pytest.skip(f"no fingerprint recorded for numerics profile {profile}")
    return profiles[profile]


@pytest.mark.integration
def test_tiny_beats_fingerprint():
    spec = ModelSpec(name="beats", pretrained=False, init_config={
        "encoder_layers": 2, "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 96,
        "encoder_attention_heads": 4, "embed_dim": 32, "dropout": 0.0,
        "attention_dropout": 0.0, "encoder_layerdrop": 0.0})
    model = avex_tpu.build_model_from_spec(
        spec, num_classes=None, return_features_only=True, seed=0
    )
    pooled = np.asarray(model(_det_batch())).mean(axis=1)
    assert fingerprint(pooled) == _expected("tiny_beats_random_init")


@pytest.mark.integration
def test_fbank_fingerprint():
    from avex_tpu.ops.fbank import beats_fbank

    fb = np.asarray(beats_fbank(_det_batch()))
    assert fingerprint(fb) == _expected("beats_fbank")
