#!/usr/bin/env python
"""Regenerate model output fingerprints for the regression test.

Counterpart of the reference's
scripts/regenerate_official_model_output_fingerprints.py: runs each
pinned fingerprint workload (tests/integration/test_output_fingerprints.py)
on the deterministic batch and prints the profile-keyed SHA-256 table to
paste into tests/fixtures/fingerprints.json.

Forces the CPU backend with the same virtual-device setup as the test
suite's conftest so the emitted hashes match the profile pytest runs under.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.utils.fingerprints import fingerprint, numerics_profile


def deterministic_batch(seconds: float = 1.0, sr: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(1234)
    return (rng.standard_normal((2, int(seconds * sr))) * 0.1).astype(np.float32)


def main() -> None:
    profile = numerics_profile()
    table = {}
    wav = deterministic_batch()

    spec = ModelSpec(name="beats", pretrained=False, init_config={
        "encoder_layers": 2, "encoder_embed_dim": 64, "encoder_ffn_embed_dim": 96,
        "encoder_attention_heads": 4, "embed_dim": 32, "dropout": 0.0,
        "attention_dropout": 0.0, "encoder_layerdrop": 0.0})
    model = avex_tpu.build_model_from_spec(
        spec, num_classes=None, return_features_only=True, seed=0
    )
    pooled = np.asarray(model(wav)).mean(axis=1)
    table["tiny_beats_random_init"] = {profile: fingerprint(pooled)}

    from avex_tpu.ops.fbank import beats_fbank

    fb = np.asarray(beats_fbank(wav))
    table["beats_fbank"] = {profile: fingerprint(fb)}

    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
