#!/usr/bin/env python
"""Regenerate model output fingerprints for the regression test.

Counterpart of the reference's
scripts/regenerate_official_model_output_fingerprints.py: runs each
registered model on the deterministic fingerprint batch and prints the
profile-keyed SHA-256 table to paste into tests/fixtures/fingerprints.json.
"""

import json

import numpy as np

import avex_tpu
from avex_tpu.utils.fingerprints import fingerprint, numerics_profile


def deterministic_batch(seconds: float = 1.0, sr: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(1234)
    return (rng.standard_normal((2, int(seconds * sr))) * 0.1).astype(np.float32)


def main() -> None:
    profile = numerics_profile()
    table = {}
    wav = deterministic_batch()
    for name, arch in [("tiny_beats", "beats")]:
        model = avex_tpu.build_model_from_spec(
            avex_tpu.get_model_spec("esp_aves2_sl_beats_all").model_copy(
                update={"pretrained": False}
            ),
            num_classes=None,
            return_features_only=True,
            seed=0,
        )
        pooled = np.asarray(model(wav)).mean(axis=1)
        table[f"esp_aves2_sl_beats_all(random-init)"] = {profile: fingerprint(pooled)}
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
