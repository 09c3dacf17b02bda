#!/usr/bin/env python
"""Quickstart: load a model, classify a clip, extract layer-wise embeddings.

Counterpart of the reference's README quickstart. Works offline with random
weights (`random_weights=True`); with network access the official safetensors
load automatically.
"""

import numpy as np

import avex_tpu

# 1. Browse the registry (10 official ESP-AVES2 models pre-registered).
avex_tpu.list_models()

# 2. Load the flagship BEATs model (random weights when offline).
model = avex_tpu.load_model("esp_aves2_sl_beats_all", random_weights=True)

# 3. Classify a 5-second clip.
wav = (np.random.default_rng(0).standard_normal((1, 80000)) * 0.05).astype(np.float32)
features = model(wav)
print("frame features:", features.shape)

# 4. Layer-wise embedding extraction (the transfer-learning workhorse).
model.register_hooks_for_layers(["all"])
embeddings = model.extract_embeddings(wav, aggregation="mean")
print("concat of 13 layers' pooled embeddings:", embeddings.shape)

# 5. Attach a probe.
from avex_tpu.configs import ProbeConfig
from avex_tpu.probes import build_probe_from_config

probe = build_probe_from_config(
    ProbeConfig(probe_type="attention", target_layers=["all"], aggregation="none",
                num_heads=8, num_layers=2),
    num_classes=10,
    base_model=model,
)
print("probe logits:", probe(wav).shape)
