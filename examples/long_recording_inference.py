#!/usr/bin/env python
"""Embed a long field recording: native decode → fixed windows → batched TPU.

The efficient TPU answer to "embed a 30-minute soundscape": decode on the
host (native C++ WAV/FLAC), slice into fixed hop/length windows (one static
shape = one jit compilation), and stream window batches through the model.
Works offline with random weights; real checkpoints load automatically when
the network allows.

Usage: python examples/long_recording_inference.py [path/to/recording.{wav,flac}]
"""

import sys

import numpy as np

import avex_tpu
from avex_tpu._native import decode_audio, resample
from avex_tpu.ops.windowing import windowed_apply

SR = 16000

if len(sys.argv) > 1:
    path = sys.argv[1]
    wav, sr = decode_audio(path, mono=True)  # WAV or FLAC, sniffed by magic
    if sr != SR:
        wav = resample(wav, sr, SR)
else:
    # No file given: synthesize a 60-second stand-in recording.
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(60 * SR) * 0.05).astype(np.float32)

print(f"recording: {len(wav) / SR:.1f}s at {SR} Hz")

model = avex_tpu.load_model(
    "esp_aves2_sl_beats_all", random_weights=True, return_features_only=True
)
model.register_hooks_for_layers(["last_layer"])

# 10-second windows, 5-second hop, fixed batch of 8 windows per device call.
embeddings, offsets = windowed_apply(
    lambda chunk: model.extract_embeddings(chunk, aggregation="mean"),
    wav,
    window_samples=10 * SR,
    hop_samples=5 * SR,
    batch_size=8,
)
print(f"{embeddings.shape[0]} windows -> embeddings {embeddings.shape}")
print("window starts (s):", (offsets / SR).round(1).tolist()[:8], "...")
