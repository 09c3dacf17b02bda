"""Windowed long-file inference utilities."""

import numpy as np
import pytest

from avex_tpu.ops.windowing import window_waveform, windowed_apply


def test_window_short_clip_pads():
    wav = np.ones(100, np.float32)
    windows, offsets = window_waveform(wav, 160)
    assert windows.shape == (1, 160)
    assert windows[0, :100].sum() == 100 and windows[0, 100:].sum() == 0
    np.testing.assert_array_equal(offsets, [0])


def test_window_hop_and_tail():
    wav = np.arange(1000, dtype=np.float32)
    windows, offsets = window_waveform(wav, 400, hop_samples=300)
    # starts: 0, 300, 600 then the tail window at 600? last full start = 600;
    # tail 600+400=1000 == len -> no extra window.
    np.testing.assert_array_equal(offsets, [0, 300, 600])
    np.testing.assert_allclose(windows[1][0], 300.0)

    windows, offsets = window_waveform(np.arange(1100, dtype=np.float32), 400, 300)
    # tail partial -> hop-aligned zero-padded window at 900 (not an
    # overlapping window at len-400).
    np.testing.assert_array_equal(offsets, [0, 300, 600, 900])
    np.testing.assert_allclose(windows[-1][:200], np.arange(900, 1100, dtype=np.float32))
    assert windows[-1][200:].sum() == 0

    # pad_final=False drops the partial tail.
    windows, offsets = window_waveform(np.arange(1100, dtype=np.float32), 400, 300, pad_final=False)
    np.testing.assert_array_equal(offsets, [0, 300, 600])


def test_windowed_apply_fixed_batch_shapes():
    seen_shapes = []

    def fn(chunk):
        seen_shapes.append(chunk.shape)
        return chunk.mean(axis=1, keepdims=True)

    wav = np.random.default_rng(0).standard_normal(16000 * 7).astype(np.float32)
    out, offsets = windowed_apply(fn, wav, window_samples=16000, batch_size=4)
    assert out.shape[0] == len(offsets) == 7
    # every call uses the same static batch shape (one jit cache entry)
    assert set(seen_shapes) == {(4, 16000)}


def test_windowed_apply_with_model(rng):
    import avex_tpu
    from avex_tpu.configs import ModelSpec

    model = avex_tpu.build_model_from_spec(
        ModelSpec(name="beats", pretrained=False, init_config={
            "encoder_layers": 1, "encoder_embed_dim": 32, "encoder_ffn_embed_dim": 48,
            "encoder_attention_heads": 4, "embed_dim": 32, "dropout": 0.0,
            "attention_dropout": 0.0, "encoder_layerdrop": 0.0}),
        num_classes=None, return_features_only=True)
    model.register_hooks_for_layers(["last_layer"])
    long_wav = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    emb, offsets = windowed_apply(
        lambda chunk: model.extract_embeddings(chunk, aggregation="mean"),
        long_wav, window_samples=16000, batch_size=2,
    )
    assert emb.shape == (3, 32)


def test_gapped_sampling_hop_larger_than_window():
    """hop > window (gapped sampling): no crash, no tail window past the end
    (round-2 review finding: the hop-aligned tail could land beyond len)."""
    wav = np.arange(90000, dtype=np.float32)
    windows, offsets = window_waveform(wav, 16000, hop_samples=32000)
    np.testing.assert_array_equal(offsets, [0, 32000, 64000])
    assert windows.shape == (3, 16000)
