"""Serving subsystem: micro-batching service + HTTP front end.

avex-tpu addition (the reference has no serving layer). The contract under
test: request timing must never change results — a clip embedded alone, in a
coalesced batch, or through HTTP yields the same row — and compiled shapes
stay inside the power-of-two bucket universe.
"""

import http.client
import io
import json
import threading

import numpy as np
import pytest

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.serving import AvexHTTPServer, InferenceService, ServiceConfig


def _tiny_spec():
    return ModelSpec(
        name="beats",
        pretrained=False,
        init_config={
            "encoder_layers": 1,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4,
            "embed_dim": 32,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "encoder_layerdrop": 0.0,
        },
        audio_config={"representation": "raw", "normalize": False},
    )


@pytest.fixture(scope="module")
def model():
    return avex_tpu.build_model_from_spec(_tiny_spec())


@pytest.fixture()
def clips():
    rng = np.random.default_rng(3)
    return [rng.standard_normal(8000).astype(np.float32) * 0.1 for _ in range(8)]


def _direct_embedding(model, wav, target_len=8000):
    from avex_tpu.ops.audio import pad_or_window_np

    clip, mask = pad_or_window_np(wav, target_len, window_selection="center")
    model.register_hooks_for_layers(["last_layer"])
    return np.asarray(
        model.extract_embeddings(clip[None], padding_mask=mask[None], aggregation="mean")
    )[0]


def test_single_request_matches_direct(model, clips):
    with InferenceService(model, ServiceConfig(clip_seconds=0.5, max_wait_ms=1)) as svc:
        row = svc.infer(clips[0])
    np.testing.assert_allclose(row, _direct_embedding(model, clips[0]), rtol=1e-4, atol=1e-5)
    assert row.ndim == 1 and row.shape[0] == 64


def test_concurrent_requests_coalesce_into_one_batch(model, clips):
    """8 concurrent submits inside the wait window -> ONE bucket-8 dispatch,
    and every caller gets exactly the row of its own clip."""
    config = ServiceConfig(clip_seconds=0.5, max_batch=8, max_wait_ms=500)
    with InferenceService(model, config) as svc:
        futures = [svc.submit(c) for c in clips]
        rows = [f.result(timeout=120) for f in futures]
        stats = svc.info()["stats"]
    assert stats["requests"] == 8
    assert stats["batches"] == 1
    assert stats["bucket_counts"] == {8: 1}
    for clip, row in zip(clips, rows):
        np.testing.assert_allclose(row, _direct_embedding(model, clip), rtol=1e-4, atol=1e-5)


def test_partial_batch_pads_to_bucket(model, clips):
    """3 requests round up to the bucket-4 program; padding rows are masked
    silence and never leak into results."""
    config = ServiceConfig(clip_seconds=0.5, max_batch=8, max_wait_ms=500)
    with InferenceService(model, config) as svc:
        rows = [f.result(timeout=120) for f in [svc.submit(c) for c in clips[:3]]]
        stats = svc.info()["stats"]
    assert stats["bucket_counts"] == {4: 1}
    assert stats["padded_rows"] == 1
    for clip, row in zip(clips[:3], rows):
        np.testing.assert_allclose(row, _direct_embedding(model, clip), rtol=1e-4, atol=1e-5)


def test_submit_resamples_foreign_rates(model):
    """A clip submitted at 8 kHz must match submitting the explicitly
    resampled 16 kHz waveform (shared host resample path)."""
    from avex_tpu._native import resample

    rng = np.random.default_rng(11)
    t = np.arange(4000) / 8000.0
    tone_8k = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(4000)).astype(
        np.float32
    )
    with InferenceService(model, ServiceConfig(clip_seconds=0.5, max_wait_ms=1)) as svc:
        a = svc.infer(tone_8k, sr=8000)
        b = svc.infer(resample(tone_8k, 8000, 16000))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_short_clip_padding_mask_respected(model, clips):
    """A half-length clip is right-padded; its embedding must equal the
    direct masked extraction (not an unmasked zero-padded one)."""
    short = clips[0][:4000]
    with InferenceService(model, ServiceConfig(clip_seconds=0.5, max_wait_ms=1)) as svc:
        row = svc.infer(short)
    np.testing.assert_allclose(row, _direct_embedding(model, short), rtol=1e-4, atol=1e-5)


def test_logits_mode(clips):
    classifier = avex_tpu.build_model_from_spec(_tiny_spec(), num_classes=3)
    with InferenceService(
        classifier, ServiceConfig(clip_seconds=0.5, mode="logits", max_wait_ms=1)
    ) as svc:
        row = svc.infer(clips[0])
    assert row.shape == (3,)


def test_warmup_compiles_expected_buckets(model):
    config = ServiceConfig(clip_seconds=0.5, max_batch=4, max_wait_ms=5)
    with InferenceService(model, config) as svc:
        svc.warmup()
        buckets = set(svc.info()["stats"]["bucket_counts"])
    assert 1 in buckets and 4 in buckets


def test_closed_service_rejects_submissions(model):
    svc = InferenceService(model, ServiceConfig(clip_seconds=0.5))
    svc.close()
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(np.zeros(8000, np.float32))


def test_config_validation():
    with pytest.raises(ValueError, match="max_batch"):
        ServiceConfig(max_batch=0)
    with pytest.raises(ValueError, match="mode"):
        ServiceConfig(mode="classify")


def test_http_roundtrip(model, clips):
    """npy POST, JSON POST with sr, healthz/info, 404, and mode mismatch."""
    config = ServiceConfig(clip_seconds=0.5, max_batch=4, max_wait_ms=5)
    with InferenceService(model, config) as svc, AvexHTTPServer(svc, port=0) as server:
        conn = http.client.HTTPConnection(server.host, server.port, timeout=120)

        buf = io.BytesIO()
        np.save(buf, clips[0])
        conn.request("POST", "/embed", body=buf.getvalue(),
                     headers={"Content-Type": "application/octet-stream"})
        resp = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(
            np.asarray(resp["output"]), _direct_embedding(model, clips[0]),
            rtol=1e-4, atol=1e-5,
        )
        assert resp["shape"] == [64]

        half = clips[1][::2]  # 8 kHz version of a 16 kHz clip
        conn.request("POST", "/embed",
                     body=json.dumps({"wav": half.tolist(), "sr": 8000}))
        assert json.loads(conn.getresponse().read())["shape"] == [64]

        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"

        conn.request("GET", "/info")
        info = json.loads(conn.getresponse().read())
        assert info["mode"] == "embed" and info["sample_rate"] == 16000
        assert info["stats"]["requests"] >= 2

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404

        conn.request("POST", "/logits", body=buf.getvalue())
        assert conn.getresponse().status == 409
        conn.close()


def test_http_concurrent_posts_batch_together(model, clips):
    """Concurrent HTTP clients ride one device batch (the thread pool is the
    producer side of the micro-batcher)."""
    config = ServiceConfig(clip_seconds=0.5, max_batch=4, max_wait_ms=500)
    with InferenceService(model, config) as svc, AvexHTTPServer(svc, port=0) as server:
        results = {}

        def post(i):
            conn = http.client.HTTPConnection(server.host, server.port, timeout=120)
            buf = io.BytesIO()
            np.save(buf, clips[i])
            conn.request("POST", "/embed", body=buf.getvalue())
            results[i] = np.asarray(json.loads(conn.getresponse().read())["output"])
            conn.close()

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        stats = svc.info()["stats"]

    assert len(results) == 4
    for i in range(4):
        np.testing.assert_allclose(
            results[i], _direct_embedding(model, clips[i]), rtol=1e-4, atol=1e-5
        )
    # all four arrived within the wait window -> strictly fewer dispatches
    # than requests (usually exactly one bucket-4 batch)
    assert stats["batches"] < 4


def test_bucket_rounding():
    from avex_tpu.serving.service import _bucket

    assert [_bucket(n, 32) for n in (1, 2, 3, 5, 17, 32)] == [1, 2, 4, 8, 32, 32]
    assert _bucket(9, 12) == 12  # capped at a non-power-of-two max_batch


def test_payload_sniffing(tmp_path):
    """WAV bytes, npy bytes, and JSON bodies all decode to the same tone."""
    from scipy.io import wavfile

    from avex_tpu.serving.http import _decode_payload

    tone = (0.25 * np.sin(2 * np.pi * 330 * np.arange(8000) / 16000)).astype(np.float32)

    wavfile.write(tmp_path / "t.wav", 16000, (tone * 32767).astype(np.int16))
    wav, sr = _decode_payload((tmp_path / "t.wav").read_bytes(), None)
    assert sr == 16000
    np.testing.assert_allclose(wav, tone, atol=2e-4)

    buf = io.BytesIO()
    np.save(buf, tone)
    wav, sr = _decode_payload(buf.getvalue(), 16000)
    assert sr == 16000
    np.testing.assert_array_equal(wav, tone)

    wav, sr = _decode_payload(
        json.dumps({"wav": tone[:16].tolist(), "sr": 8000}).encode(), None
    )
    assert sr == 8000 and wav.shape == (16,)


def test_close_resolves_raced_submissions(model):
    """A submission that lands behind the shutdown sentinel must resolve
    (with an error), never hang its Future forever."""
    from concurrent.futures import Future

    service = InferenceService(model, ServiceConfig(clip_seconds=0.5, max_batch=2))
    try:
        # Enqueue directly behind the sentinel, simulating the close() race
        # (submit() itself refuses once _closed flips).
        clip = np.zeros(8000, np.float32)
        mask = np.ones(8000, bool)
        raced: Future = Future()
        service._queue.put(None)
        service._queue.put((clip, mask, raced))
        with pytest.raises(RuntimeError, match="closed"):
            raced.result(timeout=30)
        service._thread.join(timeout=30)
        assert service._queue.qsize() == 0
    finally:
        service.close()


# ----------------------------------------------------------------------
# Multi-model co-hosting (ServicePool)
# ----------------------------------------------------------------------


def _tiny_spec_48():
    """A second architecture (48-d embeddings) so routing is observable."""
    spec = _tiny_spec()
    spec.init_config["encoder_embed_dim"] = 48
    spec.init_config["encoder_ffn_embed_dim"] = 96
    return spec


@pytest.fixture(scope="module")
def pool_models():
    from avex_tpu.serving import ServicePool

    cfg = ServiceConfig(clip_seconds=0.5, max_batch=4, max_wait_ms=5)
    big = avex_tpu.build_model_from_spec(_tiny_spec())
    small = avex_tpu.build_model_from_spec(_tiny_spec_48())
    pool = ServicePool.from_models({"big": big, "small": small}, config=cfg)
    yield pool, big, small
    pool.close()


def test_pool_routes_to_the_named_model(pool_models):
    """Each pooled model answers with ITS embedding dim — requests never
    cross services — and per-service stats stay isolated."""
    pool, big, small = pool_models
    clip = np.random.default_rng(7).standard_normal(8000).astype(np.float32) * 0.1
    # Relative delta, not an absolute count: the fixture is shared across
    # tests, so the counter's starting value depends on execution order.
    small_before = pool.get("small").info()["stats"]["requests"]
    big_before = pool.get("big").info()["stats"]["requests"]
    row_big = pool.get("big").infer(clip)
    row_small = pool.get("small").infer(clip)
    assert row_big.shape == (64,) and row_small.shape == (48,)
    np.testing.assert_allclose(row_big, _direct_embedding(big, clip), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(row_small, _direct_embedding(small, clip), rtol=1e-4, atol=1e-5)
    assert pool.get("small").info()["stats"]["requests"] == small_before + 1
    assert pool.get("big").info()["stats"]["requests"] == big_before + 1


def test_pool_warmup_forwards_buckets():
    """pool.warmup(buckets=...) compiles the requested bucket in EVERY
    pooled service — a bucket first reached under live traffic compiles
    mid-request (measured as a 55.6 s p99 outlier on the chip,
    docs/serving_bench_r4.jsonl)."""
    from avex_tpu.serving import ServicePool

    cfg = ServiceConfig(clip_seconds=0.5, max_batch=8, max_wait_ms=5)
    pool = ServicePool.from_models(
        {"a": avex_tpu.build_model_from_spec(_tiny_spec())}, config=cfg
    )
    try:
        pool.warmup(buckets=[1, 2, 8])
        buckets = set(pool.get("a").info()["stats"]["bucket_counts"])
        assert {1, 2, 8} <= buckets
    finally:
        pool.close()


def test_pool_contract():
    from avex_tpu.serving import ServicePool

    pool = ServicePool()
    with pytest.raises(RuntimeError, match="empty"):
        _ = pool.default
    with pytest.raises(KeyError, match="unknown model"):
        pool.get("nope")


def test_pool_http_routing(pool_models):
    """/models roster, per-model routes, bare routes = default model, 404
    with the roster for unknown names."""
    pool, big, _small = pool_models
    clip = np.random.default_rng(9).standard_normal(8000).astype(np.float32) * 0.1
    buf = io.BytesIO()
    np.save(buf, clip)
    body = buf.getvalue()

    with AvexHTTPServer(pool, port=0) as server:
        conn = http.client.HTTPConnection(server.host, server.port, timeout=120)

        conn.request("GET", "/models")
        roster = json.loads(conn.getresponse().read())
        assert roster["default"] == "big"
        assert sorted(roster["models"]) == ["big", "small"]

        conn.request("POST", "/models/small/embed", body=body)
        assert json.loads(conn.getresponse().read())["shape"] == [48]

        conn.request("POST", "/models/big/embed", body=body)
        big_resp = json.loads(conn.getresponse().read())
        assert big_resp["shape"] == [64]

        # Bare route serves the default (first-added) model.
        conn.request("POST", "/embed", body=body)
        bare = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(bare["output"], big_resp["output"], rtol=0, atol=0)
        np.testing.assert_allclose(
            np.asarray(bare["output"]), _direct_embedding(big, clip), rtol=1e-4, atol=1e-5
        )

        conn.request("GET", "/models/small/info")
        assert json.loads(conn.getresponse().read())["mode"] == "embed"

        conn.request("POST", "/models/ghost/embed", body=body)
        resp = conn.getresponse()
        assert resp.status == 404
        assert json.loads(resp.read())["models"] == ["big", "small"]
        conn.close()
