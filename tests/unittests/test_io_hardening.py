"""Fault-injection tests: IO retry/backoff, cache revalidation, NaN guards.

Mirror of the reference's robustness layer (utils.py:32-177 retry+versioned
cache, cloudpathlib_retry_patch.py, training_strategies.py:74-106 debug
guards).
"""

import json
import time
from pathlib import Path

import numpy as np
import pytest

import avex_tpu.io as aio


class FlakyFS:
    """fsspec-like filesystem that fails the first ``failures`` opens."""

    def __init__(self, payload: bytes, failures: int = 2, token: str = "v1"):
        self.payload = payload
        self.failures = failures
        self.token = token
        self.open_calls = 0
        self.info_calls = 0

    def open(self, path, mode="rb"):
        self.open_calls += 1
        if self.open_calls <= self.failures:
            raise OSError(f"transient failure #{self.open_calls}")
        import io

        return io.BytesIO(self.payload)

    def info(self, path):
        self.info_calls += 1
        return {"etag": self.token, "size": len(self.payload)}

    def exists(self, path):
        return True


@pytest.fixture(autouse=True)
def _fast_sleep(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)


@pytest.fixture
def cache_home(tmp_path, monkeypatch):
    monkeypatch.setenv("ESP_CACHE_HOME", str(tmp_path / "cache"))
    return tmp_path


def test_retry_recovers_from_transient_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("boom")
        return "ok"

    assert aio.retry(flaky, attempts=3) == "ok"
    assert len(calls) == 3


def test_retry_reraises_after_exhaustion():
    def always_fails():
        raise TimeoutError("dead")

    with pytest.raises(TimeoutError, match="dead"):
        aio.retry(always_fails, attempts=2)


def test_cached_download_retries_flaky_remote(cache_home, monkeypatch):
    fs = FlakyFS(b"checkpoint-bytes", failures=2)
    monkeypatch.setattr(aio, "filesystem_from_path", lambda p: (fs, p))
    local = aio.cached_download("gs://bucket/model.safetensors")
    assert Path(local).read_bytes() == b"checkpoint-bytes"
    assert fs.open_calls == 3  # two failures + one success
    # no half-baked temp files left behind
    assert not list(Path(local).parent.glob("*.tmp.*"))


def test_cached_download_revalidates_version_token(cache_home, monkeypatch):
    fs = FlakyFS(b"v1-bytes", failures=0, token="etag-1")
    monkeypatch.setattr(aio, "filesystem_from_path", lambda p: (fs, p))
    monkeypatch.setenv("ESP_CACHE_VALIDATE_TTL_SECONDS", "0")  # validate every hit
    local = aio.cached_download("gs://bucket/blob.bin")
    assert Path(local).read_bytes() == b"v1-bytes"

    # same token -> cache hit, no re-download
    opens_before = fs.open_calls
    assert aio.cached_download("gs://bucket/blob.bin") == local
    assert fs.open_calls == opens_before

    # remote changed -> token mismatch -> re-fetch
    fs.payload = b"v2-bytes"
    fs.token = "etag-2"
    assert Path(aio.cached_download("gs://bucket/blob.bin")).read_bytes() == b"v2-bytes"
    assert fs.open_calls == opens_before + 1


def test_cached_download_validation_disabled(cache_home, monkeypatch):
    fs = FlakyFS(b"v1", failures=0, token="t1")
    monkeypatch.setattr(aio, "filesystem_from_path", lambda p: (fs, p))
    monkeypatch.setenv("ESP_CACHE_VALIDATE_TTL_SECONDS", "-1")
    aio.cached_download("gs://bucket/x.bin")
    info_calls_after_fetch = fs.info_calls
    aio.cached_download("gs://bucket/x.bin")  # hit without remote stat
    assert fs.info_calls == info_calls_after_fetch


def test_cached_download_ttl_expiry_refetches(cache_home, monkeypatch):
    fs = FlakyFS(b"old", failures=0)
    monkeypatch.setattr(aio, "filesystem_from_path", lambda p: (fs, p))
    local = aio.cached_download("gs://bucket/ttl.bin", ttl_seconds=100)
    meta = Path(local).with_suffix(".bin.meta.json")
    # backdate the fetch
    payload = json.loads(meta.read_text())
    payload["fetched_at"] = time.time() - 1000
    meta.write_text(json.dumps(payload))
    fs.payload = b"new"
    local2 = aio.cached_download("gs://bucket/ttl.bin", ttl_seconds=100)
    assert Path(local2).read_bytes() == b"new"


def test_nan_guard_warns_on_poisoned_batch(caplog):
    """A batch that produces NaN outputs must log the debug guard warning."""
    import logging

    from avex_tpu.training.metrics_tracker import MetricsTracker

    tracker = MetricsTracker(mode="supervised", metric_names=["accuracy"], num_classes=2)
    logits = np.array([[1.0, np.nan], [0.5, 0.2]], np.float32)
    with caplog.at_level(logging.WARNING, logger="avex_tpu.training.metrics_tracker"):
        tracker.update(
            np.float32(np.nan),
            {
                "logits": logits,
                "correct": np.int32(1),
                "count": np.int32(2),
                "nonfinite_logits": np.int32(1),
            },
            labels=np.array([0, 1]),
        )
    messages = " ".join(r.message for r in caplog.records)
    assert "Non-finite loss" in messages
    assert "non-finite values in model outputs" in messages


def test_nan_guard_end_to_end_through_strategy(caplog):
    """NaN audio → strategy forward → tracker warning (full wiring)."""
    import logging

    import jax
    import jax.numpy as jnp

    from avex_tpu.training.metrics_tracker import MetricsTracker
    from avex_tpu.training.strategies import make_strategy

    class TinyModule:
        def apply(self, variables, x, padding_mask=None, rngs=None, **kwargs):
            return x[:, :2] * variables["params"]["w"], {}

    strategy = make_strategy("supervised", "cross_entropy", False)
    batch = {
        "raw_wav": jnp.asarray([[np.nan, 1.0, 0.0], [1.0, 2.0, 0.0]], jnp.float32),
        "label": jnp.asarray([0, 1]),
    }

    def apply_fn(variables, wav, padding_mask=None, rngs=None, **kwargs):
        return wav[:, :2] * variables["params"]["w"]

    loss, metrics = strategy.forward_loss(
        apply_fn, {"w": jnp.float32(1.0)}, {}, batch, None, train=False
    )
    assert int(metrics["nonfinite_logits"]) == 1
    tracker = MetricsTracker(mode="supervised")
    with caplog.at_level(logging.WARNING, logger="avex_tpu.training.metrics_tracker"):
        tracker.update(loss, metrics, labels=np.array([0, 1]))
    assert any("non-finite" in r.message for r in caplog.records)


def test_checkpoint_manager_remote_paths(monkeypatch, tmp_path):
    """CheckpointManager accepts cloud URIs: path joining stays URI-style and
    metadata goes through the io layer (orbax/tensorstore handles the heavy
    payload; stubbed here — no egress)."""
    from avex_tpu.training import checkpoint as ckpt_mod

    written = {}
    removed = []
    monkeypatch.setattr(
        "avex_tpu.io.write_text", lambda p, t: written.setdefault(p, t)
    )
    monkeypatch.setattr("avex_tpu.io.rm", lambda p, recursive=False: removed.append(p))
    monkeypatch.setattr("avex_tpu.io.exists", lambda p: p in written)
    monkeypatch.setattr(
        "avex_tpu.io.read_text", lambda p: written[p]
    )

    class StubCheckpointer:
        def __init__(self):
            self.saved = {}

        def save(self, path, payload):
            self.saved[str(path)] = payload

        def wait_until_finished(self):
            pass

        def restore(self, path, template=None):
            return dict(self.saved[str(path)])

    manager = ckpt_mod.CheckpointManager("gs://bucket/run1/")
    manager._checkpointer = StubCheckpointer()
    assert manager._remote
    assert manager._path("best_model") == "gs://bucket/run1/best_model"

    path = manager.save_best(params={"w": np.ones(2, np.float32)}, step=3, epoch=1)
    assert path == "gs://bucket/run1/best_model"
    assert "gs://bucket/run1/best_model.meta.json" in written
    meta = json.loads(written["gs://bucket/run1/best_model.meta.json"])
    assert meta["step"] == 3 and meta["epoch"] == 1

    payload = manager.load("gs://bucket/run1/best_model")
    assert payload["step"] == 3
    np.testing.assert_array_equal(payload["params"]["w"], np.ones(2, np.float32))


def test_retry_env_zero_still_runs_once(monkeypatch):
    """AVEX_IO_RETRIES=0 means 'no retries', not 'never run'."""
    monkeypatch.setenv("AVEX_IO_RETRIES", "0")
    assert aio.retry(lambda: "ran") == "ran"
    with pytest.raises(OSError):
        aio.retry(lambda: (_ for _ in ()).throw(OSError("x")))
