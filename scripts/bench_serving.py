"""On-chip latency numbers for the serving stack (docs/serving.md claims).

Measures, on the real TPU through the micro-batching InferenceService
(full-size BEATs, bf16, embed mode — the flagship serving shape):

1. ``warmup_s`` — wall-clock of ``warmup()`` (bucket-1 + max-batch compiles),
   the cost a pod pays before its first request.
2. ``lone`` — p50/p99 of a lone request on an idle server. This includes the
   ``max_wait_ms`` coalescing window by design: it is the worst-case latency
   an isolated caller sees, the number `service.py`'s bucket-1 fast-path
   story must back.
3. ``bucket_N`` — p50/p99 per request when exactly N concurrent requests
   arrive together (N in 1/8/32, the compiled bucket universe): the
   coalescing path under load.
4. ``cohost`` — two full BEATs services pooled in one process, two client
   threads interleaving requests at each: per-model p50/p99 vs the solo
   numbers (does co-hosting degrade tail latency?).

Emits one JSON line per measurement (collect into docs/serving_bench_r4.jsonl).
Run AFTER any test suite finishes — contended host timing corrupts p99.
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROUNDS = 30  # batches per bucket measurement
LONE_REQUESTS = 50


def emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def pct(xs, q) -> float:
    return float(np.percentile(np.asarray(xs, np.float64), q))


def one_clip(rng, n: int) -> np.ndarray:
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def timed_request(service, clip) -> float:
    t0 = time.perf_counter()
    service.submit(clip).result()
    return (time.perf_counter() - t0) * 1e3


def measure_bucket(service, clips, n: int, rounds: int) -> dict:
    """p50/p99 per request when exactly n requests arrive concurrently."""
    lat: list = []
    with ThreadPoolExecutor(max_workers=n) as pool:
        for r in range(rounds):
            futs = [pool.submit(timed_request, service, clips[(r + i) % len(clips)]) for i in range(n)]
            lat.extend(f.result() for f in futs)
    return {"p50_ms": round(pct(lat, 50), 2), "p99_ms": round(pct(lat, 99), 2), "n": len(lat)}


def main() -> None:
    import argparse

    from avex_tpu.models.load import load_model
    from avex_tpu.serving import InferenceService, ServiceConfig, ServicePool

    parser = argparse.ArgumentParser()
    parser.add_argument("--cohost-only", action="store_true",
                        help="skip the solo phases (re-run just cohost)")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    cfg = ServiceConfig(clip_seconds=5.0, max_batch=32, max_wait_ms=10.0, mode="embed")
    clips = [one_clip(rng, 80000) for _ in range(64)]

    emit({"phase": "load", "note": "full-size BEATs, random weights (same compute graph)"})
    model = load_model("esp_aves2_sl_beats_all", random_weights=True, return_features_only=True)

    if args.cohost_only:
        _cohost(model, cfg, clips, solo_p99=None)
        return

    service = InferenceService(model, cfg)
    t0 = time.perf_counter()
    service.warmup(buckets=[1, 8, 32])
    warmup_s = time.perf_counter() - t0
    emit({"measurement": "warmup", "seconds": round(warmup_s, 1),
          "buckets_compiled": [1, 8, 32]})

    # Lone-request latency on an idle server (includes the max_wait_ms window).
    lone = [timed_request(service, clips[i % len(clips)]) for i in range(LONE_REQUESTS)]
    emit({"measurement": "lone", "p50_ms": round(pct(lone, 50), 2),
          "p99_ms": round(pct(lone, 99), 2), "max_wait_ms": cfg.max_wait_ms,
          "n": len(lone)})

    # Same drive with max_wait_ms=0: isolates the coalescing window's
    # contribution to lone latency (programs already compiled, so this
    # second service is free to stand up).
    svc0 = InferenceService(model, ServiceConfig(
        clip_seconds=5.0, max_batch=32, max_wait_ms=0.0, mode="embed"))
    lone0 = [timed_request(svc0, clips[i % len(clips)]) for i in range(LONE_REQUESTS)]
    emit({"measurement": "lone_wait0", "p50_ms": round(pct(lone0, 50), 2),
          "p99_ms": round(pct(lone0, 99), 2), "max_wait_ms": 0.0,
          "n": len(lone0)})
    svc0.close()

    # Per-bucket concurrent latency. Also warms buckets 8 (power-of-two round-up).
    solo = {}
    for n in (1, 8, 32):
        res = measure_bucket(service, clips, n, ROUNDS)
        solo[n] = res
        emit({"measurement": f"bucket_{n}", **res,
              "per_clip_throughput": round(n * 1000.0 / res["p50_ms"], 1)})
    stats = service.info()["stats"]
    emit({"measurement": "service_stats", "batches": stats["batches"],
          "requests": stats["requests"], "bucket_counts": stats["bucket_counts"]})
    service.close()

    # Co-hosting: two full BEATs services in one pool, interleaved load.
    _cohost(model, cfg, clips, solo_p99=solo[8]["p99_ms"])


def _cohost(model, cfg, clips, solo_p99) -> None:
    from avex_tpu.models.load import load_model
    from avex_tpu.serving import ServicePool

    emit({"phase": "cohost", "note": "two pooled BEATs, interleaved bucket-8 load"})
    model_b = load_model("esp_aves2_sl_beats_all", random_weights=True,
                         return_features_only=True)
    pool = ServicePool.from_models({"a": model, "b": model_b}, config=cfg)
    # Warm the buckets the load below drives: a bucket first reached under
    # traffic compiles mid-request (measured 55.6 s p99 outlier without this).
    pool.warmup(buckets=[1, 8, 32])
    results = {}
    with ThreadPoolExecutor(max_workers=2) as top:
        fa = top.submit(measure_bucket, pool.get("a"), clips, 8, ROUNDS)
        fb = top.submit(measure_bucket, pool.get("b"), clips, 8, ROUNDS)
        results["a"], results["b"] = fa.result(), fb.result()
    for name, res in results.items():
        row = {"measurement": f"cohost_bucket_8_{name}", **res}
        if solo_p99:
            row["solo_p99_ms"] = solo_p99
            row["p99_vs_solo"] = round(res["p99_ms"] / solo_p99, 2)
        emit(row)
    pool.close()


if __name__ == "__main__":
    main()
