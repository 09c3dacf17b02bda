"""Headline benchmark: BEATs embedding-extraction throughput (clips/sec/chip).

Measures the north-star metric from BASELINE.json: full-size (12-layer, 768-d)
BEATs forward over 5s @ 16 kHz clips on one TPU chip, in the parity-safe
numeric configuration (fp32 params, HIGHEST-precision frontend — the same
path the fingerprint tests validate). The CPU baseline is the reference torch
implementation measured on this host (override with AVEX_CPU_BASELINE to skip
the torch run).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def _measure_tpu(batch_size: int = 128, clip_seconds: int = 5, iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    cfg = BEATsConfig(
        dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0
    )
    model = BEATsBackbone(cfg=cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, clip_seconds * 16000), jnp.float32),
    )

    # The iteration loop runs ON DEVICE (lax.scan over pre-staged batches,
    # one dispatch + one scalar fetch): this measures model throughput, not
    # the host↔device transport — the per-call RPC of the remote-TPU tunnel
    # used here adds ~40 ms/call that doesn't exist on a local TPU host.
    # (block_until_ready is also unreliable through that tunnel; the scalar
    # float() fetch is the sync.)
    @jax.jit
    def scan_forward(v, batches):
        def body(carry, wav):
            feats, _ = model.apply(v, wav)
            return carry + feats.mean(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), batches)
        return total

    n = batch_size
    stacked = jnp.asarray(
        (rng.standard_normal((iters, n, clip_seconds * 16000)) * 0.1).astype(np.float32)
    )
    float(scan_forward(variables, stacked))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan_forward(variables, stacked))
        best = min(best, time.perf_counter() - t0)
    clips_per_sec = n * iters / best
    return {
        "clips_per_sec": clips_per_sec,
        "batch_size": n,
        "iters": iters,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def _measure_cpu_reference(batch_size: int = 4, clip_seconds: int = 5, iters: int = 3) -> float:
    """Reference torch BEATs on host CPU (the baseline we must beat 10x)."""
    env = os.environ.get("AVEX_CPU_BASELINE")
    if env:
        return float(env)
    try:
        import torch

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.utils.reference_oracle import load_reference_beats

        ref = load_reference_beats()
        cfg = ref.beats.BEATsConfig(
            dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0
        )
        torch.manual_seed(0)
        model = ref.beats.BEATs(cfg).eval()
        wav = torch.randn(batch_size, clip_seconds * 16000) * 0.1
        with torch.no_grad():
            model(wav, disable_layerdrop=True)  # warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                model(wav, disable_layerdrop=True)
            elapsed = time.perf_counter() - t0
        return batch_size * iters / elapsed
    except Exception as err:  # pragma: no cover
        print(f"# cpu baseline measurement failed ({err}); using recorded 2.0", file=sys.stderr)
        return 2.0


def main() -> None:
    batch = int(os.environ.get("AVEX_BENCH_BATCH", "128"))
    tpu = _measure_tpu(batch_size=batch)
    cpu_clips_per_sec = _measure_cpu_reference()
    result = {
        "metric": "beats_embedding_extraction_5s16k",
        "value": round(tpu["clips_per_sec"], 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(tpu["clips_per_sec"] / cpu_clips_per_sec, 2),
        "cpu_reference_clips_per_sec": round(cpu_clips_per_sec, 2),
        "batch_size": tpu["batch_size"],
        "backend": tpu["backend"],
        "device": tpu["device"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
