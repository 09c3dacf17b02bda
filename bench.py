"""Headline benchmark: BEATs embedding-extraction throughput (clips/sec/chip).

Measures the north-star metric from BASELINE.json: full-size (12-layer, 768-d)
BEATs forward over 5s @ 16 kHz clips on one TPU chip.

Variants reported in the single JSON line:
  - value / vs_baseline: fp32 params, HIGHEST-precision frontend (the exact
    numeric configuration the parity/fingerprint tests validate) at the
    default batch — the apples-to-apples headline.
  - bf16_clips_per_sec: bfloat16 compute dtype (frontend stays fp32-pinned).
  - sweep: clips/sec at additional batch sizes (AVEX_BENCH_SWEEP, comma list).
  - mfu_pct / bf16_mfu_pct: model FLOP utilization from XLA's own
    cost-analysis FLOP count against the chip's peak (AVEX_TPU_PEAK_TFLOPS,
    default 197 = v5e bf16 peak; fp32 MFU uses the same denominator, i.e. a
    lower bound).
  - wav_loader_clips_per_sec: WAV files on disk through the multi-worker
    loader (decode + collate) — the "is the loader the bottleneck?" number;
    loader_bound flags when it falls below device throughput. (A combined
    number is meaningless on the remote-TPU tunnel used here: per-batch
    transfers are RPC-transport-bound in a way no real TPU host is.)

The CPU baseline is the reference torch implementation measured on this host
(override with AVEX_CPU_BASELINE to skip the torch run).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N, ...}
"""

import json
import os
import sys
import time

import numpy as np

CLIP_SECONDS = 5
SR = 16000


def _make_model(dtype_name: str):
    import jax.numpy as jnp

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    cfg = BEATsConfig(
        dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0
    )
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    return BEATsBackbone(cfg=cfg, dtype=dtype)


def _measure_tpu(batch_size: int, dtype_name: str = "float32", iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    model = _make_model(dtype_name)
    rng = np.random.default_rng(0)
    # Init on the host CPU backend: the init program embeds the fbank
    # constants and degraded tunnel instances reject large compile bodies;
    # the forward program receives them as runtime inputs (~0.6 MB).
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, CLIP_SECONDS * SR), jnp.float32)
        )
    variables = jax.device_put(variables, jax.devices()[0])

    # The iteration loop runs ON DEVICE (lax.scan over pre-staged batches,
    # one dispatch + one scalar fetch): this measures model throughput, not
    # the host↔device transport — the per-call RPC of the remote-TPU tunnel
    # used here adds ~40 ms/call that doesn't exist on a local TPU host.
    # (block_until_ready is also unreliable through that tunnel; the scalar
    # float() fetch is the sync.)
    def scan_forward(v, batches):
        def body(carry, wav):
            feats, _ = model.apply(v, wav)
            return carry + feats.astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), batches)
        return total

    stacked = jnp.asarray(
        (rng.standard_normal((iters, batch_size, CLIP_SECONDS * SR)) * 0.1).astype(np.float32)
    )
    compiled = jax.jit(scan_forward).lower(variables, stacked).compile()
    # FLOPs from XLA's own cost model — measured on a single un-scanned
    # forward (XLA's analysis counts a while/scan body once, not ×trip-count)
    # and scaled by iters.
    flops_per_run = None
    try:
        single = (
            jax.jit(lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean())
            .lower(variables, stacked[0])
            .compile()
        )
        cost = single.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        flops_per_run = flops * iters if flops > 0 else None
    except Exception:
        pass

    float(compiled(variables, stacked))  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, stacked))
        best = min(best, time.perf_counter() - t0)
    out = {
        "clips_per_sec": batch_size * iters / best,
        "batch_size": batch_size,
        "iters": iters,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if flops_per_run:
        peak = float(os.environ.get("AVEX_TPU_PEAK_TFLOPS", "197")) * 1e12
        out["mfu_pct"] = 100.0 * (flops_per_run / best) / peak
        out["tflops_per_sec"] = flops_per_run / best / 1e12
    return out


def _measure_wav_loader(batch_size: int, num_batches: int = 8, num_workers: int = -1) -> dict:
    """WAV files on disk → multi-worker loader → host batches (no device).

    The loader-side half of the pipeline: decode + resample + collate
    throughput. Loader clips/s must exceed device clips/s for the device to
    stay fed; the combined number on this host is transport-bound (the
    remote-TPU tunnel moves ~41 MB/batch over RPC), so loader and device
    throughputs are reported separately.
    """
    import csv
    import tempfile
    from pathlib import Path

    from scipy.io import wavfile

    from avex_tpu.configs import DatasetConfig
    from avex_tpu.data import Collater, DataLoader
    from avex_tpu.data.dataset import LocalAudioDataset

    root = Path(tempfile.mkdtemp(prefix="avex_bench_wav_"))
    rng = np.random.default_rng(0)
    n_clips = batch_size * num_batches
    rows = []
    for i in range(n_clips):
        wav = (rng.standard_normal(CLIP_SECONDS * SR) * 0.1 * 32767).astype(np.int16)
        wavfile.write(root / f"clip_{i}.wav", SR, wav)
        rows.append({"path": f"clip_{i}.wav", "label": f"c{i % 4}"})
    with open(root / "metadata.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["path", "label"])
        writer.writeheader()
        writer.writerows(rows)

    if num_workers < 0:
        # Workers only help with spare cores (the dev host here has ONE core,
        # where any pool is pure overhead; real TPU hosts have dozens).
        cores = os.cpu_count() or 1
        num_workers = 0 if cores <= 2 else min(8, cores - 2)
    dataset = LocalAudioDataset(
        DatasetConfig(name="bench", kind="local", path=str(root), num_classes=4)
    )
    collate = Collater(target_len=CLIP_SECONDS * SR, num_classes=4, train=False)
    loader = DataLoader(
        dataset, batch_size=batch_size, collate_fn=collate, shuffle=False,
        drop_last=True, num_workers=num_workers,
    )

    list(loader)  # warm the page cache
    t0 = time.perf_counter()
    count = sum(batch["raw_wav"].shape[0] for batch in loader)
    elapsed = time.perf_counter() - t0
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return {"clips_per_sec": count / elapsed, "clips": count, "num_workers": num_workers, "host_cores": os.cpu_count()}


def _measure_cpu_reference(batch_size: int = 4, iters: int = 3) -> float:
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
        wav = torch.randn(batch_size, CLIP_SECONDS * SR) * 0.1
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
    # Wall-clock budget: optional phases (bf16, sweep, wav loader) are skipped
    # once exceeded so the headline JSON line always lands — cold compiles
    # through the remote-TPU tunnel can take minutes each.
    budget_s = float(os.environ.get("AVEX_BENCH_BUDGET_S", "420"))
    t_start = time.perf_counter()

    def in_budget() -> bool:
        return time.perf_counter() - t_start < budget_s

    try:
        f32 = _measure_tpu(batch_size=batch, dtype_name="float32")
    except Exception as first_err:
        # One retry after a pause: the remote-TPU tunnel intermittently
        # degrades (hangs / HTTP 413 from the compile proxy) and recovers.
        print(f"# fp32 measure failed ({first_err}); retrying in 60s", file=sys.stderr)
        time.sleep(60)
        try:
            f32 = _measure_tpu(batch_size=batch, dtype_name="float32")
        except Exception as err:
            # Emit a parseable line so the driver records the cause instead
            # of an empty file; value null marks "not measured", not zero.
            print(json.dumps({
                "metric": "beats_embedding_extraction_5s16k",
                "value": None,
                "unit": "clips/sec/chip",
                "vs_baseline": None,
                "error": f"TPU unavailable: {err}"[:300],
            }))
            return
    result = {
        "metric": "beats_embedding_extraction_5s16k",
        "value": round(f32["clips_per_sec"], 2),
        "unit": "clips/sec/chip",
        "batch_size": f32["batch_size"],
        "backend": f32["backend"],
        "device": f32["device"],
    }
    if "mfu_pct" in f32:
        result["mfu_pct"] = round(f32["mfu_pct"], 2)
        result["tflops_per_sec"] = round(f32["tflops_per_sec"], 2)

    if os.environ.get("AVEX_BENCH_BF16", "1") == "1" and in_budget():
        bf16 = _measure_tpu(batch_size=batch, dtype_name="bfloat16")
        result["bf16_clips_per_sec"] = round(bf16["clips_per_sec"], 2)
        if "mfu_pct" in bf16:
            result["bf16_mfu_pct"] = round(bf16["mfu_pct"], 2)

    sweep = os.environ.get("AVEX_BENCH_SWEEP", "256")
    if sweep and in_budget():
        result["sweep"] = {}
        for b in (int(x) for x in sweep.split(",") if x.strip()):
            if b != batch and in_budget():
                result["sweep"][str(b)] = round(
                    _measure_tpu(batch_size=b, dtype_name="float32", iters=6)["clips_per_sec"], 2
                )

    if os.environ.get("AVEX_BENCH_WAV", "1") == "1" and in_budget():
        try:
            wav = _measure_wav_loader(batch_size=batch)
            result["wav_loader_clips_per_sec"] = round(wav["clips_per_sec"], 2)
            result["loader_bound"] = wav["clips_per_sec"] < f32["clips_per_sec"]
            result["loader_workers"] = wav["num_workers"]
            result["host_cores"] = wav["host_cores"]
        except Exception as err:  # pragma: no cover
            print(f"# wav loader bench failed: {err}", file=sys.stderr)

    cpu_clips_per_sec = _measure_cpu_reference()
    result["cpu_reference_clips_per_sec"] = round(cpu_clips_per_sec, 2)
    result["vs_baseline"] = round(f32["clips_per_sec"] / cpu_clips_per_sec, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
