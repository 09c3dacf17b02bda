"""Headline benchmark: BEATs embedding-extraction throughput (clips/sec/chip).

Measures the north-star metric from BASELINE.json: full-size (12-layer, 768-d)
BEATs forward over 5s @ 16 kHz clips on one TPU chip.

The single JSON line reports the BEST CORRECT configuration as the headline
(round-2 verdict: the number the rounds are judged on should be the best
correct path, with fp32-parity as a secondary field):

  - value / mfu_pct / vs_baseline: bfloat16 compute (frontend stays
    fp32-pinned exactly like the reference, beats.py:304-323; softmax runs
    in bf16 via the auto `fast_attention` policy) at the default batch.
  - fp32_parity_clips_per_sec / fp32_parity_mfu_pct: the fp32
    HIGHEST-precision configuration the parity/fingerprint tests validate.
  - bf16_fp32_rel_err: relative L2 distance between the two paths' pooled
    768-d embeddings on the same batch — the in-bench proof that the
    headline path stays within fp32 tolerance (observed ~3e-3, the bf16
    representation floor; fingerprint-grade comparisons live in the test
    suite).
  - train_clips_per_sec / train_mfu_pct: full supervised train step
    (527-class AdamW, value_and_grad, donated buffers) in bf16.
  - wav_loader_clips_per_sec: WAV files on disk through the multi-worker
    loader (decode + collate) — host side only; loader_clips_per_sec adds
    the device_put staging hop. On the remote-TPU tunnel used here the
    staging hop is RPC-transport-bound (~41 MB/batch over the wire) in a
    way no real TPU host is; loader_bound flags when the host pipeline
    falls below device throughput.
  - int8_clips_per_sec / int8_mfu_pct / int8_bf16_rel_err: the W8A8
    dynamic-int8 serving mode (avex_tpu.quant) and its quality cost vs the
    headline path. Measured ~0.92x bf16 at B=128 on v5e (XLA runs the s8
    dot at the bf16 rate — see docs/architecture.md); tracked so a
    compiler/hardware generation that doubles the int8 rate gets caught.
    Secondary: int8 is beyond fp32 tolerance, so it never becomes the
    headline.
  - sweep: clips/sec at additional batch sizes (AVEX_BENCH_SWEEP, comma
    list; empty default — the budget is better spent on the train phase).
  - MFU numbers use XLA's own cost-analysis FLOP count against the chip's
    peak (AVEX_TPU_PEAK_TFLOPS, default 197 = v5e bf16 peak; fp32 MFU uses
    the same denominator, i.e. a lower bound).

Every phase after the headline is wrapped so a mid-run tunnel degradation
still lands the one JSON line (with whatever fields completed). The CPU
baseline is the reference torch implementation measured on this host
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
NUM_TRAIN_CLASSES = 527  # AudioSet-sized classifier, the reference's default


def _make_model(dtype_name: str, num_classes=None, quantize: bool = False):
    import jax.numpy as jnp

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig, BEATsModel

    cfg = BEATsConfig(
        dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0,
        quantize_encoder=quantize,
    )
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    if num_classes is not None:
        return BEATsModel(cfg=cfg, num_classes=num_classes, dtype=dtype)
    return BEATsBackbone(cfg=cfg, dtype=dtype)


def _init_on_host(model, example):
    """Init on the host CPU backend: the init program embeds the fbank
    constants and degraded tunnel instances reject large compile bodies;
    compute programs receive them as runtime inputs (~0.6 MB)."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    return jax.device_put(variables, jax.devices()[0])


def _flops_of(compiled) -> float:
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def _peak_flops() -> float:
    return float(os.environ.get("AVEX_TPU_PEAK_TFLOPS", "197")) * 1e12


def _measure_tpu(
    batch_size: int, dtype_name: str = "float32", iters: int = 10, quantize: bool = False
) -> dict:
    import jax
    import jax.numpy as jnp

    model = _make_model(dtype_name, quantize=quantize)
    rng = np.random.default_rng(0)
    if quantize:
        # Init the FLOAT twin (same param tree shape/rng) and fold its weights
        # to int8 on the host — the same conversion Model.quantize() performs,
        # so the int8 pooled output is comparable to the bf16/fp32 phases'.
        from avex_tpu.models.beats import quantize_beats_params

        float_model = _make_model(dtype_name)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(float_model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, CLIP_SECONDS * SR), jnp.float32)
            )
            variables = dict(variables)
            variables["params"] = jax.jit(quantize_beats_params)(variables["params"])
        variables = jax.device_put(variables, jax.devices()[0])
    else:
        variables = _init_on_host(model, jnp.zeros((1, CLIP_SECONDS * SR), jnp.float32))

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
    # and scaled by iters. The same program returns the pooled 768-d
    # embedding for the bf16-vs-fp32 parity field.
    flops_per_run = None
    pooled = None
    try:
        single = (
            jax.jit(lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean(axis=(0, 1)))
            .lower(variables, stacked[0])
            .compile()
        )
        flops = _flops_of(single)
        flops_per_run = flops * iters if flops > 0 else None
        pooled = np.asarray(single(variables, stacked[0]))
    except Exception as err:
        print(f"# cost-analysis/pooled probe failed: {err}", file=sys.stderr)

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
        "pooled": pooled,
    }
    if flops_per_run:
        out["mfu_pct"] = 100.0 * (flops_per_run / best) / _peak_flops()
        out["tflops_per_sec"] = flops_per_run / best / 1e12
    return out


def _measure_train(batch_size: int, dtype_name: str = "bfloat16", iters: int = 6) -> dict:
    """Full supervised train step: forward + backward + AdamW update.

    The reference workload this quantifies is Trainer._run_epoch's hot loop
    (reference train.py:255-338). Buffers are donated (params/opt state
    update in place); the timed loop chains donated outputs so each call
    consumes the previous call's state, and the scan keeps the whole epoch
    slice on device.
    """
    import jax
    import jax.numpy as jnp
    import optax

    model = _make_model(dtype_name, num_classes=NUM_TRAIN_CLASSES)
    rng = np.random.default_rng(1)
    variables = _init_on_host(model, jnp.zeros((1, CLIP_SECONDS * SR), jnp.float32))
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}

    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, wav, labels):
        logits, _aux = model.apply({"params": p, **consts}, wav)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()

    def train_step(p, opt_state, wav, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, wav, labels)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    def train_scan(p, opt_state, wavs, labels):
        def body(carry, xs):
            p, o = carry
            new_p, new_o, loss = train_step(p, o, xs[0], xs[1])
            return (new_p, new_o), loss

        (p, opt_state), losses = jax.lax.scan(body, (p, opt_state), (wavs, labels))
        return p, opt_state, losses.mean()

    wavs = jnp.asarray(
        (rng.standard_normal((iters, batch_size, CLIP_SECONDS * SR)) * 0.1).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, NUM_TRAIN_CLASSES, (iters, batch_size)))

    compiled = jax.jit(train_scan, donate_argnums=(0, 1)).lower(
        params, opt_state, wavs, labels
    ).compile()
    flops_per_run = None
    try:
        single = jax.jit(train_step).lower(params, opt_state, wavs[0], labels[0]).compile()
        flops = _flops_of(single)
        flops_per_run = flops * iters if flops > 0 else None
    except Exception as err:
        print(f"# train cost-analysis failed: {err}", file=sys.stderr)

    p, o, loss = compiled(params, opt_state, wavs, labels)
    float(loss)  # warmup + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p, o, loss = compiled(p, o, wavs, labels)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    out = {
        "clips_per_sec": batch_size * iters / best,
        "batch_size": batch_size,
        "loss": float(loss),
    }
    if flops_per_run:
        out["mfu_pct"] = 100.0 * (flops_per_run / best) / _peak_flops()
        out["tflops_per_sec"] = flops_per_run / best / 1e12
    return out


def _measure_wav_loader(
    batch_size: int, num_batches: int = 8, num_workers: int = -1, device_put: bool = False
) -> dict:
    """WAV files on disk → multi-worker loader → host batches (→ device).

    The loader-side half of the pipeline: decode + resample + collate
    throughput, optionally plus the device_put staging hop
    (``loader_clips_per_sec``). Host loader clips/s must exceed device
    clips/s for the device to stay fed. On this dev host both caveats from
    CLAUDE.md apply: ONE core (workers are pure overhead — real TPU hosts
    have dozens, so host throughput scales ~linearly with cores) and the
    remote-TPU tunnel makes device_put RPC-transport-bound (~41 MB/batch
    over the wire; a local PCIe/ICI host does this at >10 GB/s).
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
    out = {
        "clips_per_sec": count / elapsed,
        "clips": count,
        "num_workers": num_workers,
        "host_cores": os.cpu_count(),
    }
    if device_put:
        import jax

        device = jax.devices()[0]
        t0 = time.perf_counter()
        staged = 0
        for batch in loader:
            x = jax.device_put(np.ascontiguousarray(batch["raw_wav"]), device)
            staged += x.shape[0]
        # Sync: fetch one scalar from the last staged batch.
        float(np.asarray(x)[0, 0])
        out["device_put_clips_per_sec"] = staged / (time.perf_counter() - t0)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return out


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
        return -2.0  # negative magnitude marks "fallback, not measured"


def main() -> None:
    batch = int(os.environ.get("AVEX_BENCH_BATCH", "128"))
    train_batch = int(os.environ.get("AVEX_BENCH_TRAIN_BATCH", "128"))
    # Wall-clock budget: optional phases (train, wav loader, fp32 parity,
    # sweep) are skipped once exceeded so the headline JSON line always
    # lands — cold compiles through the remote-TPU tunnel can take minutes.
    # Phase order is by value: train, then the (cheap, host-only) loader,
    # then fp32 parity. 900 s fits all phases on a healthy tunnel (measured
    # ~15 min total incl. compiles + the cpu reference).
    budget_s = float(os.environ.get("AVEX_BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()

    def in_budget() -> bool:
        return time.perf_counter() - t_start < budget_s

    # ---- headline: bf16 + auto fast_attention (best correct path) --------
    headline = None
    headline_precision = "bfloat16"
    try:
        headline = _measure_tpu(batch_size=batch, dtype_name="bfloat16")
    except Exception as first_err:
        # One retry after a pause: the remote-TPU tunnel intermittently
        # degrades (hangs / HTTP 413 from the compile proxy) and recovers.
        print(f"# bf16 measure failed ({first_err}); retrying in 60s", file=sys.stderr)
        time.sleep(60)
        try:
            headline = _measure_tpu(batch_size=batch, dtype_name="bfloat16")
        except Exception as second_err:
            print(f"# bf16 retry failed ({second_err}); trying fp32", file=sys.stderr)
            try:
                headline = _measure_tpu(batch_size=batch, dtype_name="float32")
                headline_precision = "float32"
            except Exception as err:
                # Emit a parseable line so the driver records the cause
                # instead of an empty file; value null marks "not measured".
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
        "value": round(headline["clips_per_sec"], 2),
        "unit": "clips/sec/chip",
        "precision": headline_precision,
        "batch_size": headline["batch_size"],
        "backend": headline["backend"],
        "device": headline["device"],
    }
    if "mfu_pct" in headline:
        result["mfu_pct"] = round(headline["mfu_pct"], 2)
        result["tflops_per_sec"] = round(headline["tflops_per_sec"], 2)

    # ---- training throughput (bf16 train step, donated buffers) ----------
    if os.environ.get("AVEX_BENCH_TRAIN", "1") == "1" and in_budget():
        try:
            train = _measure_train(batch_size=train_batch)
            result["train_clips_per_sec"] = round(train["clips_per_sec"], 2)
            result["train_batch_size"] = train["batch_size"]
            if "mfu_pct" in train:
                result["train_mfu_pct"] = round(train["mfu_pct"], 2)
                result["train_tflops_per_sec"] = round(train["tflops_per_sec"], 2)
        except Exception as err:
            print(f"# train bench failed: {err}", file=sys.stderr)

    # ---- host data path --------------------------------------------------
    # Host-only and bounded (~90 s) — runs regardless of remaining budget so
    # the loader fields always land; only the optional device_put staging
    # hop (which crosses the tunnel) is budget-gated.
    if os.environ.get("AVEX_BENCH_WAV", "1") == "1":
        try:
            wav = _measure_wav_loader(batch_size=batch, device_put=in_budget())
            result["wav_loader_clips_per_sec"] = round(wav["clips_per_sec"], 2)
            if "device_put_clips_per_sec" in wav:
                result["loader_clips_per_sec"] = round(wav["device_put_clips_per_sec"], 2)
            result["loader_bound"] = wav["clips_per_sec"] < headline["clips_per_sec"]
            result["loader_workers"] = wav["num_workers"]
            result["host_cores"] = wav["host_cores"]
        except Exception as err:  # pragma: no cover
            print(f"# wav loader bench failed: {err}", file=sys.stderr)

    # ---- fp32 parity path (the configuration the parity tests validate) --
    if headline_precision == "bfloat16" and in_budget():
        try:
            f32 = _measure_tpu(batch_size=batch, dtype_name="float32")
            result["fp32_parity_clips_per_sec"] = round(f32["clips_per_sec"], 2)
            if "mfu_pct" in f32:
                result["fp32_parity_mfu_pct"] = round(f32["mfu_pct"], 2)
            if headline.get("pooled") is not None and f32.get("pooled") is not None:
                a, b = headline["pooled"], f32["pooled"]
                result["bf16_fp32_rel_err"] = round(
                    float(np.linalg.norm(a - b) / np.linalg.norm(b)), 6
                )
        except Exception as err:
            print(f"# fp32 parity bench failed: {err}", file=sys.stderr)

    # ---- int8 serving path (W8A8 dynamic, avex_tpu.quant) -----------------
    # Measures the quantized serving mode (load_model(..., quantization=
    # "int8")). int8_mfu_pct keeps the bf16 peak as denominator so it reads
    # as an effective-speedup figure on the same scale as mfu_pct;
    # int8_bf16_rel_err is the quality cost vs the headline path's pooled
    # embeddings.
    if os.environ.get("AVEX_BENCH_INT8", "1") == "1" and in_budget():
        try:
            q = _measure_tpu(batch_size=batch, dtype_name="bfloat16", quantize=True)
            result["int8_clips_per_sec"] = round(q["clips_per_sec"], 2)
            if "mfu_pct" in q:
                result["int8_mfu_pct"] = round(q["mfu_pct"], 2)
                result["int8_tflops_per_sec"] = round(q["tflops_per_sec"], 2)
            if q.get("pooled") is not None and headline.get("pooled") is not None:
                a, b = q["pooled"], headline["pooled"]
                result["int8_bf16_rel_err"] = round(
                    float(np.linalg.norm(a - b) / np.linalg.norm(b)), 6
                )
        except Exception as err:
            print(f"# int8 bench failed: {err}", file=sys.stderr)

    # ---- batch sweep (opt-in) --------------------------------------------
    sweep = os.environ.get("AVEX_BENCH_SWEEP", "")
    if sweep and in_budget():
        result["sweep"] = {}
        for b in (int(x) for x in sweep.split(",") if x.strip()):
            if b != batch and in_budget():
                try:
                    result["sweep"][str(b)] = round(
                        _measure_tpu(batch_size=b, dtype_name="bfloat16", iters=6)[
                            "clips_per_sec"
                        ],
                        2,
                    )
                except Exception as err:
                    print(f"# sweep b={b} failed: {err}", file=sys.stderr)
                    break

    cpu_clips_per_sec = _measure_cpu_reference()
    if cpu_clips_per_sec < 0:  # fallback constant, not a measurement
        cpu_clips_per_sec = -cpu_clips_per_sec
        result["cpu_reference_estimated"] = True
    result["cpu_reference_clips_per_sec"] = round(cpu_clips_per_sec, 2)
    result["vs_baseline"] = round(headline["clips_per_sec"] / cpu_clips_per_sec, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
