#!/usr/bin/env python
"""Model-zoo inference throughput on the real chip (clips/s + MFU per model).

BASELINE.md's north-star workloads go beyond BEATs: "batched EfficientNet
classification; AVES layer-wise extraction; EAT + probe; …". This script
measures pooled-embedding extraction throughput for every JAX-native
architecture in the zoo with the same on-device scan loop bench.py uses
(one dispatch, scalar fetch — excludes the remote-tunnel RPC overhead that
doesn't exist on a real TPU host).

Weights are random (throughput is weight-independent); models are built at
their official-spec sizes via the registry. BirdNet is excluded (external
TFLite runtime by design, models/birdnet.py).

Usage:
  python scripts/bench_zoo.py                 # all zoo architectures, bf16
  python scripts/bench_zoo.py beats aves      # a subset
  AVEX_ZOO_BATCH=64 python scripts/bench_zoo.py

One JSON line per model:
  {"model": ..., "clips_per_sec": N, "ms_per_batch": N, "mfu_pct": N, ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One representative entry per JAX-native architecture: official registry
# names where one exists (true official-spec sizes), otherwise an
# architecture ModelSpec at its full default size. CLIP's audio tower is the
# same EfficientNet family measured above; its text tower is not an audio
# workload — excluded.
def _zoo():
    from avex_tpu.configs import ModelSpec

    return {
        "beats": ("esp_aves2_sl_beats_all", {}),
        "efficientnet": ("esp_aves2_effnetb0_all", {}),
        "eat": ("esp_aves2_eat_all", {}),
        "aves": (ModelSpec(name="aves_bio", pretrained=False), {}),
        "atst": (ModelSpec(name="atst", pretrained=False), {}),
        "resnet50": (
            ModelSpec(
                name="resnet50",
                pretrained=False,
                audio_config={"representation": "mel_spectrogram"},
            ),
            {},
        ),
        # 32 kHz models (reference birdmae.py:17-67, perch.py:153-185): feed
        # full-rate clips so a "clip" is the audio the model actually eats.
        "birdmae": (
            ModelSpec(
                name="birdmae", pretrained=False,
                model_id="DBD-research-group/Bird-MAE-base",
            ),
            {"sample_rate": 32000},
        ),
        "perch": (ModelSpec(name="perch", pretrained=False), {"sample_rate": 32000}),
    }


def measure(tag: str, source, batch: int, overrides=None, iters: int = 8) -> None:
    overrides = overrides or {}
    import jax
    import jax.numpy as jnp

    from avex_tpu.models.load import load_model

    t_build = time.perf_counter()
    try:
        model = load_model(
            source,
            return_features_only=True,
            random_weights=True,
            compute_dtype="bfloat16",
        )
    except TypeError:
        model = load_model(source, return_features_only=True, random_weights=True)
    ac = getattr(model, "audio_config", None)
    sr = int(overrides.get("sample_rate") or getattr(ac, "sample_rate", None) or 16000)
    clip_s = float(
        overrides.get("clip_seconds") or getattr(ac, "clip_seconds", None) or 5.0
    )
    n_samples = int(clip_s * sr)

    layers = model.register_hooks_for_layers(["last_layer"])
    # aggregation="none": raw captured activations (2D pooled vectors for
    # transformers, 4D conv maps for CNNs) — every architecture supports it.
    extract = model.extract_fn(tuple(layers), "none")

    def fn(v, wav):
        return extract(v, wav, None).astype(jnp.float32).mean()

    def scan_forward(v, batches):
        def body(carry, x):
            return carry + fn(v, x), None

        total, _ = jax.lax.scan(body, jnp.float32(0), batches)
        return total

    rng = np.random.default_rng(0)
    stacked = jnp.asarray(
        (rng.standard_normal((iters, batch, n_samples)) * 0.1).astype(np.float32)
    )
    variables = model.variables
    compiled = jax.jit(scan_forward).lower(variables, stacked).compile()
    flops = None
    try:
        single = jax.jit(fn).lower(variables, stacked[0]).compile()
        cost = single.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
    except Exception as err:
        print(f"# {tag}: cost analysis failed: {err}", file=sys.stderr)

    analytic_fix = 0.0
    if flops is not None:
        analytic_fix = _analytic_pallas_attention_flops(model, batch, n_samples)
        flops += analytic_fix

    float(compiled(variables, stacked))  # warmup (compile transfer + run)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, stacked))
        best = min(best, time.perf_counter() - t0)
    out = {
        "model": tag,
        "source": source if isinstance(source, str) else f"spec:{source.name}",
        "clips_per_sec": round(batch * iters / best, 1),
        "ms_per_batch": round(1e3 * best / iters, 2),
        "batch": batch,
        "clip_seconds": clip_s,
        "sample_rate": sr,
        "build_plus_compile_s": round(time.perf_counter() - t_build, 1),
    }
    if flops:
        peak = float(os.environ.get("AVEX_TPU_PEAK_TFLOPS", "197")) * 1e12
        out["tflops_per_sec"] = round(flops * iters / best / 1e12, 1)
        out["mfu_pct"] = round(100 * flops * iters / best / peak, 1)
        if analytic_fix:
            out["attention_flops_analytic"] = round(analytic_fix / 1e9, 2)  # GFLOPs
    print(json.dumps(out), flush=True)


def _analytic_pallas_attention_flops(model, batch: int, n_samples: int) -> float:
    """Attention-core FLOPs XLA's cost model misses when the model's blocks
    run the Pallas kernel (pallas_call counts as 0 FLOPs — round-4 zoo rows
    for EAT/Bird-MAE had empty MFU cells for exactly this reason).

    The analytic core is QK^T + PV = ``4·B·T²·E`` per block (projections are
    plain gemms XLA still counts). The ViT stacks (EAT/Bird-MAE) auto-enable
    Pallas at T >= 384; AVES at T >= 248 (round-5 measured crossovers);
    everything else returns 0.
    """
    import jax

    if jax.default_backend() != "tpu":
        return 0.0
    mod = getattr(model, "module", None)
    from avex_tpu.models.aves import CONV_LAYERS, AVESModel

    if isinstance(mod, AVESModel):
        t = n_samples
        for _ch, k, s in CONV_LAYERS:  # conv framing: T after the extractor
            t = (t - k) // s + 1
        if t < 248:
            return 0.0
        cfg = mod.cfg
        return 4.0 * batch * t * t * cfg.encoder_embed_dim * cfg.encoder_num_layers
    if mod is None or not all(hasattr(mod, a) for a in ("depth", "dim", "target_length")):
        return 0.0
    t = (int(mod.target_length) // 16) * (128 // 16) + 1  # grid + CLS
    if t < 384:
        return 0.0  # XLA attention path: already counted
    return 4.0 * batch * t * t * int(mod.dim) * int(mod.depth)


def main() -> None:
    batch = int(os.environ.get("AVEX_ZOO_BATCH", "128"))
    zoo = _zoo()
    wanted = sys.argv[1:] or list(zoo)
    for tag in wanted:
        try:
            measure(tag, zoo[tag][0], batch, zoo[tag][1])
        except Exception as err:
            print(
                json.dumps({"model": tag, "error": f"{type(err).__name__}: {err}"[:300]}),
                flush=True,
            )


if __name__ == "__main__":
    main()
