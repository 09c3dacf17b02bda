#!/usr/bin/env python
"""Where does BEATs forward time go? Component ablation on the real chip.

Times (bf16, B=128, 5 s clips) with the on-device scan loop from bench.py:
  full        — fbank -> patch embed -> 12-layer encoder
  encoder     — encoder only, pre-computed patch tokens as input
  frontend    — fbank + patch embed + LN/proj only (encoder skipped)
  nogate      — full, gru_rel_pos=False (gate chain ablated)
  nobias      — full, relative_position_embedding=False (whole bias ablated)

Each line prints clips/s and, via XLA cost analysis, the achieved TFLOP/s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP_SECONDS = int(float(os.environ.get("AVEX_BENCH_CLIP_S", "5")) * 16000) // 16000 or 1
SR = 16000


def measure(tag, make_fn, example, iters=10):
    import jax
    import jax.numpy as jnp

    fn, variables = make_fn()

    def scan_forward(v, batches):
        def body(carry, x):
            return carry + fn(v, x), None

        total, _ = jax.lax.scan(body, jnp.float32(0), batches)
        return total

    compiled = jax.jit(scan_forward).lower(variables, example).compile()
    flops = None
    try:
        single = jax.jit(fn).lower(variables, example[0]).compile()
        cost = single.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
    except Exception as err:
        print(f"# {tag}: cost analysis failed: {err}", file=sys.stderr)

    float(compiled(variables, example))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, example))
        best = min(best, time.perf_counter() - t0)
    n = example.shape[0] * example.shape[1]
    out = {"tag": tag, "clips_per_sec": round(n / best, 1), "ms_per_batch": round(1e3 * best / example.shape[0], 2)}
    if flops:
        out["tflops_per_sec"] = round(flops * example.shape[0] / best / 1e12, 1)
        out["mfu_pct"] = round(100 * flops * example.shape[0] / best / 197e12, 1)
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    batch = int(os.environ.get("AVEX_BENCH_BATCH", "128"))
    iters = 10
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        (rng.standard_normal((iters, batch, CLIP_SECONDS * SR)) * 0.1).astype(np.float32)
    )

    def build(cfg_kwargs):
        cfg = BEATsConfig(
            dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0,
            dropout_input=0.0, **cfg_kwargs,
        )
        model = BEATsBackbone(cfg=cfg, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, CLIP_SECONDS * SR), jnp.float32)
            )
        return model, jax.device_put(variables, jax.devices()[0])

    which = set((os.environ.get("AVEX_ABLATE") or "full,encoder,frontend,nogate,nobias").split(","))

    if "full" in which:
        def full():
            model, v = build({})
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure("full", full, wav)

    if "frontend" in which:
        def frontend():
            from avex_tpu.ops.fbank import KaldiFbank, beats_fbank

            fbank = KaldiFbank(num_mel_bins=128)
            kernel, mel = fbank.constants()
            consts = jax.device_put((jnp.asarray(kernel), jnp.asarray(mel)), jax.devices()[0])

            def fn(consts, w):
                feats = beats_fbank(w, 15.41663, 6.55582, fbank=fbank, constants=consts)
                return feats.astype(jnp.float32).mean()

            return fn, consts
        measure("frontend(fbank only)", frontend, wav)

    if "encoder" in which:
        # encoder alone: feed pre-computed (B, T=248, 768) tokens
        def encoder():
            from avex_tpu.models.beats import _TransformerEncoder

            cfg = BEATsConfig(
                dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0
            )
            enc = _TransformerEncoder(cfg=cfg, dtype=jnp.bfloat16)
            tokens0 = jnp.zeros((1, 248, 768), jnp.bfloat16)
            with jax.default_device(jax.devices("cpu")[0]):
                variables = jax.jit(enc.init)(jax.random.PRNGKey(0), tokens0)
            variables = jax.device_put(variables, jax.devices()[0])

            def fn(v, tok):
                out, _ = enc.apply(v, tok)
                return out.astype(jnp.float32).mean()

            return fn, variables

        tokens = jnp.asarray(
            (rng.standard_normal((iters, batch, 248, 768)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        measure("encoder only", lambda: encoder(), tokens)

    if "nogate" in which:
        def nogate():
            model, v = build({"gru_rel_pos": False})
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure("full, no gru gate", nogate, wav)

    if "nobias" in which:
        def nobias():
            model, v = build({"relative_position_embedding": False, "gru_rel_pos": False})
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure("full, no rel-pos bias", nobias, wav)

    if "fusedqkv" in which:
        def fusedqkv():
            model, v = build({"fused_qkv": True})
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure("full, fused qkv", fusedqkv, wav)

    if "xlaattn" in which:
        # Explicit XLA attention (auto enables the split Pallas kernel at
        # T >= 384, so "full" is not the XLA baseline for long clips).
        def xlaattn():
            model, v = build({"use_pallas": False})
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure("full, xla attention", xlaattn, wav)

    if "fusedpallas" in which:
        # Round-5 experiment: the fused-QKV *gated* Pallas boundary at T=248.
        # Param structure is identical across use_pallas, so init the XLA twin
        # on CPU (Mosaic cannot lower for the CPU init device) and apply the
        # kernel model on the chip.
        def fusedpallas():
            _, v = build({"fused_qkv": True, "use_pallas": False})
            cfg = BEATsConfig(
                dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0,
                dropout_input=0.0, fused_qkv=True, use_pallas=True,
            )
            model = BEATsBackbone(cfg=cfg, dtype=jnp.bfloat16)
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure("full, fused-qkv gated pallas", fusedpallas, wav)

    if "posconv" in which:
        # The grouped conv positional embedding alone: K=128, groups=16 over
        # [B, 248, 768] — grouped convs are a known TPU lowering weak spot.
        def posconv():
            import flax.linen as nn

            conv = nn.Conv(
                768, kernel_size=(128,), feature_group_count=16,
                padding=[(64, 64)], dtype=jnp.bfloat16,
            )
            x0 = jnp.zeros((1, 248, 768), jnp.bfloat16)
            with jax.default_device(jax.devices("cpu")[0]):
                v = conv.init(jax.random.PRNGKey(0), x0)
            v = jax.device_put(v, jax.devices()[0])
            return (lambda v, x: conv.apply(v, x).astype(jnp.float32).mean()), v

        tok = jnp.asarray(
            (rng.standard_normal((iters, batch, 248, 768)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        measure("pos_conv alone", posconv, tok)

    for b in (int(x) for x in os.environ.get("AVEX_ABLATE_SWEEP", "").split(",") if x.strip()):
        wav_b = jnp.asarray(
            (rng.standard_normal((6, b, CLIP_SECONDS * SR)) * 0.1).astype(np.float32)
        )
        def full_b():
            model, v = build({})
            return (lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean()), v
        measure(f"full b={b}", full_b, wav_b)


if __name__ == "__main__":
    main()
