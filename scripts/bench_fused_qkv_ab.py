#!/usr/bin/env python
"""On-chip A/B: fused-QKV Pallas attention vs XLA for ATST (T=125) and
AVES (T=249) at their native 5 s clip lengths.

The round-5 EAT/Bird-MAE result (+49% at T=513) showed the fused kernel
boundary removes the relayout tax that made isolated kernel numbers
meaningless in-model. This measures whether that verdict extends BELOW the
T>=384 auto-enable threshold — BEATs' gated cell lost at T=248, but the
bias-free cell is a different trade (no [T,T] bias stream, less
XLA-overlappable elementwise work).

Usage: python scripts/bench_fused_qkv_ab.py [atst aves]
       AVEX_AB_CLIP_S=10 python scripts/bench_fused_qkv_ab.py atst  # T=250
One JSON line per (model, variant).

Measured (v5e, bf16, B=128): ATST T=125 0.92x (XLA wins), AVES T=249 +7%
(1,156 vs 1,080 clips/s) — the bias-free fused boundary's in-model
crossover sits between T=125 and T=249.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(tag: str, build, batch: int = 128, iters: int = 8) -> float:
    import jax
    import jax.numpy as jnp

    model = build()
    n_samples = int(float(os.environ.get("AVEX_AB_CLIP_S", "5")) * 16000)
    layers = model.register_hooks_for_layers(["last_layer"])
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
    compiled = jax.jit(scan_forward).lower(model.variables, stacked).compile()
    float(compiled(model.variables, stacked))  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(model.variables, stacked))
        best = min(best, time.perf_counter() - t0)
    cps = batch * iters / best
    print(
        json.dumps(
            {"variant": tag, "clips_per_sec": round(cps, 1),
             "ms_per_batch": round(1e3 * best / iters, 2), "batch": batch}
        ),
        flush=True,
    )
    return cps


def measure_module(tag: str, module, batch: int, n_samples: int, iters: int = 4) -> float:
    """Forward-only throughput for a bare flax module (raw waveform in)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, n_samples), jnp.float32)
    )

    def fn(v, wav):
        out, _ = module.apply(v, wav)
        return out.astype(jnp.float32).mean()

    def scan_forward(v, batches):
        def body(carry, x):
            return carry + fn(v, x), None

        total, _ = jax.lax.scan(body, jnp.float32(0), batches)
        return total

    stacked = jnp.asarray(
        (rng.standard_normal((iters, batch, n_samples)) * 0.1).astype(np.float32)
    )
    compiled = jax.jit(scan_forward).lower(variables, stacked).compile()
    float(compiled(variables, stacked))  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(variables, stacked))
        best = min(best, time.perf_counter() - t0)
    cps = batch * iters / best
    print(
        json.dumps(
            {"variant": tag, "clips_per_sec": round(cps, 1),
             "ms_per_batch": round(1e3 * best / iters, 2), "batch": batch}
        ),
        flush=True,
    )
    return cps


def measure_train(tag: str, module, batch: int, iters: int = 4) -> float:
    """Full AdamW train-step throughput (value_and_grad + update, scan over
    pre-staged batches). The fused kernel's custom_vjp RECOMPUTES attention
    through the jnp path in the backward, so the training verdict can differ
    from inference — this measures it end-to-end."""
    import jax
    import jax.numpy as jnp
    import optax

    samples = int(float(os.environ.get("AVEX_AB_CLIP_S", "5")) * 16000)
    rng = np.random.default_rng(0)
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, samples), jnp.float32)
    )
    params = variables["params"]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    wavs = jnp.asarray(
        (rng.standard_normal((iters, batch, samples)) * 0.1).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 10, (iters, batch)))

    def loss_fn(params, wav, y):
        logits, _ = module.apply({"params": params}, wav)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y
        ).mean()

    def step(carry, xy):
        params, opt_state = carry
        wav, y = xy
        loss, grads = jax.value_and_grad(loss_fn)(params, wav, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    def run(params, opt_state, wavs, labels):
        _, losses = jax.lax.scan(step, (params, opt_state), (wavs, labels))
        return losses[-1]

    compiled = jax.jit(run).lower(params, opt_state, wavs, labels).compile()
    float(compiled(params, opt_state, wavs, labels))  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(params, opt_state, wavs, labels))
        best = min(best, time.perf_counter() - t0)
    cps = batch * iters / best
    print(
        json.dumps(
            {"variant": tag, "train_clips_per_sec": round(cps, 1),
             "ms_per_step": round(1e3 * best / iters, 2), "batch": batch}
        ),
        flush=True,
    )
    return cps


def main() -> None:
    wanted = sys.argv[1:] or ["atst", "aves"]
    if "atst" in wanted:
        from avex_tpu.models import atst

        for flag in (False, True):
            measure(
                f"atst_pallas={flag}",
                lambda flag=flag: atst.Model(
                    return_features_only=True, compute_dtype="bfloat16",
                    use_pallas=flag,
                ),
            )
    if "aves" in wanted:
        from avex_tpu.models import aves

        for flag in (False, True):
            measure(
                f"aves_pallas={flag}",
                lambda flag=flag: aves.Model(
                    return_features_only=True, compute_dtype="bfloat16",
                    use_pallas=flag,
                ),
            )
    if "grad-check" in wanted:
        # On-chip numerics: Mosaic backward kernel vs the jnp recompute
        # backward (AVEX_FUSED_BWD_XLA env), EAT shape, bf16.
        import jax
        import jax.numpy as jnp

        from avex_tpu.ops.pallas_attention import fused_qkv_attention

        b, seq, heads, dh = 4, 513, 12, 64  # B=4: fresh program hash if the
        # tunnel's compile proxy wedged a killed run's entry (CLAUDE.md)
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            (rng.standard_normal((b, seq, 3 * heads * dh)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            (rng.standard_normal((b, seq, heads * dh)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        def loss(x):
            return (fused_qkv_attention(x, heads=heads).astype(jnp.float32) * w).sum()

        g_kernel = jax.jit(jax.grad(loss))(qkv).astype(jnp.float32)
        os.environ["AVEX_FUSED_BWD_XLA"] = "1"
        g_ref = jax.jit(jax.grad(loss))(qkv).astype(jnp.float32)
        del os.environ["AVEX_FUSED_BWD_XLA"]
        num = float(jnp.max(jnp.abs(g_kernel - g_ref)))
        den = float(jnp.max(jnp.abs(g_ref)))
        print(
            json.dumps(
                {"variant": "grad_check_T513_bf16", "max_abs_diff": num,
                 "ref_max_abs": den, "rel": num / max(den, 1e-30)}
            ),
            flush=True,
        )
    if "gated-grad-check" in wanted:
        # On-chip numerics for the GATED VMEM backward kernel vs the jnp
        # recompute backward, BEATs shape (12 heads, dh=64, T=248), bf16.
        import jax
        import jax.numpy as jnp

        from avex_tpu.ops.pallas_attention import fused_qkv_gated_attention

        b, seq, heads, dh = 4, 248, 12, 64
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            (rng.standard_normal((b, seq, 3 * heads * dh)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)
        pos_bias = jnp.asarray(
            (rng.standard_normal((heads, seq, seq)) * 0.1).astype(np.float32)
        )
        gate = jnp.asarray(
            (rng.uniform(1.0, 3.0, (b, heads, seq))).astype(np.float32)
        )
        w = jnp.asarray(
            (rng.standard_normal((b, seq, heads * dh)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        def loss(x, pb, gt):
            out = fused_qkv_gated_attention(x, heads=heads, pos_bias=pb, gate=gt)
            return (out.astype(jnp.float32) * w).sum()

        grads_k = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qkv, pos_bias, gate)
        os.environ["AVEX_FUSED_BWD_XLA"] = "1"
        grads_r = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qkv, pos_bias, gate)
        del os.environ["AVEX_FUSED_BWD_XLA"]
        for name, gk, gr in zip(("dqkv", "dbias", "dgate"), grads_k, grads_r):
            gk = gk.astype(jnp.float32)
            gr = gr.astype(jnp.float32)
            num = float(jnp.max(jnp.abs(gk - gr)))
            den = float(jnp.max(jnp.abs(gr)))
            print(
                json.dumps(
                    {"variant": f"gated_grad_check_T248_bf16_{name}",
                     "max_abs_diff": num, "ref_max_abs": den,
                     "rel": num / max(den, 1e-30)}
                ),
                flush=True,
            )
    if "eat-train" in wanted:
        import jax.numpy as jnp

        from avex_tpu.models.eat import EATModel

        for flag in (False, True):
            measure_train(
                f"eat_train_pallas={flag}",
                EATModel(num_classes=10, dtype=jnp.bfloat16, use_pallas=flag),
                batch=int(os.environ.get("AVEX_AB_TRAIN_BATCH", "64")),
            )
    if "birdmae-huge" in wanted:
        # dh=80: the lcm head-grouping (8-head / 640-lane blocks) — does the
        # unaligned in-block head slicing lower and win on real Mosaic?
        import jax.numpy as jnp

        from avex_tpu.models.birdmae import BirdMAEModel

        for flag in (False, True):
            # scan_layers: one traced block instead of 32 unrolled — the
            # unrolled compile exceeds the tunnel budget; scan costs ~6%
            # uniformly (measured on BEATs) so the A/B ratio stays fair.
            measure_module(
                f"birdmae_huge_pallas={flag}",
                BirdMAEModel(dtype=jnp.bfloat16, use_pallas=flag, scan_layers=True),
                batch=int(os.environ.get("AVEX_AB_HUGE_BATCH", "16")),
                n_samples=5 * 32000,
            )
    if "beats-train" in wanted:
        # Gated chain in TRAINING: fused-QKV gated forward kernel + jnp
        # recompute backward vs the all-XLA step. (The gated cell has no
        # VMEM backward kernel yet; this measures whether one is worth
        # building — if the jnp-backward variant is already near parity,
        # the backward savings seen on EAT would tip it positive.)
        import flax.linen as nn
        import jax.numpy as jnp

        from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

        for flags in ({}, {"use_pallas": True, "fused_qkv": True}):
            cfg = BEATsConfig(
                dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
                encoder_layerdrop=0.0, dropout_input=0.0, **flags,
            )

            class _Clf(nn.Module):
                @nn.compact
                def __call__(self, wav):
                    feats, _ = BEATsBackbone(cfg=cfg, dtype=jnp.bfloat16, name="backbone")(wav)
                    return nn.Dense(10)(feats.astype(jnp.float32).mean(axis=1)), {}

            measure_train(
                f"beats_train_pallas={bool(flags)}",
                _Clf(),
                batch=int(os.environ.get("AVEX_AB_TRAIN_BATCH", "64")),
            )
    if "aves-train" in wanted:
        import jax.numpy as jnp

        from avex_tpu.models.aves import AVESConfig, AVESModel

        cfg = AVESConfig(
            dict(
                encoder_dropout=0.0,
                encoder_attention_dropout=0.0,
                encoder_ff_interm_dropout=0.0,
                encoder_projection_dropout=0.0,
                encoder_layer_drop=0.0,
            )
        )
        for flag in (False, True):
            measure_train(
                f"aves_train_pallas={flag}",
                AVESModel(
                    cfg=cfg, num_classes=10, dtype=jnp.bfloat16, use_pallas=flag
                ),
                batch=int(os.environ.get("AVEX_AB_TRAIN_BATCH", "64")),
            )


if __name__ == "__main__":
    main()
