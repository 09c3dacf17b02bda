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


if __name__ == "__main__":
    main()
