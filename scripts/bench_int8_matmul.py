"""Isolate the int8 MXU question: raw matmul rates at BEATs FFN shapes.

Times three variants of [M,K]x[K,N] (fc1-shaped, M=B*T) on the chip:
  bf16    — the production path
  s8_pre  — both operands already int8 (upper bound for W8A8)
  s8_dyn  — bf16 activations dynamically quantized in-graph, int8 weights
            (exactly avex_tpu.quant.dynamic_int8_matmul)

If s8_pre is ~2x bf16, the int8 MXU path is real and the W8A8 gap is
quant/dequant overhead; if it is ~1x, XLA is not using the doubled rate and
int8 serving cannot win here.

Round 4 adds the Mosaic side of the question: ``s8_pallas_*`` time the
hand-tiled Pallas int8 matmul (avex_tpu/ops/pallas_int8.py) at several
block shapes, and ``s8_dyn_pallas`` the fused dynamic-quant dense. If XLA's
1.04x was a scheduling artifact, these clear it; if they sit at the same
rate, the chip itself runs the s8 dot at the bf16 rate.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from avex_tpu.ops.pallas_int8 import int8_dynamic_dense, int8_matmul
from avex_tpu.quant import dynamic_int8_matmul, quantize_kernel

M, K, N = 128 * 248, 768, 3072
# 31, not a round number: the scan length is part of the program hash, and a
# previously killed client can wedge the compile proxy's entry for an exact
# hash (CLAUDE.md) — a novel length compiles fresh.
ITERS = 31


def timed(fn, *args):
    print(f"  compiling...", file=sys.stderr, flush=True)
    compiled = jax.jit(fn).lower(*args).compile()
    float(compiled(*args))  # warmup + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    wq, ws = quantize_kernel(w.astype(jnp.float32))
    xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)

    def loop(body):
        def fn(*args):
            def step(c, _):
                return c + body(*args), None

            out, _ = jax.lax.scan(step, jnp.float32(0), None, length=ITERS)
            return out

        return fn

    flops = 2 * M * K * N * ITERS
    baseline = {}

    def run(name, fn, *args):
        print(name, file=sys.stderr, flush=True)
        t = timed(fn, *args)
        if "bf16" not in baseline:
            baseline["bf16"] = t
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms": round(t * 1e3 / ITERS, 3),
                    "tflops_per_sec": round(flops / t / 1e12, 1),
                    "vs_bf16": round(baseline["bf16"] / t, 3),
                }
            ),
            flush=True,
        )

    run("bf16", loop(lambda a, b: jnp.dot(a, b).astype(jnp.float32).mean()), x, w)
    run(
        "s8_pre",
        loop(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32).mean()
        ),
        xq,
        wq,
    )
    run(
        "s8_dyn",
        loop(lambda a, b, s: dynamic_int8_matmul(a, b, s).astype(jnp.float32).mean()),
        x,
        wq,
        ws,
    )
    for bm, bn in ((256, 1024), (512, 1024), (512, 512), (1024, 512)):
        run(
            f"s8_pallas_{bm}x{bn}",
            loop(
                lambda a, b: int8_matmul(a, b, block_m=bm, block_n=bn)
                .astype(jnp.float32)
                .mean()
            ),
            xq,
            wq,
        )
    run(
        "s8_dyn_pallas_512x1024",
        loop(
            lambda a, b, s: int8_dynamic_dense(a, b, s, block_m=512, block_n=1024)
            .astype(jnp.float32)
            .mean()
        ),
        x,
        wq,
        ws,
    )


if __name__ == "__main__":
    main()
