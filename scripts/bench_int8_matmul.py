"""Isolate the int8 MXU question: raw matmul rates at BEATs FFN shapes.

Times three variants of [M,K]x[K,N] (fc1-shaped, M=B*T) on the chip:
  bf16    — the production path
  s8_pre  — both operands already int8 (upper bound for W8A8)
  s8_dyn  — bf16 activations dynamically quantized in-graph, int8 weights
            (exactly avex_tpu.quant.dynamic_int8_matmul)

If s8_pre is ~2x bf16, the int8 MXU path is real and the W8A8 gap is
quant/dequant overhead; if it is ~1x, XLA is not using the doubled rate and
int8 serving cannot win here.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from avex_tpu.quant import dynamic_int8_matmul, quantize_kernel

M, K, N = 128 * 248, 768, 3072
ITERS = 30


def timed(fn, *args):
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

    bf16 = timed(loop(lambda a, b: jnp.dot(a, b).astype(jnp.float32).mean()), x, w)
    s8_pre = timed(
        loop(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32).mean()
        ),
        xq,
        wq,
    )
    s8_dyn = timed(
        loop(lambda a, b, s: dynamic_int8_matmul(a, b, s).astype(jnp.float32).mean()),
        x,
        wq,
        ws,
    )
    flops = 2 * M * K * N * ITERS
    for name, t in (("bf16", bf16), ("s8_pre", s8_pre), ("s8_dyn", s8_dyn)):
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms": round(t * 1e3 / ITERS, 3),
                    "tflops_per_sec": round(flops / t / 1e12, 1),
                    "vs_bf16": round(bf16 / t, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
