"""Micro-benchmark: Pallas gated-bias attention vs the XLA path at BEATs shapes.

Runs both on the attached TPU chip with the device-side scan-loop timing
methodology of bench.py (one dispatch, scalar sync — immune to the remote-TPU
tunnel's per-call RPC latency). Shapes match full-size BEATs on 5 s clips:
B=128, H=12, T=248, D=64.

Usage: python scripts/bench_attention.py [--batch 128] [--seq 248] [--iters 20]
Prints one JSON line with both throughputs and the ratio.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# repo-root import without PYTHONPATH (which breaks the axon plugin discovery)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--seq", type=int, default=248)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--block-b", type=int, default=8)
    parser.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32")
    parser.add_argument(
        "--contenders",
        default="xla,pallas,flash",
        help="comma-separated subset of xla,pallas,flash to measure",
    )
    parser.add_argument(
        "--no-bias",
        action="store_true",
        help="bias-free ViT attention (EAT/Bird-MAE cell) instead of gated-bias",
    )
    args = parser.parse_args()
    wanted = set(args.contenders.split(","))

    import jax
    import jax.numpy as jnp

    from avex_tpu.ops.attention import dot_product_attention
    from avex_tpu.ops.pallas_attention import gated_bias_attention

    b, h, t, d = args.batch, args.heads, args.seq, args.dim
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32) * 0.1, dtype)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32) * 0.1, dtype)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32) * 0.1, dtype)
    pos_bias = jnp.asarray(rng.standard_normal((h, t, t)).astype(np.float32) * 0.1, dtype)
    gate = jnp.asarray(rng.uniform(1.0, 2.0, (b, h, t)).astype(np.float32), dtype)

    # NB: pos_bias/gate are jit ARGUMENTS, not closures — closed-over arrays
    # serialize into the HLO as constants, and at T=2048 the [H, T, T] bias is
    # ~100 MB, which 413s the remote-TPU compile tunnel (CLAUDE.md).
    if args.no_bias:
        # ViT-style bias-free attention (EAT / Bird-MAE blocks).
        def xla_step(q, k, v, pos_bias, gate):
            return dot_product_attention(
                q, k, v, scale=d**-0.5,
                logits_dtype=jnp.float32 if dtype == jnp.float32 else dtype,
            )

        def pallas_step(q, k, v, pos_bias, gate):
            return gated_bias_attention(
                q, k, v, pos_bias=None, scale=d**-0.5, block_b=args.block_b
            )
    else:
        def xla_step(q, k, v, pos_bias, gate):
            bias = gate[..., None] * pos_bias[None]
            return dot_product_attention(q, k, v, bias=bias, scale=d**-0.5)

        def pallas_step(q, k, v, pos_bias, gate):
            return gated_bias_attention(
                q, k, v, pos_bias=pos_bias, gate=gate, scale=d**-0.5, block_b=args.block_b
            )

    # Third contender: JAX's tuned TPU flash-attention kernel. It only takes a
    # materialized [B, H, T, T] additive bias (`ab`), so the gate x shared-bias
    # product must round-trip HBM — the very traffic the XLA path fuses away.
    # Measured to settle whether the stock kernel's block pipelining outweighs
    # that extra stream at BEATs shapes (T=248 padded to 256 for block_k).
    def make_flash_step():
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        t_pad = -(-t // 128) * 128
        blocks = BlockSizes(
            block_q=min(t_pad, 256),
            block_k_major=min(t_pad, 256),
            block_k=min(t_pad, 128),
            block_b=1,
        )

        def flash_step(q, k, v, pos_bias, gate):
            widths = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
            qp, kp, vp = (jnp.pad(x, widths) for x in (q, k, v))
            ab = gate[..., None] * pos_bias[None]
            ab = jnp.pad(ab, ((0, 0), (0, 0), (0, t_pad - t), (0, t_pad - t)),
                         constant_values=-1e9)
            out = flash_attention(qp, kp, vp, ab=ab, sm_scale=d**-0.5,
                                  block_sizes=blocks)
            return out[:, :, :t, :]

        return flash_step

    def scan_loop(step):
        def run(q, k, v, pos_bias, gate):
            def body(carry, _):
                out = step(q + carry, k, v, pos_bias, gate)
                return out.mean().astype(jnp.float32), None

            total, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
            return total

        return jax.jit(run)

    results = {}
    contenders = [("xla", xla_step), ("pallas", pallas_step)]
    if jax.default_backend() == "tpu":  # Mosaic kernel needs real hardware
        contenders.append(("flash", make_flash_step()))
    contenders = [(n, s) for n, s in contenders if n in wanted]
    for name, step in contenders:
        fn = scan_loop(step)
        float(fn(q, k, v, pos_bias, gate))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(q, k, v, pos_bias, gate))
            best = min(best, time.perf_counter() - t0)
        results[name] = args.iters * b / best  # batches of attention per sec

    out = {
        "metric": "plain_attention" if args.no_bias else "gated_bias_attention",
        "shape": f"B{b}xH{h}xT{t}xD{d}",
        "dtype": args.dtype,
        "block_b": args.block_b,
        "backend": jax.default_backend(),
    }
    for name in ("xla", "pallas", "flash"):
        if name in results:
            out[f"{name}_clips_per_sec"] = round(results[name], 1)
    if "xla" in results:
        for name in ("pallas", "flash"):
            if name in results:
                out[f"{name}_vs_xla"] = round(results[name] / results["xla"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
