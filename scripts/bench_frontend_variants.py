"""Why is the EfficientNet mel frontend 5.6-7.8 ms/batch, and what fixes it?

bench_effnet_ablation.py showed the frontend is ~52% of EfficientNet's
wall-clock and that dropping the rDFT conv to Precision.DEFAULT only buys
28% — so the strided 1-input-channel conv LOWERING, not the arithmetic,
is the bottleneck (a [2K=802, 1, 800] kernel conv with stride 160 leaves
XLA a degenerate channel dimension to tile).

This bench races the conv lowering against the TPU-native alternative:
frame the padded signal into [B, frames, n_fft] via hop-sized block
stacking (n_fft % hop == 0, so framing is reshape + 5 shifted views — no
gather), then one big [B*frames, n_fft] x [n_fft, 2K] matmul that tiles
the MXU cleanly.

Variants (B=128, 5 s @ 16 kHz, n_fft=800, hop=160 — the EffNet config):
  conv_highest   — stft_power today (fp32, 6-pass HIGHEST)
  conv_default   — same conv, Precision.DEFAULT
  matmul_f32     — framing + matmul, fp32 HIGHEST
  matmul_bf16    — framing + matmul, bf16 operands, fp32 accumulation
Each also reports max|Δ| of the resulting POWER spectrogram vs conv_highest
(relative, per-bin) so precision loss is measured, not guessed.

Usage: python scripts/bench_frontend_variants.py [--batch 128] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_FFT, HOP = 800, 160
SAMPLES = 80000


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from avex_tpu.ops.frontend import _stft_kernel, stft_power

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        (rng.standard_normal((args.iters, args.batch, SAMPLES)) * 0.1).astype(np.float32)
    )
    # [2K, 1, n_fft] -> [n_fft, 2K] for the matmul form.
    mat = jnp.asarray(_stft_kernel(N_FFT, N_FFT, "hann")[:, 0, :].T)

    def frame(x):
        """[B, T] -> [B, frames, n_fft] by stacking hop-sized blocks."""
        x = jnp.pad(x, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
        b, t = x.shape
        n_frames = (t - N_FFT) // HOP + 1
        blocks = x[:, : (t // HOP) * HOP].reshape(b, t // HOP, HOP)
        segs = [blocks[:, i : i + n_frames] for i in range(N_FFT // HOP)]
        return jnp.concatenate(segs, axis=2)

    def power_from_frames(frames, kernel, dtype):
        spec = jnp.einsum(
            "btn,nk->btk",
            frames.astype(dtype),
            kernel.astype(dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None,
        )
        k = N_FFT // 2 + 1
        power = jnp.square(spec[..., :k]) + jnp.square(spec[..., k:])
        return jnp.transpose(power, (0, 2, 1))  # [B, K, frames] like stft_power

    variants = {
        "conv_highest": lambda x: stft_power(
            x, N_FFT, HOP, N_FFT, precision=jax.lax.Precision.HIGHEST
        ),
        "conv_default": lambda x: stft_power(
            x, N_FFT, HOP, N_FFT, precision=jax.lax.Precision.DEFAULT
        ),
        "matmul_f32": lambda x: power_from_frames(frame(x), mat, jnp.float32),
        "matmul_bf16": lambda x: power_from_frames(frame(x), mat, jnp.bfloat16),
    }

    ref = np.asarray(jax.jit(variants["conv_highest"])(wavs[0]))
    scale = np.maximum(np.abs(ref), 1e-3 * np.abs(ref).max())

    for tag, fn in variants.items():
        got = np.asarray(jax.jit(fn)(wavs[0]))
        rel = float(np.max(np.abs(got - ref) / scale))

        def scan_forward(batches, fn=fn):
            def body(carry, x):
                return carry + fn(x).mean(), None

            total, _ = jax.lax.scan(body, jnp.float32(0), batches)
            return total

        compiled = jax.jit(scan_forward).lower(wavs).compile()
        float(compiled(wavs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(wavs))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        print(
            json.dumps(
                {
                    "tag": tag,
                    "batch": args.batch,
                    "ms_per_batch": round(ms, 3),
                    "clips_per_sec": round(args.batch / (ms / 1e3), 1),
                    "max_rel_err_vs_conv_highest": float(f"{rel:.3g}"),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
