"""Where do EfficientNet-B0's 14.3 ms/batch go? Component ablation on the chip.

Round-3 measured the zoo's EfficientNet at 8,927 clips/s but only 8.0% MFU —
asserted (not measured) to be a depthwise-conv property. This script
decomposes the extraction path with the same on-device scan-loop methodology
as bench_zoo.py:

  full          — waveform -> STFT/mel frontend -> trunk (the zoo baseline).
  frontend      — the mel-spectrogram frontend alone. The 800-point rDFT is a
                  dense matmul (~82 GFLOP/batch at B=128/5 s) at
                  Precision.HIGHEST — 6-pass fp32 emulation on the MXU.
  frontend_high — same at Precision.HIGH (3 bf16 passes).
  frontend_fast — same at Precision.DEFAULT (1 bf16 pass, fp32 accumulate).
  full_fast     — full path with the DEFAULT-precision frontend; also prints
                  the pooled-embedding relative drift vs the HIGHEST baseline.
  trunk         — the conv net alone on a precomputed (B, 3, 128, T) input.
  trunk_no_dw   — trunk with every depthwise conv skipped (identity): bounds
                  the wall-clock share of the VPU-bound depthwise convs.
  trunk_no_se   — trunk with squeeze-excitation skipped: bounds the share of
                  the tiny latency-bound SE matmuls ((B,1,1,C) tensors).

The skip variants change the math (they exist to bound time shares, not to
produce embeddings); their ms/batch is the signal, their MFU is meaningless
and not printed. Reference workload: avex/models/efficientnet.py:61-68.

Usage: python scripts/bench_effnet_ablation.py [--batch 128] [--iters 8]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument(
        "--variants",
        default="full,frontend,frontend_high,frontend_fast,full_fast,"
        "trunk,trunk_no_dw,trunk_no_se",
    )
    parser.add_argument(
        "--cpu", action="store_true", help="force CPU (correctness smoke test)"
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import avex_tpu.models.efficientnet as effnet_mod
    from avex_tpu.models.load import load_model

    model = load_model(
        "esp_aves2_effnetb0_all",
        return_features_only=True,
        random_weights=True,
        compute_dtype="bfloat16",
    )
    n_samples = 80000
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        (rng.standard_normal((args.iters, args.batch, n_samples)) * 0.1).astype(
            np.float32
        )
    )

    layers = model.register_hooks_for_layers(["last_layer"])
    extract = model.extract_fn(tuple(layers), "none")
    variables = model.variables
    spec_shape = None

    def measure(tag, fn, batches, count_flops=True):
        def scan_forward(v, batches):
            def body(carry, x):
                return carry + fn(v, x).astype(jnp.float32).mean(), None

            total, _ = jax.lax.scan(body, jnp.float32(0), batches)
            return total

        compiled = jax.jit(scan_forward).lower(variables, batches).compile()
        flops = None
        if count_flops:
            try:
                single = jax.jit(lambda v, x: fn(v, x).astype(jnp.float32).mean())
                cost = single.lower(variables, batches[0]).compile().cost_analysis()
                cost = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(cost.get("flops", 0.0))
            except Exception as err:  # pragma: no cover - diagnostics only
                print(f"# {tag}: cost analysis failed: {err}", file=sys.stderr)

        float(compiled(variables, batches))  # compile+warmup sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(variables, batches))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        out = {
            "tag": tag,
            "batch": args.batch,
            "ms_per_batch": round(ms, 2),
            "clips_per_sec": round(args.batch / (ms / 1e3), 1),
        }
        if flops:
            out["tflops_per_sec"] = round(flops / (ms / 1e3) / 1e12, 1)
            out["mfu_pct"] = round(100 * flops / (ms / 1e3) / 197e12, 1)
        print(json.dumps(out), flush=True)

    wanted = args.variants.split(",")

    if "full" in wanted:
        measure("full", lambda v, x: extract(v, x, None), wavs)

    # MXU precision sweep on the frontend (STFT -> mel -> norm -> 3-channel).
    # Each precision is pinned explicitly: since round 4 the bf16 wrapper
    # defaults to DEFAULT, so "frontend" (HIGHEST) is the fp32-parity
    # setting, not the wrapper default.
    proc = model.audio_processor
    orig_precision = proc.precision
    for tag, prec in (
        ("frontend", jax.lax.Precision.HIGHEST),
        ("frontend_high", jax.lax.Precision.HIGH),
        ("frontend_fast", jax.lax.Precision.DEFAULT),
    ):
        if tag in wanted:
            proc.precision = prec
            try:
                measure(tag, lambda v, x: model.process_audio(x), wavs)
            finally:
                proc.precision = orig_precision

    if "full_fast" in wanted:
        # Last-layer feature-map drift of the DEFAULT-precision frontend vs
        # the HIGHEST baseline, through the full bf16 trunk (stricter than
        # pooled drift — no averaging to hide behind). Since round 4 the
        # bf16 wrapper defaults to the DEFAULT-precision frontend, so both
        # settings are pinned explicitly here.
        # NB: precision is read at TRACE time inside process_audio, so each
        # setting needs its own jit object — reusing one silently replays
        # the first-traced program.
        try:
            proc.precision = jax.lax.Precision.HIGHEST
            base = np.asarray(
                jax.jit(lambda v, x: extract(v, x, None).astype(jnp.float32))(
                    variables, wavs[0]
                )
            )
            proc.precision = jax.lax.Precision.DEFAULT
            fast = np.asarray(
                jax.jit(lambda v, x: extract(v, x, None).astype(jnp.float32))(
                    variables, wavs[0]
                )
            )
            rel = float(
                np.linalg.norm(fast - base) / (np.linalg.norm(base) + 1e-12)
            )
            print(
                json.dumps({"tag": "full_fast_feat_rel_err", "rel_err": rel}),
                flush=True,
            )
            measure("full_fast", lambda v, x: extract(v, x, None), wavs)
        finally:
            proc.precision = orig_precision

    # Trunk alone on the precomputed spectrogram input.
    spec0 = jax.jit(model.process_audio)(wavs[0])
    spec_shape = tuple(spec0.shape)
    print(json.dumps({"tag": "spec_shape", "shape": list(spec_shape)}), flush=True)
    specs = jnp.stack(
        [jax.jit(model.process_audio)(wavs[i]) for i in range(args.iters)]
    )
    if "trunk" in wanted:
        measure("trunk", lambda v, x: extract(v, x, None), specs)

    # Skip variants: monkeypatch the building blocks to bound time shares.
    if "trunk_no_dw" in wanted:
        orig_call = effnet_mod._ConvBN.__call__

        def no_dw_call(self, x, train=False):
            if self.groups > 1:
                # depthwise conv -> strided slice: zero conv work, same output
                # shape so the downstream compute is unchanged.
                s = self.stride
                x = x[:, ::s, ::s, :] if s > 1 else x
                return x, x
            return orig_call(self, x, train)

        effnet_mod._ConvBN.__call__ = no_dw_call
        try:
            measure(
                "trunk_no_dw",
                lambda v, x: extract(v, x, None),
                specs,
                count_flops=False,
            )
        finally:
            effnet_mod._ConvBN.__call__ = orig_call

    if "trunk_no_se" in wanted:
        import flax.linen as nn

        # NB: monkeypatching __call__ with a bare function bypasses flax's
        # method wrapping (no scope is opened), so submodule creation inside
        # the patched body fails. A real subclass with @nn.compact goes
        # through __init_subclass__ wrapping; the param paths are set by the
        # explicit name= kwargs, so the existing variables tree still binds.
        orig_cls = effnet_mod._MBConv

        class _MBConvNoSE(orig_cls):
            @nn.compact
            def __call__(self, x, train=False, deterministic=True):
                residual = x
                expanded = self.in_channels * self.expand_ratio
                common = dict(
                    dtype=self.dtype,
                    bn_eps=self.bn_eps,
                    tf_same_padding=self.tf_same_padding,
                )
                if self.expand_ratio != 1:
                    x, _ = effnet_mod._ConvBN(expanded, 1, name="expand", **common)(
                        x, train
                    )
                x, _ = effnet_mod._ConvBN(
                    expanded,
                    self.kernel,
                    self.stride,
                    groups=expanded,
                    name="dw",
                    **common,
                )(x, train)
                # SE skipped entirely (flax.apply ignores unused se_* params).
                x, proj = effnet_mod._ConvBN(
                    self.out_channels, 1, act=False, name="project", **common
                )(x, train)
                if self.stride == 1 and self.in_channels == self.out_channels:
                    x = x + residual
                return x, proj

        effnet_mod._MBConv = _MBConvNoSE
        try:
            measure(
                "trunk_no_se",
                lambda v, x: extract(v, x, None),
                specs,
                count_flops=False,
            )
        finally:
            effnet_mod._MBConv = orig_cls


if __name__ == "__main__":
    main()
