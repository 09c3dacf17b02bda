"""Where do AVES's 118 ms/batch go? Component ablation on the real chip.

Round-4 zoo: AVES at 1,079 clips/s / 40.2% MFU — the slowest
transformer per-FLOP after the frontend fixes landed everywhere else.
Its 7-layer wav2vec2 conv extractor is ~35% of the model's FLOPs, and
its first conv is yet another 1-input-channel strided conv ([B, 80000, 1]
-> [B, 15999, 512], k=10, s=5) — the exact degenerate-tiling shape the
matmul rDFT lowering fixed in the EfficientNet/ResNet/Perch frontends
and the Kaldi fbank. This script decomposes the forward with the same
on-device scan-loop methodology as bench_zoo.py:

  full          — waveform -> conv extractor -> 12-layer encoder (zoo path).
  extractor     — the 7-layer conv stack alone.
  extractor_mm  — same, with conv_0 lowered as a framed matmul
                  ([B*15999, 10] x [10, 512] over gcd(10,5)=5-sample blocks)
                  + feature drift vs the conv baseline.
  extractor_no0 — conv_0 replaced by a strided slice + broadcast (zero conv-0
                  work, same output shape): upper-bounds conv_0's share.
  extractor_nogn— GroupNorm after conv_0 skipped: bounds the GN HBM stream.
  encoder       — the 12-layer transformer alone on precomputed
                  (B, 249, 768) frames (BEATs-encoder-shaped workload).
  full_mm       — full path with the conv_0 matmul lowering.

Skip variants change the math (they bound time shares); their MFU is
meaningless and not printed. Reference workload:
/root/reference/avex/models/aves_model.py (torchaudio wav2vec2 backbone).

Usage: python scripts/bench_aves_ablation.py [--batch 128] [--iters 8] [--cpu]
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
        default="full,extractor,extractor_mm,extractor_no0,extractor_nogn,"
        "encoder,full_mm",
    )
    parser.add_argument(
        "--cpu", action="store_true", help="force CPU (correctness smoke test)"
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import flax.linen as nn
    import jax.numpy as jnp

    import avex_tpu.models.aves as aves_mod

    n_samples = 80000
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        (rng.standard_normal((args.iters, args.batch, n_samples)) * 0.1).astype(
            np.float32
        )
    )

    def measure(tag, make, batches, count_flops=True):
        fn, variables = make()

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

        float(compiled(variables, batches))  # compile + warmup sync
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
        return fn, variables

    def build_model():
        cfg = aves_mod.AVESConfig(
            {"encoder_layer_drop": 0.0, "encoder_projection_dropout": 0.0,
             "encoder_attention_dropout": 0.0, "encoder_dropout": 0.0,
             "encoder_ff_interm_dropout": 0.0}
        )
        model = aves_mod.AVESModel(cfg=cfg, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, n_samples), jnp.float32)
            )
        return model, jax.device_put(variables, jax.devices()[0])

    def build_extractor():
        ext = aves_mod._FeatureExtractor(dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(ext.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, n_samples), jnp.float32)
            )
        return ext, jax.device_put(variables, jax.devices()[0])

    class _Conv0Kernel(nn.Module):
        """Param-tree alias for nn.Conv's {kernel} subtree (read-only reuse)."""

        k: int
        ch: int

        @nn.compact
        def __call__(self):
            return self.param(
                "kernel", nn.initializers.lecun_normal(), (self.k, 1, self.ch)
            )

    class _FEConv0Matmul(aves_mod._FeatureExtractor):
        """conv_0 as a framed matmul; identical math, same param tree."""

        @nn.compact
        def __call__(self, x):
            ch0, k0, s0 = aves_mod.CONV_LAYERS[0]
            b, t = x.shape
            f = (t - k0) // s0 + 1
            # gcd(10, 5)=5-sample blocks; frame i = blocks[i] ++ blocks[i+1].
            g = 5
            blocks = x[:, : (t // g) * g].reshape(b, t // g, g)
            frames = jnp.concatenate(
                [blocks[:, j : j + f] for j in range(2)], axis=2
            )  # (B, F, 10)
            w = _Conv0Kernel(k=k0, ch=ch0, name="conv_0")()
            # fp32 accumulation like the conv lowering (bf16 operands).
            h = jnp.einsum(
                "bfn,nc->bfc",
                frames.astype(self.dtype),
                w[:, 0, :].astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            h = nn.GroupNorm(
                num_groups=ch0, epsilon=1e-5, dtype=self.dtype, name="group_norm"
            )(h)
            h = aves_mod._gelu(h)
            for i, (ch, k, s) in enumerate(aves_mod.CONV_LAYERS):
                if i == 0:
                    continue
                h = nn.Conv(
                    ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                    dtype=self.dtype, name=f"conv_{i}",
                )(h)
                h = aves_mod._gelu(h)
            return h

    wanted = args.variants.split(",")

    if "full" in wanted:
        def full():
            model, v = build_model()
            return (lambda v, w: model.apply(v, w)[0]), v
        measure("full", full, wavs)

    ext = ext_v = None
    if {"extractor", "extractor_mm", "extractor_no0", "extractor_nogn"} & set(wanted):
        ext, ext_v = build_extractor()

    if "extractor" in wanted:
        measure("extractor", lambda: ((lambda v, w: ext.apply(v, w)), ext_v), wavs)

    if "extractor_mm" in wanted:
        base_feats = np.asarray(
            jax.jit(lambda v, w: ext.apply(v, w).astype(jnp.float32))(ext_v, wavs[0])
        )
        mm = _FEConv0Matmul(dtype=jnp.bfloat16)
        fn_mm, v_mm = measure(
            "extractor_mm", lambda: ((lambda v, w: mm.apply(v, w)), ext_v), wavs
        )
        mm_feats = np.asarray(
            jax.jit(lambda v, w: fn_mm(v, w).astype(jnp.float32))(v_mm, wavs[0])
        )
        rel = float(
            np.linalg.norm(mm_feats - base_feats)
            / (np.linalg.norm(base_feats) + 1e-12)
        )
        print(json.dumps({"tag": "extractor_mm_rel_err", "rel_err": rel}), flush=True)

    if "extractor_no0" in wanted:
        class _FENo0(aves_mod._FeatureExtractor):
            @nn.compact
            def __call__(self, x):
                ch0, k0, s0 = aves_mod.CONV_LAYERS[0]
                b, t = x.shape
                f = (t - k0) // s0 + 1
                # conv_0 -> strided slice + broadcast: zero conv-0 work, same
                # output shape so downstream compute is unchanged.
                h = jnp.broadcast_to(
                    x[:, : f * s0 : s0, None], (b, f, ch0)
                ).astype(self.dtype)
                h = nn.GroupNorm(
                    num_groups=ch0, epsilon=1e-5, dtype=self.dtype, name="group_norm"
                )(h)
                h = aves_mod._gelu(h)
                for i, (ch, k, s) in enumerate(aves_mod.CONV_LAYERS):
                    if i == 0:
                        continue
                    h = nn.Conv(
                        ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}",
                    )(h)
                    h = aves_mod._gelu(h)
                return h

        no0 = _FENo0(dtype=jnp.bfloat16)
        measure(
            "extractor_no0",
            lambda: ((lambda v, w: no0.apply(v, w)), ext_v),
            wavs,
            count_flops=False,
        )

    if "extractor_nogn" in wanted:
        class _FENoGN(aves_mod._FeatureExtractor):
            @nn.compact
            def __call__(self, x):
                h = x[:, :, None]
                for i, (ch, k, s) in enumerate(aves_mod.CONV_LAYERS):
                    h = nn.Conv(
                        ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}",
                    )(h)
                    h = aves_mod._gelu(h)
                return h

        nogn = _FENoGN(dtype=jnp.bfloat16)
        measure(
            "extractor_nogn",
            lambda: ((lambda v, w: nogn.apply(v, w)), ext_v),
            wavs,
            count_flops=False,
        )

    if "encoder" in wanted:
        # 12-layer trunk alone on precomputed frame embeddings (B, 249, 768).
        n_frames = 249

        class _Trunk(nn.Module):
            cfg: aves_mod.AVESConfig
            dtype: object = jnp.bfloat16

            @nn.compact
            def __call__(self, h):
                for i in range(self.cfg.encoder_num_layers):
                    h, _ = aves_mod._EncoderLayer(
                        cfg=self.cfg, dtype=self.dtype, name=f"layers_{i}"
                    )(h, None, True)
                return h

        def encoder():
            cfg = aves_mod.AVESConfig(
                {"encoder_layer_drop": 0.0, "encoder_attention_dropout": 0.0,
                 "encoder_dropout": 0.0, "encoder_ff_interm_dropout": 0.0}
            )
            trunk = _Trunk(cfg=cfg)
            with jax.default_device(jax.devices("cpu")[0]):
                variables = jax.jit(trunk.init)(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, n_frames, 768), jnp.bfloat16),
                )
            return (lambda v, x: trunk.apply(v, x)), jax.device_put(
                variables, jax.devices()[0]
            )

        frames = jnp.asarray(
            (rng.standard_normal((args.iters, args.batch, n_frames, 768)) * 0.1).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)
        measure("encoder", encoder, frames)

    if "full_mm" in wanted:
        orig_fe_call = aves_mod._FeatureExtractor.__call__

        def full_mm():
            model, v = build_model()
            aves_mod._FeatureExtractor.__call__ = _FEConv0Matmul.__call__
            return (lambda v, w: model.apply(v, w)[0]), v

        try:
            measure("full_mm", full_mm, wavs)
        finally:
            aves_mod._FeatureExtractor.__call__ = orig_fe_call


if __name__ == "__main__":
    main()
