"""Where does the BEATs training step go? Component ablation on the chip.

Round-3 measured the full supervised fine-tune step (AdamW, bf16, B=128) at
46.5% MFU with no anatomy behind it. This script decomposes it with the same
on-device scan-loop methodology as bench_train_step.py (state as scan carry,
one dispatch, scalar sync — immune to tunnel RPC latency):

  fwd_loss   — loss forward only (no grad): the inference bound.
  grad_sgd   — value_and_grad + plain SGD update: forward + backward,
               optimizer arithmetic ~free (isolates AdamW's cost).
  full       — value_and_grad + AdamW (the round-3 baseline).
  remat      — full, with nn.remat on every encoder layer (recompute-all
               policy): trades backward HBM traffic for MXU recompute.
  remat_dots — full, remat with the dots_with_no_batch_dims_saveable policy:
               matmul outputs saved, elementwise chains recomputed — the
               usual TPU sweet spot.

Each line reports ms/step, clips/s, and (via XLA cost analysis of the jitted
step) achieved TFLOP/s + MFU against v5e's 197 TF/s bf16 peak. Reference hot
loop this maps: /root/reference/avex/training/train.py:255-338.

Usage: python scripts/bench_train_ablation.py [--batch 128] [--steps 8]
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
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--clip-seconds", type=int, default=5)
    parser.add_argument("--variants", default="fwd_loss,grad_sgd,full,remat,remat_dots")
    args = parser.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    num_classes = 10
    samples = args.clip_seconds * 16000
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    def build(remat=False, remat_policy=None):
        cfg = BEATsConfig(
            dropout=0.0,
            attention_dropout=0.0,
            encoder_layerdrop=0.0,
            dropout_input=0.0,
            remat=remat,
            remat_policy=remat_policy,
        )

        class Classifier(nn.Module):
            @nn.compact
            def __call__(self, wav):
                feats, _ = BEATsBackbone(cfg=cfg, dtype=dtype, name="backbone")(wav)
                return nn.Dense(num_classes)(feats.astype(jnp.float32).mean(axis=1))

        model = Classifier()
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, samples), jnp.float32)
        )
        return model, variables["params"]

    batches = {
        "wav": jnp.asarray(
            (rng.standard_normal((args.steps, args.batch, samples)) * 0.1).astype(
                np.float32
            )
        ),
        "label": jnp.asarray(rng.integers(0, num_classes, (args.steps, args.batch))),
    }

    def loss_of(model):
        def loss_fn(p, batch):
            logits = model.apply({"params": p}, batch["wav"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()

        return loss_fn

    def make_step(model, tx, grad):
        loss_fn = loss_of(model)

        if not grad:

            def step(carry, batch):
                params, opt_state = carry
                return (params, opt_state), loss_fn(params, batch)

            return step

        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        return step

    def measure(tag, model, params, tx, grad):
        step = make_step(model, tx, grad)
        opt_state = tx.init(params)

        @jax.jit
        def run(params, opt_state, batches):
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), batches
            )
            return params, opt_state, losses.mean()

        flops = None
        try:
            single = (
                jax.jit(step)
                .lower(
                    (params, opt_state),
                    {"wav": batches["wav"][0], "label": batches["label"][0]},
                )
                .compile()
            )
            cost = single.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost.get("flops", 0.0))
        except Exception as err:  # pragma: no cover - diagnostics only
            print(f"# {tag}: cost analysis failed: {err}", file=sys.stderr)

        _, _, loss = run(params, opt_state, batches)
        float(loss)  # compile + warmup sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, loss = run(params, opt_state, batches)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        ms = best / args.steps * 1e3
        out = {
            "tag": tag,
            "batch": args.batch,
            "ms_per_step": round(ms, 1),
            "clips_per_sec": round(args.batch / (ms / 1e3), 1),
        }
        if flops:
            out["tflops_per_sec"] = round(flops / (ms / 1e3) / 1e12, 1)
            out["mfu_pct"] = round(100 * flops / (ms / 1e3) / 197e12, 1)
        print(json.dumps(out), flush=True)

    wanted = args.variants.split(",")
    adamw = optax.adamw(1e-4, weight_decay=0.01)
    sgd = optax.sgd(1e-4)
    plain_model, plain_params = build()
    if "fwd_loss" in wanted:
        measure("fwd_loss", plain_model, plain_params, sgd, grad=False)
    if "grad_sgd" in wanted:
        measure("grad_sgd", plain_model, plain_params, sgd, grad=True)
    if "full" in wanted:
        measure("full", plain_model, plain_params, adamw, grad=True)
    if "remat" in wanted:
        model, params = build(remat=True)
        measure("remat", model, params, adamw, grad=True)
    if "remat_dots" in wanted:
        model, params = build(remat=True, remat_policy="dots")
        measure("remat_dots", model, params, adamw, grad=True)


if __name__ == "__main__":
    main()
