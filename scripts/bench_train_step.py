"""Training-step throughput: full BEATs supervised fine-tune on one chip.

Two timings:
  - per_call: one jitted step per host dispatch (what Trainer does) — on the
    remote-TPU tunnel this includes ~40 ms/call RPC that a real TPU host
    doesn't pay;
  - on_device: ``lax.scan`` over pre-staged batches with the train state as
    the scan carry — the true device step time (carry buffers are reused in
    place, so this also shows what buffer donation achieves without
    ``donate_argnums``, which round-1 measured 8.5x slower through the
    tunnel's host round-trips).

Usage: python scripts/bench_train_step.py [--batch 64] [--steps 8]
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
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--clip-seconds", type=int, default=5)
    parser.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    cfg = BEATsConfig(
        dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    num_classes = 10
    samples = args.clip_seconds * 16000
    rng = np.random.default_rng(0)

    import flax.linen as nn

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, wav):
            feats, _ = BEATsBackbone(cfg=cfg, dtype=dtype, name="backbone")(wav)
            return nn.Dense(num_classes)(feats.astype(jnp.float32).mean(axis=1))

    model = Classifier()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, samples), jnp.float32)
    )
    params = variables["params"]
    tx = optax.adamw(1e-4, weight_decay=0.01)
    opt_state = tx.init(params)

    def step(carry, batch):
        params, opt_state = carry

        def loss_fn(p):
            logits = model.apply({"params": p}, batch["wav"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    batches = {
        "wav": jnp.asarray(
            (rng.standard_normal((args.steps, args.batch, samples)) * 0.1).astype(np.float32)
        ),
        "label": jnp.asarray(rng.integers(0, num_classes, (args.steps, args.batch))),
    }

    # --- on-device scan loop ---
    @jax.jit
    def run_epoch(params, opt_state, batches):
        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), batches)
        return params, opt_state, losses.mean()

    p, o, loss = run_epoch(params, opt_state, batches)  # compile + warmup
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, loss = run_epoch(params, opt_state, batches)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    on_device_ms = best / args.steps * 1000

    # --- per-call dispatch ---
    one_step = jax.jit(lambda c, b: step(c, b))
    single = {"wav": batches["wav"][0], "label": batches["label"][0]}
    carry, loss = one_step((params, opt_state), single)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        carry, loss = one_step(carry, single)
    float(loss)
    per_call_ms = (time.perf_counter() - t0) / args.steps * 1000

    print(
        json.dumps(
            {
                "metric": "beats_finetune_step",
                "batch": args.batch,
                "dtype": args.dtype,
                "on_device_ms_per_step": round(on_device_ms, 1),
                "on_device_clips_per_sec": round(args.batch / (on_device_ms / 1000), 1),
                "per_call_ms_per_step": round(per_call_ms, 1),
                "per_call_clips_per_sec": round(args.batch / (per_call_ms / 1000), 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
