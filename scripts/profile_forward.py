#!/usr/bin/env python
"""Capture a jax.profiler trace of the BEATs forward and print top device ops.

Runs a few bf16 B=128 forwards under jax.profiler.trace, then parses the
trace-viewer JSON (.trace.json.gz) and aggregates device-stream op durations
by HLO op category — the ground truth for where the 56% non-MFU time goes.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP_SECONDS, SR = 5, 16000


def main():
    import jax
    import jax.numpy as jnp

    from avex_tpu.models.beats import BEATsBackbone, BEATsConfig

    out_dir = os.environ.get("AVEX_PROFILE_OUT", "/tmp/beats_profile")
    batch = int(os.environ.get("AVEX_BENCH_BATCH", "128"))

    cfg = BEATsConfig(dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0)
    model = BEATsBackbone(cfg=cfg, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, CLIP_SECONDS * SR), jnp.float32)
        )
    variables = jax.device_put(variables, jax.devices()[0])
    wav = jnp.asarray(
        (np.random.default_rng(0).standard_normal((batch, CLIP_SECONDS * SR)) * 0.1).astype(
            np.float32
        )
    )
    fn = jax.jit(lambda v, w: model.apply(v, w)[0].astype(jnp.float32).mean())
    float(fn(variables, wav))  # compile outside the trace

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            float(fn(variables, wav))

    # Parse the trace-viewer JSON: device-lane complete events.
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz found under", out_dir, file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # Identify device lanes via process/thread names.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "xla" in name.lower()
    }
    print("# processes:", json.dumps(pid_names), file=sys.stderr)

    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (device_pids and e.get("pid") not in device_pids):
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))  # microseconds
        if not name or dur <= 0:
            continue
        total += dur
        by_name[name] += dur
        base = name.split(".")[0].split("(")[0]
        cat = "".join(ch for ch in base if not ch.isdigit()).strip("-_")
        by_cat[cat] += dur

    print(f"# total device-event time: {total/1e3:.1f} ms (3 runs)")
    print("# top categories:")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(json.dumps({"cat": cat, "ms": round(dur / 1e3, 2), "pct": round(100 * dur / total, 1)}))
    print("# top individual ops:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(json.dumps({"op": name[:110], "ms": round(dur / 1e3, 2), "pct": round(100 * dur / total, 1)}))


if __name__ == "__main__":
    main()
