"""Measure the W8A8 dynamic-int8 BEATs serving path vs bf16 on the chip.

Reuses bench.py's on-device scan harness. Prints one JSON line per
configuration plus the int8-vs-bf16 pooled relative error. Run AFTER test
suites finish — contended host timing corrupts measurements (CLAUDE.md).

    python scripts/bench_int8.py [batch ...]
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def main() -> None:
    batches = [int(b) for b in sys.argv[1:]] or [128]
    for batch in batches:
        rows = {}
        iters = max(10, 256 // batch)  # small batches need more scan steps
        for name, quantize in (("bf16", False), ("int8", True)):
            r = bench._measure_tpu(
                batch_size=batch, dtype_name="bfloat16", iters=iters, quantize=quantize
            )
            rows[name] = r
            out = {
                "config": name,
                "batch": batch,
                "clips_per_sec": round(r["clips_per_sec"], 2),
            }
            if "mfu_pct" in r:
                out["tflops_per_sec"] = round(r["tflops_per_sec"], 2)
                out["mfu_pct_bf16peak"] = round(r["mfu_pct"], 2)
            print(json.dumps(out), flush=True)
        a, b = rows["int8"].get("pooled"), rows["bf16"].get("pooled")
        if a is not None and b is not None:
            rel = float(np.linalg.norm(a - b) / np.linalg.norm(b))
            print(json.dumps({"batch": batch, "int8_bf16_rel_err": round(rel, 6),
                              "speedup": round(rows["int8"]["clips_per_sec"]
                                               / rows["bf16"]["clips_per_sec"], 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
